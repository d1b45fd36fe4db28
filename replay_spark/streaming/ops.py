"""Structured Streaming extensions.

The reference engine is batch-only (SURVEY §2.12); these operators
are the natural streaming continuations of its incremental pieces,
built on Structured Streaming primitives:

* ``StreamingSessionizer`` — ``session_window(ts, gap)`` grouped
  aggregation with a watermark for late data; the streaming
  equivalent of the batch ``Sessionizer`` (which identifies the same
  sessions via lag/cumsum).
* ``StreamingUCB`` — ``UCB.refit`` (union + re-aggregate, a
  commutative monoid — ``ucb.py:148-177``) expressed as a streaming
  groupBy aggregation in update mode: per-item (pos, total) counts
  stay in state, scores are recomputed per micro-batch.
* ``streaming_exact_dedup`` — watermarked ``dropDuplicates`` on a
  content hash: exactly-once dedup across micro-batches within the
  watermark horizon.

All three run identically on a bounded stream in tests
(``spark.readStream.format("rate")``-free: memory/file sources).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "StreamingSessionizer",
    "StreamingStatefulSessionizer",
    "StreamingUCB",
    "StreamingWindowedAggregator",
    "StreamingIntervalJoiner",
    "StreamingCountMinSketch",
    "StreamingHyperLogLog",
    "StreamingHdrQuantiles",
    "StreamingSourceCapFilter",
    "streaming_exact_dedup",
]


class StreamingSessionizer:
    """Watermarked session-window aggregation.

    Produces one row per (user, session window) with start/end and
    the number of events — the streaming contract for session
    assignment (events inside a window belong to one session).
    """

    def __init__(
        self,
        user_column: str = "user_id",
        time_column: str = "ts",
        gap: str = "30 minutes",
        watermark: str = "1 hour",
    ):
        self.user_column = user_column
        self.time_column = time_column
        self.gap = gap
        self.watermark = watermark

    def transform(self, stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark(self.time_column, self.watermark)
            .groupBy(
                F.session_window(F.col(self.time_column), self.gap).alias(
                    "session"
                ),
                F.col(self.user_column),
            )
            .agg(F.count(F.lit(1)).alias("num_events"))
            .select(
                self.user_column,
                F.col("session.start").alias("session_start"),
                F.col("session.end").alias("session_end"),
                "num_events",
            )
        )


class StreamingUCB:
    """UCB arm statistics as a streaming stateful aggregation.

    The model state is per-item (pos, total); each micro-batch folds
    new binary-reward events in. ``scores_query`` starts the stream
    into an in-memory sink; ``current_scores`` reads the latest
    accumulated state as UCB scores.
    """

    def __init__(
        self,
        coef: float = 2.0,
        item_column: str = "item_id",
        rating_column: str = "rating",
    ):
        self.coef = coef
        self.item_column = item_column
        self.rating_column = rating_column

    def aggregate(self, stream: DataFrame) -> DataFrame:
        """Streaming plan: per-item reward aggregates (update mode)."""
        return stream.groupBy(self.item_column).agg(
            F.sum(self.rating_column).alias("pos"),
            F.count(self.rating_column).alias("total"),
        )

    def scores(self, aggregated: DataFrame, full_count: int) -> DataFrame:
        """Turn (pos, total) state into UCB scores (same formula as
        the batch model — ``replay_spark.models.bandits.UCB``)."""
        return aggregated.withColumn(
            self.rating_column,
            F.col("pos") / F.col("total")
            + F.sqrt(
                F.lit(self.coef) * F.log(F.lit(float(full_count))) / F.col("total")
            ),
        ).drop("pos", "total")


def streaming_exact_dedup(
    stream: DataFrame,
    text_column: str = "text",
    time_column: Optional[str] = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once content dedup within the watermark horizon.

    Dedup keys on the content hash ALONE — identical content arriving
    at different event times is still a duplicate.
    ``dropDuplicatesWithinWatermark`` bounds the dedup state to the
    watermark horizon (content re-appearing after the horizon is
    emitted again — the state-retention tradeoff of any windowed
    dedup)."""
    hashed = stream.withColumn("_content_hash", F.md5(F.col(text_column)))
    if time_column is not None:
        hashed = hashed.withWatermark(time_column, watermark)
        return hashed.dropDuplicatesWithinWatermark(["_content_hash"]).drop(
            "_content_hash"
        )
    return hashed.dropDuplicates(["_content_hash"]).drop("_content_hash")


class StreamingStatefulSessionizer:
    """Per-event session assignment with CUSTOM state
    (``applyInPandasWithState``) — the streaming twin of the batch
    ``Sessionizer``'s composite mode: each event is tagged
    ``"{user}_{ordinal}"`` where the ordinal increments whenever the
    gap to the user's previous event reaches ``session_gap`` seconds.

    State per user: (last event time, session ordinal) — two longs,
    so state size is O(active users), independent of history length.
    Events are processed in event-time order WITHIN each micro-batch;
    cross-batch reordering must be bounded by an upstream watermark
    (same contract as any stateful streaming op).
    """

    def __init__(
        self,
        user_column: str = "user_id",
        time_column: str = "ts",
        session_gap: int = 1800,
    ):
        self.user_column = user_column
        self.time_column = time_column
        self.session_gap = session_gap

    def transform(self, stream: DataFrame) -> DataFrame:
        import pandas as pd

        from pyspark.sql.streaming.state import GroupStateTimeout
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
            TimestampType,
        )

        user_col, time_col, gap = (
            self.user_column,
            self.time_column,
            self.session_gap,
        )
        out_schema = StructType(
            [
                StructField(user_col, LongType()),
                StructField(time_col, TimestampType()),
                StructField("session_id", StringType()),
            ]
        )
        state_schema = StructType(
            [StructField("last_ts", LongType()), StructField("ordinal", LongType())]
        )

        def assign(key, pdf_iter, state):
            import numpy as np

            (user,) = key
            if state.exists:
                last_ts, ordinal = state.get
            else:
                last_ts, ordinal = None, 0
            for pdf in pdf_iter:
                pdf = pdf.sort_values(time_col)
                # vectorized gap->flag->cumsum with state carry-in: a
                # synthetic prev[0] of (t0 - gap) forces a new session
                # when there is no prior state, matching the per-event
                # rule `new if last is None or t - last >= gap`
                t = (
                    pdf[time_col]
                    .to_numpy()
                    .astype("datetime64[s]")
                    .astype(np.int64)
                )
                if t.size:
                    prev = np.empty_like(t)
                    prev[0] = last_ts if last_ts is not None else t[0] - gap
                    prev[1:] = t[:-1]
                    ordinals = ordinal + np.cumsum((t - prev) >= gap)
                    ordinal = int(ordinals[-1])
                    last_ts = int(t[-1])
                    session_ids = f"{user}_" + pd.Series(ordinals).astype(str)
                else:
                    session_ids = pd.Series([], dtype=str)
                yield pd.DataFrame(
                    {
                        user_col: pdf[user_col].to_numpy(),
                        time_col: pdf[time_col].to_numpy(),
                        "session_id": session_ids.to_numpy(),
                    }
                )
            state.update((last_ts, ordinal))

        return stream.groupBy(user_col).applyInPandasWithState(
            assign,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )


class StreamingSourceCapFilter:
    """Per-source document admission cap with CUSTOM state
    (``applyInPandasWithState``) — the streaming twin of the batch
    ``SourceCapFilter``. A streaming ingest cannot know the corpus'
    "``cap`` smallest ids", so the online rule is the one production
    ingests use: FIRST ``cap`` arrivals per source win (within a
    micro-batch, arrival order is made deterministic by sorting on
    ``id_column``).

    State per source: one admitted-count long, so state size is
    O(distinct sources) — domains, not documents. Admitted rows are
    emitted append-mode; over-cap rows are dropped exactly-once per
    the state counter.
    """

    def __init__(
        self,
        cap: int,
        partition_column: str = "source",
        id_column: str = "doc_id",
    ):
        if cap < 1:
            raise ValueError("cap must be >= 1")
        self.cap = cap
        self.partition_column = partition_column
        self.id_column = id_column

    def transform(self, stream: DataFrame) -> DataFrame:
        from pyspark.sql.streaming.state import GroupStateTimeout
        from pyspark.sql.types import LongType, StructField, StructType

        cap, src, idc = self.cap, self.partition_column, self.id_column
        out_schema = stream.schema
        state_schema = StructType([StructField("admitted", LongType())])

        def admit(key, pdf_iter, state):
            import pandas as pd

            admitted = state.get[0] if state.exists else 0
            # applyInPandasWithState may deliver ONE group as several
            # chunks per micro-batch; sorting chunks independently
            # would make the admitted set depend on chunk boundaries.
            # Concatenate the group's micro-batch slice first (a later
            # chunk can hold a smaller id), then sort once — buffering
            # is one source's share of one micro-batch, and skipped
            # entirely once the source has reached its cap.
            if admitted < cap:
                chunks = []
                for pdf in pdf_iter:
                    chunks.append(pdf)
                if chunks:
                    pdf = pd.concat(chunks, ignore_index=True)
                    pdf = pdf.sort_values(idc)
                    take = min(cap - admitted, len(pdf))
                    admitted += take
                    yield pdf.head(take)
            state.update((admitted,))

        return stream.groupBy(src).applyInPandasWithState(
            admit,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )


class StreamingCountMinSketch:
    """Count-Min sketch as a streaming stateful aggregation.

    The sketch's merge IS addition, so the depth×width counters are
    a plain streaming groupBy-count that folds every micro-batch in
    — state bounded by depth·width REGARDLESS of stream length, the
    property that makes frequency tracking on an unbounded token
    stream safe. ``aggregate`` returns the streaming register plan
    (run it in complete/update mode); point estimates reuse the
    batch :class:`~replay_spark.preprocessing.text.CountMinSketch`
    against the materialized sink, so streaming and batch sketches
    are interchangeable — pinned by the ``q_streaming_cms`` gate,
    which hash-matches the BATCH oracle SQL.
    """

    def __init__(
        self,
        depth: int = 3,
        width: int = 1024,
        token_column: str = "token",
        hash_family: str = "md5",
    ):
        from replay_spark.preprocessing.text import CountMinSketch

        self.cms = CountMinSketch(
            depth=depth,
            width=width,
            token_column=token_column,
            hash_family=hash_family,
        )

    def aggregate(self, stream: DataFrame) -> DataFrame:
        """Streaming plan: ≤ depth·width counter rows (complete or
        update output mode)."""
        return (
            self.cms._stacked_buckets(stream)
            .groupBy("_seed", "_bucket")
            .agg(F.count("*").alias("cnt"))
        )

    def estimate(self, sketch: DataFrame, queries: DataFrame) -> DataFrame:
        """Point estimates from a materialized sketch sink (same
        contract as the batch class)."""
        return self.cms.estimate(sketch, queries)


class StreamingHyperLogLog:
    """HyperLogLog as a streaming stateful aggregation — the MAX
    merge of the register table is commutative and idempotent, so
    per-register state (≤ 2^b rows) folds every micro-batch in and
    NEVER grows with the stream: approximate COUNT DISTINCT over an
    unbounded token stream in bounded memory. ``aggregate`` returns
    the streaming register plan (complete/update mode); estimates
    reuse the batch estimator against the materialized sink —
    streaming and batch sketches are interchangeable, pinned by the
    ``q_streaming_hll`` gate hash-matching the BATCH oracle.
    """

    def __init__(self, b: int = 6, token_column: str = "token"):
        from replay_spark.preprocessing.text import HyperLogLog

        self.hll = HyperLogLog(b=b, token_column=token_column)

    def aggregate(self, stream: DataFrame) -> DataFrame:
        """Streaming plan: ≤ 2^b register rows (complete/update)."""
        wbits = self.hll.HASH_BITS - self.hll.b
        h = F.conv(
            F.substring(F.md5(F.col(self.hll.token_column)), 1, 15),
            16,
            10,
        ).cast("long")
        hashed = stream.select(
            F.pmod(h, F.lit(self.hll.m)).alias("register"),
            F.floor(h / self.hll.m).cast("long").alias("_w"),
        )
        rho = F.when(
            F.col("_w") == 0, F.lit(wbits + 1)
        ).otherwise(F.lit(wbits + 1) - F.length(F.bin(F.col("_w"))))
        return (
            hashed.withColumn("_rho", rho)
            .groupBy("register")
            .agg(F.max("_rho").alias("rho_max"))
        )

    def estimate(self, registers: DataFrame) -> DataFrame:
        """One-row estimate from a materialized register sink (same
        contract as the batch class)."""
        return self.hll.estimate(registers)


class StreamingHdrQuantiles:
    """HdrQuantileSketch as a streaming stateful aggregation — the
    quantile leg of the streaming sketch family (CMS, HLL, Hdr):
    bucket-wise COUNT is commutative, so per-(group, bucket) state
    folds every micro-batch in and stays ≤ (64−k)·2^k rows per group
    no matter the stream length — approximate quantiles over an
    unbounded value stream in bounded memory. ``aggregate`` returns
    the streaming bucket-count plan (complete/update mode);
    ``quantiles`` reuses the batch rank-join against the
    materialized sink, so streaming and batch sketches are
    interchangeable (pinned by ``q_streaming_hdr`` hash-matching the
    batch oracle)."""

    def __init__(
        self,
        precision_bits: int = 7,
        value_column: str = "v",
        group_columns=(),
    ):
        from replay_spark.preprocessing.text import HdrQuantileSketch

        self.sketch = HdrQuantileSketch(
            precision_bits=precision_bits, value_column=value_column
        )
        self.group_columns = (
            [group_columns]
            if isinstance(group_columns, str)
            else list(group_columns)
        )

    def aggregate(self, stream: DataFrame) -> DataFrame:
        """Streaming bucket counts (complete/update mode)."""
        vc = self.sketch.value_column
        clean = stream.select(*self.group_columns, vc).filter(
            F.col(vc).isNotNull()
        )
        return (
            clean.withColumn("bucket", self.sketch._bucket())
            .groupBy(*self.group_columns, "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def quantiles(self, sink: DataFrame, probs) -> DataFrame:
        """Rank-join quantile read over a materialized sink (same
        contract as the batch class)."""
        if self.group_columns:
            return self.sketch.quantiles_grouped(
                sink, self.group_columns, probs
            )
        return self.sketch.quantiles(sink, probs)


class StreamingWindowedAggregator:
    """Watermarked tumbling/sliding event-time window aggregation —
    the textbook Structured Streaming shape, packaged so batch and
    stream share ONE definition.

    ``transform`` groups by ``window(time_column, window_duration
    [, slide_duration])`` plus ``key_columns`` and emits per-window
    ``n_events`` and (optionally) ``sum_value`` / ``min_value`` /
    ``max_value`` over ``value_column``. On a streaming frame a
    watermark bounds state: closed windows age out of the store
    after ``watermark_delay`` of event time, so state is
    O(open windows × keys), never O(stream). On a batch frame the
    same expression runs as a plain aggregation — which is exactly
    what the parity gate (`q_streaming_window`) exploits: the
    bounded stream's complete-mode result must equal DuckDB's
    epoch-bucket GROUP BY.

    Late data: rows older than the watermark are dropped by the
    engine (documented upstream semantics); choose the delay from
    the source's out-of-orderness, not from wall time.
    """

    def __init__(
        self,
        time_column: str = "timestamp",
        window_duration: str = "1 hour",
        slide_duration: Optional[str] = None,
        key_columns=(),
        value_column: Optional[str] = None,
        watermark_delay: str = "10 minutes",
    ):
        self.time_column = time_column
        self.window_duration = window_duration
        self.slide_duration = slide_duration
        self.key_columns = list(key_columns)
        self.value_column = value_column
        self.watermark_delay = watermark_delay

    def transform(self, df: DataFrame) -> DataFrame:
        src = (
            df.withWatermark(self.time_column, self.watermark_delay)
            if df.isStreaming
            else df
        )
        win = (
            F.window(
                self.time_column, self.window_duration, self.slide_duration
            )
            if self.slide_duration
            else F.window(self.time_column, self.window_duration)
        )
        aggs = [F.count(F.lit(1)).alias("n_events")]
        if self.value_column:
            v = F.col(self.value_column)
            aggs += [
                F.sum(v).alias("sum_value"),
                F.min(v).alias("min_value"),
                F.max(v).alias("max_value"),
            ]
        return (
            src.groupBy(*self.key_columns, win.alias("_w"))
            .agg(*aggs)
            .select(
                *self.key_columns,
                F.col("_w.start").alias("window_start"),
                F.col("_w.end").alias("window_end"),
                "n_events",
                *(
                    ["sum_value", "min_value", "max_value"]
                    if self.value_column
                    else []
                ),
            )
        )


class StreamingIntervalJoiner:
    """Watermarked stream-stream INNER equi-join with an event-time
    interval condition — the correlation primitive (click →
    purchase-within-2h) Structured Streaming supports natively and
    the batch reference has no counterpart for.

    ``transform(left, right)`` joins on ``key_columns`` with
    ``right_time ∈ [left_time, left_time + max_delay]``. On streams
    both sides carry watermarks, and the time-range condition is
    what lets the engine age out buffered rows: left state is bounded
    by ``watermark + max_delay``, right state by the watermark —
    without the range bound a stream-stream join would buffer
    forever (the 100 TB/day failure mode). Inner matches emit as
    soon as both rows arrive (append mode); the watermark governs
    only state cleanup and late-row dropping. On batch frames the
    SAME join expression runs as a plain range-condition equi-join —
    the parity the `q_streaming_join` gate pins against DuckDB.

    Column naming: time columns must differ between the sides (a
    self-derived stream should alias first); output carries every
    left column plus the right side's non-key columns.
    """

    def __init__(
        self,
        key_columns,
        left_time: str = "ts",
        right_time: str = "ts_r",
        max_delay: str = "1 hour",
        watermark_delay: str = "30 minutes",
    ):
        keys = (
            [key_columns]
            if isinstance(key_columns, str)
            else list(key_columns)
        )
        if not keys:
            raise ValueError("need at least one join key")
        if left_time == right_time:
            raise ValueError("left_time and right_time must differ")
        self.key_columns = keys
        self.left_time = left_time
        self.right_time = right_time
        self.max_delay = max_delay
        self.watermark_delay = watermark_delay

    def transform(self, left: DataFrame, right: DataFrame) -> DataFrame:
        lt, rt = self.left_time, self.right_time
        if left.isStreaming:
            left = left.withWatermark(lt, self.watermark_delay)
        if right.isStreaming:
            right = right.withWatermark(rt, self.watermark_delay)
        cond = None
        for k in self.key_columns:
            c = left[k] == right[k]
            cond = c if cond is None else cond & c
        cond = (
            cond
            & (F.col(rt) >= F.col(lt))
            & (
                F.col(rt)
                <= F.col(lt) + F.expr(f"INTERVAL {self.max_delay}")
            )
        )
        joined = left.join(right, cond, "inner")
        # drop the right side's duplicate key columns
        keep = [left[c] for c in left.columns] + [
            right[c] for c in right.columns if c not in self.key_columns
        ]
        return joined.select(*keep)


class StreamingDriftMonitor:
    """Snapshot drift as a streaming stateful aggregation — the
    production posture of :class:`~replay_spark.analytics.
    DriftReport`: the reference is FROZEN at fit time (its quantile
    edges, category order, and bin counts ride the fitted report),
    and the live side's bin counts are a plain streaming
    groupBy-count whose state is bounded by
    ``columns × (bins + 2)`` rows REGARDLESS of stream length.
    ``aggregate`` returns the streaming register plan (complete /
    update output mode); ``report`` joins the materialized sink
    against the frozen reference counts, so the streaming report IS
    the batch report — pinned by the ``q_streaming_drift`` gate,
    which hash-matches the BATCH oracle SQL. psi()/chi2() then run
    on the result exactly as in batch.
    """

    def __init__(self, drift):
        if drift._ref_counts is None:
            raise ValueError(
                "fit the DriftReport on the reference before "
                "streaming the current side"
            )
        self.drift = drift

    def aggregate(self, stream: DataFrame) -> DataFrame:
        """Streaming plan: ≤ columns·(bins+2) count rows."""
        return self.drift._binned(stream)

    def report(self, sink: DataFrame) -> DataFrame:
        """``[column, bin, n_ref, n_cur]`` from a materialized sink
        (same contract as the batch ``DriftReport.report``)."""
        return self.drift.report_from_counts(
            sink.withColumnRenamed("n", "n_cur")
        )
