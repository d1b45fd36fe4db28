"""Time-series regularization: per-key fixed-interval resampling
with distributed gap fill.

Event streams arrive irregular; feature windows, burn-rate tables,
and sequence models want a dense per-key grid. ``TimeSeriesResampler``
buckets timestamps to a fixed interval, aggregates per (key, bucket),
and completes each key's grid WITHOUT touching the driver:

1. ``bucket = unix_micros(ts) div (interval * 1e6)`` — exact BIGINT
   projection (microsecond epochs, the repo's timezone-proof
   convention);
2. ONE map-side-combined ``groupBy(key, bucket)`` carrying count /
   sum / min / max partials;
3. grid completion from a per-key (min, max) rollup of that SAME
   aggregate (tiny), ``sequence() + explode`` generating each key's
   dense bucket range executor-side, and a keyed left join
   re-attaching observed buckets;
4. fill — ``n_events`` is always 0-filled; the value aggregate is
   ``fill="zero"`` (0), ``"null"``, ``"ffill"`` (last observed
   value via ``last(ignorenulls)`` over each key's grid — a window
   ordered WITHIN the key partitioning already in place), or
   ``"interpolate"`` (linear between the neighbouring observed
   buckets via one backward + one forward window over that same
   partitioning; edges hold the boundary value).

Scale: every stage is keyed; there is no global sort. A key's grid
is bounded by time-span / interval, not by its event count, so hot
keys in the raw stream are NOT hot in the grid — the explode output
is uniform across keys. With ``extend="global"`` all keys share the
corpus-wide (min, max) grid (aligned matrices for model input); the
two extra scalars come from the same rollup.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["TimeSeriesResampler", "RollingAggregator", "AnomalyFlagger"]


class AnomalyFlagger:
    """Leakage-free rolling outlier detection with an EXACT integer
    z²-test: a row is anomalous when ``(v - mean)² > t²·var`` over
    the trailing ``window_rows`` PRIOR rows (the current row never
    sees itself — the point-in-time rule every training pipeline
    needs).

    With integer values and population variance, the test multiplies
    out to pure BIGINT arithmetic with no division and no sqrt:

        (v·c − s)² · den²  >  num² · (c·q − s²)

    where c/s/q are the trailing count/sum/sum-of-squares and the
    threshold is the rational ``num/den`` — bit-identical on every
    engine, which is what lets the gate hash a float-free anomaly
    column. Rows with fewer than ``min_periods`` prior observations
    emit NULL (unknown, not normal).

    Plan: ONE window per key ordered by ``order_columns`` (include a
    unique tiebreaker — ties make any rolling definition ambiguous)
    with a rows-frame ``[-window_rows, -1]`` — linear per key, no
    self-join. Keys are many; a single key's rows sit in one task
    (the per-entity sequence bound this repo documents everywhere).
    """

    def __init__(
        self,
        key_column: str = "user_id",
        order_columns=("ts",),
        value_column: str = "value",
        window_rows: int = 50,
        threshold_num: int = 3,
        threshold_den: int = 1,
        min_periods: int = 5,
    ):
        if window_rows < 1:
            raise ValueError("window_rows must be >= 1")
        if threshold_num < 0 or threshold_den < 1:
            raise ValueError("threshold must be a non-negative rational")
        if min_periods < 2:
            raise ValueError("min_periods must be >= 2 (variance)")
        self.key_column = key_column
        self.order_columns = list(order_columns)
        self.value_column = value_column
        self.window_rows = window_rows
        self.threshold_num = threshold_num
        self.threshold_den = threshold_den
        self.min_periods = min_periods

    def transform(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        v = F.col(self.value_column).cast("long")
        w = (
            Window.partitionBy(self.key_column)
            .orderBy(*self.order_columns)
            .rowsBetween(-self.window_rows, -1)
        )
        c = F.count(v).over(w)
        s = F.sum(v).over(w)
        q = F.sum(v * v).over(w)
        lhs = (v * c - s) * (v * c - s) * (
            self.threshold_den * self.threshold_den
        )
        rhs = (self.threshold_num * self.threshold_num) * (c * q - s * s)
        flag = F.when(
            c < self.min_periods, F.lit(None).cast("int")
        ).otherwise((lhs > rhs).cast("int"))
        return (
            df.withColumn("trailing_n", c)
            .withColumn("trailing_sum", s)
            .withColumn("trailing_sumsq", q)
            .withColumn("is_anomaly", flag)
        )


class RollingAggregator:
    """Trailing-window per-key features — count / sum / min / max
    over the last ``window_seconds`` (inclusive of the current row's
    instant): the leakage-free point-in-time feature primitive for
    training-data generation ("events in the last hour", "spend in
    the last 7 days" as of EACH event).

    One window per key ordered by microsecond epoch with a RANGE
    frame — rows whose order value lies in ``[t - window, t]``. RANGE
    semantics (peers at the same timestamp all included) are
    identical in Spark and ANSI engines, and the frame is evaluated
    with a sliding two-pointer inside each key partition — O(rows)
    per key, no self-join blowup. Keys are many, so the keyed
    exchange balances; a single key's rows sit in one task (the same
    bound every per-entity sequence op in this repo documents).
    """

    def __init__(
        self,
        window_seconds: int = 3600,
        key_column: str = "user_id",
        time_column: str = "ts",
        value_column: Optional[str] = "value",
    ):
        if window_seconds < 1:
            raise ValueError("window_seconds must be >= 1")
        self.window_seconds = window_seconds
        self.key_column = key_column
        self.time_column = time_column
        self.value_column = value_column

    def transform(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        us = F.expr(
            f"unix_micros(CAST(`{self.time_column}` AS TIMESTAMP))"
        )
        out = df.withColumn("_us", us)
        w = (
            Window.partitionBy(self.key_column)
            .orderBy("_us")
            .rangeBetween(-(self.window_seconds * 1_000_000), 0)
        )
        out = out.withColumn(
            "trailing_count", F.count(F.lit(1)).over(w)
        )
        if self.value_column:
            v = F.col(self.value_column)
            out = (
                out.withColumn("trailing_sum", F.sum(v).over(w))
                .withColumn("trailing_min", F.min(v).over(w))
                .withColumn("trailing_max", F.max(v).over(w))
            )
        return out.drop("_us")


class TimeSeriesResampler:
    """Resample (key, ts, value) streams onto a dense bucket grid.

    Output columns: the key, ``bucket`` (long), ``bucket_ts``
    (timestamp of the bucket start), ``n_events`` (long, 0 on gaps),
    ``value_sum`` (fill-dependent), ``is_gap`` (int 0/1).
    """

    def __init__(
        self,
        interval_seconds: int = 3600,
        key_column: str = "user_id",
        time_column: str = "ts",
        value_column: Optional[str] = "value",
        fill: str = "zero",
        extend: str = "per_key",
    ):
        if interval_seconds < 1:
            raise ValueError("interval_seconds must be >= 1")
        if fill not in ("zero", "null", "ffill", "interpolate"):
            raise ValueError(
                "fill must be 'zero', 'null', 'ffill', or 'interpolate'"
            )
        if extend not in ("per_key", "global"):
            raise ValueError("extend must be 'per_key' or 'global'")
        self.interval_seconds = interval_seconds
        self.key_column = key_column
        self.time_column = time_column
        self.value_column = value_column
        self.fill = fill
        self.extend = extend

    def _bucket(self) -> Column:
        # integral division on BIGINT microseconds — exact
        return F.expr(
            f"CAST(unix_micros(CAST(`{self.time_column}` AS "
            f"TIMESTAMP)) div "
            f"{self.interval_seconds * 1_000_000} AS BIGINT)"
        )

    def transform(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        key = self.key_column
        aggs = [F.count(F.lit(1)).alias("n_events")]
        if self.value_column:
            aggs.append(F.sum(self.value_column).alias("_vsum"))
        observed = (
            df.select(
                key,
                self._bucket().alias("bucket"),
                *([self.value_column] if self.value_column else []),
            )
            .groupBy(key, "bucket")
            .agg(*aggs)
        )
        if self.extend == "global":
            bounds = observed.agg(
                F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
            )
            spans = observed.select(key).distinct().crossJoin(
                F.broadcast(bounds)
            )
        else:
            spans = observed.groupBy(key).agg(
                F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
            )
        grid = spans.select(
            key,
            F.explode(F.sequence("_lo", "_hi")).alias("bucket"),
        )
        out = grid.join(observed, on=[key, "bucket"], how="left")
        out = out.withColumn(
            "is_gap", F.when(F.col("n_events").isNull(), 1).otherwise(0)
        ).withColumn("n_events", F.coalesce("n_events", F.lit(0)))
        if self.value_column:
            if self.fill == "zero":
                # lit(0) coerces to the sum's own type (long stays long)
                vs = F.coalesce(F.col("_vsum"), F.lit(0))
            elif self.fill == "null":
                vs = F.col("_vsum")
            elif self.fill == "ffill":
                # last observed value carried over gap rows
                w = (
                    Window.partitionBy(key)
                    .orderBy("bucket")
                    .rowsBetween(Window.unboundedPreceding, 0)
                )
                vs = F.last("_vsum", ignorenulls=True).over(w)
            else:  # interpolate: linear between neighbouring buckets
                # Two windows over the SAME (key, bucket) partitioning
                # — backward carries (prev value, prev bucket), forward
                # (next value, next bucket); the interior gap value is
                # prev + (next-prev) * ((b-pb)/(nb-pb)) as a double
                # with that exact operation order (IEEE-deterministic,
                # engine-portable); one-sided edges (extend="global")
                # hold the boundary value.
                wb = (
                    Window.partitionBy(key)
                    .orderBy("bucket")
                    .rowsBetween(Window.unboundedPreceding, 0)
                )
                wf = (
                    Window.partitionBy(key)
                    .orderBy("bucket")
                    .rowsBetween(0, Window.unboundedFollowing)
                )
                # a bucket counts as observed only if its sum is
                # non-null, so all-null observed buckets interpolate
                # like gaps and (pv, pb) / (nv, nb) stay paired
                obs_b = F.when(
                    F.col("_vsum").isNotNull(), F.col("bucket")
                )
                pv = F.last("_vsum", ignorenulls=True).over(wb)
                pb = F.last(obs_b, ignorenulls=True).over(wb)
                nv = F.first("_vsum", ignorenulls=True).over(wf)
                nb = F.first(obs_b, ignorenulls=True).over(wf)
                frac = (F.col("bucket") - pb).cast("double") / (
                    nb - pb
                ).cast("double")
                vs = (
                    F.when(F.col("_vsum").isNotNull(), F.col("_vsum"))
                    .when(pv.isNull(), nv)
                    .when(nv.isNull(), pv)
                    .otherwise(pv + (nv - pv) * frac)
                )
            out = out.withColumn("value_sum", vs).drop("_vsum")
        return out.withColumn(
            "bucket_ts",
            F.timestamp_micros(
                F.col("bucket") * self.interval_seconds * 1_000_000
            ),
        )
