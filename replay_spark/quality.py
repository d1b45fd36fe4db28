"""Declarative data-quality verification (the Deequ/expectations
shape): a :class:`ConstraintSuite` collects named constraints and
verifies ALL of them against a DataFrame in one pass.

Scale contract: every row-local constraint (completeness, uniqueness,
bounds, set membership, regex, predicate fractions, size) compiles to
a conditional aggregate inside ONE ``df.agg(...)`` — a 100-constraint
suite over 100 TB is still a single map-side-combined scan.
Referential-integrity constraints need a second table and each add
one broadcast-anti-join job over the (tiny) distinct key set; their
1-row results are cross-joined onto the main aggregate so the suite
still returns one DataFrame.

Every observed metric is an exact ``BIGINT`` numerator/denominator
pair (never a float) so results hash-compare across engines;
fraction assertions compare in integer parts-per-million.

Complements ``utils.spark_utils.profile_columns`` (the unsupervised
first look) — this is the supervised gate a pipeline runs per batch.
Reference parity: the reference validates inputs ad hoc inside each
operator (e.g. filters raise on missing/ill-typed columns); here
validation is a first-class composable operator.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ConstraintSuite", "MetricRepository", "StreamingQualityMonitor"]


class ConstraintSuite:
    """Builder of named constraints; ``run(df)`` verifies them all.

    >>> suite = (ConstraintSuite()
    ...          .is_complete("user_id")
    ...          .is_unique("order_id")
    ...          .is_non_negative("price")
    ...          .is_contained_in("status", ["O", "F", "P"])
    ...          .satisfies("price < 1000", "cheap_mostly",
    ...                     min_fraction_ppm=900_000))
    >>> report = suite.run(df)   # one scan, one row per constraint

    Output schema: ``constraint string, column string, metric_num
    bigint, metric_den bigint, passed boolean``. ``metric_num /
    metric_den`` is the observed ratio (violations or satisfying
    rows, per constraint docstring); integer so it hashes stably.
    """

    def __init__(self) -> None:
        # (name, column_label, num_expr, den_expr, passed_fn) where
        # the exprs are aggregate Columns and passed_fn maps the two
        # resolved BIGINT columns to a boolean Column.
        self._local: List[Tuple[str, str, Column, Column, object]] = []
        # (name, column_label, df, keys) for referential checks
        self._refs: List[Tuple[str, str, DataFrame, str, str]] = []

    # -- row-local constraints (all fuse into one agg) -------------------

    def _add(self, name, col_label, num, den, passed_fn) -> "ConstraintSuite":
        if any(n == name for n, *_ in self._local) or any(
            n == name for n, *_ in self._refs
        ):
            raise ValueError(f"duplicate constraint name {name!r}")
        self._local.append((name, col_label, num, den, passed_fn))
        return self

    def is_complete(self, column: str,
                    name: Optional[str] = None) -> "ConstraintSuite":
        """No nulls: num = null count, den = rows, passes at num=0."""
        return self._add(
            name or f"complete({column})", column,
            F.sum(F.col(column).isNull().cast("long")),
            F.count(F.lit(1)),
            lambda n, d: n == 0,
        )

    def is_unique(self, column: str,
                  name: Optional[str] = None) -> "ConstraintSuite":
        """All non-null values distinct: num = distinct count,
        den = non-null rows, passes at num=den."""
        return self._add(
            name or f"unique({column})", column,
            F.countDistinct(F.col(column)),
            F.count(F.col(column)),
            lambda n, d: n == d,
        )

    def is_non_negative(self, column: str,
                        name: Optional[str] = None) -> "ConstraintSuite":
        """num = rows with value < 0, passes at num=0."""
        return self._add(
            name or f"non_negative({column})", column,
            F.sum((F.col(column) < 0).cast("long")),
            F.count(F.lit(1)),
            lambda n, d: n == 0,
        )

    def has_min(self, column: str, lower, *,
                name: Optional[str] = None) -> "ConstraintSuite":
        """num = rows below ``lower``, passes at num=0."""
        return self._add(
            name or f"min({column})", column,
            F.sum((F.col(column) < F.lit(lower)).cast("long")),
            F.count(F.lit(1)),
            lambda n, d: n == 0,
        )

    def has_max(self, column: str, upper, *,
                name: Optional[str] = None) -> "ConstraintSuite":
        """num = rows above ``upper``, passes at num=0."""
        return self._add(
            name or f"max({column})", column,
            F.sum((F.col(column) > F.lit(upper)).cast("long")),
            F.count(F.lit(1)),
            lambda n, d: n == 0,
        )

    def is_contained_in(self, column: str, allowed: Sequence,
                        name: Optional[str] = None) -> "ConstraintSuite":
        """num = non-null rows outside ``allowed``, passes at num=0."""
        return self._add(
            name or f"contained({column})", column,
            F.sum((~F.col(column).isin(list(allowed))
                   & F.col(column).isNotNull()).cast("long")),
            F.count(F.lit(1)),
            lambda n, d: n == 0,
        )

    def matches_pattern(self, column: str, pattern: str,
                        name: Optional[str] = None) -> "ConstraintSuite":
        """num = non-null rows NOT rlike ``pattern``, passes at 0."""
        return self._add(
            name or f"pattern({column})", column,
            F.sum((~F.col(column).rlike(pattern)
                   & F.col(column).isNotNull()).cast("long")),
            F.count(F.lit(1)),
            lambda n, d: n == 0,
        )

    def satisfies(self, predicate_sql: str, name: str, *,
                  min_fraction_ppm: int = 1_000_000) -> "ConstraintSuite":
        """num = rows satisfying the SQL predicate, den = rows;
        passes when num/den >= min_fraction_ppm/1e6 — compared as
        ``num * 1_000_000 >= den * min_fraction_ppm`` so no floats
        are involved."""
        ppm = int(min_fraction_ppm)
        return self._add(
            name, predicate_sql,
            F.sum(F.coalesce(F.expr(predicate_sql).cast("boolean"),
                             F.lit(False)).cast("long")),
            F.count(F.lit(1)),
            lambda n, d: (n * 1_000_000) >= (d * ppm),
        )

    def has_size(self, min_rows: int = 0,
                 max_rows: Optional[int] = None, *,
                 name: str = "size") -> "ConstraintSuite":
        """num = row count, den = row count; passes inside bounds."""
        hi = max_rows

        def ok(n, d):
            cond = n >= min_rows
            if hi is not None:
                cond = cond & (n <= hi)
            return cond

        return self._add(name, "*", F.count(F.lit(1)),
                         F.count(F.lit(1)), ok)

    # -- cross-table constraint (adds one broadcast anti-join) -----------

    def is_referenced_in(self, column: str, dim: DataFrame,
                         dim_column: str,
                         name: Optional[str] = None) -> "ConstraintSuite":
        """Referential integrity: every non-null value of ``column``
        exists in ``dim[dim_column]``. num = orphan rows, den = rows,
        passes at num=0. The dim side is reduced to its distinct keys
        and broadcast — at 100 TB the fact table is scanned once and
        never shuffled."""
        cname = name or f"referenced({column})"
        if any(n == cname for n, *_ in self._local) or any(
            n == cname for n, *_ in self._refs
        ):
            raise ValueError(f"duplicate constraint name {cname!r}")
        self._refs.append((cname, column, dim, dim_column, column))
        return self

    # -- verification -----------------------------------------------------

    def run(self, df: DataFrame) -> DataFrame:
        """Verify every constraint; returns one row per constraint:
        ``(constraint, column, metric_num, metric_den, passed)``."""
        if not self._local and not self._refs:
            raise ValueError("empty constraint suite")
        aggs, structs = [], []
        for i, (name, col_label, num, den, passed_fn) in enumerate(
            self._local
        ):
            aggs.append(F.coalesce(num.cast("long"),
                                   F.lit(0)).alias(f"_n{i}"))
            aggs.append(den.cast("long").alias(f"_d{i}"))
        one = df.agg(*aggs) if aggs else None

        for j, (name, col_label, dim, dim_col, fact_col) in enumerate(
            self._refs
        ):
            keys = dim.select(F.col(dim_col).alias("__k")).distinct()
            orphans = (
                df.select(F.col(fact_col).alias("__v"))
                .filter(F.col("__v").isNotNull())
                .join(F.broadcast(keys), F.col("__v") == F.col("__k"),
                      "left_anti")
            )
            r = df.agg(F.count(F.lit(1)).cast("long").alias(f"_rd{j}"))
            o = orphans.agg(
                F.count(F.lit(1)).cast("long").alias(f"_rn{j}")
            )
            piece = r.crossJoin(o)
            one = piece if one is None else one.crossJoin(piece)

        for i, (name, col_label, _num, _den, passed_fn) in enumerate(
            self._local
        ):
            n, d = F.col(f"_n{i}"), F.col(f"_d{i}")
            structs.append(F.struct(
                F.lit(name).alias("constraint"),
                F.lit(col_label).alias("column"),
                n.alias("metric_num"),
                d.alias("metric_den"),
                passed_fn(n, d).alias("passed"),
            ))
        for j, (name, col_label, *_rest) in enumerate(self._refs):
            n, d = F.col(f"_rn{j}"), F.col(f"_rd{j}")
            structs.append(F.struct(
                F.lit(name).alias("constraint"),
                F.lit(col_label).alias("column"),
                n.alias("metric_num"),
                d.alias("metric_den"),
                (n == 0).alias("passed"),
            ))
        return one.select(F.explode(F.array(*structs)).alias("_c")).select(
            "_c.constraint", "_c.column", "_c.metric_num",
            "_c.metric_den", "_c.passed"
        )

    def assert_passed(self, df: DataFrame) -> None:
        """Run and raise ``ValueError`` listing every failed
        constraint (collects only the tiny report)."""
        failed = [
            f"{r.constraint}: {r.metric_num}/{r.metric_den}"
            for r in self.run(df).filter(~F.col("passed")).collect()
        ]
        if failed:
            raise ValueError("constraints failed: " + "; ".join(failed))


class MetricRepository:
    """Deequ-style metric repository + anomaly detection: persist
    every verification run's constraint metrics in a
    :class:`replay_spark.lake.LakeTable` (time travel, CDF and tags
    apply to the quality history itself), then check a NEW report
    against the trailing window before accepting a batch — the
    "yesterday's completeness was 0.99, today's is 0.2, block the
    pipeline" device (Schelter et al., VLDB 2018, re-expressed for
    this log).

    Strategies (per (constraint, column), metric = num/den):

    * ``"stddev"`` — anomalous when |x − mean(history)| > k·std
      (Deequ's OnlineNormal shape; k = ``threshold``, std of the
      trailing ``window`` runs, never flags with < 2 history runs);
    * ``"relative"`` — rate of change vs the LAST run outside
      [1/(1+threshold), 1+threshold] (RelativeRateOfChange);
    * ``"absolute"`` — |x − last| > threshold (AbsoluteChange).

    History is bounded (runs × constraints rows); the fold is a
    driver pass over that tiny table, the data-sized work happened
    inside ``ConstraintSuite.run``'s one scan."""

    def __init__(self, spark, path: str):
        from replay_spark.lake import LakeTable

        self.spark = spark
        self.table = LakeTable(spark, path)

    def _stamp(
        self, report: DataFrame, run_key: str, run_ts: int
    ) -> DataFrame:
        return report.select(
            F.lit(run_key).alias("run_key"),
            F.lit(int(run_ts)).cast("long").alias("run_ts"),
            "constraint",
            "column",
            F.col("metric_num").cast("long"),
            F.col("metric_den").cast("long"),
            "passed",
        )

    def record(
        self, report: DataFrame, run_key: str, run_ts: int
    ) -> int:
        """Append one verification run. ``run_ts`` is the caller's
        clock (unix seconds or any monotonic int — kept explicit so
        history replays deterministically)."""
        return self.table.append(self._stamp(report, run_key, run_ts))

    def record_batch(
        self, report: DataFrame, batch_id: int,
        app_id: Optional[str] = None,
    ) -> int:
        """Exactly-once record for streaming micro-batches: the lake
        txn marker (``app_id``, ``batch_id``) makes a replayed
        ``foreachBatch`` call a no-op instead of appending duplicate
        history rows — duplicates would consume anomaly-window slots
        and collapse the stddev band toward zero."""
        return self.table.append_batch(
            self._stamp(report, f"batch-{batch_id}", int(batch_id)),
            app_id=app_id or ("quality-monitor@" + self.table.path),
            batch_id=int(batch_id),
        )

    def history(self) -> DataFrame:
        return self.table.read()

    def anomaly_check(
        self,
        report: DataFrame,
        strategy: str = "stddev",
        threshold: float = 3.0,
        window: int = 10,
    ) -> DataFrame:
        """One row per (constraint, column) of ``report``:
        ``metric`` (num/den of the new run), ``expected_lo``/
        ``expected_hi`` (the strategy's admissible band from
        history), ``n_history``, ``is_anomaly``. Constraints with no
        usable history are never anomalous (n_history reflects it)."""
        if strategy not in ("stddev", "relative", "absolute"):
            raise ValueError(f"unknown strategy {strategy!r}")
        if self.table.latest_version() < 0:
            hist = []  # empty repository: nothing is anomalous yet
        else:
            hist = [
                r.asDict()
                for r in self.history()
                .orderBy(F.col("run_ts").desc())
                .collect()
            ]
        by_key: dict = {}
        for r in hist:
            key = (r["constraint"], r["column"])
            if len(by_key.setdefault(key, [])) < window:
                den = r["metric_den"] or 0
                by_key[key].append(
                    (r["metric_num"] / den) if den else 0.0
                )
        rows = []
        for r in report.collect():
            key = (r["constraint"], r["column"])
            den = r["metric_den"] or 0
            x = (r["metric_num"] / den) if den else 0.0
            past = by_key.get(key, [])
            lo = hi = None
            anomalous = False
            if strategy == "stddev" and len(past) >= 2:
                m = sum(past) / len(past)
                var = sum((p - m) ** 2 for p in past) / len(past)
                band = threshold * (var ** 0.5)
                lo, hi = m - band, m + band
                anomalous = not (lo <= x <= hi)
            elif strategy == "relative" and past:
                last = past[0]
                if last > 0:
                    lo, hi = last / (1 + threshold), last * (1 + threshold)
                    anomalous = not (lo <= x <= hi)
                else:
                    lo = hi = 0.0
                    anomalous = x > 0
            elif strategy == "absolute" and past:
                last = past[0]
                lo, hi = last - threshold, last + threshold
                anomalous = not (lo <= x <= hi)
            rows.append(
                (
                    r["constraint"],
                    r["column"],
                    float(x),
                    lo,
                    hi,
                    len(past),
                    bool(anomalous),
                )
            )
        return self.spark.createDataFrame(
            rows,
            "constraint string, column string, metric double, "
            "expected_lo double, expected_hi double, "
            "n_history int, is_anomaly boolean",
        )

    def record_if_normal(
        self,
        report: DataFrame,
        run_key: str,
        run_ts: int,
        strategy: str = "stddev",
        threshold: float = 3.0,
        window: int = 10,
    ) -> int:
        """Gatekeeper compose: anomaly-check the report against
        history and RAISE (recording nothing) when any constraint is
        anomalous; otherwise record and return the version."""
        bad = [
            f"{r.constraint}({r.column}): {r.metric:.4f} outside "
            f"[{r.expected_lo}, {r.expected_hi}]"
            for r in self.anomaly_check(
                report, strategy, threshold, window
            ).collect()
            if r.is_anomaly
        ]
        if bad:
            raise ValueError("metric anomalies: " + "; ".join(bad))
        return self.record(report, run_key, run_ts)


class StreamingQualityMonitor:
    """Continuous data quality on a stream: a ``foreachBatch``
    adapter that runs a :class:`ConstraintSuite` over every
    micro-batch, records its metrics in a :class:`MetricRepository`
    EXACTLY ONCE (the lake txn marker keyed by batch id makes a
    replayed micro-batch — failure recovery — a no-op instead of a
    duplicate history row set that would collapse the stddev band),
    and appends flagged rows to an ``<path>_anomalies`` lake table
    when a strategy is set — the streaming half of the Deequ shape:
    drift in completeness/uniqueness/bounds surfaces within one
    micro-batch, with the full history queryable (and
    time-travelable) as a table.

    State is bounded: per batch the data-sized work is the suite's
    ONE scan; everything recorded is constraints × batches rows.
    """

    def __init__(
        self,
        repository: MetricRepository,
        suite: ConstraintSuite,
        strategy: Optional[str] = "relative",
        threshold: float = 1.0,
        window: int = 20,
    ):
        self.repository = repository
        self.suite = suite
        self.strategy = strategy
        self.threshold = threshold
        self.window = window
        from replay_spark.lake import LakeTable

        self.anomalies = LakeTable(
            repository.spark, repository.table.path + "_anomalies"
        )

    def sink(self):
        """``writeStream.foreachBatch(monitor.sink()).start()``."""

        def _sink(batch_df, batch_id: int) -> None:
            self.process_batch(batch_df, int(batch_id))

        return _sink

    def process_batch(self, batch_df, batch_id: int) -> None:
        report = self.suite.run(batch_df)
        if self.strategy is not None:
            chk = self.repository.anomaly_check(
                report,
                strategy=self.strategy,
                threshold=self.threshold,
                window=self.window,
            )
            flagged = chk.filter(F.col("is_anomaly")).withColumn(
                "batch_id", F.lit(int(batch_id)).cast("long")
            )
            if flagged.limit(1).count() > 0:
                # txn-marked: a replayed batch never double-appends
                self.anomalies.append_batch(
                    flagged,
                    app_id="quality-anomalies@" + self.anomalies.path,
                    batch_id=int(batch_id),
                )
        self.repository.record_batch(report, int(batch_id))
