"""Product-analytics operators over event streams: funnels and
cohort retention.

The reference engine stops at recommendation metrics; a production
event table also answers "how many users who did A then did B within
an hour" (funnel) and "what fraction of January signups were still
active k weeks later" (retention). Both are pure keyed
DataFrame algebra here — no sessionization UDFs, no driver loops:

* ``FunnelAnalyzer`` — k ordered steps become k−1 keyed join+agg
  rounds: step i's table is ``events ⋈ reached_{i−1}`` on the user
  key, filtered to ``prev_t < ts <= first_t + window``, aggregated to
  the EARLIEST qualifying time per user. Every join is on the user
  key (shuffle-partitioned once, reused), each round's right side
  shrinks monotonically, and the final counts are one tiny agg per
  step. Strictly-increasing timestamps between steps make the funnel
  unambiguous (re-orderings of the same second don't double-count).
* ``CohortRetention`` — one scan: each user's cohort is their
  first-activity bucket (min over a keyed agg), the activity matrix
  is ``distinct (user, bucket)`` joined back to cohorts, and the
  output is (cohort, offset, n_active) with offset 0 equal to the
  cohort size by construction.

Both emit exact BIGINT counts, so the contract gates hash against
DuckDB replays of the same algebra.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "FunnelAnalyzer",
    "CohortRetention",
    "TransitionMatrix",
    "CalibrationReport",
    "DriftReport",
    "ab_test_summary",
]


class TransitionMatrix:
    """First-order next-event transition counts (the Markov-chain
    view of an event stream): for each user's time-ordered events,
    count (from_state, to_state) adjacent pairs and derive the row
    probability. One keyed window (``lead`` per user ordered by time
    + a unique tiebreaker) and one aggregation — linear per key, the
    same per-entity bound as the sessionizer.

    ``prob_ppm`` is the exact integer parts-per-million share of the
    from-state's outgoing transitions (``count·1e6 div row_total``)
    so the output hashes cross-engine without float division.
    """

    def __init__(
        self,
        user_column: str = "user_id",
        time_column: str = "ts",
        state_column: str = "event_type",
        tiebreak_column: Optional[str] = None,
    ):
        self.user_column = user_column
        self.time_column = time_column
        self.state_column = state_column
        self.tiebreak_column = tiebreak_column

    def transform(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        order = [F.col(self.time_column)]
        if self.tiebreak_column:
            order.append(F.col(self.tiebreak_column))
        w = Window.partitionBy(self.user_column).orderBy(*order)
        pairs = (
            df.select(
                self.user_column,
                self.time_column,
                *([self.tiebreak_column] if self.tiebreak_column else []),
                F.col(self.state_column).alias("from_state"),
            )
            .withColumn(
                "to_state", F.lead("from_state").over(w)
            )
            .filter(F.col("to_state").isNotNull())
        )
        counts = pairs.groupBy("from_state", "to_state").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        totals = counts.groupBy("from_state").agg(
            F.sum("n").alias("_row_total")
        )
        return (
            counts.join(F.broadcast(totals), on="from_state")
            .select(
                "from_state",
                "to_state",
                "n",
                F.expr("CAST(n * 1000000 DIV _row_total AS BIGINT)")
                .alias("prob_ppm"),
            )
        )


def ab_test_summary(
    df: DataFrame,
    variant_column: str,
    metric_column: str,
) -> DataFrame:
    """Per-variant experiment readout in ONE scan: exact BIGINT
    moments (n, sum, sum of squares — integerize the metric
    upstream) plus the derived mean and variance doubles. The Welch
    t-statistic between any two variants follows from the moments
    alone; keeping the statistic OUT of the frame keeps every hashed
    column either exact-integer or a single fixed-order double
    (``stable_round`` guarded), the repo's cross-engine contract.
    """
    v = F.col(metric_column).cast("long")
    from replay_spark.utils.spark_utils import stable_round

    return (
        df.filter(v.isNotNull())
        .groupBy(variant_column)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(v).cast("long").alias("metric_sum"),
            F.sum(v * v).cast("long").alias("metric_sumsq"),
        )
        .select(
            variant_column,
            "n",
            "metric_sum",
            "metric_sumsq",
            stable_round(
                F.col("metric_sum").cast("double") / F.col("n"), 6
            ).alias("mean"),
            stable_round(
                (
                    F.col("n").cast("double")
                    * F.col("metric_sumsq").cast("double")
                    - F.col("metric_sum").cast("double")
                    * F.col("metric_sum").cast("double")
                )
                / (
                    F.col("n").cast("double")
                    * (F.col("n") - F.lit(1)).cast("double")
                ),
                6,
            ).alias("variance"),
        )
    )


class FunnelAnalyzer:
    """Ordered-step conversion funnel within a time window.

    ``steps`` is a list of step predicates — each a SQL boolean
    expression string over the event columns (e.g. ``"event_type =
    'click'"``). A user converts through step i when an event
    matching step i occurs STRICTLY after their step-(i−1) time and
    no later than ``window_seconds`` after their step-1 time (the
    whole funnel must fit in the window, the common product
    definition). Each user converts at their EARLIEST qualifying
    time per step — deterministic regardless of partitioning.

    ``transform`` returns per-user step times (``step_1 .. step_k``
    as microsecond epochs, NULL once the user drops out);
    ``counts`` rolls that up to ``[step, n_users]``.
    """

    def __init__(
        self,
        steps: Sequence[str],
        user_column: str = "user_id",
        time_column: str = "ts",
        window_seconds: Optional[int] = 3600,
    ):
        if len(steps) < 2:
            raise ValueError("a funnel needs at least two steps")
        if window_seconds is not None and window_seconds < 1:
            raise ValueError("window_seconds must be >= 1 or None")
        self.steps = list(steps)
        self.user_column = user_column
        self.time_column = time_column
        self.window_seconds = window_seconds

    def _us(self) -> Column:
        return F.expr(
            f"unix_micros(CAST(`{self.time_column}` AS TIMESTAMP))"
        )

    def transform(self, df: DataFrame) -> DataFrame:
        u = self.user_column
        events = df.select(
            u,
            self._us().alias("_us"),
            *[
                F.expr(s).cast("boolean").alias(f"_m{i}")
                for i, s in enumerate(self.steps)
            ],
        )
        reached = (
            events.filter(F.col("_m0"))
            .groupBy(u)
            .agg(F.min("_us").alias("step_1"))
        )
        for i in range(1, len(self.steps)):
            nxt = events.filter(F.col(f"_m{i}")).select(
                u, F.col("_us").alias("_t")
            )
            cond = F.col("_t") > F.col(f"step_{i}")
            if self.window_seconds is not None:
                cond = cond & (
                    F.col("_t")
                    <= F.col("step_1") + self.window_seconds * 1_000_000
                )
            step_col = f"step_{i + 1}"
            hits = (
                nxt.join(reached, on=u)
                .filter(cond)
                .groupBy(u)
                .agg(F.min("_t").alias(step_col))
                .select(u, step_col)
            )
            reached = reached.join(hits, on=u, how="left")
        return reached

    def counts(self, df: DataFrame) -> DataFrame:
        """``[step (1-based int), n_users]`` — one row per step."""
        per_user = self.transform(df)
        aggs = [
            F.count(F.col(f"step_{i + 1}")).alias(f"_c{i + 1}")
            for i in range(len(self.steps))
        ]
        one = per_user.agg(*aggs)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(i + 1).alias("step"),
                    F.col(f"_c{i + 1}").cast("long").alias("n_users"),
                )
                for i in range(len(self.steps))
            ]
        )
        return one.select(F.explode(pairs).alias("_s")).select(
            "_s.step", "_s.n_users"
        )


class CohortRetention:
    """Cohort × offset retention matrix.

    Users are cohorted by the bucket of their FIRST event
    (``bucket = epoch_us div (bucket_seconds · 1e6)`` — the repo's
    exact-integer time convention); a user is retained at offset k
    when they have ANY event in ``cohort_bucket + k``. Output:
    ``[cohort_bucket, offset, n_active]`` with exact counts (offset
    0 is the cohort size).
    """

    def __init__(
        self,
        user_column: str = "user_id",
        time_column: str = "ts",
        bucket_seconds: int = 7 * 24 * 3600,
        max_offset: Optional[int] = None,
    ):
        if bucket_seconds < 1:
            raise ValueError("bucket_seconds must be >= 1")
        self.user_column = user_column
        self.time_column = time_column
        self.bucket_seconds = bucket_seconds
        self.max_offset = max_offset

    def transform(self, df: DataFrame) -> DataFrame:
        u = self.user_column
        bucket = F.expr(
            f"unix_micros(CAST(`{self.time_column}` AS TIMESTAMP)) div "
            f"{self.bucket_seconds * 1_000_000}"
        ).cast("long")
        activity = df.select(u, bucket.alias("_b")).distinct()
        cohorts = activity.groupBy(u).agg(F.min("_b").alias("_cohort"))
        joined = activity.join(cohorts, on=u).select(
            u,
            "_cohort",
            (F.col("_b") - F.col("_cohort")).alias("offset"),
        )
        if self.max_offset is not None:
            joined = joined.filter(F.col("offset") <= self.max_offset)
        return joined.groupBy(
            F.col("_cohort").alias("cohort_bucket"), "offset"
        ).agg(F.count(F.lit(1)).cast("long").alias("n_active"))


class CalibrationReport:
    """Probability-calibration binning (the reliability-diagram /
    expected-calibration-error input — Guo et al. 2017, "On
    Calibration of Modern Neural Networks"): predictions bucket into
    ``n_bins`` equal-width confidence bins and each bin reports
    exact-integer sufficient statistics — count, positive-label
    count, and the per-row-integerized confidence sum
    (``floor(conf·1e6)`` summed as BIGINT, so the report never
    contains an order-dependent float sum). ECE/MCE and the
    reliability curve derive from the table driver-side or in SQL.

    One map-side-combined aggregation to ≤ ``n_bins`` rows at any
    input size; the ``q_calibration`` gate hashes the bin table
    against DuckDB's replay. Confidences are clamped to [0, 1]
    (conf = 1.0 folds into the top bin); rows with NULL confidence
    or NULL label are excluded from every statistic.
    """

    def __init__(
        self,
        n_bins: int = 10,
        confidence_column: str = "confidence",
        label_column: str = "label",
    ):
        if n_bins < 1:
            raise ValueError("n_bins must be >= 1")
        self.n_bins = n_bins
        self.confidence_column = confidence_column
        self.label_column = label_column

    def report(self, df: DataFrame) -> DataFrame:
        """``[bin, n, n_pos, sum_conf_ppm]`` (bin = 0..n_bins−1).

        Rows with a NULL confidence OR a NULL label are dropped
        (counting NULL labels in ``n`` while ``sum`` skips them in
        ``n_pos`` would silently deflate per-bin accuracy and ECE);
        confidences are clamped to [0, 1] so out-of-contract inputs
        land in the edge bins instead of producing negative /
        overflow bin ids."""
        conf = F.least(
            F.lit(1.0),
            F.greatest(F.lit(0.0), F.col(self.confidence_column)),
        )
        lab = F.col(self.label_column).cast("long")
        b = F.least(
            F.lit(self.n_bins - 1),
            F.floor(conf * F.lit(self.n_bins)).cast("int"),
        )
        return (
            df.filter(
                F.col(self.confidence_column).isNotNull()
                & F.col(self.label_column).isNotNull()
            )
            .select(
                b.alias("bin"),
                lab.alias("_l"),
                F.floor(conf * F.lit(1_000_000))
                .cast("long")
                .alias("_c"),
            )
            .groupBy("bin")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("_l").cast("long").alias("n_pos"),
                F.sum("_c").cast("long").alias("sum_conf_ppm"),
            )
        )

    def ece(self, report: DataFrame) -> float:
        """Expected calibration error from a report table:
        Σ_b (n_b/N)·|acc_b − conf_b| — a driver-side fold over
        ≤ n_bins rows."""
        rows = report.collect()
        total = sum(r["n"] for r in rows)
        if total == 0:
            return 0.0
        out = 0.0
        for r in rows:
            acc = r["n_pos"] / r["n"]
            conf = r["sum_conf_ppm"] / (r["n"] * 1_000_000)
            out += (r["n"] / total) * abs(acc - conf)
        return out


class DriftReport:
    """Population-drift binning between a REFERENCE snapshot and a
    CURRENT snapshot — the PSI / chi-square input that feature-store
    monitoring runs per refresh (pair it with lake time travel:
    ``fit(t.read(version=n)).report(t.read())`` is "did anything
    drift since the model trained?").

    * NUMERIC columns bin by the reference's ``n_bins``-quantile
      edges, computed as EXACT order statistics (rank = exact
      rational ``ceil(j·n/n_bins)`` — the engine-reproducible device
      every sketch here uses); values bin as
      ``Σ_j 1[v ≥ edge_j]`` so the assignment is pure arithmetic on
      a frozen edge list.
    * CATEGORICAL (string) columns bin by the reference's
      ``max_categories`` most frequent values (count desc, value asc
      — deterministic), everything else into an OTHER bucket
      (bin = K), so cardinality is bounded at any scale.
    * NULLs land in bin −1 on both sides — nullity drift is drift.

    ``report`` returns exact BIGINT sufficient statistics
    ``[column, bin, n_ref, n_cur]`` (≤ bins+2 rows per column at any
    input size — ONE map-side-combined aggregation per side, columns
    exploded in the same pass); :meth:`psi` and :meth:`chi2` are
    driver-side folds over that tiny table, mirroring
    :class:`CalibrationReport`'s integer-stats-then-fold shape. No
    reference counterpart (ML-ops extension).
    """

    def __init__(
        self,
        numeric_columns: Sequence[str] = (),
        categorical_columns: Sequence[str] = (),
        n_bins: int = 10,
        max_categories: int = 100,
        exact_edges: bool = True,
        segment_column: Optional[str] = None,
    ):
        """``segment_column`` adds SEGMENTED drift: bin edges and
        category order stay GLOBAL (fitted on the whole reference, so
        segments are comparable on one scale), but counts, the
        report, and the psi/chi2 folds key by (segment, column) —
        "which traffic source drifted?" in the same single-pass
        plan, just a wider group key.

        ``exact_edges=False`` switches the reference-side quantile
        edges to ``approxQuantile`` (relative error 1e-3, ONE pass
        for all edges instead of ~2 per edge) — the 100 TB fit path
        when bit-reproducible edges aren't required; binning,
        reporting, and the psi/chi2 folds are unchanged. The hash
        gate keeps ``True`` (exact rational ranks replay in any
        engine)."""
        if not numeric_columns and not categorical_columns:
            raise ValueError("give at least one column to monitor")
        if n_bins < 2:
            raise ValueError("n_bins must be >= 2")
        if max_categories < 1:
            raise ValueError("max_categories must be >= 1")
        self.numeric_columns = list(numeric_columns)
        self.categorical_columns = list(categorical_columns)
        self.n_bins = n_bins
        self.max_categories = max_categories
        self.exact_edges = exact_edges
        self.segment_column = segment_column
        self.edges_: Optional[dict] = None   # col -> [edge values]
        self.cats_: Optional[dict] = None    # col -> [category values]
        self._ref_counts: Optional[list] = None  # (col, bin, n_ref)

    def _bin_expr(self, col: str) -> Column:
        v = F.col(col)
        if col in self.edges_:
            edges = self.edges_[col]
            assigned = F.aggregate(
                F.array(*[F.lit(float(e)) for e in edges]),
                F.lit(0),
                lambda acc, e: acc
                + F.when(v.cast("double") >= e, F.lit(1)).otherwise(
                    F.lit(0)
                ),
            )
        else:
            cats = self.cats_[col]
            mapping = F.map_from_arrays(
                F.array(*[F.lit(c) for c in cats]),
                F.array(*[F.lit(i) for i in range(len(cats))]),
            )
            assigned = F.coalesce(
                F.element_at(mapping, v.cast("string")), F.lit(len(cats))
            )
        return F.when(v.isNull(), F.lit(-1)).otherwise(assigned)

    def _keys(self) -> list:
        base = ["column", "bin"]
        return (
            ["segment"] + base if self.segment_column is not None else base
        )

    def _binned(self, df: DataFrame) -> DataFrame:
        """One pass for ALL monitored columns: explode a (column,
        bin) struct array, then one map-side-combined count (keyed
        by segment too when configured)."""
        pairs = F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    self._bin_expr(c).cast("int").alias("bin"),
                )
                for c in self.numeric_columns + self.categorical_columns
            ]
        )
        cols = [F.explode(pairs).alias("_p")]
        keys = [F.col("_p.column").alias("column"), F.col("_p.bin").alias("bin")]
        if self.segment_column is not None:
            cols = [
                F.col(self.segment_column).cast("string").alias("segment")
            ] + cols
            keys = [F.col("segment")] + keys
        return (
            df.select(*cols)
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    def fit(self, ref: DataFrame) -> "DriftReport":
        from replay_spark.utils.spark_utils import exact_quantiles

        self.edges_, self.cats_ = {}, {}
        for c in self.numeric_columns:
            probs = [j / self.n_bins for j in range(1, self.n_bins)]
            # NULLs live in their own -1 bin; they must not count
            # toward the quantile ranks (exact_quantiles sorts nulls
            # first, shifting every edge to rank k-m otherwise). The
            # approx path and the DuckDB oracle already exclude them.
            cast = ref.select(F.col(c).cast("double").alias(c)).filter(
                F.col(c).isNotNull()
            )
            if self.exact_edges:
                self.edges_[c] = exact_quantiles(cast, c, probs)
            else:
                self.edges_[c] = cast.stat.approxQuantile(
                    c, probs, 1e-3
                )
        for c in self.categorical_columns:
            rows = (
                ref.filter(F.col(c).isNotNull())
                .groupBy(F.col(c).cast("string").alias("v"))
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.col("n").desc(), F.col("v").asc())
                .limit(self.max_categories)
                .collect()
            )
            self.cats_[c] = [r["v"] for r in rows]
        keys = self._keys()
        self._ref_counts = [
            tuple(r[k] for k in keys) + (r["n"],)
            for r in self._binned(ref).collect()
        ]
        return self

    def report(self, cur: DataFrame) -> DataFrame:
        """``[column, bin, n_ref, n_cur]`` — full outer over the two
        sides' bin tables, zero-filled (a bin present in only one
        side is maximal drift evidence, not a dropped row)."""
        if self._ref_counts is None:
            raise ValueError("DriftReport must be fit before report")
        return self.report_from_counts(
            self._binned(cur).withColumnRenamed("n", "n_cur")
        )

    def report_from_counts(self, cur_counts: DataFrame) -> DataFrame:
        """Assemble the report from PRE-AGGREGATED current-side bin
        counts ``[column, bin, n_cur]`` — the hook the streaming
        monitor uses against its materialized sink."""
        if self._ref_counts is None:
            raise ValueError("DriftReport must be fit before report")
        spark = cur_counts.sparkSession
        keys = self._keys()
        schema = ", ".join(
            [
                f"{k} {'int' if k == 'bin' else 'string'}"
                for k in keys
            ]
            + ["n_ref long"]
        )
        ref_df = spark.createDataFrame(self._ref_counts, schema)
        return ref_df.join(cur_counts, on=keys, how="full_outer").select(
            *keys,
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
        )

    @staticmethod
    def psi(report: DataFrame, epsilon: float = 1e-6) -> dict:
        """Per-column Population Stability Index from a report table:
        Σ_b (p_b − q_b)·ln(p_b/q_b), zero shares clamped to
        ``epsilon`` — a driver fold over ≤ bins+2 rows per column.
        Rule of thumb: <0.1 stable, 0.1-0.25 moderate, >0.25 major."""
        import math
        from collections import defaultdict

        rows = report.collect()
        has_seg = "segment" in report.columns

        def key(r):
            return (r["segment"], r["column"]) if has_seg else r["column"]

        tot_r: dict = defaultdict(int)
        tot_c: dict = defaultdict(int)
        for r in rows:
            tot_r[key(r)] += r["n_ref"]
            tot_c[key(r)] += r["n_cur"]
        out: dict = defaultdict(float)
        for r in rows:
            k = key(r)
            if not tot_r[k] or not tot_c[k]:
                continue
            p = max(r["n_ref"] / tot_r[k], epsilon)
            q = max(r["n_cur"] / tot_c[k], epsilon)
            out[k] += (p - q) * math.log(p / q)
        return dict(out)

    @staticmethod
    def chi2(report: DataFrame) -> dict:
        """Per-column Pearson chi-square statistic of the 2×B
        contingency table (homogeneity test input; compare against
        the chi2 critical value for B−1 dof)."""
        from collections import defaultdict

        rows = report.collect()
        has_seg = "segment" in report.columns

        def key(r):
            return (r["segment"], r["column"]) if has_seg else r["column"]

        tot_r: dict = defaultdict(int)
        tot_c: dict = defaultdict(int)
        for r in rows:
            tot_r[key(r)] += r["n_ref"]
            tot_c[key(r)] += r["n_cur"]
        out: dict = defaultdict(float)
        for r in rows:
            k = key(r)
            n = tot_r[k] + tot_c[k]
            b = r["n_ref"] + r["n_cur"]
            if not b or not tot_r[k] or not tot_c[k]:
                continue
            e_ref = b * tot_r[k] / n
            e_cur = b * tot_c[k] / n
            out[k] += (r["n_ref"] - e_ref) ** 2 / e_ref
            out[k] += (r["n_cur"] - e_cur) ** 2 / e_cur
        return dict(out)
