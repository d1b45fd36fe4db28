"""Target (mean) encoding of categorical columns — the tabular-ML
feature primitive (Micci-Barreca 2001, "A preprocessing scheme for
high-cardinality categorical attributes"): replace a category with a
statistic of the training target over that category, WITHOUT leaking
each row's own label into its feature.

Three leakage policies, all as pure keyed DataFrame algebra (one
category-stats aggregation + one broadcast-friendly join back per
encoded column — never a per-row scan):

* ``mode="global"`` — plain category mean with additive smoothing
  toward the corpus prior: ``(sum_c + s·prior) / (cnt_c + s)``.
  Leaks at training time; the deploy-time transform for frames the
  encoder was NOT fitted on.
* ``mode="loo"`` — leave-one-out: each row sees
  ``(sum_c − y) / (cnt_c − 1)``, the exact mean of every OTHER row
  of its category (singleton categories fall back to the prior).
  Zero extra passes: the same stats join, the row's own ``y``
  subtracted in the projection.
* ``mode="kfold"`` — out-of-fold: a deterministic hash fold
  (md5 of the id column — reproducible across runs and engines, the
  ``HashSplitter`` device) splits rows into ``folds`` buckets;
  per-(category, fold) partial sums let each row read
  ``(sum_c − sum_fold) / (cnt_c − cnt_fold)`` — the category mean of
  the OTHER folds, the standard CV-safe encoding.

Exactness: with an integral target the numerator/denominator pair is
exact BIGINT arithmetic; ``emit_fractions=True`` adds
``<col>__te_num`` / ``<col>__te_den`` so cross-engine gates hash the
encoding as integers (the ``q_target_encode`` contract) instead of
engine-rounded doubles. Scale shape: the stats table is
O(categories) (× folds), broadcast when small, hash-joined when not;
nothing in the hot path is wider than one shuffle on the category
key. No reference counterpart (training-data feature extension; the
reference's nearest neighbor is ConditionalPopularityProcessor,
``replay/preprocessing/history_based_fp.py``, which computes
per-(user-feature, item) popularity, not leakage-safe target
statistics).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["TargetEncoder"]


class TargetEncoder:
    def __init__(
        self,
        categorical_columns: Sequence[str],
        target_column: str = "y",
        mode: str = "loo",
        smoothing: float = 0.0,
        folds: int = 5,
        id_column: Optional[str] = None,
        salt: str = "te",
        emit_fractions: bool = False,
    ):
        if mode not in ("global", "loo", "kfold"):
            raise ValueError(f"unknown mode: {mode!r}")
        if smoothing < 0:
            raise ValueError("smoothing must be >= 0")
        if mode == "kfold":
            if folds < 2:
                raise ValueError("kfold needs folds >= 2")
            if id_column is None:
                raise ValueError("kfold needs id_column for the hash fold")
        if mode != "global" and smoothing:
            raise ValueError(
                "smoothing applies to mode='global' only; loo/kfold "
                "are exact exclusions"
            )
        self.categorical_columns = list(categorical_columns)
        self.target_column = target_column
        self.mode = mode
        self.smoothing = float(smoothing)
        self.folds = int(folds)
        self.id_column = id_column
        self.salt = salt
        self.emit_fractions = emit_fractions

    def _fold(self):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(self.salt),
                        F.col(self.id_column).cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(self.folds))

    def transform(self, df: DataFrame) -> DataFrame:
        """Adds ``<col>__te`` (double) per categorical column — and
        ``<col>__te_num`` / ``<col>__te_den`` (exact BIGINTs) when
        ``emit_fractions`` — using ``df`` itself as the fit frame
        (the leakage policies are about THIS frame's labels)."""
        y = F.col(self.target_column)
        out = df
        prior_row = df.agg(
            F.sum(y).alias("_s"), F.count(y).alias("_n")
        ).collect()[0]
        prior_num = prior_row["_s"] or 0
        prior_den = prior_row["_n"] or 0
        if prior_den == 0:
            raise ValueError("no non-null targets to encode against")
        if self.mode == "kfold":
            out = out.withColumn("_te_fold", self._fold())
        for c in self.categorical_columns:
            if self.mode == "global":
                stats = df.groupBy(c).agg(
                    F.sum(y).alias("_cs"), F.count(y).alias("_cn")
                )
                out = out.join(stats, on=c, how="left")
                prior = F.lit(prior_num) / F.lit(prior_den)
                num = F.col("_cs") + F.lit(self.smoothing) * prior
                den = F.col("_cn") + F.lit(self.smoothing)
                num_i, den_i = F.col("_cs"), F.col("_cn")
            elif self.mode == "loo":
                stats = df.groupBy(c).agg(
                    F.sum(y).alias("_cs"), F.count(y).alias("_cn")
                )
                out = out.join(stats, on=c, how="left")
                num_i = F.col("_cs") - F.coalesce(y, F.lit(0))
                den_i = F.col("_cn") - F.when(
                    y.isNotNull(), F.lit(1)
                ).otherwise(F.lit(0))
                num, den = num_i, den_i
            else:  # kfold
                fstats = df.withColumn("_te_fold", self._fold()).groupBy(
                    c, "_te_fold"
                ).agg(F.sum(y).alias("_fs"), F.count(y).alias("_fn"))
                cstats = fstats.groupBy(c).agg(
                    F.sum("_fs").alias("_cs"), F.sum("_fn").alias("_cn")
                )
                out = out.join(
                    fstats, on=[c, "_te_fold"], how="left"
                ).join(cstats, on=c, how="left")
                num_i = F.col("_cs") - F.coalesce(F.col("_fs"), F.lit(0))
                den_i = F.col("_cn") - F.coalesce(F.col("_fn"), F.lit(0))
                num, den = num_i, den_i
            # singleton / fully-excluded categories fall back to the
            # corpus prior (exactly: prior_num / prior_den)
            use_prior = den.isNull() | (den <= 0)
            enc = F.when(use_prior, F.lit(prior_num) / F.lit(prior_den)).otherwise(
                num.cast("double") / den.cast("double")
            )
            out = out.withColumn(f"{c}__te", enc)
            if self.emit_fractions:
                out = out.withColumn(
                    f"{c}__te_num",
                    F.when(use_prior, F.lit(prior_num))
                    .otherwise(num_i)
                    .cast("long"),
                ).withColumn(
                    f"{c}__te_den",
                    F.when(use_prior, F.lit(prior_den))
                    .otherwise(den_i)
                    .cast("long"),
                )
            out = out.drop("_cs", "_cn", "_fs", "_fn")
        return out.drop("_te_fold")
