"""Sampled ranking evaluation — the SASRec/NCF protocol.

Full-catalog ranking metrics (``metrics/metrics.py``) score every
item per user; at catalog sizes where that is too expensive the
standard protocol (Koren's NetflixKDD sampling, the SASRec/NCF
papers' "99 negatives" evaluation) ranks each test positive among a
fixed number of SAMPLED negatives instead. This implementation makes
the sampling a pure function of ``(seed, query, positive, candidate)``
via md5 — deterministic across runs, partitionings, and engines (the
``q_sampled_eval`` gate replays the whole pipeline in DuckDB) — and
keeps every stage a DataFrame shape:

* ``candidates``: per test positive, the ``n_negatives`` unseen items
  with the smallest hash. The item cross join is generate-and-filter
  inside codegen: when the catalog is large, a hash THRESHOLD keeps
  ~``oversample × n_negatives`` survivors per positive before the
  shuffle, so the exchanged relation is |test|·oversample·n_neg rows,
  never |test|·|items| (the same device as HashSampler). Seen pairs
  are removed by one anti-join.
* ``evaluate``: one keyed window over each positive's ≤ n_neg+1
  scored candidates → the positive's rank. Exact integers end to end.
* ``metrics``: HR@k / NDCG@k as a driver fold over the tiny rank
  relation (the CalibrationReport pattern — floats never enter the
  hashed surface).

No reference counterpart (the reference evaluates full-catalog only);
this is the training-pipeline evaluation shape its NN tier assumes.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["SampledRankingEvaluator"]


class SampledRankingEvaluator:
    def __init__(
        self,
        n_negatives: int = 99,
        seed: int = 42,
        query_column: str = "query_id",
        item_column: str = "item_id",
        rating_column: str = "rating",
        oversample: int = 8,
    ):
        if n_negatives < 1:
            raise ValueError("n_negatives must be >= 1")
        if oversample < 2:
            raise ValueError("oversample must be >= 2")
        self.n_negatives = n_negatives
        self.seed = seed
        self.query_column = query_column
        self.item_column = item_column
        self.rating_column = rating_column
        self.oversample = oversample

    def _hash(self, q, pos, cand):
        # 15 hex chars < 2^60 — exact BIGINT, replayable in any
        # engine that has md5 over strings
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{self.seed}:"),
                        q.cast("string"),
                        F.lit(":"),
                        pos.cast("string"),
                        F.lit(":"),
                        cand.cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")

    def candidates(
        self,
        test: DataFrame,
        items: DataFrame,
        seen: Optional[DataFrame] = None,
    ) -> DataFrame:
        """One row per (test positive, candidate): the positive
        itself plus its ``n_negatives`` hash-smallest unseen items.
        ``test`` rows are (query, positive item); ``items`` is the
        candidate catalog (one id column); ``seen`` (query, item)
        pairs are excluded from the negatives."""
        qc, ic = self.query_column, self.item_column
        pos = test.select(
            F.col(qc), F.col(ic).alias("_pos")
        ).distinct()
        cand = items.select(F.col(ic)).distinct()
        n_items = cand.count()
        budget = self.n_negatives * self.oversample
        threshold = (
            (budget * (1 << 60)) // n_items
            if n_items > 4 * budget
            else None
        )
        negs = self._negatives(pos, cand, seen, threshold)
        if threshold is not None:
            # The threshold is sized from the FULL catalog but the
            # seen anti-join runs after it, so a positive whose seen
            # set covers ≳ (1 - 1/oversample) of the catalog can come
            # up short. Lossless by construction: re-run just those
            # positives through the unfiltered path (the short set is
            # empty in the common case, so the fallback cross join
            # generates zero rows).
            kept = negs.groupBy(qc, "_pos").agg(
                F.count(F.lit(1)).alias("_n")
            )
            short = kept.filter(
                F.col("_n") < F.lit(self.n_negatives)
            ).select(qc, "_pos")
            refill = self._negatives(short, cand, seen, None)
            negs = negs.join(
                short, on=[qc, "_pos"], how="left_anti"
            ).unionByName(refill)
        positives = pos.select(qc, "_pos", F.col("_pos").alias(ic))
        return negs.unionByName(positives)

    def _negatives(self, pos, cand, seen, threshold):
        """Hash-smallest ``n_negatives`` unseen items per positive;
        with ``threshold`` set, the cross join is pre-filtered inside
        codegen so the shuffle sees ~oversample·n_neg rows per
        positive instead of the catalog."""
        qc, ic = self.query_column, self.item_column
        paired = pos.crossJoin(cand).withColumn(
            "_h", self._hash(F.col(qc), F.col("_pos"), F.col(ic))
        )
        if threshold is not None:
            paired = paired.filter(F.col("_h") < F.lit(threshold))
        negs = paired.filter(F.col(ic) != F.col("_pos"))
        if seen is not None:
            negs = negs.join(
                seen.select(qc, ic).distinct(), on=[qc, ic], how="left_anti"
            )
        w = Window.partitionBy(qc, "_pos").orderBy(
            F.col("_h").asc(), F.col(ic).asc()
        )
        return (
            negs.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= self.n_negatives)
            .select(qc, "_pos", ic)
        )

    def evaluate(self, scored: DataFrame) -> DataFrame:
        """``[query, _pos, rank]`` — the positive's 1-based rank
        among its scored candidates (score desc, item asc
        tie-break). ``scored`` is the candidates frame plus the
        model's score in ``rating_column`` (e.g. from
        ``predict_pairs``); candidates the model left unscored rank
        LAST (NULL scores sort after every real score)."""
        qc, ic, rc = self.query_column, self.item_column, self.rating_column
        w = Window.partitionBy(qc, "_pos").orderBy(
            F.col(rc).desc_nulls_last(), F.col(ic).asc()
        )
        return (
            scored.withColumn("_rank", F.row_number().over(w))
            .filter(F.col(ic) == F.col("_pos"))
            .select(
                qc,
                F.col("_pos").alias(ic),
                F.col("_rank").cast("int").alias("rank"),
            )
        )

    @staticmethod
    def metrics(ranks: DataFrame, k: int) -> dict:
        """HR@k and (sampled) NDCG@k from the rank relation — a
        driver fold over one tiny aggregated table: HR = share of
        positives at rank ≤ k; NDCG = mean of 1/log2(rank+1) for
        ranks ≤ k (single-relevant-item form)."""
        rows = (
            ranks.groupBy("rank")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        )
        total = sum(r["n"] for r in rows)
        if total == 0:
            return {"hr": 0.0, "ndcg": 0.0, "n": 0}
        hits = sum(r["n"] for r in rows if r["rank"] <= k)
        ndcg = (
            sum(
                r["n"] / math.log2(r["rank"] + 1)
                for r in rows
                if r["rank"] <= k
            )
            / total
        )
        return {"hr": hits / total, "ndcg": ndcg, "n": total}
