"""Deterministic negative sampling for implicit-feedback training.

Pairwise/pointwise recommender losses (BPR, sampled softmax, the
two-tower recipe) need, for every observed (query, item) positive,
``k`` items the query has NOT interacted with. The naive approach —
``rand()`` draws plus a retry loop — is non-reproducible across
retries and engines and is driver-hostile. Here every draw is a pure
function of ``(seed, query, item, draw_index)``:

1. the item universe is indexed once by item-id order (ONE
   dimension-sized window — items are bounded, interactions are
   not); in ``weighting="popularity"`` mode the index also carries
   the exact integer cumulative interaction counts;
2. each positive explodes into ``oversample * k`` draw rows; the
   j-th draw hashes to a universe position (uniform: ``hash mod
   n_items``; popularity: ``hash mod total_count`` inverse-CDF'd
   against the cumulative counts — popular items drawn
   proportionally, the word2vec/BPR convention);
3. draws that hit the query's own history are removed with one
   LEFT ANTI join on ``(query, item)``;
4. the first ``k`` survivors per positive (by draw index — still
   deterministic) are kept via a row_number over the per-positive
   partition, which holds at most ``oversample * k`` rows by
   construction (never a data-dependent skew).

A positive whose draws all collide with history keeps fewer than
``k`` negatives (raise ``oversample``); self-collisions are removed
by the same anti join since the positive itself is in the history.

``hash_fn="xxhash64"`` (default, JVM 64-bit) or ``"md5"`` (portable
— what the DuckDB contract gate replays).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["NegativeSampler"]


class NegativeSampler:
    """Emit ``(query, positive item, draw index, negative item)``
    rows — ``k`` deterministic negatives per positive."""

    def __init__(
        self,
        k: int = 5,
        oversample: int = 3,
        query_column: str = "query_id",
        item_column: str = "item_id",
        weighting: str = "uniform",
        seed: int = 0,
        hash_fn: str = "xxhash64",
    ):
        if k < 1:
            raise ValueError("k must be >= 1")
        if oversample < 1:
            raise ValueError("oversample must be >= 1")
        if weighting not in ("uniform", "popularity"):
            raise ValueError("weighting must be 'uniform' or 'popularity'")
        if hash_fn not in ("xxhash64", "md5"):
            raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
        self.k = k
        self.oversample = oversample
        self.query_column = query_column
        self.item_column = item_column
        self.weighting = weighting
        self.seed = seed
        self.hash_fn = hash_fn

    def _draw_hash(self, j: Column) -> Column:
        q, i = F.col(self.query_column), F.col(self.item_column)
        if self.hash_fn == "xxhash64":
            return F.abs(F.xxhash64(F.lit(self.seed), q, i, j))
        key = F.concat_ws(
            ":",
            F.lit(str(self.seed)),
            q.cast("string"),
            i.cast("string"),
            j.cast("string"),
        )
        # 15 hex chars = 60 bits, exact in a signed 64-bit long
        return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast(
            "long"
        )

    def transform(self, interactions: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        qc, ic = self.query_column, self.item_column
        positives = interactions.select(qc, ic).distinct()

        items = positives.groupBy(ic).agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        # dimension-sized window: the item UNIVERSE is bounded
        iw = Window.orderBy(ic)
        items = items.select(
            F.col(ic).alias("_neg_item"),
            (F.row_number().over(iw) - 1).alias("_idx"),
            (F.sum("_cnt").over(iw) - F.col("_cnt")).alias("_cum_lo"),
            F.sum("_cnt").over(iw).alias("_cum_hi"),
        )
        n_items = items.count()
        if n_items == 0:
            raise ValueError("empty interactions")
        total = (
            items.agg(F.max("_cum_hi")).collect()[0][0]
            if self.weighting == "popularity"
            else None
        )

        n_draws = self.k * self.oversample
        draws = positives.select(
            qc,
            ic,
            F.explode(
                F.sequence(F.lit(0), F.lit(n_draws - 1))
            ).alias("_j"),
        )
        h = self._draw_hash(F.col("_j"))
        if self.weighting == "uniform":
            draws = draws.withColumn("_pos", F.pmod(h, F.lit(n_items)))
            cand = draws.join(
                F.broadcast(items.select("_neg_item", "_idx")),
                draws["_pos"] == items["_idx"],
            )
        else:
            draws = draws.withColumn("_u", F.pmod(h, F.lit(int(total))))
            cand = draws.join(
                F.broadcast(items.select("_neg_item", "_cum_lo", "_cum_hi")),
                (draws["_u"] >= items["_cum_lo"])
                & (draws["_u"] < items["_cum_hi"]),
            )
        cand = cand.select(qc, ic, "_j", "_neg_item")

        seen = positives.select(
            F.col(qc), F.col(ic).alias("_neg_item")
        )
        unseen = cand.join(seen, on=[qc, "_neg_item"], how="left_anti")

        # per-positive partitions hold <= oversample * k rows
        pw = Window.partitionBy(qc, ic).orderBy("_j")
        return (
            unseen.withColumn("_r", F.row_number().over(pw))
            .filter(F.col("_r") <= self.k)
            .select(
                qc,
                ic,
                F.col("_j").alias("draw"),
                F.col("_neg_item").alias("neg_" + ic),
            )
        )
