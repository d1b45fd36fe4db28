"""Deterministic document embeddings via feature hashing — the
text-side producer for the ANN tier.

Every similarity operator in this engine (BruteForce/IVF/PQ/LSH ANN,
EmbeddingDeduplicator, SemanticDeduplicator, KMeans/PCA) consumes an
``array<double>`` column; a real pipeline needs a way to MAKE that
column from text without a model server. :class:`DocumentEmbedder`
is the classical answer — the hashing trick (Weinberger et al. 2009,
"Feature Hashing for Large Scale Multitask Learning") over TF-IDF
weights:

* tokens hash into ``dim`` buckets (no vocabulary, no driver state —
  the property that makes it work at 100 TB: an UNBOUNDED vocabulary
  maps to a FIXED-width vector with zero coordination);
* weights are ``tf * idf`` with smooth idf ``ln((N+1)/(df+1)) + 1``
  (df counted at bucket level, standard under hashing), L2-normalized
  so downstream cosine == dot product.

Plan shape: tokenize → explode → one (doc, bucket) count aggregate →
broadcast idf literal (``dim`` doubles — fit state is O(dim), never
O(vocabulary)) → per-doc dense assembly with ``map_from_entries`` +
an ordered ``transform(sequence(...))`` fill — all JVM higher-order
expressions, zero Python in the hot path. ``fit`` is ONE distinct
aggregate over (doc, bucket) pairs producing ≤ ``dim`` rows.

``hash_family="md5"`` makes the whole pipeline engine-portable (the
DuckDB-replayable gate path, same device as the dedup family);
production default is ``xxhash64`` (JVM-native, faster).
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["DocumentEmbedder"]


class DocumentEmbedder:
    """Hashed TF-IDF embeddings: ``fit`` learns per-bucket document
    frequencies (≤ dim values), ``transform`` appends
    ``output_column`` (array<double>, length ``dim``,
    L2-normalized)."""

    def __init__(
        self,
        dim: int = 64,
        id_column: str = "doc_id",
        text_column: str = "text",
        output_column: str = "embedding",
        hash_family: str = "xxhash64",
        use_idf: bool = True,
        normalize: bool = True,
    ):
        if dim < 1:
            raise ValueError("dim must be >= 1")
        if hash_family not in ("xxhash64", "md5"):
            raise ValueError("hash_family must be 'xxhash64' or 'md5'")
        self.dim = dim
        self.id_column = id_column
        self.text_column = text_column
        self.output_column = output_column
        self.hash_family = hash_family
        self.use_idf = use_idf
        self.normalize = normalize
        self.bucket_df: Optional[list] = None  # df per bucket
        self.n_docs: Optional[int] = None

    def _bucket(self) -> Column:
        if self.hash_family == "xxhash64":
            h = F.xxhash64("token")
        else:
            h = F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast(
                "long"
            )
        return F.pmod(h, F.lit(self.dim)).cast("int")

    def _tokens(self, df: DataFrame) -> DataFrame:
        toks = F.split(
            F.trim(F.lower(F.col(self.text_column))), r"[^a-z0-9']+"
        )
        return (
            df.select(
                self.id_column,
                F.explode(toks).alias("token"),
            )
            .filter(F.col("token") != "")
            .withColumn("bucket", self._bucket())
        )

    def fit(self, df: DataFrame) -> "DocumentEmbedder":
        """One aggregate: documents per bucket (≤ dim rows) + corpus
        size. The model is O(dim) doubles — broadcastable by
        construction."""
        rows = (
            self._tokens(df)
            .select(self.id_column, "bucket")
            .distinct()
            .groupBy("bucket")
            .agg(F.count("*").alias("df"))
            .collect()
        )
        self.n_docs = df.count()
        dfs = [0] * self.dim
        for r in rows:
            dfs[r["bucket"]] = int(r["df"])
        self.bucket_df = dfs
        return self

    def _idf(self, bucket_df: int) -> float:
        return math.log((self.n_docs + 1) / (bucket_df + 1)) + 1.0

    def transform(self, df: DataFrame) -> DataFrame:
        if self.use_idf and self.bucket_df is None:
            raise ValueError("fit() first (or set use_idf=False)")
        counts = (
            self._tokens(df)
            .groupBy(self.id_column, "bucket")
            .agg(F.count("*").alias("tf"))
        )
        if self.use_idf:
            idf_lit = F.array(
                *[F.lit(self._idf(d)) for d in self.bucket_df]
            )
            weight = F.col("tf").cast("double") * F.element_at(
                idf_lit, F.col("bucket") + 1
            )
        else:
            weight = F.col("tf").cast("double")
        entries = counts.select(
            self.id_column,
            F.struct(
                F.col("bucket").alias("key"), weight.alias("value")
            ).alias("e"),
        )
        assembled = entries.groupBy(self.id_column).agg(
            F.map_from_entries(F.collect_list("e")).alias("_m")
        )
        arr = F.transform(
            F.sequence(F.lit(0), F.lit(self.dim - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("_m"), i.cast("int")), F.lit(0.0)
            ),
        )
        out = assembled.withColumn("_arr", arr).drop("_m")
        if self.normalize:
            norm = F.sqrt(
                F.aggregate(
                    F.col("_arr"),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            )
            vec = F.when(
                norm > 0,
                F.transform(F.col("_arr"), lambda x: x / norm),
            ).otherwise(F.col("_arr"))
        else:
            vec = F.col("_arr")
        result = out.select(
            self.id_column, vec.alias(self.output_column)
        )
        # documents with zero tokens embed as the zero vector
        missing = df.select(self.id_column).join(
            result.select(self.id_column), self.id_column, "left_anti"
        )
        zero = F.array(*[F.lit(0.0)] * self.dim)
        result = result.unionByName(
            missing.withColumn(self.output_column, zero)
        )
        return df.join(result, on=self.id_column, how="left")
