"""Trainable byte-pair-encoding tokenizer — DataFrame-native.

The tokenization tier of an LLM data pipeline: learn a BPE merge
table from a corpus, then tokenize documents with it (token arrays /
counts / ids). Classic Sennrich-style word-level BPE:

* ``fit`` aggregates the corpus ONCE into a word-type frequency
  table — bounded by vocabulary growth (Heaps' law), not corpus
  size: 100 TB of text still collapses to ~10^6-10^7 distinct words
  with map-side combine, so everything after the first aggregation
  runs on a small table.
* The merge loop runs on that word-type table. Below
  ``driver_threshold`` word types it collects and runs the standard
  in-memory loop (the same shape HuggingFace trainers use — fast,
  exact). Above it, each merge iteration is pure DataFrame work:
  adjacent symbol pairs via ``arrays_zip`` of shifted slices,
  frequency-weighted pair counts (one small keyed aggregate), argmax
  pair, and an Arrow-batched merge application — O(num_merges) jobs
  over a vocabulary-sized frame, never a corpus rescan. Both paths
  produce identical merges (parity-tested); ties break
  lexicographically so training is deterministic.
* ``transform`` tokenizes documents with the learned ranks inside
  ``mapInPandas`` — greedy lowest-rank merging per word with a
  per-batch word cache (each distinct word is tokenized once per
  batch), merges broadcast via closure.

No reference counterpart (LLM-pipeline extension; the reference's
``TensorSequenceTokenizer`` maps ids, it does not learn subwords).
Training is iterative and therefore rows-only gated
(`q_bpe_tokens`); the merge algebra is pinned by golden tests (the
classic hug/pug corpus) and the driver/distributed parity test.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from replay_spark.preprocessing.text import tokenize_expr

__all__ = ["BPETokenizer"]

_EOW = "</w>"


def _word_symbols(word: str) -> tuple:
    return tuple(word[:-1]) + ((word[-1] + _EOW),) if word else ()


def _merge_word(symbols: tuple, pair: tuple) -> tuple:
    out = []
    i = 0
    while i < len(symbols):
        if (
            i + 1 < len(symbols)
            and symbols[i] == pair[0]
            and symbols[i + 1] == pair[1]
        ):
            out.append(pair[0] + pair[1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


class BPETokenizer:
    """Learn ``num_merges`` BPE merges from a corpus, then tokenize.

    ``fit`` → ``self.merges`` (ordered list of (left, right)).
    ``transform`` adds a ``tokens`` array column; ``vocabulary``
    returns the token → id table (ids dense, sorted lexicographically
    for determinism).
    """

    def __init__(
        self,
        num_merges: int = 200,
        text_column: str = "text",
        lowercase: bool = True,
        min_pair_count: int = 2,
        driver_threshold: int = 1_000_000,
    ):
        if num_merges < 1:
            raise ValueError("num_merges must be >= 1")
        self.num_merges = num_merges
        self.text_column = text_column
        self.lowercase = lowercase
        self.min_pair_count = min_pair_count
        self.driver_threshold = driver_threshold
        self.merges: Optional[list] = None

    # -- training ------------------------------------------------------------

    def _word_freqs(self, df: DataFrame) -> DataFrame:
        text = F.col(self.text_column)
        if self.lowercase:
            text = F.lower(text)
        return (
            df.select(F.explode(tokenize_expr(text)).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq"))
        )

    def fit(self, df: DataFrame) -> "BPETokenizer":
        wf = self._word_freqs(df).persist()
        try:
            n_types = wf.count()
            if n_types <= self.driver_threshold:
                rows = wf.collect()
                self.merges = self._fit_driver(
                    {r["word"]: r["freq"] for r in rows}
                )
            else:
                self.merges = self._fit_distributed(wf)
        finally:
            wf.unpersist()
        return self

    def _fit_driver(self, word_freqs: dict) -> list:
        """Standard in-memory BPE over the word-type dict."""
        symbols = {w: _word_symbols(w) for w in word_freqs}
        merges: list = []
        for _ in range(self.num_merges):
            counts: dict = {}
            for w, freq in word_freqs.items():
                syms = symbols[w]
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + freq
            if not counts:
                break
            # deterministic: max count, then lexicographically smallest
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            if best[1] < self.min_pair_count:
                break
            pair = best[0]
            merges.append(pair)
            for w in symbols:
                if pair[0] in symbols[w]:
                    symbols[w] = _merge_word(symbols[w], pair)
        return merges

    def _fit_distributed(self, wf: DataFrame) -> list:
        """One DataFrame aggregate + one Arrow-batched rewrite per
        merge, all over the (bounded) word-type table."""
        import pandas as pd

        spark = wf.sparkSession
        words = wf.select(
            F.transform(
                F.split(F.col("word"), ""),
                lambda c, i: F.when(
                    i == F.length("word") - 1, F.concat(c, F.lit(_EOW))
                ).otherwise(c),
            ).alias("syms"),
            "freq",
        ).persist()
        merges: list = []
        for _ in range(self.num_merges):
            pairs = words.select(
                F.explode(
                    F.arrays_zip(
                        F.slice(
                            "syms", 1, F.greatest(F.size("syms") - 1, F.lit(0))
                        ).alias("a"),
                        F.slice(
                            "syms", 2, F.greatest(F.size("syms") - 1, F.lit(0))
                        ).alias("b"),
                    )
                ).alias("p"),
                "freq",
            ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "freq")
            top = (
                pairs.groupBy("a", "b")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < self.min_pair_count:
                break
            pair = (top[0]["a"], top[0]["b"])
            merges.append(pair)

            def apply_merge(batches, pair=pair):
                for pdf in batches:
                    pdf["syms"] = [
                        list(_merge_word(tuple(s), pair)) for s in pdf["syms"]
                    ]
                    yield pdf

            new_words = words.mapInPandas(
                apply_merge, schema="syms array<string>, freq long"
            ).persist()
            new_words.count()  # materialize before dropping the old cache
            words.unpersist()
            words = new_words
        words.unpersist()
        return merges

    # -- inference -----------------------------------------------------------

    def _encode_word(self, word: str, ranks: dict) -> list:
        syms = list(_word_symbols(word))
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    def transform(
        self, df: DataFrame, output_column: str = "tokens"
    ) -> DataFrame:
        """Append ``output_column``: the BPE token array per row."""
        if self.merges is None:
            raise ValueError("BPETokenizer must be fit before transform")
        ranks = {pair: i for i, pair in enumerate(self.merges)}
        text_column, lowercase = self.text_column, self.lowercase
        encode_word = self._encode_word
        out_schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
        ) + f", `{output_column}` array<string>"

        def process(batches: Iterator) -> Iterator:
            cache: dict = {}
            for pdf in batches:
                toks = []
                for text in pdf[text_column]:
                    words = (
                        (text or "").lower() if lowercase else (text or "")
                    ).split()
                    doc = []
                    for w in words:
                        hit = cache.get(w)
                        if hit is None:
                            hit = encode_word(w, ranks)
                            cache[w] = hit
                        doc.extend(hit)
                    toks.append(doc)
                pdf[output_column] = toks
                yield pdf

        return df.mapInPandas(process, schema=out_schema)

    def vocabulary(self, df: DataFrame) -> DataFrame:
        """(token, token_id) over the corpus' realized BPE tokens —
        dense ids, lexicographic, deterministic. Numbered with the
        two-phase range-partition utility, so even a pathological
        vocabulary never takes a one-task global sort."""
        from replay_spark.utils.spark_utils import ordered_row_numbers

        distinct = self.transform(df).select(
            F.explode("tokens").alias("token")
        ).distinct()
        numbered = ordered_row_numbers(
            distinct, [F.col("token").asc()], out_col="token_id"
        )
        return numbered.withColumn(
            "token_id", F.col("token_id") - 1
        ).select("token", "token_id")
