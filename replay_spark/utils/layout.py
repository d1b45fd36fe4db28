"""Physical data-layout optimization: Z-order (Morton) clustering.

The ``OPTIMIZE ... ZORDER BY`` primitive: interleave the bits of
per-column integer ranks so rows that are close in N-dimensional
space land in the same output file — multi-column min/max statistics
then prune scans on ANY prefix/subset of the layout columns, not
just the leading sort key. At 100 TB this is the difference between
reading every file and reading a few percent for selective
multi-dimensional predicates.

Everything is expression-level integer arithmetic:

* ranks — ONE aggregate pass collects each column's (min, max); a
  column maps to a ``bits``-wide rank with exact BIGINT math
  ``(v - min) * (2^bits - 1) div (max - min)`` (no floats, so any
  engine reproduces the key bit-for-bit);
* zkey — a static shift/or expression tree interleaving the rank
  bits (column j contributes bit b at position ``b * k + j``) —
  whole-stage-codegen friendly, no UDFs, no shuffle;
* layout — ``repartitionByRange`` on the zkey: one range shuffle
  (sampled boundaries) that directs each Morton bucket to one
  partition; downstream ``write.parquet`` emits files whose
  per-column min/max ranges are tight.

Doubles are supported by scaling through the same integer grid after
an exact ``(v - min) / (max - min)`` normalization; deterministic
within an engine, so the contract gate pins integer columns only.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ZOrderLayout", "compact_parquet"]


def compact_parquet(
    spark,
    input_path: str,
    output_path: str,
    target_file_mb: int = 512,
    zorder_by: Optional[Sequence[str]] = None,
) -> int:
    """Small-file compaction — the maintenance pass every long-lived
    100 TB table needs (streaming sinks and over-parallel writers
    leave thousands of KB-scale files; scan cost is then dominated by
    open/footer overhead, not bytes).

    Sizes the output from the INPUT BYTES (spark reports the scan's
    ``sizeInBytes`` through the file index), not row counts:
    ``ceil(input_bytes / target_file_mb)`` output files via one round
    of ``repartition`` (or, with ``zorder_by``, a Morton-key range
    repartition so the compaction ALSO clusters for data skipping —
    compact + optimize in a single shuffle). Returns the number of
    output files planned. Parquet-level stats (min/max per file)
    come free from the writer.
    """
    df = spark.read.parquet(input_path)
    # logical-plan statistics reflect the file-index byte size
    input_bytes = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    n_files = max(1, int((int(input_bytes) + target_file_mb * 2**20 - 1)
                         // (target_file_mb * 2**20)))
    if zorder_by:
        z = ZOrderLayout(list(zorder_by))
        out = z.layout(df, num_partitions=n_files).drop(z.output_column)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(output_path)
    return n_files


class ZOrderLayout:
    """Z-order (Morton-curve) layout over up to 8 columns.

    Parameters
    ----------
    columns: layout columns (numeric). Bit budget is ``bits`` per
        column; ``k * bits`` must fit in 63 bits.
    bits: rank width per column (default 16).
    output_column: name of the emitted key column.
    """

    def __init__(
        self,
        columns: Sequence[str],
        bits: int = 16,
        output_column: str = "zkey",
    ):
        cols = list(columns)
        if not 1 <= len(cols) <= 8:
            raise ValueError("1..8 layout columns")
        if bits < 1 or bits * len(cols) > 63:
            raise ValueError("bits * len(columns) must be <= 63")
        self.columns = cols
        self.bits = bits
        self.output_column = output_column
        self.stats: Optional[Dict[str, Tuple[float, float]]] = None

    # -- internals ----------------------------------------------------

    def _collect_stats(self, df: DataFrame) -> None:
        aggs = []
        for c in self.columns:
            aggs.append(F.min(c).alias(f"_mn_{c}"))
            aggs.append(F.max(c).alias(f"_mx_{c}"))
        row = df.agg(*aggs).collect()[0]
        self.stats = {
            c: (row[f"_mn_{c}"], row[f"_mx_{c}"]) for c in self.columns
        }

    def _rank(self, c: str) -> Column:
        mn, mx = self.stats[c]
        top = (1 << self.bits) - 1
        col = F.col(c)
        if mx == mn:
            return F.lit(0).cast("long")
        if isinstance(mn, int) and isinstance(mx, int):
            # exact integer grid — engine-portable bit-for-bit
            return F.expr(
                f"CAST((CAST(`{c}` AS DECIMAL(38,0)) - {mn}) * {top} "
                f"div {mx - mn} AS BIGINT)"
            )
        span = float(mx) - float(mn)
        scaled = F.floor(
            (col.cast("double") - float(mn)) / span * top
        ).cast("long")
        return F.least(F.greatest(scaled, F.lit(0)), F.lit(top))

    def zkey_expr(self) -> Column:
        """The interleaved Morton key as a static expression
        (requires stats; ``transform`` computes them)."""
        if self.stats is None:
            raise ValueError("stats not computed - call transform()")
        k = len(self.columns)
        ranks: List[Column] = [self._rank(c) for c in self.columns]
        key = F.lit(0).cast("long")
        for b in range(self.bits):
            for j, r in enumerate(ranks):
                bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
                key = key.bitwiseOR(F.shiftleft(bit, b * k + j))
        return key

    # -- API ----------------------------------------------------------

    def transform(self, df: DataFrame) -> DataFrame:
        """Add the Morton key column (one stats agg + one projection)."""
        if self.stats is None:
            self._collect_stats(df)
        return df.withColumn(self.output_column, self.zkey_expr())

    def layout(
        self, df: DataFrame, num_partitions: Optional[int] = None
    ) -> DataFrame:
        """Range-repartition by the Morton key (the write-side step:
        follow with ``.write.parquet(...)``). The key column is kept
        so downstream audits can verify clustering."""
        keyed = self.transform(df)
        if num_partitions:
            return keyed.repartitionByRange(
                num_partitions, self.output_column
            )
        return keyed.repartitionByRange(self.output_column)
