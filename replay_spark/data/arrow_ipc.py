"""Arrow IPC (Feather v2) sink/source for zero-copy interchange.

Arrow IPC files are the lingua franca between Spark exports and
single-node tooling (pandas, polars, DuckDB, dataframe loaders) —
columnar, memory-mappable, no decode step. pyarrow is already the
Arrow bridge inside Spark's Pandas-UDF machinery, so the writer costs
nothing extra; this module adds the missing FILE-level shape with the
same Spark-first contract as the repo's other sinks
(:mod:`replay_spark.data.webdataset`, ``tfrecord``, ``avro``):

* ``write_arrow_ipc`` — shard by ``pmod(xxhash64(key), num_shards)``,
  repartition so ONE task owns each shard, sort rows by key within
  the shard, and stream Arrow record batches through
  ``pa.ipc.new_file``. Deterministic layout → re-exports of the same
  data are byte-identical (asserted in tests).
* ``read_arrow_ipc`` — parallelize the shard list, open each file
  executor-side via ``mapInPandas``; the Spark schema derives from
  the FIRST shard's Arrow schema (``from_arrow_schema``), so the
  round trip needs no side-channel metadata.

Export cost scales with executor count (one writer task per shard,
nothing driver-side); at 100 TB pick ``num_shards`` ≈ the consumer's
read parallelism, same sizing rule as every sink here.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_arrow_ipc", "read_arrow_ipc"]


def write_arrow_ipc(
    df: DataFrame,
    path: str,
    key_column: str,
    num_shards: int = 16,
    batch_rows: int = 4096,
    compression: Optional[str] = None,
) -> list:
    """Write ``df`` as ``shard-%05d.arrow`` IPC files under ``path``.

    ``compression`` is passed to pyarrow's IPC options (``"zstd"`` /
    ``"lz4"`` / None); None keeps the files memory-mappable."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    os.makedirs(path, exist_ok=True)
    # _tie: a full-row hash so duplicate keys sort deterministically
    # (post-shuffle arrival order is not stable across runs); the
    # byte-identical re-export property then holds for any key column
    tagged = df.withColumn(
        "_shard",
        F.pmod(F.xxhash64(F.col(key_column)), F.lit(num_shards)).cast(
            "int"
        ),
    ).withColumn("_tie", F.xxhash64(*df.columns))
    key_col = key_column
    n_batch = int(batch_rows)
    # derive the Arrow schema from the Spark schema, NOT from pandas
    # inference: a nullable long column arrives in pandas as float64
    # (None -> NaN), and inferred IPC files would silently store
    # double — the round trip must be type-faithful
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(df.schema)

    def write_partition(batches):
        import pyarrow as pa

        by_shard: dict = {}
        for pdf in batches:
            for shard_id, grp in pdf.groupby("_shard"):
                by_shard.setdefault(int(shard_id), []).append(
                    grp.drop(columns=["_shard"])
                )
        for shard_id, parts in by_shard.items():
            import pandas as pd

            merged = (
                pd.concat(parts, ignore_index=True)
                .sort_values(
                    [key_col, "_tie"], kind="mergesort", ignore_index=True
                )
                .drop(columns=["_tie"])
            )
            table = pa.Table.from_pandas(
                merged, schema=arrow_schema, preserve_index=False
            )
            fname = os.path.join(path, f"shard-{shard_id:05d}.arrow")
            opts = pa.ipc.IpcWriteOptions(compression=compression)
            with pa.OSFile(fname, "wb") as fh:
                with pa.ipc.new_file(fh, table.schema, options=opts) as w:
                    for batch in table.to_batches(max_chunksize=n_batch):
                        w.write_batch(batch)
        yield from ()  # mapInPandas contract: yield nothing

    (
        tagged.repartition(num_shards, "_shard")
        .mapInPandas(write_partition, schema="dummy int")
        .count()  # force execution
    )
    return sorted(f for f in os.listdir(path) if f.endswith(".arrow"))


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Read a ``write_arrow_ipc`` directory back as a DataFrame —
    one task per shard, Arrow → pandas → Arrow with no driver-side
    data movement."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import from_arrow_schema

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".arrow")
    )
    if not files:
        raise FileNotFoundError(f"no .arrow shards under {path!r}")
    with pa.memory_map(files[0]) as mm:
        arrow_schema = pa.ipc.open_file(mm).schema
    spark_schema = from_arrow_schema(arrow_schema)
    from replay_spark.utils.spark_utils import local_df

    file_df = local_df(spark, [(f,) for f in files], "file string").repartition(
        len(files), "file"
    )

    def read_partition(batches):
        import pyarrow as pa

        for pdf in batches:
            for fname in pdf["file"]:
                with pa.memory_map(fname) as mm:
                    table = pa.ipc.open_file(mm).read_all()
                yield table.to_pandas()

    return file_df.mapInPandas(read_partition, schema=spark_schema)
