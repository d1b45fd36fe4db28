"""Dataset recombination helpers.

Parity: reference ``replay/preprocessing/utils.py:132-180``
(``merge_subsets``, Spark path) — used to recombine KFolds folds and
splitter outputs.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_subsets"]

_ON_DUPLICATE = ("error", "drop", "ignore")


def merge_subsets(
    dfs: Sequence[DataFrame],
    columns: Optional[Sequence[str]] = None,
    check_columns: bool = True,
    subset_for_duplicates: Optional[Sequence[str]] = None,
    on_duplicate: str = "error",
) -> DataFrame:
    """Union several DataFrames after aligning them to a common column
    list (the first frame's columns unless ``columns`` is given), with
    duplicate handling: ``error`` raises if any duplicate exists on
    ``subset_for_duplicates`` (all columns by default), ``drop``
    deduplicates (logging how many rows went), ``ignore`` keeps all.
    """
    if not dfs:
        raise ValueError("At least one dataframe is required")
    if on_duplicate not in _ON_DUPLICATE:
        raise ValueError(
            f"on_duplicate must be one of {_ON_DUPLICATE}, got {on_duplicate!r}"
        )
    ref_cols = list(dfs[0].columns) if columns is None else list(columns)
    merged = None
    for i, df in enumerate(dfs):
        if check_columns and set(df.columns) != set(ref_cols):
            raise ValueError(
                f"Dataframe {i} columns {sorted(df.columns)} do not match "
                f"expected {sorted(ref_cols)}"
            )
        part = df.select(*ref_cols)
        merged = part if merged is None else merged.unionByName(part)

    if on_duplicate == "ignore":
        return merged
    dup_subset = (
        ref_cols if subset_for_duplicates is None else list(subset_for_duplicates)
    )
    if on_duplicate == "error":
        has_dup = (
            merged.groupBy(*dup_subset)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
            > 0
        )
        if has_dup:
            raise ValueError(f"Found duplicate rows on subset {dup_subset}")
        return merged
    unique = merged.dropDuplicates(dup_subset)
    n_dropped = merged.count() - unique.count()
    if n_dropped:
        logging.getLogger("replay_spark").warning(
            "Found %d duplicate rows on subset %s and dropped them",
            n_dropped,
            dup_subset,
        )
    return unique
