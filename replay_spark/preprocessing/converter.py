"""CSRConverter — interactions → sparse user-item matrix.

Parity: reference ``preprocessing/converter.py:10-110``. Driver-side
by design (used only to feed sklearn-style models); returns a scipy
``csr_matrix`` when scipy is importable, else a plain COO triple of
numpy arrays with the same shape contract.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pyspark.sql import DataFrame

__all__ = ["CSRConverter"]

try:  # scipy is optional in this environment
    from scipy.sparse import csr_matrix

    _HAS_SCIPY = True
except ImportError:  # pragma: no cover
    _HAS_SCIPY = False


class CSRConverter:
    def __init__(
        self,
        first_dim_column: str = "query_id",
        second_dim_column: str = "item_id",
        data_column: Optional[str] = "rating",
        row_count: Optional[int] = None,
        column_count: Optional[int] = None,
    ):
        self.first_dim_column = first_dim_column
        self.second_dim_column = second_dim_column
        self.data_column = data_column
        self.row_count = row_count
        self.column_count = column_count

    def transform(self, data: DataFrame):
        cols = [self.first_dim_column, self.second_dim_column]
        if self.data_column is not None:
            cols.append(self.data_column)
        pdf = data.select(*cols).toPandas()
        rows = pdf[self.first_dim_column].to_numpy()
        columns = pdf[self.second_dim_column].to_numpy()
        if self.data_column is not None:
            values = pdf[self.data_column].to_numpy()
        else:
            values = np.ones(len(pdf))
        n_rows = self.row_count or (int(rows.max()) + 1 if len(rows) else 0)
        n_cols = self.column_count or (
            int(columns.max()) + 1 if len(columns) else 0
        )
        if _HAS_SCIPY:
            return csr_matrix(
                (values, (rows, columns)), shape=(n_rows, n_cols)
            )
        return {"rows": rows, "cols": columns, "values": values, "shape": (n_rows, n_cols)}
