"""Chat/SFT data preparation: render conversation rows into training
strings.

Instruction-tuning corpora arrive as structured turn lists
(``array<struct<role, content>>``); the trainer wants one rendered
string per conversation with role delimiters, an optional system
prompt, and a turn budget applied from the END backwards (keep the
most recent context — the standard packing convention). The whole
render is SQL higher-order expressions (``slice`` + ``aggregate``
string fold) — zero UDFs, fused into the scan, replayable by the
contract oracle.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ChatTemplater"]


class ChatTemplater:
    """Render ``turns_column`` (array<struct<role string, content
    string>>) to ``rendered`` plus ``n_turns_kept``.

    Template per turn: ``{open}{role}{sep}{content}{close}`` —
    defaults produce the common ``<|role|>\\ncontent<|end|>\\n``
    shape. ``system_column`` (optional) is rendered first with role
    ``system``. ``keep_last_turns`` truncates from the FRONT, keeping
    the trailing turns (None = keep all).
    """

    def __init__(
        self,
        turns_column: str = "turns",
        output_column: str = "rendered",
        system_column: Optional[str] = None,
        keep_last_turns: Optional[int] = None,
        open_tag: str = "<|",
        close_tag: str = "|>\n",
        end_tag: str = "<|end|>\n",
    ):
        if keep_last_turns is not None and keep_last_turns < 1:
            raise ValueError("keep_last_turns must be >= 1")
        self.turns_column = turns_column
        self.output_column = output_column
        self.system_column = system_column
        self.keep_last_turns = keep_last_turns
        self.open_tag = open_tag
        self.close_tag = close_tag
        self.end_tag = end_tag

    def _render_turn(self, role: Column, content: Column) -> Column:
        return F.concat(
            F.lit(self.open_tag),
            role,
            F.lit(self.close_tag),
            content,
            F.lit(self.end_tag),
        )

    def transform(self, df: DataFrame) -> DataFrame:
        turns = F.col(self.turns_column)
        if self.keep_last_turns is not None:
            k = self.keep_last_turns
            start = F.greatest(F.size(turns) - F.lit(k) + 1, F.lit(1))
            kept = F.slice(
                turns, start, F.least(F.size(turns), F.lit(k))
            )
        else:
            kept = turns
        body = F.aggregate(
            kept,
            F.lit("").cast("string"),
            lambda acc, t: F.concat(
                acc,
                self._render_turn(
                    t.getField("role"), t.getField("content")
                ),
            ),
        )
        if self.system_column:
            sys_part = F.when(
                F.col(self.system_column).isNotNull()
                & (F.col(self.system_column) != ""),
                self._render_turn(
                    F.lit("system"), F.col(self.system_column)
                ),
            ).otherwise(F.lit(""))
            rendered = F.concat(sys_part, body)
        else:
            rendered = body
        return df.withColumn(self.output_column, rendered).withColumn(
            "n_turns_kept",
            F.least(
                F.size(turns),
                F.lit(
                    self.keep_last_turns
                    if self.keep_last_turns is not None
                    else (1 << 31) - 1
                ),
            ),
        )
