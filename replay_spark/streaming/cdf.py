"""Micro-batch change-data-feed source for a
:class:`~replay_spark.lake.LakeTable` — the READ-side half of the
exactly-once loop (the write side being the lake's txn-marked
``append_batch`` / ``merge_batch`` sinks).

``LakeChangeStream`` tails :meth:`LakeTable.changes` from a durable
cursor: each micro-batch is the change feed over a bounded slice of
commits ``(cursor, cursor + max_commits_per_batch]``, handed to the
processor as a normal DataFrame carrying ``_change_type`` /
``_commit_version``; the cursor advances ONLY after the processor
returns. Combined with a txn-marked sink keyed by the batch's end
version, a crash between "processor succeeded" and "cursor written"
replays the same batch with the same batch id — which the sink
skips — so the pipeline is exactly-once end to end.

Why a driver-orchestrated tailer instead of a
``pyspark.sql.datasource`` streaming source: a Python DataSource
materializes every change row through driver/Arrow record batches,
while this tailer keeps each micro-batch the FULL Catalyst plan that
``changes()`` builds (deletion-vector anti-joins, column mapping,
predicate pushdown all intact) — at 100 TB the churn stays
distributed and the driver handles only commit metadata. This is the
Delta/Iceberg "incremental batch" consumption shape (Trigger
AvailableNow), generalized from the ``LakeVectorIndex`` refresh
cursor.

Cites reference behavior gap: the reference (sb-ai-lab/RePlay) has
no table format and no change feed; this follows the public Delta
Lake CDF-streaming contract (startingVersion + maxFilesPerTrigger
rate limiting) re-expressed for this log.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional

from pyspark.sql import DataFrame

__all__ = ["LakeChangeStream"]


class LakeChangeStream:
    """Tail a LakeTable's change feed in bounded micro-batches.

    Parameters
    ----------
    table:
        The source :class:`~replay_spark.lake.LakeTable`.
    checkpoint_path:
        Directory holding the durable cursor (created if missing).
        Restarting a stream with the same checkpoint resumes exactly
        after the last fully-processed commit.
    starting_version:
        Where a FRESH cursor starts: the feed covers commits
        ``> starting_version``. ``-1`` replays the full history
        (every append becomes an insert batch — the "snapshot then
        tail" bootstrap); ``None`` (default) starts at the CURRENT
        latest version, i.e. new changes only.
    max_commits_per_batch:
        Rate limit — at most this many commits per micro-batch (the
        ``maxFilesPerTrigger`` analogue at commit granularity), so a
        backlogged stream catches up in bounded, spill-safe slices.
    """

    def __init__(
        self,
        table,
        checkpoint_path: str,
        starting_version: Optional[int] = None,
        max_commits_per_batch: int = 20,
    ):
        if max_commits_per_batch < 1:
            raise ValueError("max_commits_per_batch must be >= 1")
        self.table = table
        self.checkpoint_path = checkpoint_path
        self.max_commits_per_batch = int(max_commits_per_batch)
        self._starting_version = starting_version

    # -- cursor (durable, atomically replaced) -------------------------------

    def _cursor_file(self) -> str:
        return os.path.join(self.checkpoint_path, "cursor.json")

    def cursor(self) -> int:
        """Last fully-processed source version (commits ``<= cursor``
        are done). A fresh checkpoint resolves ``starting_version``
        — the current latest by default, so only NEW changes flow —
        and PINS it durably, exactly once (Delta's startingVersion is
        likewise resolved at first start and stored in the
        checkpoint, not re-resolved per trigger)."""
        try:
            with open(self._cursor_file()) as fh:
                state = json.load(fh)
        except OSError:
            start = (
                int(self._starting_version)
                if self._starting_version is not None
                else self.table.latest_version()
            )
            self._write_cursor(start)
            return start
        if state.get("table") != self.table.path:
            raise ValueError(
                f"checkpoint at {self.checkpoint_path} belongs to "
                f"table {state.get('table')!r}, not {self.table.path!r}"
            )
        return int(state["version"])

    def _write_cursor(self, version: int) -> None:
        os.makedirs(self.checkpoint_path, exist_ok=True)
        tmp = self._cursor_file() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(
                json.dumps(
                    {"version": int(version), "table": self.table.path}
                )
            )
        os.replace(tmp, self._cursor_file())

    # -- batches --------------------------------------------------------------

    def next_batch(self):
        """The next pending micro-batch as ``(df, end_version)`` —
        the change feed over commits ``(cursor, end_version]``, at
        most ``max_commits_per_batch`` of them — or ``None`` when the
        cursor is at the tip. Reading does NOT advance the cursor;
        call :meth:`commit` (or use :meth:`process_available`) after
        the batch lands."""
        start = self.cursor()
        tip = self.table.latest_version()
        if tip <= start:
            return None
        end = min(tip, start + self.max_commits_per_batch)
        return self.table.changes(start, end), end

    def commit(self, end_version: int) -> None:
        """Durably advance the cursor to ``end_version`` — call only
        after the batch's effects are safely landed (or the sink is
        replay-idempotent)."""
        current = self.cursor()
        if end_version < current:
            raise ValueError(
                f"cursor moves forward only: {end_version} < {current}"
            )
        self._write_cursor(end_version)

    def process_available(
        self,
        fn: Callable[[DataFrame, int], None],
        max_batches: Optional[int] = None,
    ) -> int:
        """Drain the feed to the CURRENT tip (Trigger.AvailableNow):
        call ``fn(batch_df, end_version)`` per micro-batch, advancing
        the cursor after each successful call. ``end_version`` is the
        batch id to hand a txn-marked sink — monotone per checkpoint,
        so a replayed batch after a crash is skipped by the sink and
        the pipeline stays exactly-once. Returns the number of
        batches processed."""
        done = 0
        while max_batches is None or done < max_batches:
            nxt = self.next_batch()
            if nxt is None:
                return done
            df, end = nxt
            fn(df, end)
            self.commit(end)
            done += 1
        return done

    def pipe_to(self, sink_table, max_batches: Optional[int] = None) -> int:
        """End-to-end incremental pipeline: append each change batch
        (with its ``_change_type`` / ``_commit_version`` columns) to
        ``sink_table`` through the exactly-once txn sink, batch id =
        the slice's end version. Returns batches processed."""
        app_id = "lake-cdf@" + self.checkpoint_path

        def _append(df: DataFrame, end: int) -> None:
            sink_table.append_batch(df, app_id=app_id, batch_id=end)

        return self.process_available(_append, max_batches=max_batches)
