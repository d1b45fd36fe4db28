"""Sessionizer — assign session ids by inactivity gap.

Parity: reference ``replay/preprocessing/sessionizer.py:11-263``
(the doctest golden [2,2,2,5,5,5,9,8,9,9] reproduces exactly in
``session_id_mode="reference"``):

* boundary flag: gap to previous event ≥ ``session_gap`` (first
  event of a user is always a boundary);
* per-user session ordinal: running sum of boundary flags over the
  (user, time) window;
* id modes:
  - ``"composite"`` (default, scale-safe): ``session_id`` is the
    string ``"{user}_{ordinal}"`` — no global window anywhere, the
    whole transform is a single per-user shuffle. This is the mode
    to use at scale (SURVEY §2.3 recommendation).
  - ``"reference"``: globally-unique numeric id via cumulative
    user row-counts minus the ordinal — the reference's arithmetic,
    preserved for parity. Requires one single-task global window
    over the (small) per-user count table; fine while #users is
    driver-scale, wrong shape at 10⁹ users.

Determinism: with duplicate ``(user, timestamp)`` rows the lag-based
boundary and the running sum are engine-dependent for ties. Pass
``tiebreak_columns`` (e.g. ``["item_id"]``) to make the ordering
total — the windows then use an explicit ROWS frame and every engine
agrees row-for-row.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from replay_spark.utils.spark_utils import is_timestamp_like

__all__ = ["Sessionizer"]


class Sessionizer:
    def __init__(
        self,
        user_column: str = "user_id",
        time_column: str = "timestamp",
        session_column: str = "session_id",
        session_gap: int = 86400,
        time_column_format: str = "yyyy-MM-dd HH:mm:ss",
        min_inter_per_session: Optional[int] = None,
        max_inter_per_session: Optional[int] = None,
        min_sessions_per_user: Optional[int] = None,
        max_sessions_per_user: Optional[int] = None,
        tiebreak_columns: Optional[Sequence[str]] = None,
        session_id_mode: str = "composite",
        max_single_task_users: int = 5_000_000,
    ):
        # reference-mode threshold: per-user count tables below this fit
        # comfortably in one window task; above it the two-phase
        # distributed prefix sum avoids the single-task global sort
        self.max_single_task_users = max_single_task_users
        if session_id_mode not in ("composite", "reference"):
            raise ValueError(
                "session_id_mode must be 'composite' or 'reference', "
                f"got {session_id_mode!r}"
            )
        self.user_column = user_column
        self.time_column = time_column
        self.session_column = session_column
        self.session_gap = session_gap
        self.time_column_format = time_column_format
        self.min_inter_per_session = min_inter_per_session
        self.max_inter_per_session = max_inter_per_session
        self.min_sessions_per_user = min_sessions_per_user
        self.max_sessions_per_user = max_sessions_per_user
        self.tiebreak_columns = list(tiebreak_columns or [])
        self.session_id_mode = session_id_mode

    def _to_unix(self, interactions: DataFrame) -> DataFrame:
        """Add a working unix-seconds column; the original time column
        is left untouched (no precision loss on round-trip)."""
        dtype = dict(interactions.dtypes)[self.time_column]
        if is_timestamp_like(dtype):
            # .cast("timestamp") is identity for TimestampType and
            # reinterprets TIMESTAMP_NTZ wall clock in the session TZ
            return interactions.withColumn(
                "_ts_work",
                F.unix_timestamp(F.col(self.time_column).cast("timestamp")),
            )
        if dtype == "date":
            return interactions.withColumn(
                "_ts_work",
                F.unix_timestamp(self.time_column, self.time_column_format),
            )
        return interactions.withColumn("_ts_work", F.col(self.time_column))

    def _with_ordinal(self, data: DataFrame) -> DataFrame:
        """Boundary flags + per-user session ordinal (1-based)."""
        tiebreaks = [F.col(c) for c in self.tiebreak_columns]
        lag_window = Window.partitionBy(self.user_column).orderBy(
            F.col("_ts_work"), *tiebreaks
        )
        with_diff = data.withColumn(
            "_boundary",
            (
                F.col("_ts_work")
                - F.lag("_ts_work", 1).over(lag_window)
                >= self.session_gap
            ),
        )
        with_diff = with_diff.na.fill(True, subset=["_boundary"]).withColumn(
            "_boundary", F.col("_boundary").cast("long")
        )
        if self.tiebreak_columns:
            # total order -> an explicit ROWS running sum is exactly
            # deterministic in every engine (same order as the lag pass,
            # so tied-timestamp rows land in the boundary row's session)
            ordinal_window = (
                Window.partitionBy(self.user_column)
                .orderBy(F.col("_ts_work"), *tiebreaks)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        else:
            # RANGE frame (default): ties share one cumulative value
            ordinal_window = Window.partitionBy(self.user_column).orderBy(
                F.col("_ts_work"), F.col("_boundary").desc()
            )
        return with_diff.withColumn(
            "_session_ordinal", F.sum("_boundary").over(ordinal_window)
        )

    def _create_sessions(self, data: DataFrame) -> DataFrame:
        with_ordinal = self._with_ordinal(data)
        if self.session_id_mode == "composite":
            return with_ordinal.withColumn(
                self.session_column,
                F.concat_ws(
                    "_",
                    F.col(self.user_column).cast("string"),
                    F.col("_session_ordinal").cast("string"),
                ),
            ).drop("_boundary", "_session_ordinal")
        # reference arithmetic: globally-unique numeric ids (parity
        # mode). The cumulative window runs over the per-user COUNT
        # table (not the fact table); below the threshold a plain
        # one-task window is cheapest, above it the two-phase
        # distributed prefix sum takes over — identical ids either way
        user_counts = with_ordinal.groupBy(self.user_column).count()
        if user_counts.count() > self.max_single_task_users:
            from replay_spark.utils.spark_utils import ordered_prefix_sums

            cum_counts = ordered_prefix_sums(
                user_counts,
                [F.col(self.user_column)],
                "count",
                out_col="_cum_user_count",
            ).drop("count")
        else:
            cum_counts = user_counts.withColumn(
                "_cum_user_count",
                F.sum("count").over(
                    Window.partitionBy(F.lit(0)).orderBy(self.user_column)
                ),
            ).drop("count")
        return (
            with_ordinal.join(cum_counts, on=self.user_column, how="left")
            .withColumn(
                self.session_column,
                # explicit BIGINT: DuckDB's windowed SUM yields HUGEINT /
                # DECIMAL, whose textual rendering differs from Spark's
                # long — cast both engines to the same physical type so
                # value hashes agree (reference sessionizer.py:174-210)
                (F.col("_cum_user_count") - F.col("_session_ordinal")).cast(
                    "long"
                ),
            )
            .drop("_boundary", "_session_ordinal", "_cum_user_count")
        )

    def _filter_sessions(self, interactions: DataFrame) -> DataFrame:
        session_counts = interactions.groupBy(self.session_column).count()
        if self.min_inter_per_session:
            session_counts = session_counts.filter(
                F.col("count") >= self.min_inter_per_session
            )
        if self.max_inter_per_session:
            session_counts = session_counts.filter(
                F.col("count") <= self.max_inter_per_session
            )
        filtered = interactions.join(
            session_counts.select(self.session_column),
            on=self.session_column,
            how="left_semi",
        )
        nunique = filtered.groupBy(self.user_column).agg(
            F.countDistinct(self.session_column).alias("_nunique")
        )
        if self.min_sessions_per_user:
            nunique = nunique.filter(F.col("_nunique") >= self.min_sessions_per_user)
        if self.max_sessions_per_user:
            nunique = nunique.filter(F.col("_nunique") <= self.max_sessions_per_user)
        return filtered.join(
            nunique.select(self.user_column), on=self.user_column, how="left_semi"
        )

    def transform(self, interactions: DataFrame) -> DataFrame:
        data = self._to_unix(interactions)
        data = self._create_sessions(data)
        if any(
            x is not None
            for x in (
                self.min_inter_per_session,
                self.max_inter_per_session,
                self.min_sessions_per_user,
                self.max_sessions_per_user,
            )
        ):
            data = self._filter_sessions(data)
        return data.drop("_ts_work")
