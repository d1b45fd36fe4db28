"""Train/test splitters (reference ``replay/splitters/``).

All implementations are single-pass lazy window/aggregate plans; the
only driver interaction is the occasional scalar threshold pull
(e.g. TimeSplitter's fractional cut timestamp).
"""

from __future__ import annotations

from datetime import datetime
from typing import Optional, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from replay_spark.splitters.base import Splitter, SplitterReturnType
from replay_spark.utils.spark_utils import is_timestamp_like, kth_smallest

__all__ = [
    "RatioSplitter",
    "TimeSplitter",
    "LastNSplitter",
    "RandomSplitter",
    "ColdUserRandomSplitter",
    "NewUsersSplitter",
    "RandomNextNSplitter",
    "TwoStageSplitter",
    "KFolds",
]


class RatioSplitter(Splitter):
    """Last ``test_size`` fraction of each user's interactions → test.

    Two modes (reference ``ratio_splitter.py:187-340``):

    * ``split_by_fractions=True``: a row is test when its per-user
      rank fraction ``round(row_num/count, 3)`` exceeds
      ``round(1 - test_size, 3)`` (the reference's ``_precision=3``,
      ``ratio_splitter.py:158``);
    * ``split_by_fractions=False``: per-user
      ``train_size = count - int(count * test_size)`` rows stay in
      train, with the reference's small-group correction (when
      ``0 < count*ratio < 1`` and ``train_size > 1``, one extra row
      goes to test).
    """

    # reference ratio_splitter.py rounds the fraction and the threshold
    # to 3 decimals; matching it keeps boundary rows in the same split
    _precision = 3

    def __init__(
        self,
        test_size: float,
        divide_column: str = "query_id",
        query_column: str = "query_id",
        item_column: Optional[str] = "item_id",
        timestamp_column: str = "timestamp",
        drop_cold_items: bool = False,
        drop_cold_users: bool = False,
        min_interactions_per_group: Optional[int] = None,
        split_by_fractions: bool = True,
        session_id_column: Optional[str] = None,
        session_id_processing_strategy: str = "test",
    ):
        super().__init__(
            drop_cold_items=drop_cold_items,
            drop_cold_users=drop_cold_users,
            query_column=query_column,
            item_column=item_column,
            timestamp_column=timestamp_column,
            session_id_column=session_id_column,
            session_id_processing_strategy=session_id_processing_strategy,
        )
        if not 0 <= test_size < 1:
            raise ValueError("test_size must be in [0, 1)")
        self.test_size = test_size
        self.divide_column = divide_column
        self.min_interactions_per_group = min_interactions_per_group
        self.split_by_fractions = split_by_fractions

    def _core_split(self, interactions: DataFrame) -> SplitterReturnType:
        res = interactions.withColumn(
            "_row_num",
            F.row_number().over(
                Window.partitionBy(self.divide_column).orderBy(self.timestamp_column)
            ),
        ).withColumn(
            "_count",
            F.count(self.timestamp_column).over(Window.partitionBy(self.divide_column)),
        )
        if self.split_by_fractions:
            frac = F.round(F.col("_row_num") / F.col("_count"), self._precision)
            if self.min_interactions_per_group is not None:
                frac = F.when(
                    F.col("_count") >= self.min_interactions_per_group, frac
                ).otherwise(F.lit(0))
            res = res.withColumn(
                "is_test", frac > round(1 - self.test_size, self._precision)
            )
        else:
            train_size = F.col("_count") - (
                F.col("_count") * self.test_size
            ).cast(IntegerType())
            if self.min_interactions_per_group is not None:
                train_size = F.when(
                    F.col("_count") >= self.min_interactions_per_group, train_size
                ).otherwise(F.col("_count"))
            else:
                prod = F.col("_count") * self.test_size
                train_size = F.when(
                    (prod > 0) & (prod < 1) & (train_size > 1), train_size - 1
                ).otherwise(train_size)
            res = res.withColumn("is_test", F.col("_row_num") > train_size)
        if self.session_id_column:
            res = self._recalculate_with_session_id_column(res)
        train = res.filter(~F.col("is_test")).drop("_row_num", "_count", "is_test")
        test = res.filter("is_test").drop("_row_num", "_count", "is_test")
        return train, test


class TimeSplitter(Splitter):
    """Global time threshold split (reference ``time_splitter.py:20-207``).

    ``time_threshold`` may be a datetime/str (absolute cut) or a
    float: the last ``threshold`` fraction of rows by time → test.
    The fractional cut is the exact k-th order statistic of the
    timestamp column, located WITHOUT a global sort: approxQuantile
    brackets the rank with guaranteed error, an exact strictly-less
    count anchors it, and only the O(relErr·n) bracket slice is
    top-k-sorted — iterated if the slice is still large, so the plan
    never funnels the fact table through one task.
    """

    def __init__(
        self,
        time_threshold: Union[datetime, str, float],
        query_column: str = "query_id",
        item_column: Optional[str] = "item_id",
        timestamp_column: str = "timestamp",
        drop_cold_items: bool = False,
        drop_cold_users: bool = False,
        session_id_column: Optional[str] = None,
        session_id_processing_strategy: str = "test",
        time_column_format: str = "%Y-%m-%d %H:%M:%S",
    ):
        super().__init__(
            drop_cold_items=drop_cold_items,
            drop_cold_users=drop_cold_users,
            query_column=query_column,
            item_column=item_column,
            timestamp_column=timestamp_column,
            session_id_column=session_id_column,
            session_id_processing_strategy=session_id_processing_strategy,
        )
        if isinstance(time_threshold, float) and not 0 <= time_threshold < 1:
            raise ValueError("Fractional time_threshold must be in [0, 1)")
        self.time_threshold = time_threshold
        self.time_column_format = time_column_format

    # shared exact distributed order-statistic helper
    _kth_smallest = staticmethod(kth_smallest)

    def _core_split(self, interactions: DataFrame) -> SplitterReturnType:
        threshold = self.time_threshold
        if isinstance(threshold, str):
            threshold = datetime.strptime(threshold, self.time_column_format)
        if isinstance(threshold, float):
            ts_dtype = dict(interactions.dtypes)[self.timestamp_column]
            num = (
                F.unix_micros(F.col(self.timestamp_column).cast("timestamp"))
                if is_timestamp_like(ts_dtype)
                else F.col(self.timestamp_column)
            )
            nums = interactions.select(num.alias("_ts_num"))
            n_rows = nums.count()
            test_start_idx = int(n_rows * (1 - threshold)) + 1
            # n is already known — skip kth_smallest's first-pass
            # recount of the same frame
            cut = self._kth_smallest(
                nums, "_ts_num", test_start_idx, n=n_rows
            )
            if cut is None:
                raise ValueError(
                    "time_threshold fraction leaves no test rows"
                )
            # literal comparison on the raw column -> parquet pushdown
            if ts_dtype == "timestamp":
                threshold_col = F.timestamp_micros(F.lit(cut))
            elif ts_dtype == "timestamp_ntz":
                # rebuild the NTZ wall-clock literal in the session TZ so
                # the comparison stays on the raw column (pushdown-safe)
                threshold_col = F.timestamp_micros(F.lit(cut)).cast(
                    "timestamp_ntz"
                )
            else:
                threshold_col = F.lit(cut)
            res = interactions.withColumn(
                "is_test", F.col(self.timestamp_column) >= threshold_col
            )
        else:
            res = interactions.withColumn(
                "is_test", F.col(self.timestamp_column) >= F.lit(threshold)
            )
        if self.session_id_column:
            res = self._recalculate_with_session_id_column(res)
        train = res.filter(~F.col("is_test")).drop("is_test")
        test = res.filter("is_test").drop("is_test")
        return train, test


class LastNSplitter(Splitter):
    """Last N interactions (or last N seconds) per user → test.

    Reference ``last_n_splitter.py:24-341``.
    """

    def __init__(
        self,
        N: int,
        divide_column: str = "query_id",
        strategy: str = "interactions",
        query_column: str = "query_id",
        item_column: Optional[str] = "item_id",
        timestamp_column: str = "timestamp",
        drop_cold_items: bool = False,
        drop_cold_users: bool = False,
        session_id_column: Optional[str] = None,
        session_id_processing_strategy: str = "test",
    ):
        super().__init__(
            drop_cold_items=drop_cold_items,
            drop_cold_users=drop_cold_users,
            query_column=query_column,
            item_column=item_column,
            timestamp_column=timestamp_column,
            session_id_column=session_id_column,
            session_id_processing_strategy=session_id_processing_strategy,
        )
        if strategy not in ("interactions", "timedelta"):
            raise ValueError(f"Unknown strategy {strategy}")
        self.N = N
        self.divide_column = divide_column
        self.strategy = strategy

    def _core_split(self, interactions: DataFrame) -> SplitterReturnType:
        if self.strategy == "interactions":
            res = (
                interactions.withColumn(
                    "_row_num",
                    F.row_number().over(
                        Window.partitionBy(self.divide_column).orderBy(
                            self.timestamp_column
                        )
                    ),
                )
                .withColumn(
                    "_count",
                    F.count(self.timestamp_column).over(
                        Window.partitionBy(self.divide_column)
                    ),
                )
                .withColumn(
                    "is_test", F.col("_row_num") > F.col("_count") - F.lit(float(self.N))
                )
            )
            drop_cols = ["_row_num", "_count", "is_test"]
        else:
            res = (
                interactions.withColumn(
                    "_max_ts",
                    F.max(self.timestamp_column).over(
                        Window.partitionBy(self.divide_column)
                    ),
                )
                .withColumn(
                    "_diff",
                    F.col("_max_ts").cast("long")
                    - F.col(self.timestamp_column).cast("long"),
                )
                .withColumn("is_test", F.col("_diff") < F.lit(self.N))
            )
            drop_cols = ["_max_ts", "_diff", "is_test"]
        if self.session_id_column:
            res = self._recalculate_with_session_id_column(res)
        train = res.filter(~F.col("is_test")).drop(*drop_cols)
        test = res.filter("is_test").drop(*drop_cols)
        return train, test


class RandomSplitter(Splitter):
    """Uniform random row split (reference ``random_splitter.py:6-78``)."""

    def __init__(
        self,
        test_size: float,
        seed: Optional[int] = None,
        query_column: str = "query_id",
        item_column: Optional[str] = "item_id",
        drop_cold_items: bool = False,
        drop_cold_users: bool = False,
    ):
        super().__init__(
            drop_cold_items=drop_cold_items,
            drop_cold_users=drop_cold_users,
            query_column=query_column,
            item_column=item_column,
        )
        if not 0 <= test_size <= 1:
            raise ValueError("test_size must be in [0, 1]")
        self.test_size = test_size
        self.seed = seed

    def _core_split(self, interactions: DataFrame) -> SplitterReturnType:
        train, test = interactions.randomSplit(
            [1 - self.test_size, self.test_size], self.seed
        )
        return train, test


class ColdUserRandomSplitter(Splitter):
    """A random fraction of users goes entirely to test.

    Reference ``cold_user_random_splitter.py:17-111``.
    """

    def __init__(
        self,
        test_size: float,
        seed: Optional[int] = None,
        query_column: str = "query_id",
        item_column: Optional[str] = "item_id",
        drop_cold_items: bool = False,
        drop_cold_users: bool = False,
    ):
        super().__init__(
            drop_cold_items=drop_cold_items,
            drop_cold_users=drop_cold_users,
            query_column=query_column,
            item_column=item_column,
        )
        if not 0 <= test_size <= 1:
            raise ValueError("test_size must be in [0, 1]")
        self.test_size = test_size
        self.seed = seed

    def _core_split(self, interactions: DataFrame) -> SplitterReturnType:
        users = interactions.select(self.query_column).distinct()
        train_users, _ = users.randomSplit(
            [1 - self.test_size, self.test_size], seed=self.seed
        )
        marked = interactions.join(
            F.broadcast(train_users.withColumn("is_test", F.lit(False))),
            on=self.query_column,
            how="left",
        ).na.fill({"is_test": True})
        train = marked.filter(~F.col("is_test")).drop("is_test")
        test = marked.filter(F.col("is_test")).drop("is_test")
        return train, test


class NewUsersSplitter(Splitter):
    """Users whose first interaction is after a date cut covering
    ``test_size`` of users → all their history to test; train is
    everything strictly before the cut.

    The cut date is found with a cumulative user count over start
    dates descending (reference ``new_users_splitter.py:133-170``).
    """

    def __init__(
        self,
        test_size: float,
        query_column: str = "query_id",
        item_column: Optional[str] = "item_id",
        timestamp_column: str = "timestamp",
        drop_cold_items: bool = False,
        session_id_column: Optional[str] = None,
        session_id_processing_strategy: str = "test",
    ):
        super().__init__(
            drop_cold_items=drop_cold_items,
            drop_cold_users=False,
            query_column=query_column,
            item_column=item_column,
            timestamp_column=timestamp_column,
            session_id_column=session_id_column,
            session_id_processing_strategy=session_id_processing_strategy,
        )
        if not 0 < test_size < 1:
            raise ValueError("test_size must be in (0, 1)")
        self.test_size = test_size

    def _core_split(self, interactions: DataFrame) -> SplitterReturnType:
        start_date_by_user = interactions.groupBy(self.query_column).agg(
            F.min(self.timestamp_column).alias("_start_dt")
        )
        test_start_date = (
            start_date_by_user.groupBy("_start_dt")
            .agg(F.count(self.query_column).alias("_num_users"))
            .select(
                "_start_dt",
                F.sum("_num_users")
                .over(Window.orderBy(F.desc("_start_dt")))
                .alias("_cum_users"),
                F.sum("_num_users").over(Window.orderBy(F.lit(1))).alias("_total"),
            )
            .filter(F.col("_cum_users") >= F.col("_total") * self.test_size)
            .agg(F.max("_start_dt"))
            .first()[0]
        )
        train = interactions.filter(
            F.col(self.timestamp_column) < test_start_date
        )
        test = interactions.join(
            start_date_by_user.filter(F.col("_start_dt") >= test_start_date),
            on=self.query_column,
            how="inner",
        ).drop("_start_dt")
        return train, test


class RandomNextNSplitter(Splitter):
    """Deterministic pseudo-random per-user cut point; interactions at
    or after the cut (optionally capped at N) → test.

    The cut index is ``xxhash64(user, seed) mod count`` — seeded,
    shuffle-free, and reproducible across runs (reference
    ``random_next_n_splitter.py:178-209``).
    """

    def __init__(
        self,
        N: Optional[int] = None,
        seed: Optional[int] = None,
        divide_column: str = "query_id",
        query_column: str = "query_id",
        item_column: Optional[str] = "item_id",
        timestamp_column: str = "timestamp",
        drop_cold_items: bool = False,
        drop_cold_users: bool = False,
        session_id_column: Optional[str] = None,
        session_id_processing_strategy: str = "test",
    ):
        super().__init__(
            drop_cold_items=drop_cold_items,
            drop_cold_users=drop_cold_users,
            query_column=query_column,
            item_column=item_column,
            timestamp_column=timestamp_column,
            session_id_column=session_id_column,
            session_id_processing_strategy=session_id_processing_strategy,
        )
        self.N = N
        self.seed = seed
        self.divide_column = divide_column

    def _core_split(self, interactions: DataFrame) -> SplitterReturnType:
        window = Window.partitionBy(self.divide_column).orderBy(self.timestamp_column)
        df = interactions.withColumn("_event_rank", F.row_number().over(window) - F.lit(1))
        counts = df.groupBy(self.divide_column).agg(F.count(F.lit(1)).alias("_count"))
        seed_lit = F.lit(self.seed if self.seed is not None else 0)
        cuts = counts.select(
            self.divide_column,
            F.pmod(
                F.xxhash64(F.col(self.divide_column), seed_lit).cast("long"),
                F.col("_count").cast("long"),
            )
            .cast("long")
            .alias("_cut_index"),
        )
        df = df.join(cuts, on=self.divide_column, how="left")
        if self.N is not None:
            df = df.filter(F.col("_event_rank") < F.col("_cut_index") + F.lit(self.N))
        df = df.withColumn("is_test", F.col("_event_rank") >= F.col("_cut_index"))
        if self.session_id_column:
            df = self._recalculate_with_session_id_column(df)
        train = df.filter(~F.col("is_test")).select(interactions.columns)
        test = df.filter(F.col("is_test")).select(interactions.columns)
        return train, test


class TwoStageSplitter(Splitter):
    """Stage 1: sample ``first_divide_size`` users; stage 2: the last
    (by time) or random ``second_divide_size`` fraction/count of each
    sampled user's interactions → test.

    Reference ``two_stage_splitter.py:17-423``.
    """

    def __init__(
        self,
        first_divide_size: Union[float, int],
        second_divide_size: Union[float, int],
        first_divide_column: str = "query_id",
        shuffle: bool = False,
        seed: Optional[int] = None,
        query_column: str = "query_id",
        item_column: Optional[str] = "item_id",
        timestamp_column: str = "timestamp",
        drop_cold_items: bool = False,
        drop_cold_users: bool = False,
        session_id_column: Optional[str] = None,
        session_id_processing_strategy: str = "test",
    ):
        super().__init__(
            drop_cold_items=drop_cold_items,
            drop_cold_users=drop_cold_users,
            query_column=query_column,
            item_column=item_column,
            timestamp_column=timestamp_column,
            session_id_column=session_id_column,
            session_id_processing_strategy=session_id_processing_strategy,
        )
        self.first_divide_size = first_divide_size
        self.second_divide_size = second_divide_size
        self.first_divide_column = first_divide_column
        self.shuffle = shuffle
        self.seed = seed

    def _get_test_users(self, interactions: DataFrame) -> DataFrame:
        """Sample stage-1 users without a global window.

        Float size: seeded-hash threshold (the RandomNextNSplitter
        pattern) — fully distributed, reproducible regardless of
        partitioning; the sampled count is Binomial(n, frac) rather
        than exactly floor(n·frac). Int size: distributed top-N by
        seeded hash (TakeOrderedAndProject) — only the N sampled ids
        ever land in one place, never the user universe.
        """
        all_users = interactions.select(self.first_divide_column).distinct()
        seed_lit = F.lit(self.seed if self.seed is not None else 0)
        user_hash = F.xxhash64(F.col(self.first_divide_column), seed_lit)
        if isinstance(self.first_divide_size, float):
            if not 0 < self.first_divide_size < 1:
                raise ValueError(
                    f"Invalid value for user_test_size: {self.first_divide_size}"
                )
            modulus = 1 << 30
            return all_users.filter(
                F.pmod(user_hash, F.lit(modulus))
                < int(self.first_divide_size * modulus)
            )
        return (
            all_users.withColumn("_h", user_hash)
            .sort("_h", self.first_divide_column)
            .limit(int(self.first_divide_size))
            .drop("_h")
        )

    def _add_partition_rank(self, df: DataFrame) -> DataFrame:
        if self.shuffle:
            return df.withColumn("_rand", F.rand(self.seed)).withColumn(
                "_row_num",
                F.row_number().over(
                    Window.partitionBy(self.first_divide_column).orderBy("_rand")
                ),
            )
        return df.withColumn(
            "_row_num",
            F.row_number().over(
                Window.partitionBy(self.query_column).orderBy(
                    F.col(self.timestamp_column).desc()
                )
            ),
        )

    def _core_split(self, interactions: DataFrame) -> SplitterReturnType:
        counts = interactions.groupBy(self.first_divide_column).count()
        test_users = self._get_test_users(interactions).withColumn(
            "is_test", F.lit(True)
        )
        res = self._add_partition_rank(
            interactions.join(test_users, how="left", on=self.first_divide_column)
        )
        res = res.na.fill({"is_test": False})
        drop_cols = ["_rand", "_row_num", "count", "is_test"] if self.shuffle else ["_row_num", "count", "is_test"]
        if isinstance(self.second_divide_size, float):
            res = res.join(counts, on=self.first_divide_column, how="left")
            res = res.withColumn("_frac", F.col("_row_num") / F.col("count"))
            train = res.filter(
                f"_frac > {self.second_divide_size} OR NOT is_test"
            ).drop(*drop_cols, "_frac")
            test = res.filter(
                f"_frac <= {self.second_divide_size} AND is_test"
            ).drop(*drop_cols, "_frac")
        else:
            train = res.filter(
                f"_row_num > {self.second_divide_size} OR NOT is_test"
            ).drop(*drop_cols)
            test = res.filter(
                f"_row_num <= {self.second_divide_size} AND is_test"
            ).drop(*drop_cols)
        return train, test


class KFolds(Splitter):
    """Per-user k-fold CV: each user's rows get a random fold id;
    ``split`` yields (train, test) per fold.

    Reference ``k_folds.py:16-101``.
    """

    def __init__(
        self,
        n_folds: int = 5,
        strategy: str = "query",
        seed: Optional[int] = None,
        query_column: str = "query_id",
        item_column: Optional[str] = "item_id",
        timestamp_column: str = "timestamp",
        drop_cold_items: bool = False,
        drop_cold_users: bool = False,
        session_id_column: Optional[str] = None,
        session_id_processing_strategy: str = "test",
    ):
        super().__init__(
            drop_cold_items=drop_cold_items,
            drop_cold_users=drop_cold_users,
            query_column=query_column,
            item_column=item_column,
            timestamp_column=timestamp_column,
            session_id_column=session_id_column,
            session_id_processing_strategy=session_id_processing_strategy,
        )
        if strategy not in {"query"}:
            raise ValueError(f"Wrong splitter parameter: {strategy}")
        self.n_folds = n_folds
        self.strategy = strategy
        self.seed = seed

    def split(self, interactions: DataFrame):
        return self._core_split(interactions)

    def _core_split(self, interactions: DataFrame):
        df = interactions.withColumn("_rand", F.rand(self.seed)).withColumn(
            "fold",
            F.row_number().over(
                Window.partitionBy(self.query_column).orderBy("_rand")
            )
            % self.n_folds,
        ).drop("_rand")
        for i in range(self.n_folds):
            fold_df = df.withColumn(
                "is_test", F.when(F.col("fold") == i, True).otherwise(False)
            )
            if self.session_id_column:
                fold_df = self._recalculate_with_session_id_column(fold_df)
            train = fold_df.filter(~F.col("is_test")).drop("is_test", "fold")
            test = fold_df.filter(F.col("is_test")).drop("is_test", "fold")
            test = self._drop_cold_items_and_users(train, test)
            yield train, test
