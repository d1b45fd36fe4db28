"""TIMESTAMP_NTZ hardening (round-3 regression suite).

The driver's testdata has shipped ``events.ts`` as int64-nanos,
parquet ``timestamp[us]`` (read as TIMESTAMP_NTZ), and plain
TIMESTAMP across refreshes. Round 2 lost 36/50 correctness rows to a
single ``dtype == "timestamp"`` check that misroutes NTZ columns.
These tests pin every timestamp-dispatching operator to NTZ input and
assert it behaves identically to the TimestampType path.
"""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from replay_spark.utils.spark_utils import (
    is_timestamp_like,
    process_timestamp_column,
)


def _frames(spark):
    """The same 8-row log twice: once TIMESTAMP, once TIMESTAMP_NTZ."""
    rows = [
        (0, 10, datetime.datetime(2024, 1, 1, 0, 0, 0), 4.0),
        (0, 11, datetime.datetime(2024, 1, 1, 0, 30, 0), 3.0),
        (0, 12, datetime.datetime(2024, 1, 2, 12, 0, 0), 2.0),
        (1, 10, datetime.datetime(2024, 1, 1, 6, 0, 0), 5.0),
        (1, 13, datetime.datetime(2024, 1, 3, 6, 0, 0), 1.0),
        (2, 11, datetime.datetime(2024, 1, 2, 0, 0, 0), 4.5),
        (2, 12, datetime.datetime(2024, 1, 2, 0, 0, 0), 2.5),
        (2, 13, datetime.datetime(2024, 1, 5, 0, 0, 0), 3.5),
    ]

    def schema(ts_type):
        return StructType(
            [
                StructField("user_id", LongType()),
                StructField("item_id", LongType()),
                StructField("timestamp", ts_type),
                StructField("rating", DoubleType()),
            ]
        )

    tz = spark.createDataFrame(rows, schema(TimestampType()))
    ntz = spark.createDataFrame(rows, schema(TimestampNTZType()))
    return tz, ntz


def _sorted_rows(df):
    cols = sorted(df.columns)
    out = df.select(*[F.col(c).cast("string").alias(c) for c in cols])
    return sorted(tuple(r) for r in out.collect())


def test_is_timestamp_like():
    assert is_timestamp_like("timestamp")
    assert is_timestamp_like("timestamp_ntz")
    assert not is_timestamp_like("bigint")
    assert not is_timestamp_like("date")
    assert not is_timestamp_like("string")


def test_process_timestamp_column_ntz(spark):
    _, ntz = _frames(spark)
    out = process_timestamp_column(ntz, "timestamp")
    assert isinstance(out.schema["timestamp"].dataType, TimestampType)
    # UTC session: wall clock must be preserved, not shifted
    vals = {r["timestamp"] for r in out.select("timestamp").collect()}
    assert datetime.datetime(2024, 1, 1, 0, 30, 0) in vals


def test_sessionizer_ntz_matches_tz(spark):
    from replay_spark.preprocessing.sessionizer import Sessionizer

    tz, ntz = _frames(spark)
    sess = Sessionizer(
        user_column="user_id",
        time_column="timestamp",
        session_gap=3600 * 24,
        tiebreak_columns=["item_id"],
    )
    assert _sorted_rows(sess.transform(tz)) == _sorted_rows(sess.transform(ntz))


def test_time_splitter_fraction_ntz_matches_tz(spark):
    from replay_spark.splitters.splitters import TimeSplitter

    tz, ntz = _frames(spark)
    sp = TimeSplitter(time_threshold=0.25, timestamp_column="timestamp")
    tr_tz, te_tz = sp.split(tz)
    tr_ntz, te_ntz = sp.split(ntz)
    assert _sorted_rows(tr_tz) == _sorted_rows(tr_ntz)
    assert _sorted_rows(te_tz) == _sorted_rows(te_ntz)


def test_log_stat_features_ntz_keeps_ts_features(spark):
    from replay_spark.preprocessing.history_based_fp import (
        LogStatFeaturesProcessor,
    )

    tz, ntz = _frames(spark)
    for frame in (tz, ntz):
        proc = LogStatFeaturesProcessor(
            query_column="user_id",
            item_column="item_id",
            timestamp_column="timestamp",
            rating_column="rating",
        )
        proc.fit(frame)
        # round-2 bug: NTZ silently dropped the timestamp features
        assert proc.calc_timestamp_based is True


def test_time_decay_ntz_matches_tz(spark):
    from replay_spark.utils.time_decay import smoothe_time

    tz, ntz = _frames(spark)
    assert _sorted_rows(smoothe_time(tz)) == _sorted_rows(smoothe_time(ntz))


def test_sequence_tokenizer_ntz_matches_tz(spark):
    from replay_spark.data.nn import SequenceTokenizer

    tz, ntz = _frames(spark)
    tok = SequenceTokenizer(
        query_column="user_id",
        item_column="item_id",
        timestamp_column="timestamp",
        rating_column="rating",
    )
    assert _sorted_rows(tok.transform(tz)) == _sorted_rows(tok.transform(ntz))


def test_read_table_returns_timestamp_type(spark):
    from replay_spark.datasets import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
