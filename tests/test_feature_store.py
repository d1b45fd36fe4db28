"""Feature-store read path: point-in-time joins, ttl staleness,
lake-pinned versions + pruned scans, and asof nearest direction."""

import datetime
import tempfile

import pytest
from pyspark.sql import functions as F

from replay_spark.feature_store import FeatureStore, FeatureView


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_point_in_time_join_no_leakage_and_ttl(spark):
    """Each spine row sees the latest feature AT OR BEFORE its time
    (never later), and features staler than ttl attach as null."""
    spine = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(12)), (2, _ts(10)), (3, _ts(10))],
        "user_id long, ts timestamp",
    )
    feats = spark.createDataFrame(
        [
            (1, _ts(9), 100.0),   # fresh for both user-1 rows
            (1, _ts(11), 110.0),  # only for the 12:00 row (no leakage)
            (2, _ts(1), 200.0),   # 9h stale -> beyond 4h ttl
        ],
        "user_id long, ts timestamp, score double",
    )
    fs = FeatureStore(
        [
            FeatureView(
                name="user",
                source=feats,
                entity_columns=["user_id"],
                ttl_seconds=4 * 3600,
            )
        ]
    )
    out = fs.point_in_time_join(spine)
    got = {
        (r.user_id, r.ts.hour): r.user__score for r in out.collect()
    }
    assert got == {
        (1, 10): 100.0,
        (1, 12): 110.0,  # latest within ttl, not the 9:00 row
        (2, 10): None,   # stale beyond ttl
        (3, 10): None,   # no history at all
    }


def test_point_in_time_join_multi_view_prefixes(spark):
    spine = spark.createDataFrame(
        [(1, _ts(10))], "user_id long, ts timestamp"
    )
    v1 = spark.createDataFrame(
        [(1, _ts(9), 1.0)], "user_id long, ts timestamp, a double"
    )
    v2 = spark.createDataFrame(
        [(1, _ts(8), 2.0)], "user_id long, ts timestamp, a double"
    )
    fs = FeatureStore(
        [
            FeatureView("x", v1, ["user_id"]),
            FeatureView("y", v2, ["user_id"]),
        ]
    )
    out = fs.point_in_time_join(spine)
    assert set(out.columns) == {"user_id", "ts", "x__a", "y__a"}
    r = out.collect()[0]
    assert (r.x__a, r.y__a) == (1.0, 2.0)
    with pytest.raises(ValueError, match="duplicate view names"):
        FeatureStore(
            [FeatureView("x", v1, ["user_id"]), FeatureView("x", v2, ["user_id"])]
        )


def test_point_in_time_join_lake_pinned_version(spark):
    """A lake-backed view reads the PINNED snapshot: feature writes
    after the pin do not change the training set; the scan is
    stats-pruned to the spine's time interval."""
    from replay_spark.lake import LakeTable

    path = tempfile.mkdtemp(prefix="rs_fs_")
    table = LakeTable(spark, path)
    try:
        early = spark.createDataFrame(
            [(1, _ts(9), 10.0), (2, _ts(9), 20.0)],
            "user_id long, ts timestamp, bal double",
        )
        # a second file far in the future -> prunable
        future = spark.createDataFrame(
            [(1, datetime.datetime(2030, 1, 1), 999.0)],
            "user_id long, ts timestamp, bal double",
        )
        table.append(early.coalesce(1))   # v0
        table.append(future.coalesce(1))  # v1
        spine = spark.createDataFrame(
            [(1, _ts(10)), (2, _ts(10))], "user_id long, ts timestamp"
        )
        fs = FeatureStore(
            [
                FeatureView(
                    "acct", table, ["user_id"], version=1
                )
            ]
        )
        out = {r.user_id: r.acct__bal for r in fs.point_in_time_join(spine).collect()}
        assert out == {1: 10.0, 2: 20.0}
        # overwrite AFTER the pin: pinned join result unchanged
        table.overwrite(
            spark.createDataFrame(
                [(1, _ts(9), -1.0)],
                "user_id long, ts timestamp, bal double",
            )
        )
        out2 = {r.user_id: r.acct__bal for r in fs.point_in_time_join(spine).collect()}
        assert out2 == out
        # pruning actually skips the 2030 file
        pruned, kept, total = table.read_where(
            {"ts": (_ts(0), _ts(23))}, version=1
        )
        assert kept < total
    finally:
        table.drop()


def test_asof_join_nearest_direction(spark):
    """nearest: picks the closer side, ties go backward, tolerance
    applies to both sides independently."""
    from replay_spark.utils.spark_utils import asof_join

    left = spark.createDataFrame(
        [(1, _ts(10)), (2, _ts(10)), (3, _ts(10)), (4, _ts(10))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(9), "b"), (1, _ts(10, 30), "f"),   # forward closer
            (2, _ts(9), "b"), (2, _ts(11), "f"),       # tie -> backward
            (3, _ts(6), "b"),                           # only backward, stale
            (4, _ts(10, 10), "f"),                      # only forward, fresh
        ],
        "k long, ts timestamp, tag string",
    )
    out = asof_join(
        left, right, on="ts", by="k",
        direction="nearest", tolerance=3600.0,
    )
    got = {r.k: r.tag_right for r in out.collect()}
    assert got == {1: "f", 2: "b", 3: None, 4: "f"}


def test_asof_join_nearest_no_tolerance(spark):
    from replay_spark.utils.spark_utils import asof_join

    left = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(1), 5.0)], "k long, ts timestamp, v double"
    )
    out = asof_join(left, right, on="ts", by="k", direction="nearest")
    assert out.collect()[0].v_right == 5.0


def test_point_in_time_join_feature_named_like_spine_ts(spark):
    """A feature column literally named like the spine timestamp must
    not make the as-of 'on' column ambiguous (r9 ADVICE): it is moved
    aside internally and comes back under its real name."""
    spine = spark.createDataFrame(
        [(1, _ts(10))], "user_id long, ts timestamp"
    )
    feats = spark.createDataFrame(
        [(1, _ts(9), _ts(8), 5.0)],
        "user_id long, obs_ts timestamp, ts timestamp, score double",
    )
    fs = FeatureStore(
        [
            FeatureView(
                name="u",
                source=feats,
                entity_columns=["user_id"],
                timestamp_column="obs_ts",
            )
        ]
    )
    out = fs.point_in_time_join(spine)
    row = out.collect()[0]
    assert row.u__score == 5.0
    assert row.u__ts == _ts(8)          # the shadowed feature survives
    assert row.ts == _ts(10)            # spine time untouched


def test_point_in_time_join_entity_collision_raises(spark):
    spine = spark.createDataFrame(
        [(1, _ts(10))], "ts long, t timestamp"
    )
    feats = spark.createDataFrame(
        [(1, _ts(9), 5.0)], "ts long, obs_ts timestamp, score double"
    )
    fs = FeatureStore(
        [
            FeatureView(
                name="u",
                source=feats,
                entity_columns=["ts"],
                timestamp_column="obs_ts",
            )
        ]
    )
    with pytest.raises(ValueError, match="collides"):
        fs.point_in_time_join(spine, spine_ts="ts")


def test_point_in_time_join_numeric_epoch_ttl_prune(spark, tmp_path):
    """ttl lookback on a numeric-epoch spine timestamp must subtract
    seconds numerically, not via timedelta (r9 ADVICE TypeError)."""
    from replay_spark.lake import LakeTable

    t = LakeTable(spark, str(tmp_path / "epoch_feats"))
    t.append(
        spark.createDataFrame(
            [(1, 1000.0, 7.0)], "user_id long, obs_ts double, f double"
        ).coalesce(1)
    )
    spine = spark.createDataFrame(
        [(1, 1900.0)], "user_id long, obs_ts double"
    )
    fs = FeatureStore(
        [
            FeatureView(
                name="u",
                source=t,
                entity_columns=["user_id"],
                timestamp_column="obs_ts",
                ttl_seconds=3600.0,
            )
        ]
    )
    out = fs.point_in_time_join(spine, spine_ts="obs_ts", prune=True)
    assert out.collect()[0].u__f == 7.0
