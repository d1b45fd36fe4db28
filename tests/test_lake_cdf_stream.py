"""LakeChangeStream: micro-batch CDF tailing from a durable cursor —
rate limiting, restart-from-cursor, and exactly-once composition
with the lake's txn-marked sinks."""

import pyspark.sql.functions as F
import pytest

from replay_spark.lake import LakeTable
from replay_spark.streaming import LakeChangeStream


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "src"))
    t.append(spark.range(0, 50).select("id", (F.col("id") * 2).alias("v")))
    t.append(spark.range(50, 100).select("id", (F.col("id") * 2).alias("v")))
    t.delete("id % 10 = 3", mode="dv")
    t.update("id = 4", {"v": "999"}, mode="dv")
    t.append(spark.range(100, 120).select("id", (F.col("id") * 2).alias("v")))
    return t


def _fold(rows):
    """Replay a change feed into final (id -> v) state."""
    state = {}
    for r in sorted(
        rows, key=lambda r: (r["_commit_version"], r["_change_type"])
    ):
        if r["_change_type"] == "delete":
            state.pop(r["id"], None)
        else:
            state[r["id"]] = r["v"]
    return state


def test_stream_equals_batch_changes(table, tmp_path):
    stream = LakeChangeStream(
        table,
        str(tmp_path / "ckpt"),
        starting_version=-1,
        max_commits_per_batch=2,
    )
    batches = []

    def grab(df, end):
        batches.append((end, df.collect()))

    n = stream.process_available(grab)
    tip = table.latest_version()
    # rate limit respected: slices of <= 2 commits, covering the log
    assert n >= 2
    ends = [e for e, _ in batches]
    assert ends[-1] == tip and ends == sorted(ends)
    prev = -1
    for e in ends:
        assert e - prev <= 2
        prev = e
    # streamed batches, folded, equal the batch feed folded AND the
    # live snapshot
    streamed = [r for _, rows in batches for r in rows]
    want = table.changes(-1, tip).collect()
    assert _fold(streamed) == _fold(want)
    snap = {r["id"]: r["v"] for r in table.read().collect()}
    assert _fold(streamed) == snap
    # drained: nothing pending
    assert stream.next_batch() is None


def test_restart_resumes_from_cursor(table, tmp_path, spark):
    ck = str(tmp_path / "ckpt")
    s1 = LakeChangeStream(
        table, ck, starting_version=-1, max_commits_per_batch=1
    )
    s1.process_available(lambda df, end: None, max_batches=2)
    assert s1.cursor() == 1
    # a NEW stream object on the same checkpoint resumes exactly there
    s2 = LakeChangeStream(table, ck, max_commits_per_batch=100)
    df, end = s2.next_batch()
    assert end == table.latest_version()
    versions = {
        r["_commit_version"] for r in df.select("_commit_version").collect()
    }
    assert min(versions) >= 2  # commits 0-1 never re-delivered


def test_fresh_cursor_defaults_to_new_changes_only(table, tmp_path, spark):
    stream = LakeChangeStream(table, str(tmp_path / "ckpt"))
    assert stream.next_batch() is None  # at the tip: nothing pending
    table.append(
        spark.range(200, 205).select("id", (F.col("id") * 2).alias("v"))
    )
    df, end = stream.next_batch()
    assert end == table.latest_version()
    assert sorted(r["id"] for r in df.collect()) == list(range(200, 205))


def test_exactly_once_pipe_with_crash_replay(table, tmp_path, spark):
    sink = LakeTable(spark, str(tmp_path / "sink"))
    ck = str(tmp_path / "ckpt")
    stream = LakeChangeStream(
        table, ck, starting_version=-1, max_commits_per_batch=2
    )
    # simulate a crash AFTER the sink landed but BEFORE the cursor
    # advanced: the batch will be replayed with the same batch id
    df, end = stream.next_batch()
    sink.append_batch(df, app_id="lake-cdf@" + ck, batch_id=end)
    # (crash here: no stream.commit) — now recover and drain fully
    stream.pipe_to(sink)
    got = sink.read()
    want = table.changes(-1, table.latest_version())
    assert got.count() == want.count()  # no duplicate batch rows
    assert _fold(got.collect()) == _fold(want.collect())


def test_checkpoint_table_mismatch_raises(table, tmp_path, spark):
    ck = str(tmp_path / "ckpt")
    s1 = LakeChangeStream(table, ck, starting_version=-1)
    s1.process_available(lambda df, end: None, max_batches=1)
    other = LakeTable(spark, str(tmp_path / "other"))
    other.append(spark.range(3).select("id", F.col("id").alias("v")))
    with pytest.raises(ValueError, match="belongs to"):
        LakeChangeStream(other, ck).next_batch()


def test_cursor_moves_forward_only(table, tmp_path):
    stream = LakeChangeStream(table, str(tmp_path / "ckpt"))
    stream.commit(table.latest_version())
    with pytest.raises(ValueError, match="forward"):
        stream.commit(0)


def test_stream_below_vacuum_horizon_raises_clear_error(
    spark, tmp_path
):
    """A backlogged cursor below the vacuum horizon raises the clear
    below-horizon error AT BATCH-PLAN TIME (the same one time travel
    raises), not a raw file-read failure mid-job."""
    t = LakeTable(spark, str(tmp_path / "src"))
    for i in range(3):
        t.append(
            spark.range(i * 10, (i + 1) * 10).select(
                "id", (F.col("id") * 2).alias("v")
            )
        )
    t.compact()
    t.vacuum(retain_last=1)
    stream = LakeChangeStream(
        t, str(tmp_path / "ckpt"), starting_version=-1
    )
    with pytest.raises(ValueError, match="no longer possible"):
        stream.next_batch()
