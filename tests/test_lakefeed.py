"""Native readStream source for LakeTable (PySpark Python
DataSource): append tailing, restart exactly-once via Spark's own
checkpoint, rate limiting, change-commit semantics, column mapping."""

import os

import pyspark.sql.functions as F
import pytest

from replay_spark.lake import LakeTable
from replay_spark.streaming import register_lakefeed


@pytest.fixture(autouse=True)
def _register(spark):
    register_lakefeed(spark)


def _drain(spark, path, out, ck, **options):
    reader = (
        spark.readStream.format("lakefeed")
        .option("path", path)
        .option("startingVersion", "-1")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_lakefeed_tails_appends_exactly_once(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.append(spark.range(0, 50).select("id", (F.col("id") * 2).alias("v")))
    t.append(spark.range(50, 100).select("id", (F.col("id") * 2).alias("v")))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain(spark, t.path, out, ck)
    assert spark.read.parquet(out).count() == 100
    # restart from Spark's checkpoint: ONLY the new append flows
    t.append(spark.range(100, 120).select("id", (F.col("id") * 2).alias("v")))
    _drain(spark, t.path, out, ck)
    got = spark.read.parquet(out)
    assert got.count() == 120 and got.distinct().count() == 120
    assert got.agg(F.sum("id")).collect()[0][0] == sum(range(120))


def test_lakefeed_rate_limit_bounds_batches(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.append(spark.range(0, 10).select("id", (F.col("id") * 2).alias("v")))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    # every batch honors maxCommitsPerTrigger; append AFTER the
    # stream opens and count the planned batches
    q = (
        spark.readStream.format("lakefeed")
        .option("path", t.path)
        .option("startingVersion", "-1")
        .option("maxCommitsPerTrigger", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    q.processAllAvailable()
    for i in range(1, 4):
        t.append(
            spark.range(i * 10, i * 10 + 10).select(
                "id", (F.col("id") * 2).alias("v")
            )
        )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 40 and got.distinct().count() == 40
    # one offset file per planned micro-batch: the 3 appended commits
    # arrive rate-limited at 1 commit/batch after the initial batch
    offsets = [
        n for n in os.listdir(os.path.join(ck, "offsets"))
        if not n.startswith(".")
    ]
    assert len(offsets) >= 4


def test_lakefeed_first_batch_honors_rate_limit(spark, tmp_path):
    """A FRESH stream over a 10-commit backlog with
    maxCommitsPerTrigger=2 catches up in 5 bounded micro-batches —
    the engine asks latestOffset before initialOffset, and the
    source bounds from the resolved starting version instead of
    draining the whole backlog into one giant batch."""
    t = LakeTable(spark, str(tmp_path / "t"))
    for i in range(10):
        t.append(
            spark.range(i * 10, i * 10 + 10).select(
                "id", (F.col("id") * 2).alias("v")
            )
        )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("lakefeed")
        .option("path", t.path)
        .option("startingVersion", "-1")
        .option("maxCommitsPerTrigger", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 100 and got.distinct().count() == 100
    # one offset file per planned micro-batch: 10 commits at
    # 2/trigger = at least 5 planned batches (was 1 when the first
    # batch drained to the tip)
    offsets = [
        n for n in os.listdir(os.path.join(ck, "offsets"))
        if not n.startswith(".")
    ]
    assert len(offsets) >= 5


def test_lakefeed_mid_stream_schema_change_fails(spark, tmp_path):
    """A rename or shape-changing commit AFTER the session tip fails
    the stream (Delta semantics: restart to adopt the new schema);
    schema history at or below the session tip stays replayable."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    t = LakeTable(spark, str(tmp_path / "t"))
    t.append(spark.range(0, 20).select("id", (F.col("id") * 2).alias("v")))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("lakefeed")
        .option("path", t.path)
        .option("startingVersion", "-1")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    q.processAllAvailable()
    t.rename_column("v", "value")
    t.append(
        spark.range(20, 30).select("id", (F.col("id") * 2).alias("value"))
    )
    with pytest.raises(StreamingQueryException, match="restart the stream"):
        q.processAllAvailable()
        q.awaitTermination(60)
    # a fresh session re-resolves schema() + the rename map at the
    # new tip and replays the whole history under the new names
    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    _drain(spark, t.path, out2, ck2)
    got = spark.read.parquet(out2)
    assert set(got.columns) == {"id", "value"}
    assert got.count() == 30 and got.distinct().count() == 30


def test_lakefeed_change_commit_fails_without_option(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    t = LakeTable(spark, str(tmp_path / "t"))
    t.append(spark.range(0, 50).select("id", (F.col("id") * 2).alias("v")))
    t.delete("id < 5", mode="dv")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    with pytest.raises(StreamingQueryException, match="skipChangeCommits"):
        _drain(spark, t.path, out, ck)


def test_lakefeed_skip_change_commits(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.append(spark.range(0, 50).select("id", (F.col("id") * 2).alias("v")))
    t.delete("id < 5", mode="dv")          # change commit: skipped
    t.compact()                            # layout-only: ignored
    t.append(spark.range(50, 60).select("id", (F.col("id") * 2).alias("v")))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain(spark, t.path, out, ck, skipChangeCommits="true")
    got = spark.read.parquet(out)
    # appends stream their rows as appended (Delta semantics): the
    # dv-delete is skipped, the compact adds nothing, no duplicates
    assert got.count() == 60 and got.distinct().count() == 60


def test_lakefeed_presents_logical_names_on_mapped_table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.append(spark.range(0, 30).select("id", (F.col("id") * 2).alias("v")))
    t.rename_column("v", "value")
    t.append(
        spark.range(30, 40).select("id", (F.col("id") * 2).alias("value"))
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain(spark, t.path, out, ck)
    got = spark.read.parquet(out)
    assert set(got.columns) == {"id", "value"}
    assert got.count() == 40
    assert (
        got.agg(F.sum("value")).collect()[0][0]
        == sum(2 * i for i in range(40))
    )


def test_lakefeed_composes_with_streaming_agg(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.append(spark.range(0, 100).select("id", (F.col("id") % 5).alias("g")))
    agg = (
        spark.readStream.format("lakefeed")
        .option("path", t.path)
        .option("startingVersion", "-1")
        .load()
        .groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("id").alias("s"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("lakefeed_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {r["g"]: (r["n"], r["s"]) for r in spark.table("lakefeed_agg").collect()}
    assert rows == {
        g: (20, sum(i for i in range(100) if i % 5 == g)) for g in range(5)
    }


def test_lakefeed_below_vacuum_horizon_raises_clear_error(spark, tmp_path):
    """append x3 -> compact -> vacuum(retain_last=1) -> fresh stream
    with startingVersion=-1: the batch plan raises the clear
    below-horizon error, not a mid-job executor read failure."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    t = LakeTable(spark, str(tmp_path / "t"))
    for i in range(3):
        t.append(
            spark.range(i * 10, (i + 1) * 10).select(
                "id", (F.col("id") * 2).alias("v")
            )
        )
    t.compact()
    t.vacuum(retain_last=1)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    with pytest.raises(
        StreamingQueryException, match="below the vacuum horizon"
    ):
        _drain(spark, t.path, out, ck)


def test_lakefeed_available_now_default_drains_backlog(spark, tmp_path):
    """Without maxCommitsPerTrigger, every batch drains to the tip —
    so Trigger.AvailableNow (single-batch for Python sources)
    processes the WHOLE backlog. Rate limiting is opt-in; this pins
    the default posture."""
    t = LakeTable(spark, str(tmp_path / "t"))
    for i in range(6):
        t.append(
            spark.range(i * 10, (i + 1) * 10).select(
                "id", (F.col("id") * 2).alias("v")
            )
        )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain(spark, t.path, out, ck)
    got = spark.read.parquet(out)
    assert got.count() == 60 and got.distinct().count() == 60


def test_lakefeed_rate_limited_restart_mid_backlog(spark, tmp_path):
    """Stop a rate-limited stream mid-catch-up and restart from the
    checkpoint: the replayed partitions() call anchors the rate
    cursor at the checkpoint, so the new session stays bounded and
    the table lands exactly once."""
    t = LakeTable(spark, str(tmp_path / "t"))
    for i in range(10):
        t.append(
            spark.range(i * 10, (i + 1) * 10).select(
                "id", (F.col("id") * 2).alias("v")
            )
        )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run(stop_early):
        q = (
            spark.readStream.format("lakefeed")
            .option("path", t.path)
            .option("startingVersion", "-1")
            .option("maxCommitsPerTrigger", "3")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(processingTime="50 milliseconds")
            .start()
        )
        if stop_early:
            import time

            deadline = time.time() + 60
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= 30:
                        break
                except Exception:
                    pass
                time.sleep(0.2)
        else:
            q.processAllAvailable()
        q.stop()

    run(stop_early=True)
    mid = spark.read.parquet(out).count()
    assert 30 <= mid < 100, mid  # stopped mid-backlog, bounded slices
    run(stop_early=False)
    got = spark.read.parquet(out)
    assert got.count() == 100 and got.distinct().count() == 100
    # at 3 commits/trigger, 10 commits need >= 4 planned batches
    # across both sessions
    offsets = [
        n for n in os.listdir(os.path.join(ck, "offsets"))
        if not n.startswith(".")
    ]
    assert len(offsets) >= 4


def test_lakefeed_cursor_at_horizon_minus_one_still_reads(spark, tmp_path):
    """Off-by-one guard (r14 advice): a batch (lo, hi] reads commits
    >= lo+1, so a checkpoint sitting at exactly horizon-1 is fully
    readable — the vacuum guard must NOT fail it. Drain to the tip,
    compact+vacuum so the horizon moves past the drained commits,
    append once more, and restart from the checkpoint: the new commit
    flows and nothing raises."""
    t = LakeTable(spark, str(tmp_path / "t"))
    for i in range(3):
        t.append(
            spark.range(i * 10, (i + 1) * 10).select(
                "id", (F.col("id") * 2).alias("v")
            )
        )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain(spark, t.path, out, ck)  # checkpoint now at the tip (v2)
    assert spark.read.parquet(out).count() == 30
    # horizon moves to the compact commit; checkpoint (v2) == h-1
    t.compact()  # v3
    t.vacuum(retain_last=1)
    h = t._vacuum_horizon()
    assert h == 3
    t.append(
        spark.range(30, 40).select("id", (F.col("id") * 2).alias("v"))
    )  # v4
    _drain(spark, t.path, out, ck)  # must not raise; reads v4 only
    got = spark.read.parquet(out)
    assert got.count() == 40 and got.distinct().count() == 40


def test_lakefeed_partitions_rejects_offset_regression(spark, tmp_path):
    """Defensive protocol check (r14 advice): hi < lo means the rate
    cursor lost the checkpoint position; planning an empty batch
    would move the checkpoint backwards and duplicate commits on the
    next batch. partitions() must raise, not plan."""
    from replay_spark.streaming.lakefeed import _LakeFeedReader

    t = LakeTable(spark, str(tmp_path / "t"))
    t.append(spark.range(0, 10).select("id", (F.col("id") * 2).alias("v")))
    t.append(spark.range(10, 20).select("id", (F.col("id") * 2).alias("v")))
    reader = _LakeFeedReader(t.path, t.read().schema, {})
    with pytest.raises(RuntimeError, match="offset regression"):
        reader.partitions({"version": 1}, {"version": 0})


def test_lakefeed_vacuum_error_advice_is_followable(spark, tmp_path):
    """The below-horizon error must name a startingVersion that, when
    followed literally, reads the commit AT the horizon (cursor is
    exclusive — the stream reads commits AFTER it). Parse the advised
    value out of the message and verify a fresh stream from it drains
    the horizon commit's rows. (When the horizon commit is
    layout-only — e.g. a compact — the feed still opens cleanly from
    the advised version but correctly yields no rows for it; full
    contents then need a batch backfill + tail, Delta semantics.)"""
    import re as _re

    from pyspark.errors.exceptions.captured import StreamingQueryException

    t = LakeTable(spark, str(tmp_path / "t"))
    for i in range(2):
        t.append(
            spark.range(i * 10, (i + 1) * 10).select(
                "id", (F.col("id") * 2).alias("v")
            )
        )
    t.compact()  # v2
    t.append(
        spark.range(20, 30).select("id", (F.col("id") * 2).alias("v"))
    )  # v3
    t.vacuum(retain_last=1)
    h = t._vacuum_horizon()
    assert h >= 3  # horizon commit (v3) is an append
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    with pytest.raises(StreamingQueryException) as exc:
        _drain(spark, t.path, out, ck)
    m = _re.search(r"startingVersion=(-?\d+)", str(exc.value))
    assert m, str(exc.value)
    advised = int(m.group(1))
    assert advised == h - 1
    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    q = (
        spark.readStream.format("lakefeed")
        .option("path", t.path)
        .option("startingVersion", str(advised))
        .load()
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", ck2)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # the append AT the horizon flows; nothing raises
    got = spark.read.parquet(out2)
    assert got.count() == 10
    assert got.agg(F.sum("id")).collect()[0][0] == sum(range(20, 30))
