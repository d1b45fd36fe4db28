"""ConstraintSuite: one-pass Deequ-style data-quality verification."""

import pytest
from pyspark.sql import functions as F

from replay_spark.quality import ConstraintSuite


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "O", 10.0, "1-URGENT", 100),
            (2, "F", 0.0, "5-LOW", 200),
            (3, "P", -5.0, "3-MEDIUM", 100),
            (4, None, 30.0, "2-HIGH", 999),
            (5, "O", 40.0, "bad", 200),
            (5, "F", 50.0, "4-NOT SO", 100),
        ],
        "id long, status string, price double, prio string, fk long",
    )


def test_local_constraints_one_pass(frame):
    suite = (
        ConstraintSuite()
        .is_complete("id")
        .is_complete("status")
        .is_unique("id")
        .is_non_negative("price")
        .has_min("price", -10.0)
        .has_max("price", 100.0)
        .is_contained_in("status", ["O", "F", "P"])
        .matches_pattern("prio", r"^[1-5]-")
        .satisfies("price >= 0", "mostly_paid", min_fraction_ppm=800_000)
        .has_size(min_rows=2, max_rows=10)
    )
    rep = suite.run(frame)
    rows = {r.constraint: r for r in rep.collect()}
    assert rep.columns == [
        "constraint", "column", "metric_num", "metric_den", "passed",
    ]
    assert rows["complete(id)"].passed
    c = rows["complete(status)"]
    assert (not c.passed) and c.metric_num == 1 and c.metric_den == 6
    u = rows["unique(id)"]
    assert (not u.passed) and u.metric_num == 5 and u.metric_den == 6
    assert not rows["non_negative(price)"].passed
    assert rows["min(price)"].passed
    assert rows["max(price)"].passed
    assert rows["contained(status)"].passed  # null is not a violation
    p = rows["pattern(prio)"]
    assert (not p.passed) and p.metric_num == 1
    m = rows["mostly_paid"]
    assert m.passed and m.metric_num == 5  # 5/6 = 833333 ppm >= 800000
    assert rows["size"].passed

    # the ten row-local constraints fuse into a single aggregate:
    # the optimized plan reads the relation exactly once (the AQE
    # physical string prints initial+final sections, so count scans
    # in the logical plan where each relation appears once per read)
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1


def test_referential_integrity(frame, spark):
    dim = spark.createDataFrame([(100,), (200,)], "k long")
    rep = (
        ConstraintSuite()
        .is_referenced_in("fk", dim, "k")
        .is_complete("id")
        .run(frame)
    )
    rows = {r.constraint: r for r in rep.collect()}
    ri = rows["referenced(fk)"]
    assert (not ri.passed) and ri.metric_num == 1 and ri.metric_den == 6
    assert rows["complete(id)"].passed
    # orphan-free dim passes
    full = spark.createDataFrame([(100,), (200,), (999,)], "k long")
    ok = (
        ConstraintSuite()
        .is_referenced_in("fk", full, "k")
        .run(frame)
        .collect()[0]
    )
    assert ok.passed and ok.metric_num == 0


def test_suite_errors(frame):
    with pytest.raises(ValueError, match="duplicate"):
        ConstraintSuite().is_complete("id").is_complete("id")
    with pytest.raises(ValueError, match="empty"):
        ConstraintSuite().run(frame)
    with pytest.raises(ValueError, match="constraints failed"):
        ConstraintSuite().is_non_negative("price").assert_passed(frame)
    # assert_passed is silent on success
    ConstraintSuite().is_complete("id").assert_passed(frame)


def test_satisfies_null_predicate_counts_as_false(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 5)], "id long, v long"
    )
    r = (
        ConstraintSuite()
        .satisfies("v > 0", "v_pos", min_fraction_ppm=1_000_000)
        .run(df)
        .collect()[0]
    )
    assert r.metric_num == 1 and r.metric_den == 2 and not r.passed


def test_metric_repository_anomaly_detection(spark, tmp_path):
    import pytest as _pt

    from replay_spark.quality import ConstraintSuite, MetricRepository

    repo = MetricRepository(spark, str(tmp_path / "metrics"))
    suite = ConstraintSuite().is_complete("v")

    def batch(null_every):
        return spark.range(0, 1000).selectExpr(
            "id", f"CASE WHEN id % {null_every} = 0 THEN NULL ELSE id END AS v"
        )

    # five stable runs: ~0.1% nulls
    for i in range(5):
        repo.record(suite.run(batch(1000)), f"run-{i}", 100 + i)
    assert repo.history().count() == 5
    # a normal sixth run is not anomalous and records
    ok = suite.run(batch(1000))
    chk = repo.anomaly_check(ok, strategy="relative", threshold=0.5)
    assert all(not r.is_anomaly for r in chk.collect())
    repo.record_if_normal(ok, "run-5", 105, strategy="relative",
                          threshold=0.5)
    # a corrupted batch (20% nulls) is anomalous under relative AND
    # absolute strategies, and the gatekeeper refuses to record it
    bad = suite.run(batch(5))
    chk2 = repo.anomaly_check(bad, strategy="relative", threshold=0.5)
    flagged = [r for r in chk2.collect() if r.is_anomaly]
    assert flagged and flagged[0].n_history >= 1
    with _pt.raises(ValueError, match="anomalies"):
        repo.record_if_normal(bad, "run-6", 106, strategy="absolute",
                              threshold=0.05)
    assert repo.history().count() == 6  # the bad run never landed
    # stddev needs >= 2 history points and flags the same outlier
    chk3 = repo.anomaly_check(bad, strategy="stddev", threshold=3.0)
    assert any(r.is_anomaly for r in chk3.collect())


def test_streaming_quality_monitor(spark, tmp_path):
    from replay_spark.quality import (
        ConstraintSuite,
        MetricRepository,
        StreamingQualityMonitor,
    )

    repo = MetricRepository(spark, str(tmp_path / "sq"))
    suite = ConstraintSuite().is_complete("v")
    mon = StreamingQualityMonitor(
        repo, suite, strategy="relative", threshold=1.0
    )
    sink = mon.sink()

    def batch(null_every):
        return spark.range(0, 500).selectExpr(
            "id",
            f"CASE WHEN id % {null_every} = 0 THEN NULL ELSE id END AS v",
        )

    # three healthy micro-batches build history, no anomalies table
    for b in range(3):
        sink(batch(100), b)
    assert repo.history().count() == 3
    assert mon.anomalies.latest_version() < 0
    # a corrupted batch flags and lands in the anomalies table
    sink(batch(2), 3)
    rows = mon.anomalies.read().collect()
    assert rows and rows[0]["batch_id"] == 3 and rows[0]["is_anomaly"]
    # history keeps recording regardless (facts, not gatekeeping)
    assert repo.history().count() == 4


def test_streaming_quality_monitor_replay_idempotent(spark, tmp_path):
    """ADVICE r12: a replayed foreachBatch micro-batch (failure
    recovery) must not append duplicate history rows — duplicates
    would consume anomaly-window slots and collapse the stddev band
    toward zero."""
    from replay_spark.quality import (
        ConstraintSuite,
        MetricRepository,
        StreamingQualityMonitor,
    )

    repo = MetricRepository(spark, str(tmp_path / "sqr"))
    suite = ConstraintSuite().is_complete("v")
    mon = StreamingQualityMonitor(
        repo, suite, strategy="relative", threshold=1.0
    )
    sink = mon.sink()

    def batch(null_every):
        return spark.range(0, 200).selectExpr(
            "id",
            f"CASE WHEN id % {null_every} = 0 THEN NULL ELSE id END AS v",
        )

    sink(batch(100), 0)
    sink(batch(100), 1)
    sink(batch(100), 1)  # replayed micro-batch: exactly-once no-op
    assert repo.history().count() == 2
    assert (
        repo.history().select("run_key").distinct().count() == 2
    )
    # a replayed ANOMALOUS batch doesn't double-append flags either
    sink(batch(2), 2)
    sink(batch(2), 2)
    assert mon.anomalies.read().count() == 1
    assert repo.history().count() == 3
