"""Funnel and cohort-retention analytics operators."""

import datetime as dt

import pytest
from pyspark.sql import functions as F  # noqa: F401

from replay_spark.analytics import CohortRetention, FunnelAnalyzer


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def test_funnel_ordered_steps_and_window(spark):
    rows = [
        # user 1 completes all three inside the window
        (1, _ts(0), "view"), (1, _ts(5), "click"), (1, _ts(10), "buy"),
        # user 2: click BEFORE view -> never reaches step 2
        (2, _ts(5), "click"), (2, _ts(10), "view"),
        # user 3: completes steps 1-2, step 3 lands past the window
        (3, _ts(0), "view"), (3, _ts(30), "click"), (3, _ts(90), "buy"),
        # user 4: same-time click (NOT strictly after) -> drops out
        (4, _ts(0), "view"), (4, _ts(0), "click"),
        # user 5: never does step 1
        (5, _ts(0), "buy"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, et string")
    funnel = FunnelAnalyzer(
        ["et = 'view'", "et = 'click'", "et = 'buy'"],
        window_seconds=3600,
    )
    per_user = {r.user_id: r for r in funnel.transform(df).collect()}
    assert set(per_user) == {1, 2, 3, 4}  # user 5 never enters
    assert per_user[1].step_3 is not None
    assert per_user[2].step_2 is None
    assert per_user[3].step_2 is not None and per_user[3].step_3 is None
    assert per_user[4].step_2 is None  # strict ordering
    counts = {r.step: r.n_users for r in funnel.counts(df).collect()}
    assert counts == {1: 4, 2: 2, 3: 1}

    # window=None disables the cap: user 3's late buy now counts
    loose = FunnelAnalyzer(
        ["et = 'view'", "et = 'click'", "et = 'buy'"],
        window_seconds=None,
    )
    lc = {r.step: r.n_users for r in loose.counts(df).collect()}
    assert lc[3] == 2
    with pytest.raises(ValueError, match="two steps"):
        FunnelAnalyzer(["et = 'view'"])


def test_cohort_retention_matrix(spark):
    day = 24 * 3600
    rows = [
        # cohort day 0: users 1, 2; user 1 returns day 1 and 3,
        # user 2 returns day 1 only (two events same day dedupe)
        (1, _ts(0)), (1, _ts(24 * 60)), (1, _ts(3 * 24 * 60)),
        (2, _ts(10)), (2, _ts(24 * 60)), (2, _ts(24 * 60 + 5)),
        # cohort day 2: user 3, never returns
        (3, _ts(2 * 24 * 60)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    ret = CohortRetention(bucket_seconds=day)
    out = {
        (r.cohort_bucket, r.offset): r.n_active
        for r in ret.transform(df).collect()
    }
    c0 = min(b for (b, _) in out)
    assert out[(c0, 0)] == 2       # cohort size
    assert out[(c0, 1)] == 2       # both return day 1
    assert out[(c0, 3)] == 1       # only user 1
    assert (c0, 2) not in out      # nobody active day 2
    assert out[(c0 + 2, 0)] == 1   # user 3's cohort
    # max_offset trims the matrix
    trimmed = CohortRetention(bucket_seconds=day, max_offset=1)
    assert max(r.offset for r in trimmed.transform(df).collect()) <= 1
    with pytest.raises(ValueError, match="bucket_seconds"):
        CohortRetention(bucket_seconds=0)


def test_transition_matrix(spark):
    rows = [
        (1, _ts(0), 1, "a"), (1, _ts(1), 2, "b"), (1, _ts(2), 3, "a"),
        (2, _ts(0), 4, "a"), (2, _ts(1), 5, "b"),
        (3, _ts(0), 6, "c"),  # single event: no transitions
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, eid long, event_type string"
    )
    from replay_spark.analytics import TransitionMatrix

    tm = TransitionMatrix(tiebreak_column="eid")
    out = {(r.from_state, r.to_state): (r.n, r.prob_ppm)
           for r in tm.transform(df).collect()}
    assert out[("a", "b")] == (2, 1000000)  # a always goes to b
    assert out[("b", "a")] == (1, 1000000)
    assert ("c", "a") not in out and len(out) == 2


def test_ab_test_summary(spark):
    from replay_spark.analytics import ab_test_summary

    rows = [("A", v) for v in (10, 20, 30)] + [("B", v) for v in (5, 5)]
    rows.append(("A", None))
    df = spark.createDataFrame(rows, "variant string, m long")
    out = {r.variant: r for r in ab_test_summary(df, "variant", "m").collect()}
    a = out["A"]
    assert (a.n, a.metric_sum, a.metric_sumsq) == (3, 60, 1400)
    assert a.mean == 20.0
    assert a.variance == 100.0  # sample variance of 10,20,30
    b = out["B"]
    assert b.variance == 0.0 and b.mean == 5.0


def test_calibration_report_and_ece(spark):
    """Bin assignment (conf=1.0 folds into the top bin), exact
    integer stats, and the ECE fold."""
    from replay_spark.analytics import CalibrationReport

    rows = [
        (0.05, 0), (0.05, 0),          # bin 0: acc 0, conf 0.05
        (0.95, 1), (0.95, 1),          # bin 9: acc 1, conf 0.95
        (1.0, 1),                      # conf 1.0 -> bin 9
        (0.55, 1), (0.55, 0),          # bin 5: acc 0.5, conf 0.55
        (None, 1),                     # dropped
    ]
    df = spark.createDataFrame(rows, "confidence double, label int")
    cr = CalibrationReport(n_bins=10)
    rep = {r.bin: (r.n, r.n_pos, r.sum_conf_ppm)
           for r in cr.report(df).collect()}
    assert rep[0] == (2, 0, 100000)
    assert rep[9] == (3, 3, 2900000)   # 0.95+0.95+1.0 in ppm
    assert rep[5] == (2, 1, 1100000)
    ece = cr.ece(cr.report(df))
    # |0-0.05|*2/7 + |1-2.9/3|*3/7 + |0.5-0.55|*2/7
    want = (abs(0 - 0.05) * 2 + abs(1 - 2.9 / 3) * 3
            + abs(0.5 - 0.55) * 2) / 7
    assert abs(ece - want) < 1e-9
    import pytest as _p
    with _p.raises(ValueError):
        CalibrationReport(n_bins=0)


def test_calibration_null_labels_and_out_of_range_conf(spark):
    """NULL labels are dropped from ALL statistics (not silently
    counted in n while sum skips them in n_pos); out-of-contract
    confidences clamp to [0, 1] instead of minting negative bins."""
    from replay_spark.analytics import CalibrationReport

    rows = [
        (0.15, 1), (0.15, None),       # null label: fully dropped
        (-0.4, 0),                     # clamps to 0.0 -> bin 0
        (1.7, 1),                      # clamps to 1.0 -> bin 9
    ]
    df = spark.createDataFrame(rows, "confidence double, label int")
    rep = {r.bin: (r.n, r.n_pos, r.sum_conf_ppm)
           for r in CalibrationReport(n_bins=10).report(df).collect()}
    assert rep[1] == (1, 1, 150000)    # the null-label row is gone
    assert rep[0] == (1, 0, 0)         # clamped low
    assert rep[9] == (1, 1, 1000000)   # clamped high
    assert set(rep) == {0, 1, 9}


def test_drift_report_bins_psi_chi2(spark):
    """Numeric quantile bins from the REFERENCE side, categorical
    top-K + OTHER, NULL bucket on both sides, zero-filled full outer
    bins, and the psi/chi2 driver folds."""
    from replay_spark.analytics import DriftReport

    ref_rows = [(float(i), "a" if i % 2 else "b") for i in range(1, 21)]
    ref_rows.append((None, None))
    ref = spark.createDataFrame(ref_rows, "x double, c string")
    # current: shifted distribution + a category the ref never saw
    cur_rows = [(float(i) + 10.0, "a") for i in range(1, 21)]
    cur_rows += [(5.0, "z"), (None, "a")]
    cur = spark.createDataFrame(cur_rows, "x double, c string")

    dr = DriftReport(
        numeric_columns=["x"], categorical_columns=["c"], n_bins=4
    ).fit(ref)
    # edges = exact quartiles of 1..20: ranks ceil(5)=5, 10, 15
    assert dr.edges_["x"] == [5.0, 10.0, 15.0]
    # categories by (count desc, value asc): 'a' (10) ties 'b' (10)
    assert dr.cats_["c"] == ["a", "b"]

    rep = {
        (r["column"], r["bin"]): (r["n_ref"], r["n_cur"])
        for r in dr.report(cur).collect()
    }
    # ref x: bins 0..3 hold 4,5,5,6 (v>=edge count), null bucket 1
    assert rep[("x", -1)] == (1, 1)
    assert rep[("x", 0)] == (4, 0)      # cur has nothing below 5
    assert rep[("x", 3)][0] == 6
    assert rep[("x", 3)][1] == 16       # cur mass piled at the top
    # categorical: 'z' is OTHER (bin 2), present only in cur
    assert rep[("c", 2)] == (0, 1)
    assert rep[("c", -1)] == (1, 0)
    assert rep[("c", 0)] == (10, 21)

    out = dr.report(cur)
    psi = DriftReport.psi(out)
    chi2 = DriftReport.chi2(out)
    assert psi["x"] > 0.25, psi          # major numeric drift
    assert psi["c"] > 0.1
    assert chi2["x"] > 0 and chi2["c"] > 0
    # no drift -> psi ~ 0
    same = dr.report(ref)
    assert DriftReport.psi(same)["x"] < 1e-9

    with pytest.raises(ValueError):
        DriftReport()
    with pytest.raises(ValueError, match="fit before"):
        DriftReport(numeric_columns=["x"]).report(cur)


def test_drift_report_segmented(spark):
    """segment_column: global edges, per-(segment, column) counts
    and psi — the drifted segment stands out while the stable one
    reads ~0."""
    from replay_spark.analytics import DriftReport

    ref = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 21)]
        + [("b", float(i)) for i in range(1, 21)],
        "seg string, x double",
    )
    cur = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 21)]          # unchanged
        + [("b", float(i) + 12.0) for i in range(1, 21)],  # shifted
        "seg string, x double",
    )
    dr = DriftReport(
        numeric_columns=["x"], n_bins=4, segment_column="seg"
    ).fit(ref)
    rep = dr.report(cur)
    assert set(rep.columns) == {"segment", "column", "bin", "n_ref", "n_cur"}
    rows = {(r.segment, r.bin): (r.n_ref, r.n_cur) for r in rep.collect()}
    assert rows[("a", 0)][0] == rows[("a", 0)][1]        # stable seg
    assert rows[("b", 3)][1] > rows[("b", 3)][0]         # piled high
    psi = DriftReport.psi(rep)
    assert psi[("a", "x")] < 1e-9
    assert psi[("b", "x")] > 0.25
    chi2 = DriftReport.chi2(rep)
    assert chi2[("b", "x")] > chi2[("a", "x")]
