"""Physical-plan regression tests — the PLANS.md claims, mechanized.

PLANS.md argues scale via plan shape (pushdown reaches the scan,
dimensions broadcast, aggregates map-side combine, top-k uses group
limits). These tests assert those properties on the live plans so a
refactor that silently loses one fails CI instead of a bench round.

Assertions are deliberately LOOSE (substring presence/absence, not
full plan text) so Spark-version formatting changes don't flake.
"""

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _nodes(plan: str) -> list:
    """One entry per physical node (the formatted detail headers) —
    the tree section repeats names, so raw substring counts double."""
    return re.findall(r"^\(\d+\) (\w+)", plan, re.M)


@pytest.fixture(scope="module")
def sf(spark):
    import replay_spark.datasets as rsd

    return lambda name: rsd.read_table(spark, SF_DIR, name)


def test_filter_pushdown_and_column_pruning(sf):
    """q_pricing_summary shape: the quantity predicate reaches the
    parquet scan and unused wide columns are pruned from ReadSchema."""
    li = sf("lineitem")
    df = (
        li.filter(F.col("l_quantity") < 30)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("s"))
    )
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "LessThan(l_quantity" in plan
    # projection needs 4 columns; a scan reading these would be wrong
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    for unused in ("l_shipdate", "l_extendedprice", "l_partkey"):
        assert unused not in read_schema[0], read_schema[0]


def test_aggregate_is_map_side_combined(sf):
    """groupBy aggregates must show the partial/final HashAggregate
    pair around ONE exchange — a single-phase agg would ship raw rows."""
    li = sf("lineitem")
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    plan = _plan(df)
    nodes = _nodes(plan)
    assert nodes.count("HashAggregate") == 2
    assert nodes.count("Exchange") == 1


def test_dimension_joins_broadcast(sf):
    """q_nation_revenue shape: both dimension joins broadcast; the
    fact side never shuffles before aggregation."""
    orders, customer, nation = sf("orders"), sf("customer"), sf("nation")
    df = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    nodes = _nodes(_plan(df))
    assert nodes.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in nodes
    # only the final aggregation exchanges; broadcasts are not shuffles
    assert nodes.count("Exchange") == 1, nodes


def test_top_k_uses_window_group_limit(sf):
    """get_top_k must plan a WindowGroupLimit (rank pushed into the
    shuffle) rather than ranking every row and filtering after."""
    from replay_spark.utils import get_top_k

    part = sf("part")
    df = get_top_k(
        part,
        partition_by_col=F.col("p_size"),
        order_by=[F.col("p_retailprice").desc(), F.col("p_partkey").asc()],
        k=3,
    )
    assert "WindowGroupLimit" in _plan(df)


def test_exact_dedup_single_shuffle(sf):
    """ExactDeduplicator.transform: one hash-key shuffle, no sort-based
    global ordering anywhere."""
    from replay_spark.preprocessing.dedup import ExactDeduplicator

    docs = sf("documents")
    nodes = _nodes(_plan(ExactDeduplicator().transform(docs)))
    assert nodes.count("Exchange") <= 2, nodes
    assert "Sort" not in nodes or nodes.count("Sort") <= 2


def test_source_cap_no_full_width_shuffle(sf):
    """SourceCapFilter: the corpus-wide frame must NOT be exchanged —
    only the 2-column (source, id) projection shuffles for the salted
    cutoff; text never moves."""
    from replay_spark.preprocessing.text import SourceCapFilter

    docs = sf("documents")
    plan = _plan(SourceCapFilter(cap=40).transform(docs))
    exchange_lines = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning" in l or "Exchange rangepartitioning" in l
    ]
    # the full-width side appears in no exchange: 'text' only ever
    # rides the scan and the final broadcast-filtered projection
    assert all("text" not in l for l in exchange_lines), exchange_lines


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """write_bucketed: a join of two tables bucketed on the same key
    with the same bucket count must plan WITHOUT a shuffle on either
    side — the co-location claim, mechanized."""
    from replay_spark.utils.spark_utils import write_bucketed

    a = spark.range(0, 1000).withColumn("va", F.col("id") * 2)
    b = spark.range(0, 1000).withColumn("vb", F.col("id") * 3)
    ta = write_bucketed(a, "bucket_plan_a", "id", 4, sort_by="id")
    tb = write_bucketed(b, "bucket_plan_b", "id", 4, sort_by="id")
    try:
        joined = ta.join(tb, on="id")
        nodes = _nodes(_plan(joined))
        assert "SortMergeJoin" in nodes or "BroadcastHashJoin" in nodes
        # bucketing IS the partitioning: no shuffle anywhere
        assert (
            "Exchange" not in nodes
            or all(
                "Broadcast" in l
                for l in _plan(joined).splitlines()
                if "Exchange" in l and "(" in l
            )
        ), nodes
        got = joined.count()
        assert got == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bucket_plan_a")
        spark.sql("DROP TABLE IF EXISTS bucket_plan_b")


def test_dsir_bucket_tables_broadcast(sf):
    """DSIRSelector.weights: the ≤64k-bucket log-ratio LUT must join
    the exploded features via BROADCAST — a shuffle join over the
    feature stream would move the whole corpus."""
    from replay_spark.preprocessing.text import DSIRSelector

    docs = sf("documents")
    target = docs.filter(F.col("doc_id") % 5 == 0)
    raw = docs.filter(F.col("doc_id") % 5 != 0)
    plan = _plan(DSIRSelector().weights(raw, target))
    nodes = _nodes(plan)
    assert "BroadcastHashJoin" in nodes, nodes
    # ONE merge join is legitimate: the full-outer merge of the two
    # ≤64k-row count tables. The feature STREAM must never merge-join.
    assert nodes.count("SortMergeJoin") <= 1, nodes


def test_cms_estimate_broadcasts_sketch(sf):
    """CountMinSketch.estimate: the ≤depth·width sketch broadcasts;
    query hashing is an explode + broadcast join, never a shuffle
    join keyed on the sketch."""
    from replay_spark.preprocessing.text import CountMinSketch, tokenize_expr

    docs = sf("documents")
    toks = docs.select(
        F.explode(tokenize_expr(F.lower(F.col("text")))).alias("token")
    )
    cms = CountMinSketch(depth=3, width=256)
    plan = _plan(cms.estimate(cms.fit(toks), toks.distinct()))
    assert "BroadcastHashJoin" in _nodes(plan)


def test_ccnet_bucketer_single_range_exchange(sf):
    """PerplexityBucketer exact strategy: ONE range exchange for the
    global order; no per-language hash exchange of the full frame
    beyond it (the broadcast offsets join adds only broadcast nodes)."""
    from replay_spark.preprocessing.text import PerplexityBucketer

    docs = sf("documents")
    scored = docs.select(
        "doc_id",
        F.col("lang"),
        F.length("text").cast("double").alias("lm_score"),
    )
    plan = _plan(PerplexityBucketer(strategy="exact").transform(scored))
    # the range exchange lives inside ordered_row_numbers' PERSISTED
    # scan (InMemoryTableScan in this plan); what must NOT exist is a
    # per-language hash exchange of the full frame — the exact shape
    # this operator was built to avoid
    assert "InMemoryTableScan" in plan or "rangepartitioning" in plan
    hash_exchanges = [
        l
        for l in plan.splitlines()
        if "Exchange hashpartitioning(lang" in l
    ]
    assert not hash_exchanges, hash_exchanges
    nodes = _nodes(plan)
    assert "BroadcastHashJoin" in nodes, nodes


def test_range_join_is_hash_equi_join(sf):
    """range_join: the interval predicate must plan as a hash
    equi-join on (keys, cell) — BroadcastNestedLoopJoin appearing
    means the bucketing contract broke."""
    from replay_spark.utils.spark_utils import range_join

    ev = sf("events")
    left = ev.select("event_id", "ts", "user_id")
    right = ev.select(
        F.col("event_id").alias("rid"),
        "user_id",
        F.col("ts").alias("r_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("r_end"),
    )
    nodes = _nodes(
        _plan(range_join(left, right, "ts", "r_start", "r_end", by="user_id"))
    )
    assert "BroadcastNestedLoopJoin" not in nodes, nodes
    assert any("Join" in n for n in nodes), nodes


def test_gopher_filter_is_pure_projection(sf):
    """GopherQualityFilter: no Exchange at all — the whole rule set
    is a per-row projection over the scan."""
    from replay_spark.preprocessing.text import GopherQualityFilter

    docs = sf("documents")
    nodes = _nodes(_plan(GopherQualityFilter().transform(docs)))
    assert "Exchange" not in nodes, nodes


def test_kmeans_assignment_is_pure_projection(sf):
    """KMeansClusterer.transform with fixed centroids must add zero
    exchanges: the centroid matrix is a broadcast literal and the
    argmin is expression-level."""
    from replay_spark.ann import KMeansClusterer

    emb = sf("embeddings")
    km = KMeansClusterer(k=4, max_iter=0).fit(
        emb, centroids=[[0.1 * (i + 1)] * 64 for i in range(4)]
    )
    plan = _plan(km.transform(emb))
    assert "Exchange" not in plan, plan


def test_stratified_sampler_salted_two_phase(sf):
    """No per-stratum total ordering: the first window partitions by
    (stratum, salt), the exact window runs on bounded survivors, and
    the corpus filter is a broadcast LEFT SEMI join (full-width rows
    never shuffle)."""
    from replay_spark.preprocessing.text import StratifiedSampler

    docs = sf("documents")
    plan = _plan(StratifiedSampler(n=5).transform(docs))
    assert plan.count("Window") >= 2
    assert "_salt" in plan
    assert "LeftSemi" in plan
    # full-width text column never enters an exchange input
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line, line


def test_zorder_key_stays_in_codegen(sf):
    """The Morton key projection is whole-stage-codegen'd (no UDF
    nodes), and layout() plans a single range exchange."""
    from replay_spark.utils.layout import ZOrderLayout

    li = sf("lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    z = ZOrderLayout(["l_partkey", "l_suppkey"], bits=8)
    plan = _plan(z.layout(li, num_partitions=4))
    nodes = _nodes(plan)
    assert "BatchEvalPython" not in nodes
    assert "ArrowEvalPython" not in nodes
    assert plan.count("rangepartitioning") >= 1 or "range" in plan.lower()
    assert nodes.count("Exchange") == 1, nodes


def test_timeseries_grid_is_keyed_only(sf):
    """TimeSeriesResampler: every exchange is keyed on the key column
    (grid completion is executor-side explode, never a driver loop or
    global sort)."""
    from replay_spark.timeseries import TimeSeriesResampler

    ev = sf("events")
    plan = _plan(
        TimeSeriesResampler(interval_seconds=21600).transform(ev)
    )
    assert "Generate explode" in plan or "explode" in plan
    assert "rangepartitioning" not in plan.lower()
    nodes = _nodes(plan)
    assert "BatchEvalPython" not in nodes


def test_negative_sampler_broadcasts_item_universe(sf):
    """The item-universe join must broadcast (dimension-sized) and
    the per-positive rank window must partition by the positive."""
    from replay_spark.preprocessing.negative_sampling import (
        NegativeSampler,
    )
    import replay_spark.datasets as rsd

    inter = rsd.load_interactions(
        sf("events").sparkSession, SF_DIR
    )
    plan = _plan(NegativeSampler(k=2, oversample=2).transform(inter))
    assert "BroadcastExchange" in plan
    assert "LeftAnti" in plan


def test_file_stats_manifest_and_pruning(spark, tmp_path):
    """Data-skipping manifest: footer-only stats are exact per file,
    pruning actually skips files after a Z-order layout, a pruned
    scan equals the full scan, and an empty survivor set returns
    zero rows without scanning."""
    from replay_spark.utils.layout import (
        ZOrderLayout,
        collect_file_stats,
        prune_files,
        read_pruned,
    )

    df = spark.range(0, 4000).selectExpr(
        "id",
        "CAST(id % 100 AS DOUBLE) AS x",
        "CAST((id * 37) % 100 AS DOUBLE) AS y",
        "CAST(id % 5 AS STRING) AS tag",
    )
    out = str(tmp_path / "zdata")
    z = ZOrderLayout(["x", "y"])
    z.layout(df, num_partitions=8).drop(z.output_column).write.parquet(out)

    man = collect_file_stats(spark, out, ["x", "y", "id"])
    stats = man.collect()
    files = {r.file for r in stats}
    assert len(files) == 8
    # manifest row counts sum to the table row count per column
    per_col = {}
    for r in stats:
        per_col[r.column] = per_col.get(r.column, 0) + r.n_rows
    assert per_col["x"] == 4000
    # min/max land in the typed double slots for double columns
    xs = [r for r in stats if r.column == "x"]
    assert all(r.min_double is not None and r.min_long is None for r in xs)
    assert min(r.min_double for r in xs) == 0.0
    assert max(r.max_double for r in xs) == 99.0

    bounds = {"x": (10.0, 20.0), "y": (10.0, 20.0)}
    kept = prune_files(man, bounds).collect()
    assert 0 < len(kept) < 8  # the layout makes skipping real

    pruned, n_kept, n_total = read_pruned(spark, out, bounds, manifest=man)
    assert n_total == 8 and n_kept == len(kept)
    want = df.filter(
        "x between 10 and 20 and y between 10 and 20"
    ).count()
    assert pruned.count() == want

    empty, n_kept2, _ = read_pruned(spark, out, {"x": (1e6, 2e6)})
    assert n_kept2 == 0 and empty.count() == 0


def test_triangle_counter(spark):
    """Triangle semantics on known graphs: K4 has C(4,3)=4
    triangles (3 per node), squares and pendants have none,
    duplicate/reversed/self edges are canonicalized away, and the
    triangles() enumeration lists each triangle exactly once as
    x<y<z."""
    from replay_spark.graph import TriangleCounter

    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (4, 5),                                           # pendant
        (6, 7), (7, 8), (8, 9), (9, 6),                   # square
        (2, 1), (3, 3),                                   # dup + self
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    tc = TriangleCounter()
    tris = sorted(tuple(r) for r in tc.triangles(df).collect())
    assert tris == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]
    per = {r.node: r.n_triangles for r in tc.transform(df).collect()}
    assert per == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0, 7: 0, 8: 0, 9: 0}


def test_asof_nearest_single_exchange(spark):
    """direction='nearest' runs BOTH directional carries under ONE
    hash exchange on the keys (two sorts, two windows) — no second
    shuffle for the forward pass."""
    import datetime
    import re

    from replay_spark.utils.spark_utils import asof_join

    left = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 10))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 9), 5.0)],
        "k long, ts timestamp, v double",
    )
    out = asof_join(
        left, right, on="ts", by="k", direction="nearest",
        tolerance=3600.0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"\bWindow ", plan)) == 2


def test_hdr_sketch_fit_is_map_side_combined(sf):
    """The Hdr sketch build must be ONE partial/final HashAggregate
    pair around one exchange — bounded map-side state is the whole
    point of a sketch."""
    from replay_spark.preprocessing.text import HdrQuantileSketch

    ev = sf("events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("v"),
    )
    sk = HdrQuantileSketch(precision_bits=7, value_column="v")
    nodes = _nodes(_plan(sk.fit_grouped(ev, "event_type")))
    assert nodes.count("HashAggregate") == 2
    assert nodes.count("Exchange") == 1


def test_target_encoder_loo_single_stats_exchange(sf):
    """LOO target encoding = one stats aggregation joined back; the
    category-stats side must be the only grouped exchange and the
    join must broadcast the tiny stats table."""
    from replay_spark.preprocessing.target_encoder import TargetEncoder

    ev = sf("events").select(
        "event_id", "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("y"),
    )
    enc = TargetEncoder(["event_type"], "y", mode="loo").transform(ev)
    nodes = _nodes(_plan(enc))
    assert "BroadcastHashJoin" in nodes
    assert "SortMergeJoin" not in nodes


def test_rrf_fuse_single_grouped_exchange(spark):
    """RRF fusion over candidate lists: one grouped exchange for the
    conditional-MIN collapse; the per-query window reuses that same
    partitioning (no second full exchange of the fused rows)."""
    from replay_spark.preprocessing.text import ReciprocalRankFusion

    r1 = spark.createDataFrame(
        [(0, i, i + 1) for i in range(50)],
        "query_id long, doc_id long, rank long",
    )
    r2 = spark.createDataFrame(
        [(0, i * 2, i + 1) for i in range(50)],
        "query_id long, doc_id long, rank long",
    )
    fused = ReciprocalRankFusion(k=60).fuse(r1, r2)
    nodes = _nodes(_plan(fused))
    # one exchange on (query, doc) for the agg + one on (query) for
    # the ranking window — and nothing else
    assert nodes.count("Exchange") <= 2, nodes


def test_drift_binning_single_shuffle(sf):
    """DriftReport's current-side pass is ONE map-side-combined
    aggregation over the exploded (column, bin) pairs — exactly one
    Exchange, with partial_count visible below it."""
    from replay_spark.analytics import DriftReport

    ev = sf("events")
    dr = DriftReport(
        numeric_columns=["value"],
        categorical_columns=["event_type"],
        n_bins=4,
    ).fit(ev.filter(F.col("event_id") % 2 == 0))
    plan = _plan(dr._binned(ev.filter(F.col("event_id") % 2 == 1)))
    nodes = _nodes(plan)
    assert nodes.count("Exchange") == 1, nodes
    assert "partial_count" in plan
