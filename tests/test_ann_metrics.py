"""ANN metric= option (cosine / dot / l2) across the index family.

The reference's vector distance family is cosine / dot / euclidean
(reference/replay/utils/spark_utils.py:624-651, base_rec.py:740-792);
each index here must rank under the chosen metric with the exact
re-rank (where it has one) agreeing with the brute-force oracle.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from replay_spark.ann import (
    BruteForceANN,
    HNSWANN,
    IVFANN,
    IVFPQANN,
    PQANN,
)

DIM = 16
N = 200
N_Q = 20


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(31)
    rows = [
        (i, [float(x) for x in rng.normal(size=DIM)]) for i in range(N)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()
    df.count()
    return df


def _numpy_top1(df, metric):
    rows = sorted(
        (r.vec_id, np.array(r.embedding, dtype=np.float64))
        for r in df.collect()
    )
    ids = np.array([i for i, _ in rows])
    x = np.vstack([v for _, v in rows])
    out = {}
    for qi in range(N_Q):
        q = x[qi]
        if metric == "dot":
            s = x @ q
            order = np.argsort(-s)
        elif metric == "l2":
            s = ((x - q) ** 2).sum(1)
            order = np.argsort(s)
        else:
            xn = x / np.linalg.norm(x, axis=1, keepdims=True)
            s = xn @ (q / np.linalg.norm(q))
            order = np.argsort(-s)
        top = [int(ids[j]) for j in order if int(ids[j]) != int(ids[qi])]
        out[int(ids[qi])] = top[0]
    return out


@pytest.mark.parametrize("metric,col", [("dot", "score"), ("l2", "distance")])
def test_brute_force_metric_exact(spark, corpus, metric, col):
    q = corpus.filter(F.col("vec_id") < N_Q)
    res = BruteForceANN(metric=metric).search(q, corpus, k=3)
    assert col in res.columns
    top1 = {
        r.query_id: r.neighbor_id for r in res.filter("rank = 1").collect()
    }
    assert top1 == _numpy_top1(corpus, metric)


@pytest.mark.parametrize("metric", ["dot", "l2"])
def test_ivf_full_probe_equals_brute(spark, corpus, metric):
    """With nprobe == num_clusters every cell is scanned, so IVF
    under any metric must EQUAL the brute-force ranking."""
    q = corpus.filter(F.col("vec_id") < N_Q)
    ann = IVFANN(num_clusters=4, nprobe=4, seed=3, metric=metric).fit(
        corpus
    )
    got = {
        r.query_id: r.neighbor_id
        for r in ann.search(q, k=3).filter("rank = 1").collect()
    }
    assert got == _numpy_top1(corpus, metric)


def test_ivf_l2_fixed_centroids_deterministic(spark, corpus):
    """metric='l2' + fixed centroids: the assignment rule is min-L2
    (SQL-replayable — the q_ivf_ann_l2 gate shape); save/load
    round-trips the metric."""
    import tempfile

    cents = [[1.0] * DIM, [-1.0] * DIM, [1.0] * (DIM // 2) + [-1.0] * (DIM // 2)]
    ann = IVFANN(nprobe=2, metric="l2").fit(corpus, centroids=cents)
    assert ann._assign == "euclidean"
    q = corpus.filter(F.col("vec_id") < 5)
    before = ann.search(q, k=4).collect()
    path = tempfile.mkdtemp(prefix="rs_ivf_l2_")
    ann.save(path)
    ann2 = IVFANN.load(path)
    assert ann2.metric == "l2"
    after = ann2.search(q, k=4).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))


@pytest.mark.parametrize("metric", ["dot", "l2"])
def test_pq_metric_top1_agreement(spark, corpus, metric):
    q = corpus.filter(F.col("vec_id") < N_Q)
    ann = PQANN(
        dim=DIM, m=4, ksub=32, refine=8, seed=7, metric=metric
    ).fit(corpus)
    res = ann.search(q, k=3)
    top1 = {
        r.query_id: r.neighbor_id for r in res.filter("rank = 1").collect()
    }
    exact = _numpy_top1(corpus, metric)
    hits = sum(1 for k_, v in exact.items() if top1.get(k_) == v)
    assert hits / len(exact) >= 0.8, f"PQ {metric} top-1 {hits}/{len(exact)}"


@pytest.mark.parametrize("metric", ["dot", "l2"])
def test_ivfpq_metric_top1_agreement(spark, corpus, metric):
    q = corpus.filter(F.col("vec_id") < N_Q)
    ann = IVFPQANN(
        dim=DIM,
        num_cells=4,
        nprobe=4,
        m=4,
        ksub=32,
        refine=8,
        seed=11,
        metric=metric,
    ).fit(corpus)
    res = ann.search(q, k=3)
    top1 = {
        r.query_id: r.neighbor_id for r in res.filter("rank = 1").collect()
    }
    exact = _numpy_top1(corpus, metric)
    hits = sum(1 for k_, v in exact.items() if top1.get(k_) == v)
    assert hits / len(exact) >= 0.8, (
        f"IVFPQ {metric} top-1 {hits}/{len(exact)}"
    )


@pytest.mark.parametrize("metric,col", [("dot", "score"), ("l2", "distance")])
def test_hnsw_metric_top1_agreement(spark, corpus, metric, col):
    q = corpus.filter(F.col("vec_id") < N_Q)
    ann = HNSWANN(
        M=8, ef_construction=100, ef_search=200, seed=13, metric=metric
    ).fit(corpus)
    res = ann.search(q, k=3)
    assert col in res.columns
    top1 = {
        r.query_id: r.neighbor_id for r in res.filter("rank = 1").collect()
    }
    exact = _numpy_top1(corpus, metric)
    hits = sum(1 for k_, v in exact.items() if top1.get(k_) == v)
    assert hits / len(exact) >= 0.9, (
        f"HNSW {metric} top-1 {hits}/{len(exact)}"
    )


def test_metric_validation():
    with pytest.raises(ValueError, match="metric"):
        BruteForceANN(metric="manhattan")
    with pytest.raises(ValueError, match="metric"):
        IVFANN(metric="ip")


def test_cosine_default_unchanged(spark, corpus):
    """metric defaults to cosine and keeps the historical output
    column name — the hash-gated cosine queries are untouched."""
    res = BruteForceANN().search(
        corpus.filter("vec_id = 0"), corpus, k=2
    )
    assert "cosine" in res.columns
    assert IVFANN().metric == "cosine"
