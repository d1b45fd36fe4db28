

def test_filtered_search_matches_brute_filter(spark):
    import pyspark.sql.functions as F

    from replay_spark.ann import BruteForceANN, IVFANN

    import random

    rng = random.Random(5)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)], i % 4)
        for i in range(120)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    queries = corpus.filter("vec_id < 6")
    # exact filtered baseline
    exact = BruteForceANN().search(
        queries, corpus, k=3, where="label = 2"
    )
    for r in exact.collect():
        assert r["neighbor_id"] % 4 == 2
    # IVF with one cluster == exhaustive scan -> must equal exact
    ann = IVFANN(num_clusters=1, nprobe=1, attribute_columns=["label"])
    ann.fit(corpus, centroids=[[1.0] * 8])
    approx = ann.search(queries, k=3, where="label = 2")
    a = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in approx.collect()}
    e = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in exact.collect()}
    assert a == e
    # filter_ids variant agrees with where on the same admissible set
    ids = corpus.filter("label = 2").select("vec_id")
    by_ids = ann.search(queries, k=3, filter_ids=ids)
    b = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in by_ids.collect()}
    assert b == e
    # save/load keeps the attributes
    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "ivf")
    ann.save(path)
    loaded = IVFANN.load(path, spark)
    l = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in loaded.search(queries, k=3, where="label = 2").collect()
    }
    assert l == e


def test_filtered_search_pq_ids(spark):
    import random

    from replay_spark.ann import PQANN

    rng = random.Random(9)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(80)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    ann = PQANN(dim=8, m=2, ksub=8, seed=1).fit(corpus)
    ids = corpus.filter("vec_id % 2 = 0").select("vec_id")
    out = ann.search(corpus.filter("vec_id < 4"), k=3, filter_ids=ids)
    for r in out.collect():
        assert r["neighbor_id"] % 2 == 0


def test_filtered_search_hnsw_oversample(spark):
    import random

    from replay_spark.ann import HNSWANN

    rng = random.Random(3)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(100)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    ann = HNSWANN(M=8, ef_construction=32, ef_search=32, seed=1).fit(corpus)
    ids = corpus.filter("vec_id % 2 = 1").select("vec_id")
    out = ann.search(
        corpus.filter("vec_id < 4"), k=3, filter_ids=ids,
        filter_oversample=8,
    )
    rows_out = out.collect()
    assert rows_out
    for r in rows_out:
        assert r["neighbor_id"] % 2 == 1
        assert r["rank"] <= 3


def test_filtered_search_hnsw_auto_widens_to_k(spark):
    """r12 verdict task: a 1%-selective filter must still return
    exactly k per query — underfilled queries re-walk at doubled
    oversample (bounded retries) instead of shipping <k rows."""
    import random

    from replay_spark.ann import HNSWANN

    rng = random.Random(7)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(500)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    ann = HNSWANN(M=8, ef_construction=48, ef_search=48, seed=1).fit(
        corpus
    )
    # ~1% admissible (5 of 500) with k=3: the default oversample
    # (k*4+1 = 13 candidates) virtually never catches 3 of them
    ids = corpus.filter("vec_id % 100 = 7").select("vec_id")
    out = ann.search(
        corpus.filter("vec_id < 6"),
        k=3,
        filter_ids=ids,
        filter_oversample=4,
    )
    got = out.collect()
    per_query = {}
    for r in got:
        assert r["neighbor_id"] % 100 == 7
        per_query.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_query) == {0, 1, 2, 3, 4, 5}
    for qid, ranks in per_query.items():
        assert sorted(ranks) == [1, 2, 3], (qid, ranks)


def test_filtered_search_hnsw_fewer_than_k_admissible(spark):
    """When the corpus has FEWER than k admissible vectors, widening
    stops at the retry budget and returns what exists."""
    import random

    from replay_spark.ann import HNSWANN

    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(120)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    ann = HNSWANN(M=8, ef_construction=48, ef_search=48, seed=1).fit(
        corpus
    )
    ids = corpus.filter("vec_id IN (50, 51)").select("vec_id")
    out = ann.search(
        corpus.filter("vec_id < 2"), k=5, filter_ids=ids,
        max_widen_retries=2,
    )
    per_query = {}
    for r in out.collect():
        assert r["neighbor_id"] in (50, 51)
        per_query.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for qid, nbrs in per_query.items():
        assert nbrs == {50, 51}


def test_filtered_search_hnsw_widening_path(spark):
    """The broad-filter regime (exact fallback disabled): underfilled
    queries re-walk at doubled oversample until k admissible rows
    fill — the post-filter never ships short results while
    admissible neighbors remain reachable."""
    import random

    from replay_spark.ann import HNSWANN

    rng = random.Random(5)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(500)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    ann = HNSWANN(
        M=8, ef_construction=48, ef_search=48, seed=1,
        exact_filter_threshold=0,  # force the walk+widen path
    ).fit(corpus)
    ids = corpus.filter("vec_id % 2 = 1").select("vec_id")
    out = ann.search(
        corpus.filter("vec_id < 6"),
        k=3,
        filter_ids=ids,
        filter_oversample=1,  # deliberately too small: must widen
    )
    per_query = {}
    for r in out.collect():
        assert r["neighbor_id"] % 2 == 1
        per_query.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_query) == {0, 1, 2, 3, 4, 5}
    for qid, ranks in per_query.items():
        assert sorted(ranks) == [1, 2, 3], (qid, ranks)


def test_vectorized_lut_bit_identical_to_per_row():
    """The r16 LUT vectorization (one numpy pass over all queries /
    probe pairs) must produce EXACTLY the per-row integer tables: the
    subtract-square-sum reduces the same contiguous dsub axis either
    way, so every double — and every floored micro-unit — matches."""
    import numpy as np

    rng = np.random.default_rng(7)
    m, ksub, dsub = 8, 16, 8
    books = rng.normal(size=(m, ksub, dsub))
    x = rng.normal(size=(40, m * dsub))
    # PQ form: query vs codeword
    for j in range(m):
        per_row = np.stack(
            [
                np.floor(
                    (((books[j] - row[j * dsub : (j + 1) * dsub]) ** 2).sum(1) + 1e-9)
                    * 1e6
                    + 0.5
                ).astype(np.int64)
                for row in x
            ]
        )
        vec = np.floor(
            (
                ((x[:, None, j * dsub : (j + 1) * dsub] - books[j][None, :, :]) ** 2).sum(-1)
                + 1e-9
            )
            * 1e6
            + 0.5
        ).astype(np.int64)
        assert (per_row == vec).all()
    # IVFPQ form: residual (repeat minus fancy-indexed centroids)
    cents = rng.normal(size=(4, m * dsub))
    probes = rng.integers(0, 4, size=(40, 2))
    p = probes.shape[1]
    rflat = np.repeat(x, p, axis=0) - cents[probes.reshape(-1)]
    i = 0
    for qi, row in enumerate(x):
        for cell in probes[qi]:
            r = row - cents[cell]
            assert (r == rflat[i]).all()
            i += 1


def test_hnsw_row_cache_refreshes_and_never_pickles(spark):
    """The _d_to hot-loop row cache (r16) is derived state: it must
    refresh whenever _vecs is replaced (refit on same-length data,
    append) and must not ride the executor closure pickle — a stale
    cache would silently compute distances against the OLD corpus."""
    import pickle
    import random

    import numpy as np

    from replay_spark.ann import HNSWANN

    rng = random.Random(7)

    def frame(shift):
        rows = [
            (i, [rng.gauss(0, 1) + shift for _ in range(8)])
            for i in range(60)
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    ann = HNSWANN(M=4, ef_construction=16, ef_search=16, seed=1)
    ann.fit(frame(0.0))
    d_a = ann._d_to(ann._vecs[0])(1)
    assert ann._rows_base is ann._vecs

    # refit the SAME instance on same-length different data: the
    # cached rows must follow the new _vecs (identity, not length)
    ann.fit(frame(5.0))
    assert ann._rows_base is ann._vecs
    d_b = ann._d_to(ann._vecs[0])(1)
    assert d_a != d_b
    # cached row views alias the live matrix
    assert ann._rows[3].base is ann._vecs

    # append replaces _vecs via vstack: cache must refresh again
    extra = spark.createDataFrame(
        [(1000 + i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    ann._d_to(ann._vecs[0])  # warm the cache pre-append
    ann.append(extra)
    dist = ann._d_to(ann._vecs[0])
    assert ann._rows_base is ann._vecs
    assert len(ann._rows) == 65
    # the appended rows are reachable through the refreshed cache
    assert dist(64) == 1.0 - float(np.dot(ann._vecs[64], ann._vecs[0]))

    # the derived cache never pickles (closure-broadcast hygiene)
    state = ann.__getstate__()
    assert state["_rows"] is None and state["_rows_base"] is None
    ann2 = pickle.loads(pickle.dumps(ann))
    q = ann._vecs[2].copy()
    assert ann2._knn(q, 5) == ann._knn(q, 5)
