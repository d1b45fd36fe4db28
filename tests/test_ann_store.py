"""ANN index persistence + incremental maintenance.

Contract per class: save→load→search ≡ fresh-build search on the
same frames (the reference's index-store tier, parquet-native), and
append-under-frozen-parameters ≡ full rebuild where the math makes
that exact (IVF centroids, PQ codebooks), recall-pinned where it
can't (HNSW insertion order).
"""

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from replay_spark.ann import (
    BruteForceANN,
    HNSWANN,
    IVFANN,
    IVFPQANN,
    LSHANN,
    PQANN,
    load_index,
    save_index,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(size=16)]) for i in range(120)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()


def _rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, r.cosine, r.rank) for r in df.collect()
    )


def test_ivf_save_load_and_incremental_exact(spark, corpus):
    """Fixed-centroid IVF: the loaded index and the half+append index
    both answer EXACTLY like the fresh full build."""
    cents = [
        r.embedding
        for r in corpus.filter("vec_id < 8").orderBy("vec_id").collect()
    ]
    queries = corpus.filter("vec_id < 10")
    fresh = IVFANN(num_clusters=8, nprobe=2).fit(corpus, centroids=cents)
    want = _rows(fresh.search(queries, k=5))

    path = tempfile.mkdtemp(prefix="rs_ivfidx_")
    save_index(fresh, path)
    loaded = load_index(path, spark)
    assert isinstance(loaded, IVFANN)
    assert loaded.centroids == fresh.centroids
    assert _rows(loaded.search(queries, k=5)) == want

    half = IVFANN(num_clusters=8, nprobe=2).fit(
        corpus.filter("vec_id % 2 = 0"), centroids=cents
    )
    half.append(corpus.filter("vec_id % 2 = 1"))
    assert _rows(half.search(queries, k=5)) == want
    # appending to a LOADED index works too (load→append→search)
    l2 = load_index(path, spark)
    more = spark.createDataFrame(
        [(500, [0.5] * 16)], "vec_id long, embedding array<double>"
    )
    l2.append(more)
    assert l2._indexed.filter("neighbor_id = 500").count() == 1


def test_ivf_kmeans_save_load_roundtrip(spark, corpus):
    """KMeans-trained IVF (euclidean assignment rule): loaded search
    equals the original's, and append assigns by the same rule."""
    fresh = IVFANN(num_clusters=4, nprobe=2, seed=1).fit(corpus)
    queries = corpus.filter("vec_id < 5")
    want = _rows(fresh.search(queries, k=4))
    path = tempfile.mkdtemp(prefix="rs_ivfkm_")
    fresh.save(path)
    loaded = IVFANN.load(path, spark)
    assert loaded._assign == "euclidean"
    assert _rows(loaded.search(queries, k=4)) == want
    n0 = loaded._indexed.count()
    loaded.append(
        spark.createDataFrame(
            [(600, [1.0] * 16)], "vec_id long, embedding array<double>"
        )
    )
    assert loaded._indexed.count() == n0 + 1


def test_pq_save_load_and_incremental_exact(spark, corpus):
    """Fixed-codebook PQ: save→load→search and half+append both
    reproduce the fresh full build exactly (frozen codebooks)."""
    raw = [
        r.embedding
        for r in corpus.filter("vec_id < 8").orderBy("vec_id").collect()
    ]
    x = PQANN._normalize(np.array(raw, dtype=np.float64))
    dsub = 16 // 4
    books = np.stack([x[:, j * dsub : (j + 1) * dsub] for j in range(4)])
    queries = corpus.filter("vec_id < 6")

    fresh = PQANN(dim=16, m=4, ksub=8, refine=4).fit(corpus, codebooks=books)
    want = _rows(fresh.search(queries, k=5))

    path = tempfile.mkdtemp(prefix="rs_pqidx_")
    fresh.save(path)
    loaded = load_index(path, spark)
    assert isinstance(loaded, PQANN)
    assert np.array_equal(loaded.codebooks, fresh.codebooks)
    assert _rows(loaded.search(queries, k=5)) == want

    half = PQANN(dim=16, m=4, ksub=8, refine=4).fit(
        corpus.filter("vec_id % 2 = 0"), codebooks=books
    )
    half.append(corpus.filter("vec_id % 2 = 1"))
    assert _rows(half.search(queries, k=5)) == want

    with pytest.raises(ValueError, match="fit before"):
        PQANN(dim=16, m=4).save(tempfile.mkdtemp())
    with pytest.raises(ValueError, match="fit before"):
        PQANN(dim=16, m=4).append(corpus)


def test_ivfpq_save_load_roundtrip_and_append(spark, corpus):
    """Trained IVF-PQ round-trips losslessly (centroids, codebooks,
    codes, refine corpus); append under the frozen quantizers makes
    a planted near-duplicate findable."""
    fresh = IVFPQANN(
        dim=16, num_cells=4, nprobe=2, m=4, ksub=8, seed=3
    ).fit(corpus)
    queries = corpus.filter("vec_id < 5")
    want = _rows(fresh.search(queries, k=4))
    path = tempfile.mkdtemp(prefix="rs_ivfpqidx_")
    fresh.save(path)
    loaded = load_index(path, spark)
    assert isinstance(loaded, IVFPQANN)
    assert np.allclose(loaded.centroids, fresh.centroids)
    assert np.allclose(loaded.codebooks, fresh.codebooks)
    assert _rows(loaded.search(queries, k=4)) == want
    # plant a near-dup of vec_id 0, append, search finds it top-1
    v0 = corpus.filter("vec_id = 0").first().embedding
    dup = [x + 1e-4 for x in v0]
    loaded.append(
        spark.createDataFrame(
            [(900, dup)], "vec_id long, embedding array<double>"
        )
    )
    top = (
        loaded.search(corpus.filter("vec_id = 0"), k=3)
        .filter("rank = 1")
        .first()
    )
    assert top.neighbor_id == 900


def test_hnsw_save_load_identical_graph_and_append(spark):
    """The persisted graph IS the in-memory graph (links, entry,
    levels), so loaded searches are bit-identical; append inserts
    via the standard HNSW procedure and respects max_elements."""
    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(150)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    fresh = HNSWANN(M=6, ef_construction=40, ef_search=32, seed=5).fit(df)
    queries = df.filter("vec_id < 8")
    want = _rows(fresh.search(queries, k=5))
    path = tempfile.mkdtemp(prefix="rs_hnswidx_")
    fresh.save(path)
    loaded = load_index(path, spark)
    assert isinstance(loaded, HNSWANN)
    assert loaded._entry == fresh._entry
    assert loaded._max_level == fresh._max_level
    assert loaded._links == fresh._links
    assert np.array_equal(loaded._ids, fresh._ids)
    assert _rows(loaded.search(queries, k=5)) == want
    # append a near-dup of node 3; it must surface top-1
    v3 = rows[3][1]
    loaded.append(
        spark.createDataFrame(
            [(700, [x + 1e-4 for x in v3])],
            "vec_id long, embedding array<double>",
        )
    )
    top = (
        loaded.search(df.filter("vec_id = 3"), k=3)
        .filter("rank = 1")
        .first()
    )
    assert top.neighbor_id == 700
    with pytest.raises(ValueError, match="max_elements"):
        HNSWANN(max_elements=150).fit(df).append(
            spark.createDataFrame(
                [(701, [0.1] * 8)], "vec_id long, embedding array<double>"
            )
        )
    with pytest.raises(ValueError, match="fit before"):
        HNSWANN().save(tempfile.mkdtemp())


def test_stateless_classes_and_dispatch(spark, corpus):
    """BruteForce/LSH round-trip their params; model_handler loads
    any saved index through the shared meta.json contract; format
    version mismatches raise."""
    import json
    import os

    from replay_spark.utils import model_handler

    p1 = tempfile.mkdtemp(prefix="rs_bfidx_")
    BruteForceANN(id_column="vec_id").save(p1)
    bf = load_index(p1, spark)
    assert isinstance(bf, BruteForceANN)

    p2 = tempfile.mkdtemp(prefix="rs_lshidx_")
    orig = LSHANN(dim=16, num_planes=3, num_tables=2, seed=9)
    orig.save(p2)
    lsh = model_handler.load(p2, spark)
    assert isinstance(lsh, LSHANN)
    assert (lsh.num_planes, lsh.num_tables, lsh.seed) == (3, 2, 9)
    # identical bucketing by construction: same search output
    a = _rows(orig.search(corpus.filter("vec_id < 4"), corpus, k=3))
    b = _rows(lsh.search(corpus.filter("vec_id < 4"), corpus, k=3))
    assert a == b

    meta = json.loads(open(os.path.join(p2, "meta.json")).read())
    meta["format_version"] = 99
    with open(os.path.join(p2, "meta.json"), "w") as fh:
        fh.write(json.dumps(meta))
    with pytest.raises(ValueError, match="format_version"):
        load_index(p2, spark)


def test_lake_vector_index_cdf_refresh_exact(spark, corpus):
    """build at v0, append + delete on the source table, refresh via
    the change feed — the refreshed index answers EXACTLY like a
    fresh full build over the current snapshot; the cursor ratchets
    and a no-op refresh is a no-op."""
    from replay_spark.ann import IVFANN, LakeVectorIndex
    from replay_spark.lake import LakeTable

    cents = [
        r.embedding
        for r in corpus.filter("vec_id < 8").orderBy("vec_id").collect()
    ]
    tbl_path = tempfile.mkdtemp(prefix="rs_lvi_tbl_")
    idx_path = tempfile.mkdtemp(prefix="rs_lvi_idx_")
    t = LakeTable(spark, tbl_path)
    t.append(corpus.filter("vec_id % 2 = 0").coalesce(1))       # v0
    lvi = LakeVectorIndex(
        spark, idx_path, t, num_clusters=8, nprobe=2
    ).build(centroids=cents)
    assert lvi.indexed_version() == 0

    t.append(corpus.filter("vec_id % 2 = 1").coalesce(1))       # v1
    t.delete(F.col("vec_id") % 7 == 3)                          # v2
    lvi.refresh()
    assert lvi.indexed_version() == 2

    queries = corpus.filter("vec_id < 10")
    got = _rows(lvi.search(queries, k=5))
    fresh = IVFANN(num_clusters=8, nprobe=2).fit(
        t.read(), centroids=cents
    )
    assert got == _rows(fresh.search(queries, k=5))
    # deleted ids never surface as neighbors
    assert not [r for r in got if r[1] % 7 == 3]
    # no-op refresh keeps the cursor
    lvi.refresh()
    assert lvi.indexed_version() == 2
    # a second handle loads the persisted index cold
    lvi2 = LakeVectorIndex(spark, idx_path, t, num_clusters=8, nprobe=2)
    assert _rows(lvi2.search(queries, k=5)) == got
    with pytest.raises(ValueError, match="build"):
        LakeVectorIndex(
            spark, tempfile.mkdtemp(), t, num_clusters=8
        ).refresh()
    t.drop()


def test_sidecar_state_classes_roundtrip(spark, corpus):
    """KMeansClusterer / PCAProjector / EmbeddingQuantizer persist
    their whole model in the meta.json sidecar and restore through
    load_index's shared dispatch."""
    from replay_spark.ann import (
        EmbeddingQuantizer,
        KMeansClusterer,
        PCAProjector,
    )

    km = KMeansClusterer(k=4, max_iter=3, seed=2).fit(corpus)
    p1 = tempfile.mkdtemp(prefix="rs_kmidx_")
    km.save(p1)
    km2 = load_index(p1, spark)
    assert isinstance(km2, KMeansClusterer)
    assert km2.centroids == km.centroids
    a = sorted(
        (r.vec_id, r.cluster)
        for r in km.transform(corpus.filter("vec_id < 10")).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster)
        for r in km2.transform(corpus.filter("vec_id < 10")).collect()
    )
    assert a == b

    pca = PCAProjector(k=3).fit(corpus)
    p2 = tempfile.mkdtemp(prefix="rs_pcaidx_")
    pca.save(p2)
    pca2 = load_index(p2, spark)
    assert pca2.components == pca.components
    assert pca2.mean == pca.mean

    q = EmbeddingQuantizer(mode="global").fit(corpus)
    p3 = tempfile.mkdtemp(prefix="rs_sq8idx_")
    q.save(p3)
    q2 = load_index(p3, spark)
    assert q2.global_scale == q.global_scale
    with pytest.raises(ValueError, match="fit"):
        KMeansClusterer(k=2).save(tempfile.mkdtemp())
    with pytest.raises(ValueError, match="fit"):
        EmbeddingQuantizer(mode="global").save(tempfile.mkdtemp())


def test_ivf_remove_exact(spark, corpus):
    """remove(ids) == fit on the remaining corpus (frozen
    centroids): the delete half of incremental maintenance."""
    cents = [
        r.embedding
        for r in corpus.filter("vec_id < 8").orderBy("vec_id").collect()
    ]
    queries = corpus.filter("vec_id < 6")
    full = IVFANN(num_clusters=8, nprobe=2).fit(corpus, centroids=cents)
    full.remove(corpus.filter("vec_id % 5 = 4").select("vec_id"))
    want = IVFANN(num_clusters=8, nprobe=2).fit(
        corpus.filter("vec_id % 5 != 4"), centroids=cents
    )
    assert _rows(full.search(queries, k=5)) == _rows(
        want.search(queries, k=5)
    )
    assert not [
        r
        for r in full.search(queries, k=5).collect()
        if r.neighbor_id % 5 == 4
    ]
    with pytest.raises(RuntimeError, match="not fitted"):
        IVFANN().remove(corpus.select("vec_id"))


def test_lake_vector_index_tracks_deletion_vectors(spark, corpus):
    """A merge-on-read dv-delete on the source table flows through
    the change feed, so refresh() drops the deleted vectors from the
    index without any file rewrite having happened."""
    from replay_spark.ann import IVFANN, LakeVectorIndex
    from replay_spark.lake import LakeTable

    cents = [
        r.embedding
        for r in corpus.filter("vec_id < 8").orderBy("vec_id").collect()
    ]
    tbl_path = tempfile.mkdtemp(prefix="rs_lvidv_tbl_")
    idx_path = tempfile.mkdtemp(prefix="rs_lvidv_idx_")
    t = LakeTable(spark, tbl_path)
    t.append(corpus.coalesce(2))
    lvi = LakeVectorIndex(
        spark, idx_path, t, num_clusters=8, nprobe=2
    ).build(centroids=cents)

    t.delete("vec_id % 5 = 2", mode="dv")  # no data file rewritten
    lvi.refresh()

    queries = corpus.filter("vec_id < 10")
    got = _rows(lvi.search(queries, k=5))
    fresh = IVFANN(num_clusters=8, nprobe=2).fit(
        t.read(), centroids=cents
    )
    assert got == _rows(fresh.search(queries, k=5))
    assert not [r for r in got if r[1] % 5 == 2]
    t.drop()
