"""Property-based tests (hypothesis) — invariants the reference's
example-based suite can't cover.

Kept to few, small examples per property: each example builds a
Spark DataFrame, so the budget goes to property diversity, not
example count.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from replay_spark.metrics import NDCG, HitRate, Precision, Recall
from replay_spark.preprocessing import LabelEncodingRule, MinCountFilter
from replay_spark.splitters import RatioSplitter
from replay_spark.utils import get_top_k_recs

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

interactions_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),  # query
        st.integers(0, 8),  # item
        st.integers(0, 1000),  # ts offset
        st.floats(0.125, 10.0, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=interactions_strategy, k=st.integers(1, 4))
@settings(**SETTINGS)
def test_top_k_is_per_user_maximal(spark, rows, k):
    # dedupe (query, item) so ranking has a unique winner set
    seen = {}
    for q, i, t, r in rows:
        seen[(q, i)] = float(round(r, 3))
    df = spark.createDataFrame(
        [(q, i, r) for (q, i), r in seen.items()],
        "query_id int, item_id int, rating double",
    )
    out = get_top_k_recs(df, k).collect()
    by_user = {}
    for row in out:
        by_user.setdefault(row.query_id, []).append((row.rating, row.item_id))
    source = {}
    for (q, i), r in seen.items():
        source.setdefault(q, []).append((r, i))
    for q, got in by_user.items():
        assert len(got) <= k
        expected = sorted(source[q], key=lambda x: (-x[0], x[1]))[:k]
        assert sorted(got, key=lambda x: (-x[0], x[1])) == expected


@given(rows=interactions_strategy, n=st.integers(1, 5))
@settings(**SETTINGS)
def test_min_count_filter_threshold(spark, rows, n):
    df = spark.createDataFrame(
        [(q, i) for q, i, _, _ in rows], "query_id int, item_id int"
    )
    out = MinCountFilter(n, "query_id").transform(df)
    counts = {
        r.query_id: r["count"]
        for r in df.groupBy("query_id").count().collect()
    }
    kept = {
        r.query_id: r["count"]
        for r in out.groupBy("query_id").count().collect()
    }
    for q, c in counts.items():
        if c >= n:
            assert kept.get(q) == c
        else:
            assert q not in kept


@given(rows=interactions_strategy, frac=st.sampled_from([0.2, 0.5, 0.8]))
@settings(**SETTINGS)
def test_ratio_splitter_partitions_input(spark, rows, frac):
    df = spark.createDataFrame(
        [
            (q, i, 1577836800 + t, r)
            for idx, (q, i, t, r) in enumerate(rows)
        ],
        "query_id int, item_id int, ts long, rating double",
    ).withColumn("timestamp", __import__("pyspark").sql.functions.to_timestamp(
        __import__("pyspark").sql.functions.from_unixtime("ts"))).drop("ts")
    train, test = RatioSplitter(frac).split(df)
    assert train.count() + test.count() == df.count()
    # the split is temporal per user: no test row precedes a train row
    train_max = {
        r.query_id: r.m
        for r in train.groupBy("query_id").agg(
            __import__("pyspark").sql.functions.max("timestamp").alias("m")
        ).collect()
    }
    test_min = {
        r.query_id: r.m
        for r in test.groupBy("query_id").agg(
            __import__("pyspark").sql.functions.min("timestamp").alias("m")
        ).collect()
    }
    for q, tmin in test_min.items():
        if q in train_max:
            assert train_max[q] <= tmin


@given(rows=interactions_strategy, k=st.integers(1, 5))
@settings(**SETTINGS)
def test_metric_bounds_and_ordering(spark, rows, k):
    seen = {}
    for q, i, t, r in rows:
        seen[(q, i)] = float(round(r, 3))
    recs = spark.createDataFrame(
        [(q, i, r) for (q, i), r in seen.items()],
        "query_id int, item_id int, rating double",
    )
    gt = spark.createDataFrame(
        [(q, i) for (q, i) in list(seen)[::2]], "query_id int, item_id int"
    )
    ndcg = NDCG(k)(recs, gt)[f"NDCG@{k}"]
    hr = HitRate(k)(recs, gt)[f"HitRate@{k}"]
    prec = Precision(k)(recs, gt)[f"Precision@{k}"]
    rec = Recall(k)(recs, gt)[f"Recall@{k}"]
    for v in (ndcg, hr, prec, rec):
        assert -1e-9 <= v <= 1 + 1e-9
    # hitrate dominates precision and ndcg per user, hence on average
    assert hr + 1e-9 >= prec
    assert hr + 1e-9 >= ndcg


@given(
    values=st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=3),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_label_encoder_roundtrip_property(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "item_id string")
    rule = LabelEncodingRule("item_id")
    encoded = rule.fit_transform(df)
    codes = [r.item_id for r in encoded.collect()]
    assert set(codes) == set(range(len(set(values))))
    back = sorted(r.item_id for r in rule.inverse_transform(encoded).collect())
    assert back == sorted(values)


docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
        min_size=0,
        max_size=12,
    ),
    min_size=1,
    max_size=12,
)


@given(token_lists=docs_strategy)
@settings(**SETTINGS)
def test_vocab_builder_matches_python_counts(spark, token_lists):
    from collections import Counter

    from replay_spark.preprocessing.text import VocabBuilder

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["token"]: (r["tf"], r["df"])
        for r in VocabBuilder().transform(df).collect()
    }
    tf = Counter()
    dfreq = Counter()
    for toks in token_lists:
        tf.update(toks)
        dfreq.update(set(toks))
    assert got == {t: (tf[t], dfreq[t]) for t in tf}


@given(token_lists=docs_strategy)
@settings(**SETTINGS)
def test_repetition_stats_match_python(spark, token_lists):
    from replay_spark.preprocessing.text import RepetitionStats

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["dup_word_frac"], r["top_bigram_char_frac"])
        for r in RepetitionStats().transform(df).collect()
    }
    for i, toks in enumerate(token_lists):
        text = " ".join(toks)
        dup = 1 - len(set(toks)) / len(toks) if toks else 0.0
        assert abs(got[i][0] - dup) < 1e-9
        bigrams = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        if bigrams and len(text) > 0:
            from collections import Counter

            cnt = Counter(bigrams)
            best = min(((-c, b) for b, c in cnt.items()))
            expect = (-best[0]) * len(best[1]) / len(text)
            assert abs(got[i][1] - expect) < 1e-9
        else:
            assert got[i][1] == 0.0


@given(token_lists=docs_strategy, n=st.integers(1, 3))
@settings(**SETTINGS)
def test_contamination_self_is_total(spark, token_lists, n):
    """A corpus checked against itself is 100% contaminated; against a
    disjoint-vocabulary corpus, 0%."""
    from replay_spark.preprocessing.dedup import ContaminationChecker

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists) if toks]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chk = ContaminationChecker(n=n)
    rep = chk.report(df, df).collect()
    assert all(r["contamination_frac"] == 1.0 for r in rep)
    other = spark.createDataFrame([(999, "zeta theta iota")], "doc_id long, text string")
    rep2 = chk.report(df, other).collect()
    assert all(r["contamination_frac"] == 0.0 for r in rep2)


docs_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),  # source id
        st.integers(0, 999),  # doc id (may collide across sources)
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t,  # (source, id) unique -> id unique per source
)


@given(rows=docs_strategy, cap=st.integers(1, 6), salts=st.sampled_from([1, 3, 8]))
@settings(**SETTINGS)
def test_source_cap_matches_bruteforce(spark, rows, cap, salts):
    """SourceCapFilter's salted two-phase cutoff == the naive 'cap
    smallest ids per source' for any corpus/cap/salt count."""
    from replay_spark.preprocessing.text import SourceCapFilter

    df = spark.createDataFrame(
        [(doc, f"s{src}") for src, doc in rows],
        "doc_id long, source string",
    )
    got = {
        (r.source, r.doc_id)
        for r in SourceCapFilter(cap=cap, salts=salts).transform(df).collect()
    }
    expect = set()
    by_src = {}
    for src, doc in rows:
        by_src.setdefault(f"s{src}", []).append(doc)
    for src, ids in by_src.items():
        for doc in sorted(ids)[:cap]:
            expect.add((src, doc))
    assert got == expect


para_docs_strategy = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=4),
    min_size=1,
    max_size=12,
)


@given(docs=para_docs_strategy, max_occ=st.integers(1, 3),
       keep=st.sampled_from(["first", "none"]))
@settings(**SETTINGS)
def test_paragraph_dedup_matches_bruteforce(spark, docs, max_occ, keep):
    """ParagraphDeduplicator == the naive corpus-frequency model for
    arbitrary paragraph multisets, both keep modes."""
    from collections import Counter

    from replay_spark.preprocessing.dedup import ParagraphDeduplicator

    rows = [(i, "\n\n".join(paras)) for i, paras in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.text
        for r in ParagraphDeduplicator(max_occurrences=max_occ, keep=keep)
        .transform(df)
        .collect()
    }
    freq = Counter(p for paras in docs for p in paras if p)
    first = {}
    for i, paras in enumerate(docs):
        for pos, p in enumerate(paras):
            if p and p not in first:
                first[p] = (i, pos)
    expect = {}
    for i, paras in enumerate(docs):
        kept = []
        for pos, p in enumerate(paras):
            if not p:
                continue
            if freq[p] <= max_occ:
                kept.append(p)
            elif keep == "first" and first[p] == (i, pos):
                kept.append(p)
        expect[i] = "\n\n".join(kept)
    assert out == expect
