"""Driver-contract checks for __spark_entry__.py — no Spark session.

The driver scores the FIRST 50 entries of ``queries()``; round 5
shipped a registry whose documented window sections summed to 53, so
3 queries the round plan meant to refresh silently fell outside the
scored window. These tests pin the structure so that can't recur.
"""

import inspect
import os
import re

import __spark_entry__ as entrymod


def test_registry_keys_unique_and_callable():
    qs = entrymod.queries()
    assert len(qs) == len(set(qs)), "duplicate query names"
    for name, fn in qs.items():
        assert callable(fn), name
        assert name.startswith("q_"), name


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    extra = set(entrymod.oracle_sql()) - set(qs)
    assert not extra, f"oracle_sql for unregistered queries: {extra}"


def test_scored_window_sections_sum_to_exactly_50():
    # parse the source: section markers (a)/(b)/(c) in queries();
    # everything before the (c) marker is the scored window
    src = inspect.getsource(entrymod.queries)
    c_marker = src.index("-- (c)")
    scored = re.findall(r'"(q_[a-z0-9_]+)":', src[:c_marker])
    assert len(scored) == 50, (
        f"scored window is {len(scored)} entries, must be exactly 50: "
        f"sections (a)+(b) drifted"
    )
    # and the parsed window must agree with the dict's actual order
    qs = list(entrymod.queries())
    assert qs[:50] == scored


def test_window_rows_only_entries_are_documented_and_stale():
    """r14 policy: rows-only gates MAY sit in the scored window, but
    only as staleness rotation — each must be in the documented
    rows-only allowlist AND must be either never-officially-scored or
    older-scored than every hash gate left outside the window (no
    crowding fresh rows-only checks in over stale hash gates)."""
    import glob
    import json

    oracles = set(entrymod.oracle_sql())
    scored = list(entrymod.queries())[:50]
    rows_only_in_window = [q for q in scored if q not in oracles]
    allow = _rows_only_allowlist()
    undocumented = [q for q in rows_only_in_window if q not in allow]
    assert not undocumented, (
        f"rows-only window entries without a documented reason: "
        f"{undocumented}"
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    # The window is judged against the state that PRODUCED it: the
    # driver drops the current round's CORRECTNESS file after source
    # freezes, and counting the window's own fresh scores would flag
    # every rotated entry as "too fresh" (r14 verdict, What's wrong
    # #1). Exclude the max-round file from the ledger.
    if paths:
        rounds = [
            int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
            for p in paths
        ]
        max_round = max(rounds)
        paths = [p for p, r in zip(paths, rounds) if r != max_round]
    last = {}
    for path in paths:
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for gate in json.load(open(path)):
            last[gate] = max(rnd, last.get(gate, 0))
    outside_hash = [
        q for q in list(entrymod.queries())[50:] if q in oracles and q in last
    ]
    if outside_hash:
        freshest_allowed = min(last[q] for q in outside_hash)
        too_fresh = [
            q
            for q in rows_only_in_window
            if q in last and last[q] > freshest_allowed
        ]
        assert not too_fresh, (
            f"rows-only window entries fresher than the stalest "
            f"outside hash gate (r{freshest_allowed}): {too_fresh}"
        )


def _rows_only_allowlist():
    """The documented rows-only contracts (non-SQL-expressible)."""
    return {
        "q_bytelevel_bpe",  # iterative byte-level merges (golden-tested)
        "q_filter_interaction_entries",  # iterated fixpoint
        "q_discretize_greedy",  # greedy merge order not SQL-expressible
        "q_random_next_n_split",  # seeded RNG
        "q_two_stage_split_sizes",  # seeded sampling
        "q_kfolds_sizes",  # seeded fold assignment
        "q_corpus_mix",  # seeded sampling
        "q_als_recs",  # iterative factorization
        "q_word2vec_recs",  # iterative embedding
        "q_thompson_scores",  # seeded posterior draw
        "q_cluster_rec",  # kmeans iterations
        "q_slim_similarity",  # coordinate-descent iterations
        "q_doc_fingerprints",  # md5 variant carries the hash oracle
        "q_minhash_candidates",  # md5 variant carries the hash oracle
        "q_ivf_ann",  # approximate; q_ivf_ann_fixed carries the oracle
        "q_e2e_eval",  # multi-model composition (ALS inside)
        "q_discretize_quantile",  # approxQuantile bin edges
        "q_bpe_tokens",  # iterative merge loop (golden+parity tested)
        "q_pq_ann",  # seeded kmeans codebooks; fixed twin carries hash
        "q_ivfpq_ann",  # seeded kmeans cells+codebooks (recall-tested)
        "q_sample_top_k",  # seeded sampling
        "q_simhash_fingerprints",  # md5 pairs variant carries the hash
        "q_hnsw_ann",  # seeded graph walk; recall-tested vs brute force
        "q_kmeans_fit",  # float centroid means; assign twin carries hash
        "q_pca_fit",  # eigendecomposition; project twin carries hash
        "q_quality_classifier",  # seeded LogisticRegression
        "q_textrank",  # iterative per-doc PageRank
        "q_bin_pack",  # FFD heuristic order not SQL-expressible
        "q_pagerank",  # iterative propagation
        "q_compression_ratio",  # zlib internals
        "q_spectrogram",  # FFT
    }


def test_scored_window_has_oracle_or_documented_rows_only():
    # every scored query needs an oracle; the known rows-only
    # contracts are the documented exceptions
    rows_only = _rows_only_allowlist()
    oracles = set(entrymod.oracle_sql())
    scored = list(entrymod.queries())[:50]
    missing = [q for q in scored if q not in oracles and q not in rows_only]
    assert not missing, f"scored queries with no oracle and no note: {missing}"


def test_every_registered_gate_listed_in_coverage_md():
    """COVERAGE.md is the judge-facing inventory; the r6 and r8
    verdicts both caught it drifting behind the registry tail. Every
    queries() entry must appear in it (as a gate column or in the
    variants appendix)."""
    cov_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COVERAGE.md",
    )
    cov = open(cov_path).read()
    missing = [q for q in entrymod.queries() if q not in cov]
    assert not missing, (
        f"gates registered but not listed in COVERAGE.md: {missing}"
    )


def test_readme_bench_table_synced_to_newest_bench_json():
    """The r6/r8/r9 verdicts each caught the README bench tables
    drifting from the shipped numbers. Mechanical sync contract:
    (a) the 'Generated from `X`' banner names a file that EXISTS in
    the repo; (b) the README/PLANS table blocks are BYTE-IDENTICAL
    to what tools/render_bench_tables.py renders from that file —
    hand-edits are impossible, not just bounded; (c) the headline
    total stays inside a coarse sanity band of the newest committed
    BENCH_r*.json (quiet-box-vs-driver gaps run ~25%; the r9 rot —
    2.5x-stale sf1 rows from a file not in the repo — cannot)."""
    import glob
    import json
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readme = open(os.path.join(root, "README.md")).read()
    start = readme.index("<!-- BENCH_SF1_TABLE start")
    end = readme.index("BENCH_SF1_TABLE end") + len(
        "BENCH_SF1_TABLE end -->"
    )
    block = readme[start:end]
    m = re.search(r"Generated from `([^`]+)`", block)
    assert m, "bench table banner missing"
    src = m.group(1)
    src_path = None
    for cand in (os.path.join(root, src),
                 os.path.join(root, "bench_runs", src)):
        if os.path.exists(cand):
            src_path = cand
            break
    assert src_path, (
        f"bench table banner names a file not in the repo: {src}"
    )
    # (b) regeneration fidelity: README block == rendered block
    sys.path.insert(0, os.path.join(root, "tools"))
    import render_bench_tables as rbt

    parsed, _ = rbt._load(src_path)
    rendered = rbt.render(parsed, src)
    assert block.strip() == rendered.strip(), (
        "README bench table differs from a fresh render of its own "
        "banner source — rerun tools/render_bench_tables.py --write"
    )
    plans = open(os.path.join(root, "PLANS.md")).read()
    assert rendered.strip() in plans, (
        "PLANS.md bench table differs from the render — rerun "
        "tools/render_bench_tables.py --write"
    )
    # (c) coarse sanity vs the newest driver record
    t = re.search(r"Headline warm total ([0-9.]+) s", block)
    assert t, "bench table missing headline total"
    readme_total = float(t.group(1))
    newest = None
    for p in sorted(glob.glob(os.path.join(root, "BENCH_r*.json")),
                    reverse=True):
        rec = json.load(open(p))
        parsed = rec.get("parsed") if isinstance(rec, dict) else None
        if parsed and parsed.get("value"):
            newest = (p, float(parsed["value"]))
            break
    assert newest, "no parsable BENCH_r*.json"
    path, bench_total = newest
    ratio = readme_total / bench_total
    assert 0.6 <= ratio <= 1.4, (
        f"README headline total {readme_total}s is not in the same "
        f"ballpark as {os.path.basename(path)}'s {bench_total}s "
        f"(ratio {ratio:.2f}) — stale table or a real regression"
    )


def test_staleness_ledger_matches_files():
    """The r10 docstring claimed 'no official score predates r7';
    recomputation over the CORRECTNESS files showed 67 gates at
    r4-r6. This test makes that claim class impossible to hand-wave:
    the queries() docstring must carry a staleness ledger whose
    numbers are RECOMPUTED here from CORRECTNESS_r*.json — 'as of
    rM' pins the file set, so the claim stays true after later
    rounds land new files."""
    import glob
    import json

    doc = entrymod.queries.__doc__
    flat = " ".join(doc.split())
    m = re.search(
        r"as of\s+r(\d+) the oldest official hash-gate score is "
        r"r(\d+) \((\d+) gates\), and (\d+) hash gates await a "
        r"first official score",
        flat,
    )
    assert m, "queries() docstring is missing the hash staleness ledger"
    as_of, oldest_claim, n_oldest_claim, n_unscored_claim = map(
        int, m.groups()
    )
    m2 = re.search(
        r"over the full registry the oldest official score is "
        r"r(\d+) \((\d+) gates\), and (\d+) gates of any kind await "
        r"a first official score",
        flat,
    )
    assert m2, (
        "queries() docstring is missing the full-registry staleness "
        "ledger (the r13 verdict: rows-only gates went officially "
        "dark while the hash ledger looked clean)"
    )
    full_oldest_claim, full_n_oldest_claim, full_unscored_claim = map(
        int, m2.groups()
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        if rnd > as_of:
            continue
        for gate in json.load(open(path)):
            last[gate] = max(rnd, last.get(gate, 0))
    assert any(last.values()), "no CORRECTNESS files up to the as-of round"

    all_gates = list(entrymod.queries())
    hash_gates = [q for q in all_gates if q in entrymod.oracle_sql()]
    scored = {q: last[q] for q in hash_gates if q in last}
    oldest = min(scored.values())
    n_oldest = sum(1 for v in scored.values() if v == oldest)
    n_unscored = sum(1 for q in hash_gates if q not in last)
    assert (oldest, n_oldest, n_unscored) == (
        oldest_claim,
        n_oldest_claim,
        n_unscored_claim,
    ), (
        f"hash staleness ledger drifted: docstring says oldest r"
        f"{oldest_claim} ({n_oldest_claim} gates) / {n_unscored_claim}"
        f" unscored, files say oldest r{oldest} ({n_oldest} gates) / "
        f"{n_unscored} unscored — update the queries() docstring"
    )
    # the FULL registry (hash + rows-only): the r13 verdict caught
    # rows-only gates stranded at r4 while the hash ledger was clean
    full_scored = {q: last[q] for q in all_gates if q in last}
    full_oldest = min(full_scored.values())
    full_n_oldest = sum(
        1 for v in full_scored.values() if v == full_oldest
    )
    full_unscored = sum(1 for q in all_gates if q not in last)
    assert (full_oldest, full_n_oldest, full_unscored) == (
        full_oldest_claim,
        full_n_oldest_claim,
        full_unscored_claim,
    ), (
        f"full-registry staleness ledger drifted: docstring says "
        f"oldest r{full_oldest_claim} ({full_n_oldest_claim} gates) /"
        f" {full_unscored_claim} unscored, files say oldest "
        f"r{full_oldest} ({full_n_oldest} gates) / {full_unscored} "
        "unscored — update the queries() docstring"
    )
    # the rotation policy must actually hold over the FULL registry:
    # the window must contain gates AT the oldest official round and
    # every never-scored gate (rotating toward anything else strands
    # the tail the r13 verdict flagged)
    window = list(entrymod.queries())[:50]
    oldest_in_window = [
        q for q in window if full_scored.get(q) == full_oldest
    ]
    assert oldest_in_window, (
        f"no gate with the oldest official score (r{full_oldest}) is "
        "in the scored window — the rotation is not consuming the tail"
    )
    never_scored_outside = [
        q for q in all_gates if q not in last and q not in window
    ]
    assert not never_scored_outside, (
        f"never-officially-scored gates outside the window: "
        f"{never_scored_outside}"
    )
