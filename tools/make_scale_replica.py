#!/usr/bin/env python
"""Build a 10x scale replica of the sf0.1 documents/embeddings tables
for the dedup/ANN scale datapoint in bench.py.

The replica is DERIVED from the driver-provided testdata (never
hand-synthesized): each source row is replicated ``factor`` times with
a shifted id. Every token of a replica document carries a
replica-specific suffix, so replicas share NO word n-grams with their
source: the corpus becomes ``factor`` shingle-disjoint shards, each
with the same internal near-dup structure as sf0.1 — candidate-pair
and cluster workloads scale linearly with rows, which is exactly the
property a fair 10x scaling measurement needs (a near-dup replica
would quadratically inflate pairs instead). Embeddings are kept
bit-identical. Output parquet keeps the source schema so the same
``queries()`` entries run unchanged against the replica dir.

Usage: python tools/make_scale_replica.py [out_dir] [src_dir] [factor]
Importable: ``ensure_replica(out_dir, src_dir, factor)`` — reuses the
cached replica across rounds, but rebuilds when the SOURCE parquet
files change (a manifest of source sizes+mtimes is stored next to the
replica; the driver has refreshed testdata mid-history before, and a
pure existence check would silently keep benchmarking the old corpus).
"""

from __future__ import annotations

import json
import os
import sys

DEFAULT_SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sf1_bench"
)


def _source_manifest(src_dir: str, factor: int) -> dict:
    out = {"factor": factor}
    for name in (
        "documents.parquet",
        "embeddings.parquet",
        "events.parquet",
    ):
        p = os.path.join(src_dir, name)
        st = os.stat(p)
        out[name] = [st.st_size, int(st.st_mtime)]
    return out


def ensure_replica(
    out_dir: str = DEFAULT_OUT,
    src_dir: str = DEFAULT_SRC,
    factor: int = 10,
) -> str:
    docs_out = os.path.join(out_dir, "documents.parquet")
    embs_out = os.path.join(out_dir, "embeddings.parquet")
    evts_out = os.path.join(out_dir, "events.parquet")
    manifest_path = os.path.join(out_dir, "source_manifest.json")
    manifest = _source_manifest(src_dir, factor)
    if (
        os.path.exists(docs_out)
        and os.path.exists(embs_out)
        and os.path.exists(evts_out)
    ):
        try:
            with open(manifest_path) as fh:
                if json.load(fh) == manifest:
                    return out_dir
        except (OSError, ValueError):
            pass  # missing/corrupt manifest -> rebuild

    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    src_docs = os.path.join(src_dir, "documents.parquet")
    src_embs = os.path.join(src_dir, "embeddings.parquet")
    src_evts = os.path.join(src_dir, "events.parquet")
    con.execute(
        f"""
        COPY (
            WITH rep AS (
                SELECT doc_id + k.k * 1000000 AS doc_id,
                       CASE WHEN k.k = 0 THEN text
                            ELSE array_to_string(
                                list_transform(
                                    string_split_regex(text, '\\s+'),
                                    w -> w || 'x' || k.k),
                                ' ') END AS text,
                       lang, source
                FROM read_parquet('{src_docs}'), range({factor}) k(k))
            SELECT doc_id, text, lang, source,
                   length(text) AS n_chars
            FROM rep ORDER BY doc_id
        ) TO '{docs_out}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT vec_id + k.k * 1000000 AS vec_id, embedding, label
            FROM read_parquet('{src_embs}'), range({factor}) k(k)
            ORDER BY vec_id
        ) TO '{embs_out}' (FORMAT PARQUET)
        """
    )
    # events: 10x rows in USER-disjoint shards (user_id + k*10^7,
    # event_id + k*10^9) — user-keyed joins/aggregations (the
    # feature-store PIT join, the IVM group-by) scale linearly with
    # rows, which is what a real 10x user base does; timestamps and
    # payloads stay bit-identical so per-user work is unchanged.
    con.execute(
        f"""
        COPY (
            SELECT event_id + k.k * 1000000000 AS event_id, ts,
                   user_id + k.k * 10000000 AS user_id,
                   event_type, value, props
            FROM read_parquet('{src_evts}'), range({factor}) k(k)
            ORDER BY event_id
        ) TO '{evts_out}' (FORMAT PARQUET)
        """
    )
    con.close()
    with open(manifest_path, "w") as fh:
        json.dump(manifest, fh)
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    src = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_SRC
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    print(ensure_replica(out, src, factor))
