#!/usr/bin/env python
"""Render README/PLANS bench tables FROM the shipped bench JSON.

Two rounds in a row the hand-copied sf1/warm tables drifted from the
numbers in BENCH_r{N}.json; this tool makes the docs mechanically
honest. It reads the newest bench record (or a file you point it at),
renders the sf1 scale table, and with ``--write`` splices it between
the ``<!-- BENCH_SF1_TABLE ... -->`` markers in README.md / PLANS.md.

Accepted inputs (first that works wins):
* a driver record ``BENCH_r{N}.json`` with non-null ``"parsed"``;
* a file whose last JSON-parsable line is bench.py's compact stdout
  line (run ``python bench.py > bench_out.txt`` locally);
* with neither given, the newest ``BENCH_r*.json`` in the repo root
  that has a non-null ``parsed`` field.

Usage:
    python tools/render_bench_tables.py [path] [--write]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

START = "<!-- BENCH_SF1_TABLE start (tools/render_bench_tables.py) -->"
END = "<!-- BENCH_SF1_TABLE end -->"


def _load(path: str | None) -> tuple[dict, str]:
    """Return (bench_dict, source_label)."""
    candidates = []
    if path:
        candidates = [path]
    else:
        candidates = sorted(
            glob.glob(os.path.join(ROOT, "BENCH_r*.json")), reverse=True
        )
        candidates += [os.path.join(ROOT, "bench_out.txt")]
    for p in candidates:
        if not os.path.exists(p):
            continue
        text = open(p).read()
        try:
            rec = json.loads(text)
            if isinstance(rec, dict) and rec.get("parsed"):
                return rec["parsed"], os.path.basename(p)
            if isinstance(rec, dict) and "queries" in rec:
                return rec, os.path.basename(p)
        except ValueError:
            pass
        # fall back: prefer the stderr "# FULL {...}" record (it
        # carries the [min, median] sf1 pairs the r11 compact line
        # dropped for capture-window budget), else the last
        # JSON-parsable line in the file
        for line in reversed(text.splitlines()):
            line = line.strip()
            if line.startswith("# FULL {"):
                try:
                    rec = json.loads(line[len("# FULL ") :])
                except ValueError:
                    continue
                if "queries" in rec:
                    return rec, os.path.basename(p)
        for line in reversed(text.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if "queries" in rec:
                    return rec, os.path.basename(p)
    raise SystemExit(
        "no parsable bench record found — run `python bench.py > "
        "bench_out.txt` or pass a BENCH_r{N}.json with non-null parsed"
    )


def render(parsed: dict, source: str) -> str:
    warm = parsed.get("queries") or {}
    sf1 = parsed.get("sf1") or {}
    lines = [
        START,
        f"Generated from `{source}` — do not hand-edit this table; "
        "rerun `python tools/render_bench_tables.py --write`.",
        "",
        "| query | sf0.1 warm | sf1 min (10× rows) | sf1 median | ratio (min) |",
        "|---|---|---|---|---|",
    ]
    for name, v1 in sf1.items():
        v01 = warm.get(name)
        if v1 is None:
            row = f"| {name} | — | ERROR | — | — |"
            lines.append(row)
            continue
        # r9+: sf1 values are [min, median]; older records are scalar
        vmin, vmed = (v1[0], v1[1]) if isinstance(v1, list) else (v1, v1)
        if v01:
            row = (
                f"| {name} | {v01:.2f} s | {vmin:.2f} s | {vmed:.2f} s | "
                f"{vmin / v01:.1f}× |"
            )
        else:
            row = (
                f"| {name} | (not in headline set) | {vmin:.2f} s | "
                f"{vmed:.2f} s | — |"
            )
        lines.append(row)
    total = parsed.get("value")
    cold = parsed.get("cold_total")
    tail = f"Headline warm total {total} s"
    if cold is not None:
        tail += f" (cold total {cold} s)"
    lines += ["", tail + f" at sf={parsed.get('sf')}.", END]
    return "\n".join(lines)


def splice(path: str, block: str) -> bool:
    text = open(path).read()
    pat = re.compile(
        re.escape(START) + r".*?" + re.escape(END), flags=re.S
    )
    if not pat.search(text):
        return False
    open(path, "w").write(pat.sub(lambda _: block, text))
    return True


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--write"]
    write = "--write" in sys.argv[1:]
    parsed, source = _load(args[0] if args else None)
    block = render(parsed, source)
    print(block)
    if write:
        for doc in ("README.md", "PLANS.md"):
            p = os.path.join(ROOT, doc)
            ok = splice(p, block)
            print(
                f"# {doc}: {'updated' if ok else 'NO MARKERS — skipped'}",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
