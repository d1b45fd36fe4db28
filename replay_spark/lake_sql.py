"""SQL DML over lake views — ``INSERT`` / ``UPDATE`` / ``DELETE`` /
``MERGE INTO`` statements against a :meth:`LakeTable.to_view` name, routed through
the table's existing Python DML (same commits, same change feed,
same constraints), so a user coming from Delta SQL keeps their
statements.

``to_view`` registers the name; :func:`lake_sql` parses the statement
with a thin dispatcher (identifier target, top-level-comma SET list,
equality-key merge ON) and calls ``update()`` / ``delete()`` /
``merge()`` / ``append()`` / ``overwrite()``. The maintenance
vocabulary rides along: ``OPTIMIZE name [WHERE col = val]
[ZORDER BY (c1, c2)]``, ``VACUUM name [RETAIN n VERSIONS] [DRY
RUN]`` (bare VACUUM = orphan-only GC), ``DESCRIBE HISTORY name``,
and ``RESTORE name TO VERSION AS OF n``; ``CREATE [OR REPLACE]
TABLE name LOCATION 'path' [PARTITIONED BY (cols)] AS query``
creates (or version-overwrites — the old snapshot stays
time-travelable, and the replacement keeps its PARTITIONED BY) a
lake table and registers the view. Schema evolution and constraints
ride the same dispatcher: ``ALTER TABLE name ADD COLUMN c type`` /
``RENAME COLUMN a TO b`` / ``DROP COLUMN c`` (all metadata-only
commits) and ``ADD CONSTRAINT n CHECK (expr)`` / ``DROP CONSTRAINT
n``. ``MERGE`` takes ``WHEN MATCHED [AND <cond>] THEN UPDATE SET *
| UPDATE SET c = expr, ... | DELETE``, ``WHEN NOT MATCHED [AND
<cond>] THEN INSERT *`` (insert-only merges append file-granularly
with zero rewrites), and ``WHEN NOT MATCHED BY SOURCE [AND <cond>]
THEN UPDATE SET ... | DELETE`` (full-table scope, like Delta); ``INSERT INTO|OVERWRITE v [(c1, c2, ...)]`` binds by
position without the list and by NAME with it (unlisted generated
columns are computed, other unlisted columns null-fill). Anything that is not DML on a registered lake view —
every SELECT, and DML in dialect corners the thin parser does not
cover — falls through to ``spark.sql`` untouched, which for
unregistered views keeps Spark's own error surface. After a DML the
view is re-registered at the new version, so subsequent ``spark.sql``
reads see the write.

Scale shape: parsing is driver-side string work; the DML itself is
the lake's file-granular rewrite / deletion-vector machinery, so a
SQL ``UPDATE`` on a 100 TB table still rewrites only the touched
files.

Cites reference behavior gap: the reference (sb-ai-lab/RePlay) has no
table format or SQL DML; this follows the public Delta Lake SQL DML
surface (UPDATE/DELETE/MERGE INTO) re-expressed for this log.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

__all__ = ["lake_sql"]


def _split_top_level(text: str, sep: str = ",") -> List[str]:
    """Split on ``sep`` outside parentheses and quotes."""
    parts, depth, buf = [], 0, []
    quote: Optional[str] = None
    for ch in text:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"', "`"):
            quote = ch
            buf.append(ch)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<name>[A-Za-z_]\w*)\s+SET\s+(?P<body>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<name>[A-Za-z_]\w*)"
    r"(?:\s+WHERE\s+(?P<where>.+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>[A-Za-z_]\w*)"
    r"(?:\s+(?:AS\s+)?(?P<talias>[A-Za-z_]\w*))?"
    r"\s+USING\s+(?P<source>\((?:[^()]|\([^()]*\))*\)|[A-Za-z_][\w.]*)"
    r"(?:\s+(?:AS\s+)?(?P<salias>[A-Za-z_]\w*))?"
    r"\s+ON\s+(?P<on>.+?)"
    r"(?P<clauses>\s+WHEN\s+.+)$",
    re.IGNORECASE | re.DOTALL,
)
_ASSIGN_RE = re.compile(
    r"^\s*(?:[A-Za-z_]\w*\s*\.\s*)?"  # optional target qualifier
    r"`?(?P<col>[A-Za-z_]\w*)`?\s*=\s*(?P<expr>.+)$",
    re.DOTALL,
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(?P<kind>INTO|OVERWRITE)\s+(?:TABLE\s+)?"
    r"(?P<name>[A-Za-z_]\w*)\s*"
    r"(?:\(\s*(?P<cols>`?[A-Za-z_]\w*`?(?:\s*,\s*`?[A-Za-z_]\w*`?)*)"
    r"\s*\)\s*)?"
    r"(?P<query>(?:SELECT|VALUES|TABLE|WITH|\()"
    r".*)$",
    re.IGNORECASE | re.DOTALL,
)
# keywords that start a parenthesized QUERY, not a column list:
# `INSERT INTO v (SELECT ...)` must not parse "SELECT" as a column
_QUERY_STARTERS = {"select", "values", "table", "with"}
_CREATE_RE = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?TABLE\s+(?P<name>[A-Za-z_]\w*)"
    r"\s+LOCATION\s+'(?P<path>[^']+)'"
    r"(?:\s+PARTITIONED\s+BY\s+\(?(?P<pcols>[^)]+?)\)?)?"
    r"\s+AS\s+(?P<query>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+(?P<name>[A-Za-z_]\w*)"
    r"(?:\s+WHERE\s+`?(?P<pcol>[A-Za-z_]\w*)`?\s*=\s*(?P<pval>"
    r"'[^']*'|\"[^\"]*\"|\S+))?"
    r"(?:\s+ZORDER\s+BY\s+\(?(?P<zcols>[^)]+?)\)?)?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+(?P<name>[A-Za-z_]\w*)"
    r"(?:\s+RETAIN\s+(?P<n>\d+)\s+VERSIONS?)?"
    r"(?:\s+(?P<dry>DRY\s+RUN))?\s*$",
    re.IGNORECASE,
)
_HISTORY_RE = re.compile(
    r"^\s*DESCRIBE\s+HISTORY\s+(?P<name>[A-Za-z_]\w*)\s*$",
    re.IGNORECASE,
)
_DETAIL_RE = re.compile(
    r"^\s*DESCRIBE\s+DETAIL\s+(?P<name>[A-Za-z_]\w*)\s*$",
    re.IGNORECASE,
)
_RESTORE_RE = re.compile(
    r"^\s*RESTORE\s+(?:TABLE\s+)?(?P<name>[A-Za-z_]\w*)\s+TO\s+"
    r"VERSION\s+AS\s+OF\s+(?P<v>\d+)\s*$",
    re.IGNORECASE,
)
_MATCHED_RE = re.compile(
    r"WHEN\s+MATCHED\s*"
    r"(?:AND\s+(?P<cond>.+?)\s+)?"
    r"THEN\s+(?P<action>UPDATE\s+SET\s+.+?|DELETE)\s*"
    r"(?=WHEN\s+(?:NOT\s+)?MATCHED|$)",
    re.IGNORECASE | re.DOTALL,
)
_NOT_MATCHED_RE = re.compile(
    r"WHEN\s+NOT\s+MATCHED\s*(?!BY\s+SOURCE)"
    r"(?:AND\s+(?P<cond>.+?)\s+)?THEN\s+INSERT\s+\*",
    re.IGNORECASE | re.DOTALL,
)
_BY_SOURCE_RE = re.compile(
    r"WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s*"
    r"(?:AND\s+(?P<cond>.+?)\s+)?THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+.+?|DELETE)\s*"
    r"(?=WHEN\s+(?:NOT\s+)?MATCHED|$)",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_ADD_COL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[A-Za-z_]\w*)\s+ADD\s+COLUMNS?\s+"
    r"(?P<body>.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _parse_add_column(body: str) -> Tuple[str, str]:
    """``[ ( ] col type [ ) ]`` with depth-aware comma detection so
    ``decimal(10,2)`` / ``map<string,int>`` parse and a genuine
    multi-column list raises the one-per-statement error."""
    body = body.strip()
    # strip ONE wrapping paren pair (the whole body, not a type's)
    if body.startswith("(") and body.endswith(")"):
        depth = 0
        wraps = True
        for i, ch in enumerate(body):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i != len(body) - 1:
                    wraps = False
                    break
        if wraps:
            body = body[1:-1].strip()
    depth = 0
    for ch in body:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            raise ValueError(
                "lake_sql: ALTER TABLE ADD COLUMN takes one column "
                "per statement"
            )
    m = re.match(r"^`?([A-Za-z_]\w*)`?\s+(.+)$", body, re.DOTALL)
    if not m:
        raise ValueError(
            f"lake_sql: cannot parse ADD COLUMN body {body!r} "
            "(expected `column type`)"
        )
    return m.group(1), m.group(2).strip()
_ALTER_RENAME_COL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[A-Za-z_]\w*)\s+RENAME\s+COLUMN\s+"
    r"`?(?P<old>[A-Za-z_]\w*)`?\s+TO\s+`?(?P<new>[A-Za-z_]\w*)`?\s*$",
    re.IGNORECASE,
)
_ALTER_DROP_COL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[A-Za-z_]\w*)\s+DROP\s+COLUMNS?\s+"
    r"\(?\s*`?(?P<col>[A-Za-z_]\w*)`?\s*\)?\s*$",
    re.IGNORECASE,
)
_ALTER_ADD_CONSTRAINT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[A-Za-z_]\w*)\s+ADD\s+CONSTRAINT\s+"
    r"(?P<cname>[A-Za-z_]\w*)\s+CHECK\s*\((?P<expr>.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_DROP_CONSTRAINT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[A-Za-z_]\w*)\s+DROP\s+CONSTRAINT\s+"
    r"(?P<cname>[A-Za-z_]\w*)\s*$",
    re.IGNORECASE,
)
_RESERVED_AFTER_SOURCE = {"on"}
_QUAL_REF_RE = re.compile(r"\b([A-Za-z_]\w*)\s*\.\s*`?(\w+)`?")


def _split_set_where(body: str) -> Tuple[str, Optional[str]]:
    """Split ``SET ... [WHERE ...]`` at the top-level WHERE."""
    depth = 0
    quote: Optional[str] = None
    upper = body.upper()
    i = 0
    while i < len(body):
        ch = body[i]
        if quote:
            if ch == quote:
                quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and upper.startswith("WHERE", i)
            and (i == 0 or not body[i - 1].isalnum())
            and (
                i + 5 >= len(body)
                or not (body[i + 5].isalnum() or body[i + 5] == "_")
            )
        ):
            return body[:i].strip(), body[i + 5 :].strip()
        i += 1
    return body.strip(), None


def _parse_assignments(set_clause: str) -> Dict[str, str]:
    out: Dict[str, str] = {}
    for item in _split_top_level(set_clause):
        m = _ASSIGN_RE.match(item)
        if not m:
            raise ValueError(
                f"lake_sql: cannot parse SET assignment {item!r} "
                "(expected `column = expression`)"
            )
        out[m.group("col")] = m.group("expr").strip()
    if not out:
        raise ValueError("lake_sql: UPDATE has an empty SET list")
    return out


def _outside_quotes_spans(expr: str) -> List[Tuple[int, int, bool]]:
    """Split ``expr`` into (start, end, is_quoted) spans so rewrites
    can skip string literals — ``SET note = 't.bak'`` must not have
    its LITERAL rewritten as a column reference."""
    spans = []
    i, start = 0, 0
    quote: Optional[str] = None
    while i < len(expr):
        ch = expr[i]
        if quote:
            if ch == quote:
                # SQL doubles quotes to escape them ('it''s')
                if i + 1 < len(expr) and expr[i + 1] == quote:
                    i += 2
                    continue
                spans.append((start, i + 1, True))
                start = i + 1
                quote = None
        elif ch in ("'", '"'):
            if start < i:
                spans.append((start, i, False))
            start = i
            quote = ch
        i += 1
    if start < len(expr):
        spans.append((start, len(expr), quote is not None))
    return spans


def _sub_outside_quotes(pattern: "re.Pattern", repl, expr: str) -> str:
    """``pattern.sub(repl, ...)`` applied only OUTSIDE quoted string
    literals."""
    out = []
    for s, e, quoted in _outside_quotes_spans(expr):
        seg = expr[s:e]
        out.append(seg if quoted else pattern.sub(repl, seg))
    return "".join(out)


def _rewrite_merge_refs(
    expr: str, target_quals: set, source_quals: set
) -> str:
    """Map the statement's alias-qualified references onto
    :func:`merge_into`'s expression namespace: target columns BARE,
    source columns as ``source.<col>``. Unknown qualifiers (struct
    field access, function-result fields) pass through untouched;
    quoted string literals are never rewritten."""

    def sub(m: "re.Match") -> str:
        q, c = m.group(1), m.group(2)
        ql = q.lower()
        if ql in source_quals:
            return f"source.`{c}`"
        if ql in target_quals:
            return f"`{c}`"
        return m.group(0)

    return _sub_outside_quotes(_QUAL_REF_RE, sub, expr)


def _parse_on_keys(on_clause: str, aliases: set) -> List[str]:
    """Equality-key ON: ``a.k = b.k [AND ...]`` where both sides name
    the SAME column (possibly alias-qualified) -> [k, ...]."""
    keys = []
    for term in re.split(r"\s+AND\s+", on_clause.strip(), flags=re.IGNORECASE):
        m = re.match(
            r"^\s*(?:(\w+)\.)?`?(\w+)`?\s*=\s*(?:(\w+)\.)?`?(\w+)`?\s*$",
            term,
        )
        if not m or m.group(2) != m.group(4):
            raise ValueError(
                f"lake_sql: MERGE ON term {term!r} is not an "
                "equality on one column name (the supported subset "
                "is `t.k = s.k AND ...`); use LakeTable.merge() for "
                "anything richer"
            )
        for q in (m.group(1), m.group(3)):
            if q is not None and q not in aliases:
                raise ValueError(
                    f"lake_sql: MERGE ON qualifier {q!r} names "
                    f"neither side (aliases: {sorted(aliases)})"
                )
        keys.append(m.group(2))
    return keys


def lake_sql(spark, statement: str, mode: str = "rewrite"):
    """Execute ``statement``. DML (``INSERT [INTO|OVERWRITE]`` /
    ``UPDATE`` / ``DELETE`` / ``MERGE INTO``) whose target is a lake view registered by
    :meth:`LakeTable.to_view` routes through the table's Python DML
    and returns the new commit version (int); everything else runs
    through ``spark.sql`` and returns its DataFrame.

    ``mode`` picks the UPDATE/DELETE strategy: ``"rewrite"`` (file
    rewrite, default) or ``"dv"`` (merge-on-read deletion vectors).
    Supported DML subset: identifier view names, ``SET col = expr``
    lists, any WHERE expression, and equality-key ``MERGE`` with
    ``WHEN MATCHED [AND <cond>] THEN UPDATE SET * | UPDATE SET
    c = expr, ... | DELETE`` / ``WHEN NOT MATCHED THEN INSERT *``
    actions (merge expressions may qualify columns with either
    side's alias), plus by-name ``INSERT INTO v (c1, c2)`` and
    ``ALTER TABLE`` column/constraint evolution — the shapes the
    Python API expresses; richer statements raise with a pointer to
    the Python method.
    """
    from replay_spark.lake import LakeTable

    from replay_spark.lake import _view_fingerprint

    stmt = statement.strip().rstrip(";").strip()
    first = stmt.split(None, 1)[0].upper() if stmt else ""

    class _Registry:
        """Live lake-view lookup with staleness checks: a name only
        routes to a table's DML while (a) the registering
        SparkSession is THIS session, (b) the temp view still exists
        in the catalog, and (c) its current plan matches the one
        to_view registered (a plain createOrReplaceTempView that
        shadows the name changes the plan → fall through to
        spark.sql instead of mutating the old table behind it)."""

        def __init__(self):
            # one staleness check per statement: __contains__ and
            # _resolve share the result instead of re-running the
            # catalog lookup + plan fingerprint 2-3x per DML
            self._memo: Dict[str, Optional[dict]] = {}

        def _entry(self, name: str):
            if name in self._memo:
                return self._memo[name]
            result = self._check(name)
            self._memo[name] = result
            return result

        def _check(self, name: str):
            entry = LakeTable._view_registry.get(name)
            if entry is None:
                return None
            session = entry["session"]()
            if session is None or session is not spark:
                return None
            try:
                if not spark.catalog.tableExists(name):
                    LakeTable._view_registry.pop(name, None)
                    return None
            except Exception:
                pass
            fp = entry["fingerprint"]
            if fp is not None:
                current = _view_fingerprint(spark, name)
                if current is not None and current != fp:
                    # shadowed by a different view definition
                    LakeTable._view_registry.pop(name, None)
                    return None
            return entry

        def __contains__(self, name: str) -> bool:
            return self._entry(name) is not None

    registry = _Registry()

    def _table_for(entry: dict) -> "LakeTable":
        # rebuild with the REGISTERING table's constructor options
        # (checkpoint cadence, write-time auto-compaction) so SQL
        # DML behaves exactly like the Python API on the same table
        return LakeTable(spark, entry["path"], **entry.get("init", {}))

    def _resolve(name: str) -> "LakeTable":
        entry = registry._entry(name)
        if entry is None:
            raise KeyError(name)
        if entry["snapshot"]:
            raise ValueError(
                f"lake_sql: view {name!r} is a time-travel snapshot; "
                "DML targets the live table — register the tip with "
                f"to_view({name!r}) first"
            )
        return _table_for(entry)

    if first == "CREATE":
        m = _CREATE_RE.match(stmt)
        if m:
            replace = bool(
                re.match(r"^\s*CREATE\s+OR\s+REPLACE\b", stmt, re.IGNORECASE)
            )
            table = LakeTable(spark, m.group("path"))
            exists = table.latest_version() >= 0
            if exists and not replace:
                raise ValueError(
                    f"lake_sql: a lake table already exists at "
                    f"{m.group('path')!r}; use CREATE OR REPLACE TABLE"
                )
            df = spark.sql(m.group("query"))
            pcols = (
                [c.strip().strip("`") for c in m.group("pcols").split(",")]
                if m.group("pcols")
                else None
            )
            if exists:
                # pass the parsed partition columns through — a
                # CREATE OR REPLACE ... PARTITIONED BY must agree
                # with a fresh CREATE (r14 advice: silently dropping
                # the clause loses pruning on the replacement)
                version = table.overwrite(df, partition_by=pcols)
            else:
                version = table.append(df, partition_by=pcols)
            table.to_view(m.group("name"))
            return version
    elif first == "OPTIMIZE":
        m = _OPTIMIZE_RE.match(stmt)
        if m and m.group("name") in registry:
            table = _resolve(m.group("name"))
            pf = None
            if m.group("pcol"):
                val = m.group("pval")
                if val[0] in "'\"" and val[0] == val[-1]:
                    val = val[1:-1]
                pf = {m.group("pcol"): val}
            z = (
                [c.strip().strip("`") for c in m.group("zcols").split(",")]
                if m.group("zcols")
                else None
            )
            version = table.optimize(zorder_by=z, partition_filter=pf)
            table.to_view(m.group("name"))
            return version
    elif first == "VACUUM":
        m = _VACUUM_RE.match(stmt)
        if m and m.group("name") in registry:
            table = _resolve(m.group("name"))
            # bare VACUUM = orphan-only GC (maximally conservative);
            # RETAIN n VERSIONS ratchets the retention horizon
            return table.vacuum(
                retain_last=int(m.group("n")) if m.group("n") else None,
                dry_run=bool(m.group("dry")),
            )
    elif first == "DESCRIBE":
        m = _HISTORY_RE.match(stmt)
        if m and m.group("name") in registry:
            # read-only: snapshot views are served too
            return _table_for(registry._entry(m.group("name"))).history()
        m = _DETAIL_RE.match(stmt)
        if m and m.group("name") in registry:
            # one-row frame of table facts (Delta's DESCRIBE DETAIL
            # shape); complex values render as JSON strings so the
            # row stays flat and stable. Read-only: snapshot views
            # are served too (detail() is always about the live
            # table at the path, like Delta's)
            import json as _json

            from pyspark.sql.types import (
                DoubleType,
                LongType,
                StringType,
                StructField as _SF,
                StructType as _ST,
            )

            detail = _table_for(
                registry._entry(m.group("name"))
            ).detail()
            row, fields = {}, []
            for k, v in sorted(detail.items()):
                if isinstance(v, bool):
                    v = str(v)
                if isinstance(v, int):
                    t = LongType()
                elif isinstance(v, float):
                    t = DoubleType()
                else:
                    t = StringType()
                    if v is not None and not isinstance(v, str):
                        v = _json.dumps(v, sort_keys=True, default=str)
                row[k] = v
                fields.append(_SF(k, t, True))
            return spark.createDataFrame([row], _ST(fields))
    elif first == "RESTORE":
        m = _RESTORE_RE.match(stmt)
        if m and m.group("name") in registry:
            table = _resolve(m.group("name"))
            version = table.restore(int(m.group("v")))
            table.to_view(m.group("name"))
            return version
    elif first == "ALTER":
        for rx, op in (
            (_ALTER_RENAME_COL_RE, "rename"),
            (_ALTER_DROP_CONSTRAINT_RE, "drop_constraint"),
            (_ALTER_ADD_CONSTRAINT_RE, "add_constraint"),
            (_ALTER_DROP_COL_RE, "drop_col"),
            (_ALTER_ADD_COL_RE, "add_col"),
        ):
            m = rx.match(stmt)
            if m and m.group("name") in registry:
                table = _resolve(m.group("name"))
                if op == "rename":
                    version = table.rename_column(
                        m.group("old"), m.group("new")
                    )
                elif op == "drop_constraint":
                    version = table.drop_constraint(m.group("cname"))
                elif op == "add_constraint":
                    version = table.add_constraint(
                        m.group("cname"), m.group("expr").strip()
                    )
                elif op == "drop_col":
                    version = table.drop_column(m.group("col"))
                else:
                    col, dtype = _parse_add_column(m.group("body"))
                    version = table.add_column(col, dtype)
                table.to_view(m.group("name"))
                return version
    elif first == "UPDATE":
        m = _UPDATE_RE.match(stmt)
        if m and m.group("name") in registry:
            table = _resolve(m.group("name"))
            set_clause, where = _split_set_where(m.group("body"))
            version = table.update(
                where if where is not None else "true",
                _parse_assignments(set_clause),
                mode=mode,
            )
            table.to_view(m.group("name"))
            return version
    elif first == "DELETE":
        m = _DELETE_RE.match(stmt)
        if m and m.group("name") in registry:
            table = _resolve(m.group("name"))
            version = table.delete(m.group("where") or "true", mode=mode)
            table.to_view(m.group("name"))
            return version
    elif first == "INSERT":
        m = _INSERT_RE.match(stmt)
        if m and m.group("name") in registry:
            table = _resolve(m.group("name"))
            cols_raw = m.group("cols")
            query = m.group("query")
            col_list = None
            if cols_raw is not None:
                col_list = [
                    c.strip().strip("`") for c in cols_raw.split(",")
                ]
                if (
                    len(col_list) == 1
                    and col_list[0].lower() in _QUERY_STARTERS
                ):
                    # `INSERT INTO v (SELECT)` corner: a one-token
                    # parenthesized query, not a column list —
                    # reassemble the original text
                    col_list = None
                    query = f"({cols_raw}) {query}".strip()
            df = spark.sql(query)
            schema = table.read().schema  # one snapshot resolve
            target_cols = schema.names
            if col_list is not None:
                # by-NAME binding (Delta/Spark `INSERT INTO v (a, b)`):
                # the query's output binds positionally to the listed
                # columns; unlisted GENERATED columns are omitted (the
                # write computes them), other unlisted columns fill
                # with typed nulls. Names resolve case-INsensitively
                # (Spark identifier semantics) onto the stored casing.
                by_lower = {c.lower(): c for c in target_cols}
                resolved = [by_lower.get(c.lower(), c) for c in col_list]
                dup = {c for c in resolved if resolved.count(c) > 1}
                if dup:
                    raise ValueError(
                        f"lake_sql: INSERT column list repeats "
                        f"{sorted(dup)}"
                    )
                unknown = [c for c in resolved if c not in target_cols]
                if unknown:
                    raise ValueError(
                        f"lake_sql: INSERT column list names columns "
                        f"not in view {m.group('name')!r}: {unknown}"
                    )
                if len(df.columns) != len(resolved):
                    raise ValueError(
                        f"lake_sql: INSERT query produces "
                        f"{len(df.columns)} columns, the column list "
                        f"names {len(resolved)}"
                    )
                col_list = resolved
                df = df.toDF(*col_list)
                from pyspark.sql import functions as _F

                gens = set(table.generated_columns())
                proj = []
                for c in target_cols:
                    if c in col_list:
                        # store-assignment cast (Delta semantics):
                        # `INSERT INTO v (id) SELECT 900` binds an
                        # int literal into a bigint column
                        proj.append(
                            _F.col(c).cast(schema[c].dataType).alias(c)
                        )
                    elif c in gens:
                        continue  # the write fills it
                    else:
                        proj.append(
                            _F.lit(None)
                            .cast(schema[c].dataType)
                            .alias(c)
                        )
                df = df.select(*proj)
            else:
                # SQL INSERT binds by POSITION (Delta semantics):
                # rename the query's output into the table's schema
                # order after an arity check, so `INSERT INTO v
                # SELECT a, b` works whatever the SELECT aliases are
                if len(df.columns) != len(target_cols):
                    raise ValueError(
                        f"lake_sql: INSERT query produces "
                        f"{len(df.columns)} columns, view "
                        f"{m.group('name')!r} has {len(target_cols)}"
                    )
                from pyspark.sql import functions as _F

                df = df.toDF(*target_cols)
                # store-assignment casts (Delta semantics): an INT
                # literal binds into a BIGINT column
                df = df.select(
                    *[
                        _F.col(c).cast(schema[c].dataType).alias(c)
                        for c in target_cols
                    ]
                )
            version = (
                table.overwrite(df)
                if m.group("kind").upper() == "OVERWRITE"
                else table.append(df)
            )
            table.to_view(m.group("name"))
            return version
    elif first == "MERGE":
        m = _MERGE_RE.match(stmt)
        if m and m.group("target") in registry:
            table = _resolve(m.group("target"))
            salias = m.group("salias")
            if salias and salias.lower() in _RESERVED_AFTER_SOURCE:
                salias = None
            src = m.group("source")
            source_df = (
                spark.sql(src[1:-1]) if src.startswith("(")
                else spark.table(src)
            )
            aliases = {
                a
                for a in (
                    m.group("target"), m.group("talias"),
                    src if not src.startswith("(") else None, salias,
                )
                if a
            }
            keys = _parse_on_keys(m.group("on"), aliases)
            clauses = m.group("clauses")
            matched_list = list(_MATCHED_RE.finditer(clauses))
            not_matched = _NOT_MATCHED_RE.search(clauses)
            by_source = _BY_SOURCE_RE.search(clauses)
            covered = (
                len(matched_list) + bool(not_matched) + bool(by_source)
            )
            if covered != len(
                re.findall(r"WHEN\s+(?:NOT\s+)?MATCHED", clauses,
                           flags=re.IGNORECASE)
            ):
                raise ValueError(
                    "lake_sql: MERGE supports WHEN MATCHED "
                    "[AND <cond>] THEN UPDATE SET * | UPDATE SET "
                    "c = expr, ... | DELETE clauses (several, "
                    "first-true-condition wins), one WHEN NOT "
                    "MATCHED [AND <cond>] THEN INSERT * clause, and "
                    "one WHEN NOT MATCHED BY SOURCE [AND <cond>] "
                    "THEN UPDATE SET ... | DELETE clause; use "
                    "LakeTable.merge() for richer shapes"
                )
            # expression namespace rewrite: the statement's aliases
            # -> merge_into's (target bare, source as `source.c`)
            tq = {
                a.lower()
                for a in (m.group("target"), m.group("talias"))
                if a
            }
            sq = {
                a.lower()
                for a in (
                    src if not src.startswith("(") else None, salias,
                )
                if a
            }
            m_clauses = []
            for mm in matched_list:
                action = mm.group("action").strip()
                cl = {"action": "delete", "condition": None, "set": None}
                if action.upper() != "DELETE":
                    cl["action"] = "update"
                    set_body = action[len("UPDATE"):].strip()
                    set_body = set_body[len("SET"):].strip()
                    if set_body != "*":
                        cl["set"] = {
                            col: _rewrite_merge_refs(expr, tq, sq)
                            for col, expr in _parse_assignments(
                                set_body
                            ).items()
                        }
                if mm.group("cond") is not None:
                    cl["condition"] = _rewrite_merge_refs(
                        mm.group("cond").strip(), tq, sq
                    )
                m_clauses.append(cl)
            when_matched = "ignore"
            update_set = None
            cond = None
            if len(m_clauses) == 1:
                when_matched = m_clauses[0]["action"]
                update_set = m_clauses[0]["set"]
                cond = m_clauses[0]["condition"]
                m_clauses = []
            nm_cond = not_matched.group("cond") if not_matched else None
            if nm_cond is not None:
                # insert conditions see SOURCE columns only (bare in
                # merge_into's namespace — there is no target row);
                # target-alias refs stay qualified and fail clearly
                nm_cond = _rewrite_merge_refs(nm_cond.strip(), sq, set())
            bs_action = "ignore"
            bs_cond = None
            bs_set = None
            if by_source is not None:
                act = by_source.group("action").strip()
                if act.upper() == "DELETE":
                    bs_action = "delete"
                else:
                    bs_action = "update"
                    set_body = act[len("UPDATE"):].strip()
                    set_body = set_body[len("SET"):].strip()
                    if set_body == "*":
                        raise ValueError(
                            "lake_sql: WHEN NOT MATCHED BY SOURCE "
                            "cannot UPDATE SET * (there is no source "
                            "row to copy) — name the columns"
                        )
                    # target columns only in scope: strip target
                    # qualifiers, leave source refs to fail clearly
                    bs_set = {
                        col: _rewrite_merge_refs(expr, tq, set())
                        for col, expr in _parse_assignments(
                            set_body
                        ).items()
                    }
                bs_cond = by_source.group("cond")
                if bs_cond is not None:
                    bs_cond = _rewrite_merge_refs(
                        bs_cond.strip(), tq, set()
                    )
            if not matched_list and not_matched is None and by_source is None:
                raise ValueError(
                    "lake_sql: MERGE has no recognizable WHEN clause"
                )
            version = table.merge(
                source_df,
                on=keys,
                when_matched=when_matched,
                when_not_matched="insert" if not_matched else "ignore",
                matched_condition=cond,
                update_set=update_set,
                matched_clauses=m_clauses or None,
                not_matched_condition=nm_cond,
                when_not_matched_by_source=bs_action,
                not_matched_by_source_condition=bs_cond,
                update_set_by_source=bs_set,
            )
            table.to_view(m.group("target"))
            return version
    return spark.sql(statement)
