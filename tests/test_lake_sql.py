"""SQL DML on lake views: UPDATE / DELETE / MERGE INTO statements
against a to_view name route through the table's Python DML."""

import pyspark.sql.functions as F
import pytest

from replay_spark.lake import LakeTable
from replay_spark.lake_sql import lake_sql


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.append(
        spark.range(0, 40).select(
            "id",
            (F.col("id") * 2).alias("v"),
            (F.col("id") % 4).cast("string").alias("g"),
        )
    )
    t.to_view("sqlt")
    return t


def test_sql_update_routes_through_dml(spark, table):
    ver = lake_sql(
        spark, "UPDATE sqlt SET v = v + 100, g = 'hot' WHERE id < 5"
    )
    assert ver == table.latest_version()
    rows = {r["id"]: (r["v"], r["g"]) for r in table.read().collect()}
    assert rows[3] == (106, "hot") and rows[10] == (20, "2")
    # the view was refreshed: spark.sql sees the write
    assert (
        spark.sql("SELECT v FROM sqlt WHERE id = 3").collect()[0][0] == 106
    )
    # history records a real update commit
    ops = [r.operation for r in table.history().collect()]
    assert "update" in ops


def test_sql_delete_and_where_less_delete(spark, table):
    lake_sql(spark, "DELETE FROM sqlt WHERE id % 2 = 0")
    assert sorted(r["id"] for r in table.read().collect()) == list(
        range(1, 40, 2)
    )
    lake_sql(spark, "DELETE FROM sqlt")
    assert table.read().count() == 0


def test_sql_update_dv_mode(spark, table):
    lake_sql(spark, "UPDATE sqlt SET v = 0 WHERE id = 7", mode="dv")
    assert table.detail()["num_dv_files"] >= 1
    rows = {r["id"]: r["v"] for r in table.read().collect()}
    assert rows[7] == 0 and len(rows) == 40


def test_sql_merge_update_and_insert(spark, table):
    spark.range(38, 44).select(
        "id", F.lit(-1).alias("v"), F.lit("m").alias("g")
    ).createOrReplaceTempView("src")
    lake_sql(
        spark,
        "MERGE INTO sqlt t USING src s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    rows = {r["id"]: (r["v"], r["g"]) for r in table.read().collect()}
    assert len(rows) == 44
    assert rows[37] == (74, "1")           # untouched
    assert all(rows[i] == (-1, "m") for i in range(38, 44))


def test_sql_merge_delete_and_subquery_source(spark, table):
    lake_sql(
        spark,
        "MERGE INTO sqlt USING (SELECT id FROM sqlt WHERE id >= 30) s "
        "ON sqlt.id = s.id WHEN MATCHED THEN DELETE",
    )
    assert sorted(r["id"] for r in table.read().collect()) == list(range(30))


def test_sql_select_passthrough_and_unregistered(spark, table):
    df = lake_sql(spark, "SELECT count(*) AS n FROM sqlt")
    assert df.collect()[0]["n"] == 40
    # DML on a non-lake name falls through to spark.sql's own error
    with pytest.raises(Exception):
        lake_sql(spark, "DELETE FROM not_a_lake_view WHERE 1=1")


def test_sql_dml_on_snapshot_view_rejected(spark, table):
    table.append(spark.range(40, 50).select(
        "id", (F.col("id") * 2).alias("v"), F.lit("x").alias("g")
    ))
    table.to_view("snap", version=0)
    with pytest.raises(ValueError, match="time-travel snapshot"):
        lake_sql(spark, "DELETE FROM snap WHERE id = 1")


def test_sql_merge_rich_clauses_rejected(spark, table):
    spark.range(0, 3).select(
        "id", F.lit(0).alias("v"), F.lit("z").alias("g")
    ).createOrReplaceTempView("src2")
    # BY SOURCE has no source row to copy: SET * is rejected
    with pytest.raises(ValueError, match="no source row"):
        lake_sql(
            spark,
            "MERGE INTO sqlt USING src2 ON sqlt.id = src2.id "
            "WHEN MATCHED THEN DELETE "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *",
        )
    # explicit INSERT column lists inside MERGE remain outside
    with pytest.raises(ValueError, match="richer|clause"):
        lake_sql(
            spark,
            "MERGE INTO sqlt USING src2 ON sqlt.id = src2.id "
            "WHEN NOT MATCHED THEN INSERT (id, v, g) "
            "VALUES (src2.id, src2.v, src2.g)",
        )
    with pytest.raises(ValueError, match="equality"):
        lake_sql(
            spark,
            "MERGE INTO sqlt USING src2 ON sqlt.id >= src2.id "
            "WHEN MATCHED THEN DELETE",
        )


def test_sql_set_parses_commas_inside_calls(spark, table):
    lake_sql(
        spark,
        "UPDATE sqlt SET g = concat(g, '-', cast(v AS string)) "
        "WHERE id = 1",
    )
    rows = {r["id"]: r["g"] for r in table.read().collect()}
    assert rows[1] == "1-2" and rows[2] == "2"


def test_sql_insert_into_and_overwrite(spark, table):
    ver = lake_sql(
        spark,
        "INSERT INTO sqlt SELECT id, id * 3 AS x, 'new' AS y "
        "FROM range(100, 105)",
    )
    assert ver == table.latest_version()
    rows = {r["id"]: (r["v"], r["g"]) for r in table.read().collect()}
    assert len(rows) == 45
    assert all(rows[i] == (i * 3, "new") for i in range(100, 105))
    # positional binding: arity mismatch is a clear error
    with pytest.raises(ValueError, match="columns"):
        lake_sql(spark, "INSERT INTO sqlt SELECT id FROM range(5)")
    lake_sql(
        spark,
        "INSERT OVERWRITE sqlt "
        "SELECT id, id AS a, 'ow' AS b FROM range(0, 7)",
    )
    got = table.read().collect()
    assert len(got) == 7 and all(r["g"] == "ow" for r in got)
    # overwrite landed as a single new version readable via the view
    assert spark.sql("SELECT COUNT(*) FROM sqlt").collect()[0][0] == 7


def test_sql_maintenance_statements(spark, table, tmp_path):
    # DESCRIBE HISTORY returns the history frame
    hist = lake_sql(spark, "DESCRIBE HISTORY sqlt")
    assert "operation" in hist.columns and hist.count() >= 1
    # OPTIMIZE ZORDER BY clusters (new commit, same rows)
    pre = table.latest_version()
    lake_sql(spark, "OPTIMIZE sqlt ZORDER BY (g, id)")
    assert table.latest_version() > pre
    assert table.read().count() == 40
    # RESTORE rolls back to the pre-optimize snapshot (same rows here)
    lake_sql(spark, f"RESTORE sqlt TO VERSION AS OF {pre}")
    assert table.read().count() == 40
    # VACUUM RETAIN 1 VERSIONS DRY RUN lists but deletes nothing
    listed = lake_sql(spark, "VACUUM sqlt RETAIN 1 VERSIONS DRY RUN")
    assert isinstance(listed, list)
    assert table.read(version=pre).count() == 40  # nothing deleted
    # real vacuum: pre-horizon time travel dies, tip still reads
    lake_sql(spark, "VACUUM sqlt RETAIN 1 VERSIONS")
    assert table.read().count() == 40


def test_sql_optimize_scoped_where(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "p"))
    t.append(
        spark.range(0, 40).select(
            "id", (F.col("id") % 2).cast("string").alias("p")
        ),
        partition_by=["p"],
    )
    t.append(
        spark.range(40, 80).select(
            "id", (F.col("id") % 2).cast("string").alias("p")
        ),
        partition_by=["p"],
    )
    t.to_view("sqlopt")
    lake_sql(spark, "OPTIMIZE sqlopt WHERE p = '1' ZORDER BY (id)")
    assert sorted(r["id"] for r in t.read().collect()) == list(range(80))


# -- property: SQL statements == the Python API on the same table ---------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_COND = st.sampled_from(
    [
        "id % {m} = 1",
        "v > {m} * 7",
        "id % {m} = 0 AND v < 60",
        "id < {m} * 3 OR v >= 70",
        "g IN ('1', '2') AND id % {m} = 0",
    ]
)
_SET = st.sampled_from(
    [
        {"v": "v + {m}"},
        {"v": "v * 2", "g": "concat(g, '-u')"},
        {"g": "CASE WHEN id % {m} = 0 THEN 'a' ELSE g END"},
    ]
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cond=_COND,
    assigns=_SET,
    m=st.integers(min_value=2, max_value=6),
    delete_after=st.booleans(),
    mode=st.sampled_from(["rewrite", "dv"]),
)
def test_sql_statements_equal_python_api(
    spark, tmp_path_factory, cond, assigns, m, delete_after, mode
):
    """UPDATE/DELETE through lake_sql's parser lands the SAME final
    table as the equivalent .update()/.delete() calls — randomized
    conditions (AND/OR, IN, arithmetic), SET lists (multi-column,
    CASE, nested calls), and both DML modes."""
    import pyspark.sql.functions as F

    base = tmp_path_factory.mktemp("sqlprop")
    seed = spark.range(0, 60).select(
        "id",
        (F.col("id") * 2 % 97).alias("v"),
        (F.col("id") % 4).cast("string").alias("g"),
    )
    cond_s = cond.format(m=m)
    set_s = {k: v.format(m=m) for k, v in assigns.items()}

    t_sql = LakeTable(spark, str(base / "sql"))
    t_sql.append(seed)
    t_sql.to_view("sqlprop_v")
    set_clause = ", ".join(f"{k} = {v}" for k, v in set_s.items())
    lake_sql(
        spark,
        f"UPDATE sqlprop_v SET {set_clause} WHERE {cond_s}",
        mode=mode,
    )
    if delete_after:
        lake_sql(spark, f"DELETE FROM sqlprop_v WHERE {cond_s}", mode=mode)

    t_py = LakeTable(spark, str(base / "py"))
    t_py.append(seed)
    t_py.update(cond_s, set_s, mode=mode)
    if delete_after:
        t_py.delete(cond_s, mode=mode)

    got = sorted(map(tuple, t_sql.read().collect()))
    want = sorted(map(tuple, t_py.read().collect()))
    assert got == want


def test_sql_create_table_as_select(spark, tmp_path):
    p = str(tmp_path / "ctas")
    ver = lake_sql(
        spark,
        f"CREATE TABLE ctas_v LOCATION '{p}' AS "
        "SELECT id, id * 2 AS v, CAST(id % 3 AS STRING) AS part "
        "FROM range(0, 30)",
    )
    assert ver == 0
    assert spark.sql("SELECT COUNT(*) FROM ctas_v").collect()[0][0] == 30
    # plain CREATE refuses to clobber; OR REPLACE is a versioned
    # overwrite (old snapshot stays time-travelable)
    with pytest.raises(ValueError, match="already exists"):
        lake_sql(
            spark,
            f"CREATE TABLE ctas_v LOCATION '{p}' AS SELECT 1 AS x",
        )
    lake_sql(
        spark,
        f"CREATE OR REPLACE TABLE ctas_v LOCATION '{p}' AS "
        "SELECT id, id AS v, 'r' AS part FROM range(0, 5)",
    )
    t = LakeTable(spark, p)
    assert spark.sql("SELECT COUNT(*) FROM ctas_v").collect()[0][0] == 5
    assert t.read(version=0).count() == 30
    # and the full SQL lifecycle continues on the created table
    lake_sql(spark, "UPDATE ctas_v SET v = v + 100 WHERE id < 2")
    assert (
        spark.sql("SELECT SUM(v) FROM ctas_v").collect()[0][0]
        == sum(range(5)) + 200
    )


def test_sql_create_table_partitioned(spark, tmp_path):
    p = str(tmp_path / "ctasp")
    lake_sql(
        spark,
        f"CREATE TABLE ctasp_v LOCATION '{p}' PARTITIONED BY (part) AS "
        "SELECT id, CAST(id % 2 AS STRING) AS part FROM range(0, 40)",
    )
    t = LakeTable(spark, p)
    assert t._partition_columns() == ["part"]
    out, kept, total = t.read_where({"part": ("1", "1")})
    assert kept < total
    assert out.count() == 20


# -- r15 widened subset: conditional MERGE, column-level SET in MERGE,
#    by-name INSERT, ALTER TABLE, CREATE OR REPLACE PARTITIONED BY ----


def test_sql_merge_matched_condition(spark, table):
    """WHEN MATCHED AND <cond>: condition-false matches keep the
    target row; condition-true matches take the action."""
    spark.sql(
        "SELECT id, id * 100 AS v, 'S' AS g FROM range(0, 50)"
    ).createOrReplaceTempView("msrc")
    lake_sql(
        spark,
        "MERGE INTO sqlt AS t USING msrc AS s ON t.id = s.id "
        "WHEN MATCHED AND t.id % 2 = 0 THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    rows = {r["id"]: (r["v"], r["g"]) for r in table.read().collect()}
    assert rows[2] == (200, "S")  # condition true: replaced
    assert rows[3] == (6, "3")  # condition false: untouched
    assert rows[45] == (4500, "S")  # not matched: inserted
    assert len(rows) == 50


def test_sql_merge_column_level_set(spark, table):
    """Column-level UPDATE SET with both aliases in the expressions;
    unmentioned columns keep the target's values."""
    spark.sql(
        "SELECT id, id AS v, 'S' AS g FROM range(0, 40)"
    ).createOrReplaceTempView("msrc2")
    lake_sql(
        spark,
        "MERGE INTO sqlt t USING msrc2 s ON t.id = s.id "
        "WHEN MATCHED AND s.v > 10 THEN "
        "UPDATE SET t.v = t.v + s.v, g = concat(t.g, '+')",
    )
    rows = {r["id"]: (r["v"], r["g"]) for r in table.read().collect()}
    assert rows[20] == (60, "0+")  # 40 + 20, g suffixed
    assert rows[5] == (10, "1")  # cond false: untouched
    assert len(rows) == 40


def test_sql_merge_conditional_delete(spark, table):
    spark.sql(
        "SELECT id, 0 AS v, 'x' AS g FROM range(0, 40)"
    ).createOrReplaceTempView("msrc3")
    lake_sql(
        spark,
        "MERGE INTO sqlt USING msrc3 ON sqlt.id = msrc3.id "
        "WHEN MATCHED AND sqlt.v >= 60 THEN DELETE",
    )
    ids = sorted(r["id"] for r in table.read().collect())
    assert ids == list(range(30))  # v = 2*id >= 60 <=> id >= 30


def test_sql_insert_by_name(spark, table):
    """INSERT INTO v (cols) binds the query output to the NAMED
    columns; unlisted columns fill with typed nulls."""
    lake_sql(
        spark,
        "INSERT INTO sqlt (g, id) SELECT 'nw', 900",
    )
    row = [r for r in table.read().collect() if r["id"] == 900][0]
    assert row["g"] == "nw" and row["v"] is None


def test_sql_insert_by_name_errors(spark, table):
    with pytest.raises(ValueError, match="repeats"):
        lake_sql(spark, "INSERT INTO sqlt (id, id) SELECT 1, 2")
    with pytest.raises(ValueError, match="not in view"):
        lake_sql(spark, "INSERT INTO sqlt (id, nope) SELECT 1, 2")
    with pytest.raises(ValueError, match="column list names"):
        lake_sql(spark, "INSERT INTO sqlt (id, v) SELECT 1")


def test_sql_insert_parenthesized_query_still_works(spark, table):
    before = table.read().count()
    lake_sql(
        spark,
        "INSERT INTO sqlt (SELECT id, id AS v, 'p' AS g "
        "FROM range(500, 503))",
    )
    assert table.read().count() == before + 3


def test_sql_insert_by_name_omits_generated_columns(spark, tmp_path):
    """Unlisted GENERATED columns are omitted from the bound frame so
    the write computes them (not null-filled)."""
    t = LakeTable(spark, str(tmp_path / "gen"))
    t.append(
        spark.range(3).select(
            "id", (F.col("id") * 2).alias("twice")
        )
    )
    t.set_generated_column("twice", "id * 2")
    t.to_view("gent")
    lake_sql(spark, "INSERT INTO gent (id) SELECT 7")
    rows = {r["id"]: r["twice"] for r in t.read().collect()}
    assert rows[7] == 14  # computed, not null


def test_sql_alter_table_columns_and_constraints(spark, table):
    lake_sql(spark, "ALTER TABLE sqlt ADD COLUMN score double")
    assert "score" in spark.table("sqlt").columns
    assert all(
        r["score"] is None for r in spark.table("sqlt").collect()
    )
    lake_sql(spark, "ALTER TABLE sqlt RENAME COLUMN score TO rating")
    cols = spark.table("sqlt").columns
    assert "rating" in cols and "score" not in cols
    lake_sql(
        spark,
        "ALTER TABLE sqlt ADD CONSTRAINT nonneg CHECK (v >= 0 OR v IS NULL)",
    )
    with pytest.raises(ValueError, match="constraint"):
        lake_sql(
            spark,
            "INSERT INTO sqlt SELECT -1 AS id, -5 AS v, 'x' AS g, "
            "1.0 AS rating",
        )
    lake_sql(spark, "ALTER TABLE sqlt DROP CONSTRAINT nonneg")
    lake_sql(spark, "ALTER TABLE sqlt DROP COLUMN rating")
    assert "rating" not in spark.table("sqlt").columns
    # all metadata-only: no data files rewritten by the ALTERs
    ops = [r.operation for r in table.history().collect()]
    assert {"add_column", "rename_column", "drop_column",
            "add_constraint", "drop_constraint"} <= set(ops)


def test_sql_alter_add_column_complex_type_and_multi_rejected(
    spark, table
):
    lake_sql(spark, "ALTER TABLE sqlt ADD COLUMN m map<string,int>")
    assert dict(spark.table("sqlt").dtypes)["m"] == "map<string,int>"
    with pytest.raises(ValueError, match="one column per statement"):
        lake_sql(spark, "ALTER TABLE sqlt ADD COLUMNS (a int, b int)")


def test_sql_create_or_replace_keeps_partitioning(spark, tmp_path):
    """CREATE OR REPLACE ... PARTITIONED BY must agree with a fresh
    CREATE: the replacement keeps partition metadata (log pruning)."""
    p = str(tmp_path / "ct")
    lake_sql(
        spark,
        f"CREATE TABLE corp LOCATION '{p}' PARTITIONED BY (p) "
        "AS SELECT id, id % 2 AS p FROM range(10)",
    )
    lake_sql(
        spark,
        f"CREATE OR REPLACE TABLE corp LOCATION '{p}' "
        "PARTITIONED BY (p) AS SELECT id, id % 3 AS p FROM range(30)",
    )
    t = LakeTable(spark, p)
    assert t._partition_columns(t.latest_version()) == ["p"]
    assert spark.table("corp").count() == 30
    # pruning metadata works: read_where prunes from the log alone
    df, kept, total = t.read_where({"p": (1, 1)})
    assert df.count() == 10
    assert kept < total  # files actually pruned by the log


def test_sql_conditional_merge_equals_python_api(spark, tmp_path):
    """The SQL conditional/column-set MERGE lands the same table as
    the Python merge() with matched_condition/update_set."""
    seed = spark.range(0, 60).select(
        "id", (F.col("id") * 3 % 53).alias("v"),
        (F.col("id") % 5).cast("string").alias("g"),
    )
    src = spark.range(30, 90).select(
        "id", (F.col("id") * 7 % 41).alias("v"), F.lit("s").alias("g")
    )
    src.createOrReplaceTempView("pmsrc")

    t_sql = LakeTable(spark, str(tmp_path / "sql"))
    t_sql.append(seed)
    t_sql.to_view("pm_v")
    lake_sql(
        spark,
        "MERGE INTO pm_v t USING pmsrc s ON t.id = s.id "
        "WHEN MATCHED AND s.v > t.v THEN "
        "UPDATE SET v = s.v + 1, g = upper(t.g) "
        "WHEN NOT MATCHED THEN INSERT *",
    )

    t_py = LakeTable(spark, str(tmp_path / "py"))
    t_py.append(seed)
    t_py.merge(
        src,
        on=["id"],
        matched_condition="source.v > v",
        update_set={"v": "source.v + 1", "g": "upper(g)"},
        when_not_matched="insert",
    )
    got = sorted(map(tuple, t_sql.read().collect()))
    want = sorted(map(tuple, t_py.read().collect()))
    assert got == want


def test_sql_stale_view_registration_falls_through(spark, table):
    """r14 advice: a lake-registered name that the user later drops
    or shadows with a plain createOrReplaceTempView must NOT route
    DML at the old table — lake_sql falls through to spark.sql."""
    # shadow with a different DataFrame under the same name
    spark.range(3).select(
        "id", F.lit(1).alias("v"), F.lit("x").alias("g")
    ).createOrReplaceTempView("sqlt")
    before = sorted(map(tuple, table.read().collect()))
    with pytest.raises(Exception):  # spark.sql can't UPDATE a temp view
        lake_sql(spark, "UPDATE sqlt SET v = 0")
    # the lake table was NOT mutated, the user's view NOT replaced
    assert sorted(map(tuple, table.read().collect())) == before
    assert spark.table("sqlt").count() == 3
    # re-registering restores DML routing
    table.to_view("sqlt")
    lake_sql(spark, "UPDATE sqlt SET v = 0 WHERE id = 1")
    assert {r["id"]: r["v"] for r in table.read().collect()}[1] == 0


def test_sql_dropped_view_falls_through(spark, table):
    spark.catalog.dropTempView("sqlt")
    with pytest.raises(Exception):
        lake_sql(spark, "DELETE FROM sqlt WHERE id = 0")
    assert table.read().count() == 40  # untouched


_MERGE_COND = st.sampled_from(
    [
        None,
        "s.v > t.v",
        "(t.v + s.v) % {m} = 0",
        "t.g IN ('1', '2') AND s.v % {m} != 1",
        "s.v < {m} * 9",
    ]
)
_MERGE_SET = st.sampled_from(
    [
        None,  # UPDATE SET *
        {"v": "s.v"},
        {"v": "t.v + s.v", "g": "concat(t.g, '-m')"},
        {"g": "CASE WHEN s.v % {m} = 0 THEN 'z' ELSE t.g END"},
    ]
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cond=_MERGE_COND,
    assigns=_MERGE_SET,
    m=st.integers(min_value=2, max_value=6),
    delete_action=st.booleans(),
    insert=st.booleans(),
)
def test_sql_merge_statements_equal_python_api(
    spark, tmp_path_factory, cond, assigns, m, delete_action, insert
):
    """Randomized conditional MERGE through lake_sql's parser lands
    the SAME final table as the equivalent .merge() call — random
    matched conditions (both aliases, arithmetic, IN), random SET
    shapes (whole-row / single column / multi-column with CASE),
    both matched actions, with and without NOT MATCHED INSERT."""
    import pyspark.sql.functions as F

    if delete_action:
        assigns = None  # DELETE has no SET list
    base = tmp_path_factory.mktemp("mrgprop")
    seed = spark.range(0, 50).select(
        "id",
        (F.col("id") * 3 % 41).alias("v"),
        (F.col("id") % 4).cast("string").alias("g"),
    )
    src = spark.range(25, 70).select(
        "id",
        (F.col("id") * 7 % 37).alias("v"),
        F.lit("s").alias("g"),
    )
    src.createOrReplaceTempView("mrgprop_src")
    cond_s = cond.format(m=m) if cond else None
    set_s = (
        {k: v.format(m=m) for k, v in assigns.items()} if assigns else None
    )

    t_sql = LakeTable(spark, str(base / "sql"))
    t_sql.append(seed)
    t_sql.to_view("mrgprop_v")
    action = (
        "DELETE"
        if delete_action
        else (
            "UPDATE SET "
            + ", ".join(f"{k} = {v}" for k, v in set_s.items())
            if set_s
            else "UPDATE SET *"
        )
    )
    stmt = (
        "MERGE INTO mrgprop_v t USING mrgprop_src s ON t.id = s.id "
        + (
            f"WHEN MATCHED AND {cond_s} THEN {action} "
            if cond_s
            else f"WHEN MATCHED THEN {action} "
        )
        + ("WHEN NOT MATCHED THEN INSERT *" if insert else "")
    )
    lake_sql(spark, stmt)

    # Python twin: rewrite alias-qualified refs to merge_into's
    # namespace (target bare, source as `source.c`)
    def to_py(e):
        return (
            e.replace("s.v", "source.v")
            .replace("s.g", "source.g")
            .replace("t.v", "v")
            .replace("t.g", "g")
        )

    t_py = LakeTable(spark, str(base / "py"))
    t_py.append(seed)
    t_py.merge(
        src,
        on=["id"],
        when_matched="delete" if delete_action else "update",
        when_not_matched="insert" if insert else "ignore",
        matched_condition=to_py(cond_s) if cond_s else None,
        update_set=(
            {k: to_py(v) for k, v in set_s.items()} if set_s else None
        ),
    )
    got = sorted(map(tuple, t_sql.read().collect()))
    want = sorted(map(tuple, t_py.read().collect()))
    assert got == want


# -- r15 late additions: full Delta MERGE clause vocabulary ---------------


def test_sql_merge_insert_only(spark, table):
    """Insert-only MERGE (standard Delta): existing keys suppress
    their inserts, no file rewrites (pure append commit)."""
    spark.sql(
        "SELECT id, 0 AS v, 'i' AS g FROM range(35, 45)"
    ).createOrReplaceTempView("iosrc")
    pre_files = set(table.snapshot_files())
    lake_sql(
        spark,
        "MERGE INTO sqlt USING iosrc ON sqlt.id = iosrc.id "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    rows = {r["id"]: (r["v"], r["g"]) for r in table.read().collect()}
    assert len(rows) == 45
    assert rows[38] == (76, "2")  # existing key untouched
    assert rows[42] == (0, "i")  # new key inserted
    # file granularity: every pre-existing file carried by reference
    assert pre_files <= set(table.snapshot_files())


def test_sql_merge_conditional_insert(spark, table):
    spark.sql(
        "SELECT id, id AS v, 'ci' AS g FROM range(35, 60)"
    ).createOrReplaceTempView("cisrc")
    lake_sql(
        spark,
        "MERGE INTO sqlt t USING cisrc s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED AND s.v % 2 = 0 THEN INSERT *",
    )
    rows = {r["id"]: r["g"] for r in table.read().collect()}
    # only EVEN new ids inserted; matched ids (35-39) replaced
    assert all(rows[i] == "ci" for i in range(35, 40))
    assert all(rows.get(i) == "ci" for i in range(40, 60, 2))
    assert all(i not in rows for i in range(41, 60, 2))


def test_sql_merge_not_matched_by_source_delete(spark, table):
    """BY SOURCE DELETE: target rows with no source match die —
    the sync-to-source shape."""
    spark.sql(
        "SELECT id, 1 AS v, 's' AS g FROM range(10, 20)"
    ).createOrReplaceTempView("bssrc")
    lake_sql(
        spark,
        "MERGE INTO sqlt USING bssrc ON sqlt.id = bssrc.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
    )
    rows = {r["id"]: (r["v"], r["g"]) for r in table.read().collect()}
    assert sorted(rows) == list(range(10, 20))
    assert all(rows[i] == (1, "s") for i in range(10, 20))


def test_sql_merge_not_matched_by_source_update_with_cond(spark, table):
    spark.sql(
        "SELECT id, 1 AS v, 's' AS g FROM range(0, 10)"
    ).createOrReplaceTempView("bs2src")
    lake_sql(
        spark,
        "MERGE INTO sqlt t USING bs2src s ON t.id = s.id "
        "WHEN NOT MATCHED BY SOURCE AND t.id % 2 = 0 THEN "
        "UPDATE SET g = 'stale'",
    )
    rows = {r["id"]: r["g"] for r in table.read().collect()}
    assert len(rows) == 40
    assert rows[12] == "stale" and rows[13] == "1"  # cond split
    assert rows[4] == "0"  # matched: untouched (no WHEN MATCHED)


def test_python_merge_by_source_equals_sql(spark, tmp_path):
    seed = spark.range(0, 40).select(
        "id", (F.col("id") * 2 % 31).alias("v"),
        (F.col("id") % 3).cast("string").alias("g"),
    )
    src = spark.range(10, 50).select(
        "id", (F.col("id") * 5 % 29).alias("v"), F.lit("s").alias("g")
    )
    src.createOrReplaceTempView("pbs_src")
    t_sql = LakeTable(spark, str(tmp_path / "sql"))
    t_sql.append(seed)
    t_sql.to_view("pbs_v")
    lake_sql(
        spark,
        "MERGE INTO pbs_v t USING pbs_src s ON t.id = s.id "
        "WHEN MATCHED AND s.v > t.v THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED AND s.v % 3 = 0 THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE AND t.v < 15 THEN DELETE",
    )
    t_py = LakeTable(spark, str(tmp_path / "py"))
    t_py.append(seed)
    t_py.merge(
        src,
        on=["id"],
        matched_condition="source.v > v",
        update_set={"v": "source.v"},
        when_not_matched="insert",
        not_matched_condition="v % 3 = 0",
        when_not_matched_by_source="delete",
        not_matched_by_source_condition="v < 15",
    )
    got = sorted(map(tuple, t_sql.read().collect()))
    want = sorted(map(tuple, t_py.read().collect()))
    assert got == want


def test_merge_into_by_source_dataframe_semantics(spark):
    from replay_spark.lake import merge_into

    t = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c"), (4, 40, "d")],
        "id int, v int, g string",
    )
    s = spark.createDataFrame(
        [(2, 200, "B"), (3, 5, "C")], "id int, v int, g string"
    )
    out = merge_into(
        t, s, ["id"],
        when_matched="ignore",
        when_not_matched="ignore",
        when_not_matched_by_source="update",
        update_set_by_source={"g": "concat(g, '!')"},
        not_matched_by_source_condition="v >= 40",
    ).orderBy("id").collect()
    assert [(r.id, r.v, r.g) for r in out] == [
        (1, 10, "a"), (2, 20, "b"), (3, 30, "c"), (4, 40, "d!")
    ]


def test_sql_describe_detail(spark, table):
    df = lake_sql(spark, "DESCRIBE DETAIL sqlt")
    row = df.collect()[0].asDict()
    assert row["version"] == table.latest_version()
    assert row["num_files"] == len(table.snapshot_files())


def test_sql_merge_multiple_matched_clauses(spark, table):
    """Several WHEN MATCHED clauses, first-true-condition wins
    (Delta semantics); the clause without a condition must be last."""
    spark.sql(
        "SELECT id, id AS v, 'm' AS g FROM range(0, 40)"
    ).createOrReplaceTempView("mmsrc")
    lake_sql(
        spark,
        "MERGE INTO sqlt t USING mmsrc s ON t.id = s.id "
        "WHEN MATCHED AND t.id < 10 THEN DELETE "
        "WHEN MATCHED AND t.id < 20 THEN UPDATE SET g = 'mid' "
        "WHEN MATCHED THEN UPDATE SET g = 'high'",
    )
    rows = {r["id"]: r["g"] for r in table.read().collect()}
    assert sorted(rows) == list(range(10, 40))  # first clause deleted
    assert all(rows[i] == "mid" for i in range(10, 20))
    assert all(rows[i] == "high" for i in range(20, 40))


def test_sql_merge_nonlast_unconditional_clause_rejected(spark, table):
    spark.sql(
        "SELECT id, 0 AS v, 'x' AS g FROM range(3)"
    ).createOrReplaceTempView("mm2src")
    with pytest.raises(ValueError, match="last matched clause"):
        lake_sql(
            spark,
            "MERGE INTO sqlt USING mm2src ON sqlt.id = mm2src.id "
            "WHEN MATCHED THEN DELETE "
            "WHEN MATCHED AND sqlt.v > 5 THEN UPDATE SET *",
        )


def test_python_merge_multiple_clauses_first_wins(spark, tmp_path):
    from replay_spark.lake import merge_into

    t = spark.createDataFrame(
        [(1, 5, "a"), (2, 15, "b"), (3, 25, "c"), (9, 0, "z")],
        "id int, v int, g string",
    )
    s = spark.createDataFrame(
        [(1, 0, "s"), (2, 0, "s"), (3, 0, "s"), (4, 0, "s")],
        "id int, v int, g string",
    )
    out = merge_into(
        t, s, ["id"],
        matched_clauses=[
            {"action": "update", "condition": "v < 10",
             "set": {"g": "'low'"}},
            {"action": "update", "condition": "v < 20",
             "set": {"g": "'mid'"}},
            {"action": "delete", "condition": None, "set": None},
        ],
        when_not_matched="ignore",
    ).orderBy("id").collect()
    assert [(r.id, r.g) for r in out] == [
        (1, "low"), (2, "mid"), (9, "z")
    ]  # 3 deleted by the fall-through clause; 9 unmatched survives


# -- r15 code-review regression fixes -------------------------------------


def test_merge_string_literals_not_rewritten(spark, table):
    """Alias-qualified-looking tokens INSIDE string literals must
    stay literals — 's.bak' is data, not a source column ref."""
    spark.sql(
        "SELECT id, 0 AS v, 'x' AS g FROM range(0, 5)"
    ).createOrReplaceTempView("litsrc")
    lake_sql(
        spark,
        "MERGE INTO sqlt t USING litsrc s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET g = 't.bak'",
    )
    rows = {r["id"]: r["g"] for r in table.read().collect()}
    assert all(rows[i] == "t.bak" for i in range(5))
    assert rows[10] == "2"  # unmatched untouched


def test_sql_alter_add_column_parameterized_types(spark, table):
    lake_sql(spark, "ALTER TABLE sqlt ADD COLUMN price decimal(10,2)")
    assert dict(spark.table("sqlt").dtypes)["price"] == "decimal(10,2)"
    lake_sql(spark, "ALTER TABLE sqlt ADD COLUMNS (note varchar(20))")
    assert "note" in spark.table("sqlt").columns
    with pytest.raises(ValueError, match="one column per statement"):
        lake_sql(
            spark,
            "ALTER TABLE sqlt ADD COLUMNS (a decimal(3,1), b int)",
        )


def test_sql_registry_preserves_constructor_options(spark, tmp_path):
    """lake_sql's reconstructed table must behave like the
    registering one: auto_checkpoint_every=None writes no
    checkpoint files through SQL DML either."""
    import os

    t = LakeTable(
        spark, str(tmp_path / "opt"), auto_checkpoint_every=None
    )
    for i in range(12):  # past the default cadence of 10
        t.append(spark.range(i, i + 1).selectExpr("id", "id AS v"))
    t.to_view("optv")
    lake_sql(spark, "INSERT INTO optv SELECT 99, 99")
    log = os.path.join(t.path, "_log")
    assert not [
        n for n in os.listdir(log) if n.startswith("_checkpoint")
    ], "SQL DML ran with default checkpoint cadence"


def test_sql_insert_overwrite_keeps_partitioning(spark, tmp_path):
    """INSERT OVERWRITE on a partitioned table inherits the
    partition layout (log pruning survives) — r15 review fix."""
    p = str(tmp_path / "iow")
    lake_sql(
        spark,
        f"CREATE TABLE iowv LOCATION '{p}' PARTITIONED BY (b) "
        "AS SELECT id, CAST(id % 2 AS STRING) AS b FROM range(10)",
    )
    lake_sql(
        spark,
        "INSERT OVERWRITE iowv "
        "SELECT id, CAST(id % 2 AS STRING) AS b FROM range(20)",
    )
    t = LakeTable(spark, p)
    assert t._partition_columns(t.latest_version()) == ["b"]
    df, kept, total = t.read_where({"b": ("1", "1")})
    assert kept < total and df.count() == 10


def test_sql_describe_readonly_serves_snapshot_views(spark, table):
    table.append(
        spark.range(40, 45).selectExpr(
            "id", "id * 2 AS v", "'s' AS g"
        )
    )
    table.to_view("snapro", version=0)
    hist = lake_sql(spark, "DESCRIBE HISTORY snapro")
    assert hist.count() >= 1
    det = lake_sql(spark, "DESCRIBE DETAIL snapro").collect()[0]
    assert det["version"] == table.latest_version()


def test_sql_insert_column_list_case_insensitive(spark, table):
    lake_sql(spark, "INSERT INTO sqlt (G, Id) SELECT 'ci', 700")
    row = [r for r in table.read().collect() if r["id"] == 700][0]
    assert row["g"] == "ci" and row["v"] is None


def test_python_insert_only_condition_on_source_only_column(
    spark, tmp_path
):
    """Insert-only merge conditions filter RAW source rows, so they
    may reference source-only columns dropped by the final
    projection."""
    t = LakeTable(spark, str(tmp_path / "io"))
    t.append(spark.range(5).selectExpr("id", "id AS v"))
    src = spark.range(3, 9).selectExpr(
        "id", "id AS v", "id % 2 AS priority"
    )
    t.merge(
        src,
        on=["id"],
        when_matched="ignore",
        not_matched_condition="priority = 1",
    )
    ids = sorted(r["id"] for r in t.read().collect())
    assert ids == [0, 1, 2, 3, 4, 5, 7]  # only odd new ids inserted
