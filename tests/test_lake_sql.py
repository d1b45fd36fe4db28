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
    with pytest.raises(ValueError, match="richer"):
        lake_sql(
            spark,
            "MERGE INTO sqlt USING src2 ON sqlt.id = src2.id "
            "WHEN MATCHED THEN UPDATE SET v = 9",
        )
    with pytest.raises(ValueError, match="WHEN MATCHED"):
        lake_sql(
            spark,
            "MERGE INTO sqlt USING src2 ON sqlt.id = src2.id "
            "WHEN NOT MATCHED THEN INSERT *",
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
