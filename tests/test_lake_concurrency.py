"""Commit-conflict matrix for non-append DML (Delta-style logical
conflict detection, WriteSerializable): on a version collision the
loser re-reads the log and retries at the tip iff every intervening
commit is logically disjoint — a dv-delete racing an append no
longer loses, while a dv-delete racing a compact of the same file
still fails, as it must.

Races are simulated by interleaving a second writer's commit between
the first writer's snapshot scan and its commit attempt (patching
the first writer's data/sidecar write to fire the racer), which is
exactly where a real concurrent commit lands.
"""

import pyspark.sql.functions as F
import pytest

from replay_spark.lake import ConcurrentWriteError, LakeTable


def _mk(spark, path, lo=0, hi=100):
    t = LakeTable(spark, str(path))
    t.append(
        spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v"))
    )
    return t


def _race(t1, method_name, racer):
    """Fire ``racer()`` once, right after ``t1.<method_name>``'s
    first call — i.e. after t1 has scanned its base snapshot and
    written its files, before its commit attempt."""
    orig = getattr(t1, method_name)
    state = {"fired": False}

    def wrapped(*a, **k):
        out = orig(*a, **k)
        if not state["fired"]:
            state["fired"] = True
            racer()
        return out

    setattr(t1, method_name, wrapped)


def test_dv_delete_vs_append_retries_and_wins(spark, tmp_path):
    t1 = _mk(spark, tmp_path / "t")
    t2 = LakeTable(spark, str(tmp_path / "t"))
    _race(
        t1,
        "_write_dv_sidecar",
        lambda: t2.append(
            spark.range(100, 110).select(
                "id", (F.col("id") * 2).alias("v")
            )
        ),
    )
    t1.delete("id < 5", mode="dv")
    got = sorted(r["id"] for r in t1.read().collect())
    assert got == list(range(5, 110))
    ops = [c["operation"] for c in t1._commits()]
    assert ops == ["append", "append", "delete"]


def test_dv_delete_vs_dv_delete_disjoint_files_retries(spark, tmp_path):
    t1 = LakeTable(spark, str(tmp_path / "t"))
    # two appends -> two disjoint file sets
    t1.append(
        spark.range(0, 100).select("id", (F.col("id") * 2).alias("v"))
    )
    t1.append(
        spark.range(100, 200).select(
            "id", (F.col("id") * 2).alias("v")
        )
    )
    t2 = LakeTable(spark, str(tmp_path / "t"))
    _race(
        t1,
        "_write_dv_sidecar",
        lambda: t2.delete("id >= 195", mode="dv"),
    )
    t1.delete("id < 5", mode="dv")
    got = sorted(r["id"] for r in t1.read().collect())
    assert got == list(range(5, 195))


def test_dv_delete_vs_dv_delete_same_file_fails(spark, tmp_path):
    t1 = _mk(spark, tmp_path / "t")
    t2 = LakeTable(spark, str(tmp_path / "t"))
    _race(
        t1,
        "_write_dv_sidecar",
        lambda: t2.delete("id = 7", mode="dv"),
    )
    with pytest.raises(ConcurrentWriteError, match="conflicts"):
        t1.delete("id = 3", mode="dv")
    # the winner's delete stands; the loser's never landed
    got = sorted(r["id"] for r in t1.read().collect())
    assert 7 not in got and 3 in got


def test_dv_delete_vs_compact_fails(spark, tmp_path):
    t1 = _mk(spark, tmp_path / "t")
    t2 = LakeTable(spark, str(tmp_path / "t"))
    _race(t1, "_write_dv_sidecar", lambda: t2.compact())
    with pytest.raises(ConcurrentWriteError, match="conflicts"):
        t1.delete("id < 5", mode="dv")
    assert t1.read().count() == 100  # compact won, no rows lost


def test_compact_vs_dv_delete_fails(spark, tmp_path):
    t1 = _mk(spark, tmp_path / "t")
    t2 = LakeTable(spark, str(tmp_path / "t"))
    _race(t1, "_write_data", lambda: t2.delete("id = 7", mode="dv"))
    with pytest.raises(ConcurrentWriteError, match="conflicts"):
        t1.compact()
    # the dv-delete won and survives the failed compact
    got = sorted(r["id"] for r in t1.read().collect())
    assert got == [i for i in range(100) if i != 7]


def test_delete_rewrite_vs_append_retries(spark, tmp_path):
    t1 = _mk(spark, tmp_path / "t")
    t2 = LakeTable(spark, str(tmp_path / "t"))
    _race(
        t1,
        "_write_data",
        lambda: t2.append(
            spark.range(100, 110).select(
                "id", (F.col("id") * 2).alias("v")
            )
        ),
    )
    t1.delete("id < 5")
    got = sorted(r["id"] for r in t1.read().collect())
    assert got == list(range(5, 110))


def test_update_dv_vs_append_retries(spark, tmp_path):
    t1 = _mk(spark, tmp_path / "t")
    t2 = LakeTable(spark, str(tmp_path / "t"))
    _race(
        t1,
        "_write_dv_sidecar",
        lambda: t2.append(
            spark.range(100, 110).select(
                "id", (F.col("id") * 2).alias("v")
            )
        ),
    )
    t1.update("id = 7", {"v": "999"}, mode="dv")
    rows = {r["id"]: r["v"] for r in t1.read().collect()}
    assert rows[7] == 999 and len(rows) == 110


def test_delete_vs_schema_evolving_append_fails(spark, tmp_path):
    t1 = _mk(spark, tmp_path / "t")
    t2 = LakeTable(spark, str(tmp_path / "t"))
    _race(
        t1,
        "_write_data",
        lambda: t2.append(
            spark.range(100, 110).select(
                "id",
                (F.col("id") * 2).alias("v"),
                F.lit("x").alias("extra"),
            ),
            merge_schema=True,
        ),
    )
    with pytest.raises(ConcurrentWriteError, match="schema"):
        t1.delete("id < 5")
    assert "extra" in t1.read().columns  # evolution won


def test_delete_vs_rename_fails(spark, tmp_path):
    t1 = _mk(spark, tmp_path / "t")
    t2 = LakeTable(spark, str(tmp_path / "t"))
    _race(
        t1, "_write_data", lambda: t2.rename_column("v", "value")
    )
    with pytest.raises(ConcurrentWriteError, match="mapping|schema"):
        t1.delete("id < 5")
    assert "value" in t1.read().columns


def test_reconcile_retries_exhaust(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    base = t.latest_version()
    t2 = LakeTable(spark, str(tmp_path / "t"))

    orig = t._commit

    def always_raced(*a, **k):
        # another append lands before EVERY attempt
        t2.append(
            spark.range(0, 1).select(
                "id", (F.col("id") * 2).alias("v")
            )
        )
        return orig(*a, **k)

    t._commit = always_raced
    with pytest.raises(ConcurrentWriteError, match="exhausted"):
        t._commit_reconciled(
            "delete", [], [], t1_schema(t), base, max_retries=2
        )


def t1_schema(t):
    import json

    from pyspark.sql.types import StructType

    return StructType.fromJson(json.loads(t._fold_state(None)[1]))
