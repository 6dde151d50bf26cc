"""File-pruned MERGE (sinks/merge.py, r7 verdict #1): a change set touching
one partition must rewrite only that partition's affected files — untouched
files stay byte-identical — under the shared maintenance marker protocol
with crash roll-forward and checksum gates."""

import os

import pytest
from pyspark.sql import functions as F

from bigquack_spark.sinks.merge import merge_upsert


def _data_files(path):
    out = []
    for dirpath, dirnames, filenames in os.walk(path):
        dirnames[:] = [d for d in dirnames if not d.startswith((".", "_"))]
        for n in filenames:
            if n.endswith(".parquet"):
                out.append(os.path.join(dirpath, n))
    return sorted(out)


def _part_table(spark, tmp_path, name="mt"):
    """k=0..3 hive-partitioned, several files per partition."""
    path = str(tmp_path / name)
    df = spark.range(1000).selectExpr(
        "id", "id % 4 AS k", "CAST(id AS STRING) AS s"
    )
    df.repartition(4).write.partitionBy("k").parquet(path)
    return path


def test_merge_partitioned_touches_only_named_partitions(spark, tmp_path):
    path = _part_table(spark, tmp_path)
    before = {
        f: open(f, "rb").read() for f in _data_files(path) if "/k=1/" not in f
    }
    # key includes the partition column -> the find scan partition-prunes
    changes = spark.createDataFrame(
        [(5, 1, "five!", False), (2001, 1, "new", False), (9, 1, None, True)],
        "id bigint, k bigint, s string, is_delete boolean",
    )
    rep = merge_upsert(spark, path, changes, ["k", "id"], delete_col="is_delete")
    after = spark.read.parquet(path)
    got = {r.id: r.s for r in after.filter("k = 1").collect()}
    assert got[5] == "five!" and got[2001] == "new" and 9 not in got
    assert after.count() == 1000 + 1 - 1  # one insert, one delete
    # every file outside k=1 is byte-identical
    for f, want in before.items():
        assert open(f, "rb").read() == want
    assert rep["rows_before"] == 1000 and rep["rows_after"] == 1000
    assert rep["upserts"] == 2 and rep["deletes"] == 1
    # audit evidence at the table root
    audits = [f for f in os.listdir(path) if f.startswith("_MERGE-")]
    assert len(audits) == 1
    # all affected files live under k=1
    import json

    audit = json.load(open(os.path.join(path, audits[0])))
    assert audit["affected_files"] and all(
        "/k=1/" in f for f in audit["affected_files"]
    )


def test_merge_flat_rewrites_only_files_containing_matches(spark, tmp_path):
    path = str(tmp_path / "flat")
    # three appends, one file each, covering disjoint key ranges
    for lo in (0, 100, 200):
        spark.range(lo, lo + 100).selectExpr(
            "id", "CAST(id AS STRING) AS s"
        ).coalesce(1).write.mode("append").parquet(path)
    files_before = _data_files(path)
    assert len(files_before) == 3
    bytes_before = {f: open(f, "rb").read() for f in files_before}

    changes = spark.createDataFrame(
        [(150, "x", False), (155, "y", False)], "id bigint, s string, is_delete boolean"
    )
    rep = merge_upsert(spark, path, changes, ["id"], delete_col="is_delete")
    assert rep["files_rewritten"] == 1 and rep["files_retired"] == 0
    # the two files not containing 150/155 are byte-identical
    untouched = [f for f in files_before if f in _data_files(path)]
    assert len(untouched) == 2
    for f in untouched:
        assert open(f, "rb").read() == bytes_before[f]
    got = {r.id: r.s for r in spark.read.parquet(path).collect()}
    assert got[150] == "x" and got[155] == "y" and len(got) == 300


def test_merge_insert_into_new_partition(spark, tmp_path):
    path = _part_table(spark, tmp_path, "mt2")
    changes = spark.createDataFrame([(5000, 7, "np")], "id bigint, k bigint, s string")
    rep = merge_upsert(spark, path, changes, ["k", "id"])
    assert rep["files_rewritten"] == 0 and rep["files_inserted"] >= 1
    after = spark.read.parquet(path)
    assert after.filter("k = 7").count() == 1
    assert after.count() == 1001


def test_merge_key_moves_partition(spark, tmp_path):
    """Key = id only (partition NOT in the key): an update that moves the
    row to another partition rewrites the old leaf and inserts into the
    new one."""
    path = _part_table(spark, tmp_path, "mt3")
    changes = spark.createDataFrame([(8, 3, "moved")], "id bigint, k bigint, s string")
    merge_upsert(spark, path, changes, ["id"])
    after = spark.read.parquet(path)
    rows = after.filter("id = 8").collect()
    assert len(rows) == 1 and rows[0].k == 3 and rows[0].s == "moved"
    assert after.count() == 1000


def test_merge_delete_retires_fully_matched_file(spark, tmp_path):
    path = str(tmp_path / "ret")
    for lo in (0, 10):
        spark.range(lo, lo + 10).selectExpr("id", "id * 2 AS v").coalesce(
            1
        ).write.mode("append").parquet(path)
    changes = spark.range(0, 10).selectExpr("id", "CAST(NULL AS BIGINT) AS v").withColumn(
        "is_delete", F.lit(True)
    )
    rep = merge_upsert(spark, path, changes, ["id"], delete_col="is_delete")
    assert rep["files_retired"] == 1 and rep["files_rewritten"] == 0
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == list(
        range(10, 20)
    )


def test_merge_crash_before_marker_replay_converges(spark, tmp_path):
    """Crash before any rewrite marker commits: inserts may already be
    published (transient duplicate keys — never loss), and re-running the
    same change set converges to the merged state."""
    from bigquack_spark.operators import maintenance

    path = _part_table(spark, tmp_path, "mt4")

    class Boom(RuntimeError):
        pass

    real = maintenance._write_marker
    calls = {"n": 0}

    def crash_on_rewrite_marker(staging, gen, olds, prefix="compacted", others=None):
        calls["n"] += 1
        if olds:  # the rewrite leg's marker (insert legs pass olds=[])
            raise Boom()
        return real(staging, gen, olds, prefix=prefix, others=others)

    changes = spark.createDataFrame(
        [(5, 1, "five!", False)], "id bigint, k bigint, s string, is_delete boolean"
    )
    maintenance._write_marker = crash_on_rewrite_marker
    try:
        with pytest.raises(Boom):
            merge_upsert(spark, path, changes, ["k", "id"], delete_col="is_delete")
    finally:
        maintenance._write_marker = real

    # crash window: no row lost (old id=5 still present; duplicate allowed)
    mid = spark.read.parquet(path)
    assert mid.filter("id = 5").count() >= 1

    rep = merge_upsert(spark, path, changes, ["k", "id"], delete_col="is_delete")
    after = spark.read.parquet(path)
    rows = after.filter("id = 5").collect()
    assert len(rows) == 1 and rows[0].s == "five!"
    assert after.count() == 1000
    assert rep["generation"] is not None


def test_merge_crash_after_marker_rolls_forward(spark, tmp_path):
    from bigquack_spark.operators import maintenance

    path = _part_table(spark, tmp_path, "mt5")

    class Boom(RuntimeError):
        pass

    real = maintenance._finish_swap
    state = {"crashed": False}

    def crash_once(leaf, staging, gen, olds, prefix="compacted"):
        if olds and not state["crashed"]:
            state["crashed"] = True
            raise Boom()
        return real(leaf, staging, gen, olds, prefix=prefix)

    changes = spark.createDataFrame(
        [(5, 1, "five!", False)], "id bigint, k bigint, s string, is_delete boolean"
    )
    maintenance._finish_swap = crash_once
    try:
        with pytest.raises(Boom):
            merge_upsert(spark, path, changes, ["k", "id"], delete_col="is_delete")
    finally:
        maintenance._finish_swap = real

    # next merge call rolls the committed swap forward first
    rep = merge_upsert(spark, path, changes, ["k", "id"], delete_col="is_delete")
    assert rep["resumed"] >= 1
    after = spark.read.parquet(path)
    rows = after.filter("id = 5").collect()
    assert len(rows) == 1 and rows[0].s == "five!"
    assert after.count() == 1000


def test_merge_checksum_gate_aborts_before_publish(spark, tmp_path):
    from bigquack_spark.operators import maintenance

    path = _part_table(spark, tmp_path, "mt6")
    before = sorted(r.id for r in spark.read.parquet(path).collect())

    real = maintenance._checksum_row
    calls = {"n": 0}

    def skewed(df):
        calls["n"] += 1
        row = real(df)
        return (row[0] + calls["n"], row[1], row[2])  # never equal

    changes = spark.createDataFrame(
        [(5, 1, "five!", False)], "id bigint, k bigint, s string, is_delete boolean"
    )
    maintenance._checksum_row = skewed
    # merge.py binds _checksum_row at call time from the maintenance module
    import bigquack_spark.sinks.merge as merge_mod  # noqa: F401

    try:
        with pytest.raises(RuntimeError, match="checksum"):
            merge_upsert(spark, path, changes, ["k", "id"], delete_col="is_delete")
    finally:
        maintenance._checksum_row = real

    # live table untouched by the abort (the insert leg aborts FIRST, before
    # any publish)
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == before


def test_merge_string_partition_values_survive_checksum_gate(spark, tmp_path):
    """r8 review: hive readback re-infers partition types from directory
    names ('00501' -> int 501), so the insert-leg checksum compares data
    columns only — a zip-code-partitioned table must merge cleanly."""
    path = str(tmp_path / "zip")
    spark.createDataFrame(
        [("00501", 1, "a"), ("00501", 2, "b"), ("10001", 3, "c")],
        "zip string, id bigint, v string",
    ).write.partitionBy("zip").parquet(path)
    changes = spark.createDataFrame(
        [("00501", 2, "b2"), ("00501", 9, "new")], "zip string, id bigint, v string"
    )
    rep = merge_upsert(spark, path, changes, ["zip", "id"])
    assert rep["generation"] is not None
    got = {r.id: r.v for r in spark.read.parquet(path).filter("zip = '00501'").collect()}
    assert got == {1: "a", 2: "b2", 9: "new"}


# ------------------------------------------------- schema evolution (r8 #5)


def test_merge_schema_evolution_adds_column(spark, tmp_path):
    """An evolved change set adds a column: matched rows carry it, inserts
    carry it, untouched files stay byte-identical and read back NULL-filled
    under mergeSchema."""
    path = _part_table(spark, tmp_path, "ev1")
    untouched = {
        f: open(f, "rb").read() for f in _data_files(path) if "/k=1/" not in f
    }
    changes = spark.createDataFrame(
        [(1, 1, "one-upd", 0.9), (10001, 1, "new-row", 0.5)],
        "id long, k long, s string, quality double",
    )
    rep = merge_upsert(
        spark, path, changes, key_cols=["id", "k"], schema_evolution=True
    )
    assert rep["columns_added"] == ["quality"]
    assert rep["upserts"] == 2 and rep["rows_after"] == 1001

    got = spark.read.option("mergeSchema", "true").parquet(path)
    assert "quality" in got.columns
    assert got.count() == 1001
    by_id = {r.id: r for r in got.filter("id in (1, 2, 10001)").collect()}
    assert by_id[1].s == "one-upd" and by_id[1].quality == 0.9
    assert by_id[10001].quality == 0.5
    assert by_id[2].quality is None  # pre-evolution row reads NULL
    # evolved NULLs are exactly the untouched rows
    assert got.filter("quality IS NULL").count() == 1001 - 2
    for f, blob in untouched.items():
        assert open(f, "rb").read() == blob, f"untouched file rewritten: {f}"


def test_merge_evolution_refuses_missing_target_column(spark, tmp_path):
    """Evolution only ADDS: a change set missing an existing target column
    still dies loudly instead of silently nulling live data."""
    path = _part_table(spark, tmp_path, "ev2")
    changes = spark.createDataFrame(
        [(1, 1, 0.9)], "id long, k long, quality double"
    )  # no 's'
    with pytest.raises(Exception):
        merge_upsert(
            spark, path, changes, key_cols=["id", "k"], schema_evolution=True
        )
    assert spark.read.parquet(path).count() == 1000  # untouched


def test_merge_on_previously_evolved_table(spark, tmp_path):
    """A later merge against a mixed-schema table resolves the UNION schema
    (old footers must not shadow the evolved column) and a whole-leaf
    rewrite NULL-fills rows from pre-evolution files."""
    path = _part_table(spark, tmp_path, "ev3")
    first = spark.createDataFrame(
        [(1, 1, "one-upd", 0.9)], "id long, k long, s string, quality double"
    )
    merge_upsert(spark, path, first, key_cols=["id", "k"], schema_evolution=True)

    # second evolved-aware merge, no NEW columns this time: touches a row
    # living in a pre-evolution file of the same leaf
    second = spark.createDataFrame(
        [(5, 1, "five-upd", 0.1)], "id long, k long, s string, quality double"
    )
    rep = merge_upsert(spark, path, second, key_cols=["id", "k"], schema_evolution=True)
    assert rep["columns_added"] == []
    got = spark.read.option("mergeSchema", "true").parquet(path)
    by_id = {r.id: r for r in got.filter("id in (1, 5, 9)").collect()}
    assert by_id[1].quality == 0.9  # first evolution survived the rewrite
    assert by_id[5].s == "five-upd" and by_id[5].quality == 0.1
    assert by_id[9].quality is None
    assert got.count() == 1000


def test_merge_evolution_with_delete_and_stats_refresh(spark, tmp_path):
    """Evolved merge composes with delete_col and refresh_stats: the stats
    fold stays fresh and counts the evolved column's table-wide NULLs."""
    from bigquack_spark.operators.maintenance import (
        collect_table_stats,
        stats_are_fresh,
    )

    path = _part_table(spark, tmp_path, "ev4")
    collect_table_stats(spark, path)
    changes = spark.createDataFrame(
        [(1, 1, "upd", 7.0, False), (2, 2, "del", None, True)],
        "id long, k long, s string, score double, is_delete boolean",
    )
    rep = merge_upsert(
        spark, path, changes, key_cols=["id", "k"], delete_col="is_delete",
        schema_evolution=True, refresh_stats=True,
    )
    assert rep["columns_added"] == ["score"]
    assert rep["deletes"] == 1 and rep["upserts"] == 1
    assert stats_are_fresh(path)
    import json as _json

    stats = _json.load(open(os.path.join(path, "_STATS.json")))
    assert stats["rows"] == 999
    score = stats["columns"]["score"]
    assert score["null_count"] == 998  # every row except the one upsert
