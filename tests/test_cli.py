"""CLI front door (bigquack_spark/__main__.py): each verb runs on a shared
session, prints one JSON object, and maps onto the same executors the API
exposes — the reference's one-shot-pipeline ergonomics on Spark."""

import json
import os

import pytest


def _run(capsys, spark, argv):
    from bigquack_spark.__main__ import main

    rc = main(argv, spark=spark)
    out = capsys.readouterr()
    return rc, (json.loads(out.out) if out.out.strip() else None), out.err


def test_cli_transfer_query_roundtrip(capsys, spark, tmp_path):
    from tests.conftest import SF_SMOKE

    rc, out, _ = _run(capsys, spark, [
        "transfer", SF_SMOKE, "orders", "cli_orders_t",
        "--columns", "o_orderkey,o_orderpriority", "--predicate", "o_orderkey < 100",
    ])
    try:
        assert rc == 0 and out["cmd"] == "transfer" and out["rows"] > 0
        assert spark.table("cli_orders_t").columns == [
            "o_orderkey", "o_orderpriority",
        ]
    finally:
        spark.sql("DROP TABLE IF EXISTS cli_orders_t")

    rc, out, _ = _run(capsys, spark, [
        "query", "SELECT count(*) AS n FROM orders", "--sf-dir", SF_SMOKE,
    ])
    assert rc == 0 and out["rows"][0]["n"] > 0


def test_cli_maintenance_lifecycle(capsys, spark, tmp_path):
    path = str(tmp_path / "cli_t")
    spark.range(500).selectExpr("id", "id % 3 AS k").repartition(8)\
        .write.partitionBy("k").parquet(path)

    rc, out, _ = _run(capsys, spark, ["stats", path])
    assert rc == 0 and out["rows"] == 500

    rc, out, _ = _run(capsys, spark, ["snapshot", path, "v1"])
    assert rc == 0 and out["files"] > 0

    rc, out, _ = _run(capsys, spark, ["restore", path, "v1", "--dry-run"])
    assert rc == 0 and out["files_restored"] == 0  # nothing changed yet

    rc, out, _ = _run(capsys, spark, [
        "maintain", path, "--retention", "k = 2", "--target-mb", "1024",
    ])
    assert rc == 0 and out["retention"]["partitions_touched"] == 1
    assert not os.path.isdir(os.path.join(path, "k=2"))

    rc, out, _ = _run(capsys, spark, ["expire", path, "--keep-last", "0"])
    assert rc == 0 and out["expired"] == ["v1"]

    rc, out, _ = _run(capsys, spark, ["vacuum", path])
    assert rc == 0 and "snapshot_pinned_bytes" in out

    # errors surface as JSON on stderr with a non-zero exit
    rc, out, err = _run(capsys, spark, ["snapshot", path, "../evil"])
    assert rc == 1 and out is None and "invalid snapshot name" in err


def test_cli_advise_from_workload(capsys, spark, tmp_path):
    from bigquack_spark.operators.planner import scan_table

    path = str(tmp_path / "cli_w")
    spark.range(1000).selectExpr("id", "CAST(id % 50 AS DOUBLE) AS v")\
        .write.parquet(path)
    from bigquack_spark.operators.maintenance import collect_table_stats

    collect_table_stats(spark, path)
    scan_table(spark, path, "id < 10").count()
    scan_table(spark, path, "v > 25").count()
    rc, out, _ = _run(capsys, spark, ["advise", path])
    assert rc == 0 and out["n_logged"] == 2
    assert sorted(out["zorder_cols"]) == ["id", "v"]


def test_cli_transfer_shred(capsys, spark, tmp_path):
    """The documented '--shred COL=DDL' usage works end to end (r9 advice:
    the docstring advertised it but the parser lacked the flag): the landing
    table stores typed columns parsed once at ingest."""
    src = str(tmp_path)
    spark.createDataFrame(
        [(1, '{"k": 7, "tag": "a"}'), (2, "not-json")], "id bigint, props string"
    ).write.parquet(f"{src}/ev.parquet")
    spark.sql("DROP TABLE IF EXISTS cli_shred_t")
    rc, out, _ = _run(capsys, spark, [
        "transfer", src, "ev", "cli_shred_t",
        "--shred", "props=k INT, tag STRING",
    ])
    try:
        assert rc == 0 and out["rows"] == 2
        got = spark.table("cli_shred_t")
        assert got.columns == ["id", "k", "tag"]
        assert {r.id: (r.k, r.tag) for r in got.collect()} == {
            1: (7, "a"), 2: (None, None),
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS cli_shred_t")

    # malformed spec fails loudly with usage guidance, not a stack trace
    rc, _, err = _run(capsys, spark, [
        "transfer", src, "ev", "cli_shred_bad", "--shred", "no-equals-sign",
    ])
    assert rc == 1 and "COL=DDL" in err


def test_cli_transfer_shred_auto_and_bucket_by(capsys, spark, tmp_path):
    """CLI parity for the r11 transfer surface: --shred auto lands typed
    columns from the product's own inference, --bucket-by lands a bucketed
    managed table (append-safe spec), malformed --bucket-by refuses with
    usage guidance."""
    src = str(tmp_path)
    spark.createDataFrame(
        [(i, i % 7, '{"k": %d}' % i) for i in range(40)],
        "id bigint, uid bigint, props string",
    ).write.parquet(f"{src}/ev.parquet")
    spark.sql("DROP TABLE IF EXISTS cli_auto_t")
    rc, out, _ = _run(capsys, spark, [
        "transfer", src, "ev", "cli_auto_t",
        "--shred", "auto", "--bucket-by", "uid:8:uid",
    ])
    try:
        assert rc == 0 and out["rows"] == 40
        got = spark.table("cli_auto_t")
        assert "k" in got.columns and "props" in got.columns  # auto keeps raw
        assert got.filter("k != id").count() == 0
        desc = spark.sql("DESCRIBE EXTENDED cli_auto_t").collect()
        bucket_rows = {r.col_name: r.data_type for r in desc}
        assert bucket_rows.get("Num Buckets") == "8"
    finally:
        spark.sql("DROP TABLE IF EXISTS cli_auto_t")

    rc, _, err = _run(capsys, spark, [
        "transfer", src, "ev", "cli_bad_bucket", "--bucket-by", ":",
    ])
    assert rc == 1 and "COLS[:N[:SORT_COLS]]" in err


def test_cli_ann_index_lifecycle(capsys, spark, tmp_path):
    """The simsearch verbs mirror the API lifecycle (r9 verdict #6):
    build (+PQ, +metadata) -> calibrate -> probe (plain, PQ,
    recall-budgeted, filtered) -> rebuild, each printing one JSON object."""
    from tests.conftest import SF_SMOKE

    path = str(tmp_path / "cli_ivf")
    rc, out, _ = _run(capsys, spark, [
        "index-build", path, "--src-dir", SF_SMOKE,
        "--n-lists", "4", "--metadata", "label", "--pq", "8,16",
    ])
    assert rc == 0 and out["cells"] == 4 and out["pq"]["m"] == 8

    rc, out, _ = _run(capsys, spark, [
        "index-calibrate", path, "--k", "5", "--n-probes", "2",
        "--budgets", "5,40", "--sample", "8",
    ])
    assert rc == 0 and len(out["curve"]) == 2
    assert out["curve"][-1]["recall"] >= out["curve"][0]["recall"]

    rc, out, _ = _run(capsys, spark, [
        "index-probe", path, "--src-dir", SF_SMOKE, "--query-ids", "0,1",
        "--k", "5", "--n-probes", "2",
    ])
    assert rc == 0 and out["n_rows"] == 10

    rc, out, _ = _run(capsys, spark, [
        "index-probe", path, "--src-dir", SF_SMOKE, "--query-ids", "0,1",
        "--k", "5", "--n-probes", "4", "--pq", "--rerank", "10000",
        "--predicate", "label = 1",
    ])
    assert rc == 0 and out["n_rows"] > 0
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    assert all(labels[r["neighbor_id"]] == 1 for r in out["rows"])

    rc, out, _ = _run(capsys, spark, [
        "index-probe", path, "--src-dir", SF_SMOKE, "--query-ids", "0",
        "--k", "5", "--pq", "--target-recall", "0.5",
    ])
    assert rc == 0 and out["n_rows"] == 5

    rc, out, _ = _run(capsys, spark, ["index-rebuild", path])
    assert rc == 0 and out["generation"].startswith("gen-")
    rc, out, _ = _run(capsys, spark, [
        "index-probe", path, "--src-dir", SF_SMOKE, "--query-ids", "0,1",
        "--k", "5",
    ])
    assert rc == 0 and out["n_rows"] == 10  # new generation serves


def test_cli_stream_ingest_exactly_once(capsys, spark, tmp_path):
    """stream-ingest drains a parquet directory stream through the
    exactly-once sink: re-running with the same checkpoint is a no-op,
    new files land incrementally, and --lease participates in the table
    writer protocol."""
    src = str(tmp_path / "src")
    target = str(tmp_path / "tgt")
    spark.range(100).selectExpr("id", "id % 3 AS k").write.parquet(src)

    rc, out, _ = _run(capsys, spark, ["stream-ingest", src, target])
    assert rc == 0 and out["rows_total"] == 100

    # replay with the same checkpoint: no new batches, same rows
    rc, out, _ = _run(capsys, spark, ["stream-ingest", src, target])
    assert rc == 0 and out["rows_total"] == 100

    # a new file arrives -> one incremental batch (with --lease this time)
    spark.range(100, 150).selectExpr("id", "id % 3 AS k")\
        .write.mode("append").parquet(src)
    rc, out, _ = _run(capsys, spark, ["stream-ingest", src, target, "--lease"])
    assert rc == 0 and out["rows_total"] == 150


def test_cli_index_stream_ingest(capsys, spark, tmp_path):
    """The streaming half of the index lifecycle from the front door:
    build, stream a batch of new vectors in exactly-once, report drift."""
    from bigquack_spark.operators import simsearch as S
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    assert S.build_ivf_index(emb.filter("vec_id < 400"), path, n_lists=4) == 4
    src = str(tmp_path / "incoming")
    emb.filter("vec_id >= 400").write.parquet(src)
    rc, out, _ = _run(capsys, spark, [
        "index-stream-ingest", src, path, "--drift-check",
    ])
    assert rc == 0
    assert out["appended"] == emb.filter("vec_id >= 400").count()
    assert out["drift"] is not None and "rebuild" in out["drift"]
    assert spark.read.parquet(f"{path}/index").count() == emb.count()
