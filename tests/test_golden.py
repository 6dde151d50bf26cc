"""Golden-value tests ported 1:1 from the reference's unit corpus
(FIXTURES.md §A; duck_test.go:54-295)."""

from __future__ import annotations

import pytest

from bigquack_spark.codec import decode_rows, encode_rows
from bigquack_spark.engine import Engine

PEOPLE_ROWS = [(1, "Alice", 95.5), (2, "Bob", 87.2), (3, "Eve", 78.9)]


@pytest.fixture()
def engine(spark):
    eng = Engine(spark)
    # CREATE TABLE people + INSERT VALUES (duck_test.go:64,71-76), via the
    # same SQL-passthrough surface the reference uses.
    eng.exec("CREATE OR REPLACE TEMP VIEW people AS SELECT * FROM VALUES "
             "(1, 'Alice', CAST(95.5 AS DOUBLE)), (2, 'Bob', 87.2), (3, 'Eve', 78.9) "
             "AS people(id, name, score)")
    return eng


def test_golden_select_order_by(engine):
    """duck_test.go:83,109-127: exact cell values, row/col counts, types."""
    rows = engine.query_rows("SELECT id, name, score FROM people ORDER BY id")
    assert len(rows) == 3
    assert len(rows[0]) == 3
    for row, (gid, gname, gscore) in zip(rows, PEOPLE_ROWS):
        assert row.id == gid
        assert row.name == gname
        assert row.score == pytest.approx(gscore, abs=0.001)  # duck_test.go:123


def test_golden_limit(engine):
    """duck_test.go:236: LIMIT 1 -> exactly one row."""
    assert len(engine.query_rows("SELECT id, name, score FROM people LIMIT 1")) == 1


def test_golden_encode_roundtrip(engine):
    """duck_test.go:192-295 (QueryProto): query -> per-row encode -> decode
    -> field-by-field equality."""
    df = engine.query("SELECT id, name, score FROM people ORDER BY id")
    encoded = encode_rows(df)
    assert encoded.columns == ["encoded"]
    assert encoded.count() == 3
    back = decode_rows(encoded, df.schema).orderBy("id").collect()
    for row, (gid, gname, gscore) in zip(back, PEOPLE_ROWS):
        assert (row.id, row.name) == (gid, gname)
        assert row.score == pytest.approx(gscore, abs=0.001)


def test_encode_strict_flat_rejects_nested(spark):
    """bigquery_write.go:279-282: flat-only descriptor parity."""
    df = spark.sql("SELECT 1 AS a, struct(2 AS x) AS s")
    with pytest.raises(ValueError, match="nested"):
        encode_rows(df, strict_flat=True)


def test_golden_users_create_then_append(spark, tmp_path):
    """duck_test.go:132-190: ingest once -> table created (2 rows); ingest
    again -> appended (4 rows)."""
    eng = Engine(spark)
    batch = spark.createDataFrame([(10, "Kiki"), (11, "Lala")], "uid bigint, uname string")
    table = "users_golden"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    eng.ingest_create_append(table, batch)
    assert spark.table(table).count() == 2
    eng.ingest_create_append(table, batch)
    rows = eng.query_rows(f"SELECT uid, uname FROM {table} ORDER BY uid")
    assert len(rows) == 4  # duck_test.go:189
    assert [r.uid for r in rows] == [10, 10, 11, 11]
    spark.sql(f"DROP TABLE {table}")


def test_ingest_schema_mismatch_rejected(spark):
    """bigquery_write.go:422-424: schema gate on append."""
    eng = Engine(spark)
    table = "users_schema_gate"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    eng.ingest_create_append(table, spark.createDataFrame([(1, "a")], "uid bigint, uname string"))
    bad = spark.createDataFrame([(1.5, "a")], "uid double, uname string")
    with pytest.raises(ValueError, match="does not match"):
        eng.ingest_create_append(table, bad)
    spark.sql(f"DROP TABLE {table}")


def test_facade_mirrors_reference_api(spark, tmp_path):
    """A reference user's program, renamed: handle -> reader w/ pushdown ->
    bq2duck -> query -> query_proto -> managed writer."""
    from bigquack_spark.bigquack import BigQuackSpark
    from bigquack_spark.sinks.atomic import WriteStreamType

    bq = BigQuackSpark(spark)
    sf = "/root/testdata/sf0.001"

    r = bq.new_reader(sf, "supplier", columns=["s_suppkey", "s_name"], predicate="s_suppkey > 0")
    assert [f.name for f in r.schema().fields] == ["s_suppkey", "s_name"]

    spark.sql("DROP TABLE IF EXISTS facade_supplier")
    n = bq.bq2duck(sf, "supplier", "facade_supplier", predicate="s_suppkey > 0")
    assert n == bq.query("SELECT count(*) AS c FROM facade_supplier").collect()[0].c

    encoded = bq.query_proto("SELECT s_suppkey FROM facade_supplier ORDER BY s_suppkey LIMIT 2")
    assert encoded.count() == 2

    w = bq.new_managed_writer(str(tmp_path / "facade_out"), WriteStreamType.PENDING)
    w.write(spark.table("facade_supplier"))
    assert w.finalize() == n
    spark.sql("DROP TABLE facade_supplier")


def test_arrow_ipc_roundtrip(spark):
    """F4 parity (bigquery_write.go:429-445): batch -> IPC bytes -> batch
    must be lossless across a mixed flat schema, with the decode schema
    re-derived from the source frame."""
    from bigquack_spark.codec import decode_arrow_ipc, encode_arrow_ipc

    df = spark.createDataFrame(
        [(1, "a", 1.5, True), (2, "b", -2.25, False), (3, None, None, None)],
        "id bigint, name string, score double, flag boolean",
    ).repartition(2)
    blobs = encode_arrow_ipc(df)
    assert blobs.columns == ["ipc"]
    back = decode_arrow_ipc(blobs, df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
