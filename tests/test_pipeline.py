"""Pipeline + source tests: the BQ2Duck analogue (bigquack.go:64-141) and
pushdown-preserving reader (bigquery.go:85-129), offline parquet harness
(FIXTURES.md §A4 shape)."""

from __future__ import annotations

from bigquack_spark.pipeline import transfer
from bigquack_spark.sources.reader import Reader, read_source
from tests.conftest import SF_SMOKE


def test_transfer_full_table(spark):
    """bigquery_test.go:42-88 shape: read supplier -> ingest -> count."""
    spark.sql("DROP TABLE IF EXISTS supplier_copy")
    n = transfer(spark, SF_SMOKE, "supplier", "supplier_copy")
    assert n == 10
    assert spark.table("supplier_copy").count() == 10
    spark.sql("DROP TABLE supplier_copy")


def test_transfer_pushdown_and_append(spark):
    """bigquack_test.go:12-30 shape: projected+filtered transfer, then a
    second transfer appends (duck.go create-or-append semantics)."""
    spark.sql("DROP TABLE IF EXISTS supplier_push")
    cols = ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
    n1 = transfer(
        spark, SF_SMOKE, "supplier", "supplier_push",
        columns=cols, predicate="s_suppkey > 0", max_streams=2,
    )
    expected = (
        spark.read.parquet(f"{SF_SMOKE}/supplier.parquet").filter("s_suppkey > 0").count()
    )
    assert n1 == expected
    assert spark.table("supplier_push").columns == cols
    n2 = transfer(
        spark, SF_SMOKE, "supplier", "supplier_push",
        columns=cols, predicate="s_suppkey > 0",
    )
    assert n2 == expected
    assert spark.table("supplier_push").count() == 2 * expected
    spark.sql("DROP TABLE supplier_push")


def test_reader_pushdown_reaches_scan(spark):
    """S2/S3 (bigquery.go:80,91): projection and predicate must reach the
    parquet scan — visible as PushedFilters + pruned ReadSchema."""
    df = read_source(
        spark, SF_SMOKE, "supplier",
        columns=["s_suppkey", "s_name"], predicate="s_suppkey > 3",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(s_suppkey,3)" in plan
    assert "s_acctbal" not in plan  # pruned column never read
    expected = (
        spark.read.parquet(f"{SF_SMOKE}/supplier.parquet").filter("s_suppkey > 3").count()
    )
    assert df.count() == expected


def test_reader_consumes_all_streams(spark):
    """SURVEY §2.1 S4: the reference drops data beyond stream 0; the rebuild
    must read every partition even when max_streams > 1."""
    r = Reader(spark, SF_SMOKE, "lineitem", max_streams=4)
    df = r.dataframe()
    assert df.rdd.getNumPartitions() >= 4
    assert df.count() == spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").count()


def test_reader_schema_and_batches(spark):
    """S8 (bigquery.go:243-248) Schema(); S5 Read() parity via Arrow batches."""
    r = Reader(spark, SF_SMOKE, "region")
    assert [f.name for f in r.schema().fields] == ["r_regionkey", "r_name"]
    total = sum(b.num_rows for b in r.to_batches())
    assert total == 5
