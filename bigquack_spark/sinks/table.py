"""Create-or-append ingest — the ``IngestCreateAppend`` analogue.

Reference behavior (duck.go:214-252): probe target schema via
``GetTableSchema`` (duck.go:224); absent -> create from the record's schema,
present -> append (mode pick duck.go:232-236).  Spark's
``saveAsTable(mode="append")`` collapses the probe+branch into one atomic
catalog operation — it creates on first write and appends after, without the
reference's TOCTOU race (SURVEY §7 hard-part 4).

Schema safety: the reference's writer rejects mismatched schemas per record
(bigquery_write.go:422-424); here :func:`check_schema_compatible` performs the
same gate before an append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def table_exists(spark: SparkSession, table: str) -> bool:
    return spark.catalog.tableExists(table)


def check_schema_compatible(spark: SparkSession, table: str, df: DataFrame) -> None:
    """Schema-equality gate (bigquery_write.go:422-424 analogue): names and
    types must match the existing target, order-insensitively."""
    existing = {f.name: f.dataType for f in spark.table(table).schema.fields}
    incoming = {f.name: f.dataType for f in df.schema.fields}
    if existing != incoming:
        raise ValueError(
            f"record schema does not match expected schema for {table!r}: "
            f"existing={existing} incoming={incoming}"
        )


def ingest_create_append(df: DataFrame, table: str) -> None:
    """Create the managed table from the DataFrame's schema on first write,
    append thereafter (duck.go:214-252 semantics)."""
    spark = df.sparkSession
    if table_exists(spark, table):
        check_schema_compatible(spark, table, df)
    df.write.mode("append").saveAsTable(table)
