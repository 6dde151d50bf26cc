"""Partitioned + bucketed table layouts — the storage-side half of the
100 TB design.

Two capabilities the reference cannot express (its sink is a single DuckDB
table; duck.go:214-252) but any Spark deployment of the same pipelines
needs:

- **Bucketed tables** (:func:`save_bucketed`): pre-shuffle a fact table by
  its join key ONCE at write time; every later equi-join/aggregate on that
  key is exchange-free.  This is the Spark analogue of co-located storage —
  the write pays the shuffle, every read amortizes it.
- **Dynamic partition overwrite** (:func:`overwrite_partitions`): rewrite
  exactly the partitions present in the incoming batch, leaving siblings
  untouched.  Re-running the same batch converges to the same state —
  idempotent backfill, the overwrite-flavored exactly-once
  (SURVEY §7 hard-part 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally sorted) managed table.

    ``num_buckets`` should match the downstream join fan-out; both sides of
    a co-located join must agree on (cols, num_buckets)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Dynamic partition overwrite to a parquet directory: only partitions
    present in ``df`` are replaced (requires
    ``spark.sql.sources.partitionOverwriteMode=dynamic``, set per-write
    here so the session default is untouched)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
