"""End-to-end transfer pipeline — the ``BQ2Duck`` analogue.

Reference (bigquack.go:64-141): open sink conn -> create pushdown reader ->
pump batches one at a time (read, skip-empty :114-117, ingest, release,
count) -> log duration -> return total rows.  The pump is serial and
single-stream (SURVEY §2.1 S4 defect).

Spark version: the whole pump is ONE declarative statement — scan with
pushdown, write create-or-append — executed in parallel across all
partitions with no driver-side batch loop and no collect.  Row count comes
from the committed table, not from driver accounting.
"""

from __future__ import annotations

import logging
import time

from pyspark.sql import SparkSession

from bigquack_spark.sinks.table import ingest_create_append
from bigquack_spark.sources.reader import read_source

log = logging.getLogger("bigquack_spark.pipeline")


def transfer(
    spark: SparkSession,
    source_location: str,
    source_table: str,
    target_table: str,
    columns: list[str] | None = None,
    predicate: str | None = None,
    max_streams: int | None = None,
    fmt: str = "parquet",
) -> int:
    """Copy a (projected, filtered) source table into a managed target table;
    returns rows ingested this call.  Signature mirrors
    ``BQ2Duck(ctx, duckDBPath, project, dataset, table, opts)``
    (bigquack.go:64-77) with opts = SelectedFields/RowRestriction/MaxStreamCount.
    """
    start = time.monotonic()
    before = (
        spark.table(target_table).count()
        if spark.catalog.tableExists(target_table)
        else 0
    )
    df = read_source(
        spark, source_location, source_table,
        columns=columns, predicate=predicate, max_streams=max_streams, fmt=fmt,
    )
    ingest_create_append(df, target_table)
    total = spark.table(target_table).count() - before
    # duration log, bigquack.go:135-138
    log.info("transfer complete", extra={"rows": total, "seconds": time.monotonic() - start})
    return total
