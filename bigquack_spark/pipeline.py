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

from bigquack_spark.operators.jsonshred import shred_json
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
    shred: dict | None = None,
) -> int:
    """Copy a (projected, filtered) source table into a managed target table;
    returns rows ingested this call.  Signature mirrors
    ``BQ2Duck(ctx, duckDBPath, project, dataset, table, opts)``
    (bigquack.go:64-77) with opts = SelectedFields/RowRestriction/MaxStreamCount.

    ``shred`` makes schema-on-write JSON shredding the DEFAULT ingest
    posture for JSON-carrying tables (r5 verdict #2): pass
    ``{"col": "props", "schema": "k INT, tag STRING", "keep_raw": False}``
    and the landing write parses the JSON ONCE (``from_json`` projection —
    rides the scan, no extra pass) and stores typed top-level columns.
    Every later query reads columnar values instead of re-parsing: measured
    15x on the q20 aggregate at the 100x bench tier (bench_full.json
    ``trend_100x.q20_json_parse_wall``).  The reference maps BQ JSON to
    STRING and re-parses per query (bigquery_write.go:189-190); this is
    the schema-carry analogue of its :372-382 write path."""
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
    if shred is not None:
        df = shred_json(
            df, shred["col"], shred["schema"], keep_raw=bool(shred.get("keep_raw", False))
        )
    ingest_create_append(df, target_table)
    total = spark.table(target_table).count() - before
    # duration log, bigquack.go:135-138
    log.info("transfer complete", extra={"rows": total, "seconds": time.monotonic() - start})
    return total


def transfer_incremental(
    spark: SparkSession,
    source_location: str,
    source_table: str,
    target_table: str,
    watermark_col: str,
    columns: list[str] | None = None,
    max_streams: int | None = None,
    fmt: str = "parquet",
    shred: dict | None = None,
) -> int:
    """Watermark-driven incremental transfer: append only source rows with
    ``watermark_col`` strictly greater than the target's current maximum —
    the repeat-run shape every production BQ2X pipeline converges to (the
    reference re-copies the full table every run, bigquack.go:64-141).

    The high-water mark is read from the TARGET (one column-pruned MAX,
    footer-stat cheap on parquet), so the pipeline is self-contained and
    restart-safe: a crashed run re-derives the mark from whatever actually
    committed.  Exactly-once per row holds when ``watermark_col`` is
    monotone in the source (late rows below the mark are skipped — pair
    with a lagged predicate window if the source can be late).  The
    incremental predicate is pushed down to the source scan like any other
    (PushedFilters), so a 100 TB history costs one footer-pruned slice per
    run, not a rescan."""
    if shred is not None and shred["col"] == watermark_col and not shred.get("keep_raw"):
        raise ValueError(
            "transfer_incremental: the watermark column cannot be the shredded "
            "JSON column (the target would lose it); set keep_raw=True or "
            "watermark on another column"
        )
    if columns is not None and watermark_col not in columns:
        columns = list(columns) + [watermark_col]
    predicate = None
    if spark.catalog.tableExists(target_table):
        row = spark.table(target_table).selectExpr(
            f"max({watermark_col}) AS hi"
        ).collect()[0]
        if row.hi is not None:
            hi = row.hi
            if isinstance(hi, bool):
                lit = "true" if hi else "false"
            elif isinstance(hi, (int, float)):
                lit = repr(hi)
            else:
                # strings / timestamps / dates / decimals: quoted with
                # SQL-standard '' escaping (Spark casts vs the column type)
                lit = "'" + str(hi).replace("'", "''") + "'"
            predicate = f"{watermark_col} > {lit}"
    return transfer(
        spark, source_location, source_table, target_table,
        columns=columns, predicate=predicate, max_streams=max_streams, fmt=fmt,
        shred=shred,
    )
