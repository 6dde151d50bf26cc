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


#: TBLPROPERTIES keys recording which column a landed table was shredded
#: from and with what schema — the provenance ``shred="auto"`` replays on
#: re-ingest (second r11 review pass: deriving the source column from a
#: fresh inference over the NEW batch could silently shred the wrong
#: column, or rebuild a projected-away real column as all-NULL).
SHRED_PROP_COL = "bigquack.shred.col"
SHRED_PROP_SCHEMA = "bigquack.shred.schema"
SHRED_PROP_KEEPRAW = "bigquack.shred.keepraw"


def _record_shred_properties(spark: SparkSession, target_table: str, shred: dict) -> None:
    def q(v: str) -> str:
        return "'" + str(v).replace("'", "''") + "'"

    spark.sql(
        f"ALTER TABLE {target_table} SET TBLPROPERTIES ("
        f"{q(SHRED_PROP_COL)} = {q(shred['col'])}, "
        f"{q(SHRED_PROP_SCHEMA)} = {q(shred['schema'])}, "
        f"{q(SHRED_PROP_KEEPRAW)} = {q(str(bool(shred.get('keep_raw', False))))})"
    )


def _resolve_auto_shred(spark: SparkSession, df, target_table: str) -> "dict | None":
    """Resolve ``shred="auto"`` for one transfer call.

    First landing: a bounded-sample inference over the source frame
    (``auto_shred_spec``).  Re-ingest of an EXISTING target: REPLAY the
    shred spec RECORDED on the target at landing time (TBLPROPERTIES) —
    never re-infer (r11 review, both passes: a fresh inference can
    resolve a different field set, a promoted type, or even a different
    source column, silently NULLing the shredded columns or failing the
    append's exact-schema gate; schema changes under live readers stay an
    explicit operator decision, the q20-remedy posture).  A target with
    no recorded spec and no extra columns landed raw — keep landing raw;
    extra columns WITHOUT provenance refuse loudly rather than guess."""
    from bigquack_spark.operators.jsonshred import auto_shred_spec

    if not spark.catalog.tableExists(target_table):
        return auto_shred_spec(df)
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {target_table}").collect()
    }
    col, schema = props.get(SHRED_PROP_COL), props.get(SHRED_PROP_SCHEMA)
    if col and schema:
        return {"col": col, "schema": schema,
                "keep_raw": props.get(SHRED_PROP_KEEPRAW, "True") == "True",
                "basis": "target-replay", "n_json_refs": 0}
    extra = [c for c in dict(spark.table(target_table).dtypes) if c not in df.columns]
    if not extra:
        return None  # target landed raw; stay raw
    raise ValueError(
        f"transfer(shred='auto'): target {target_table!r} carries columns "
        f"{sorted(extra)} the incoming frame lacks, and records no shred "
        "provenance — synthesizing them from a guess would land NULLs "
        "silently; shred explicitly (shred={'col': ..., 'schema': ...}) or "
        "land to a new table"
    )


def transfer(
    spark: SparkSession,
    source_location: str,
    source_table: str,
    target_table: str,
    columns: list[str] | None = None,
    predicate: str | None = None,
    max_streams: int | None = None,
    fmt: str = "parquet",
    shred: "dict | str | None" = None,
    bucket_by: dict | None = None,
    meter: bool = True,
) -> int:
    """Copy a (projected, filtered) source table into a managed target table;
    returns rows ingested this call (``meter=False`` skips the before/after
    row counts — two extra footer scans that are metering, not landing —
    and returns -1; benches timing the landing itself use it).  Signature mirrors
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
    the schema-carry analogue of its :372-382 write path.

    ``bucket_by`` (r10 verdict #8) lands the table BUCKETED so the
    q68/q21-class layout win is available at ingest time, not only via a
    separate ``save_bucketed`` rewrite: pass ``{"cols": ["o_orderkey"],
    "num_buckets": 32, "sort_cols": ["o_orderkey"]}`` and every later
    join/groupBy on the bucket columns runs exchange-free (both sides of
    a co-located join must agree on cols + num_buckets).  Appends reuse
    the same clause, so the table's bucket spec stays consistent; the
    layout advisor recommends the spec from the captured workload
    (``recommend_layout_from_log`` -> ``bucket_by``).

    ``shred="auto"`` (r10 verdict #4) resolves the spec itself via
    :func:`bigquack_spark.operators.jsonshred.auto_shred_spec`: a bounded
    sample detects the JSON column and its fields on FIRST landing (the
    workload advisor's recommendation is accepted when callers pass its
    captured predicates to ``auto_shred_spec`` directly); a re-ingest of
    an existing target REPLAYS the target's own shred columns/types, so
    appends can never fail the exact-schema gate on a drifted inference.
    Auto always keeps the raw column; no JSON column found means land raw
    (never fail a first ingest on inference)."""
    start = time.monotonic()
    before = (
        spark.table(target_table).count()
        if meter and spark.catalog.tableExists(target_table)
        else 0
    )
    df = read_source(
        spark, source_location, source_table,
        columns=columns, predicate=predicate, max_streams=max_streams, fmt=fmt,
    )
    if shred == "auto":
        shred = _resolve_auto_shred(spark, df, target_table)
        if shred is not None:
            log.info("transfer shred=auto resolved", extra=dict(shred))
    if shred is not None:
        df = shred_json(
            df, shred["col"], shred["schema"], keep_raw=bool(shred.get("keep_raw", False))
        )
    if bucket_by is not None:
        from bigquack_spark.sinks.table import check_schema_compatible, table_exists

        if table_exists(spark, target_table):
            check_schema_compatible(spark, target_table, df)
        writer = df.write.mode("append").bucketBy(
            int(bucket_by.get("num_buckets", 32)), *bucket_by["cols"]
        )
        if bucket_by.get("sort_cols"):
            writer = writer.sortBy(*bucket_by["sort_cols"])
        writer.saveAsTable(target_table)
    else:
        ingest_create_append(df, target_table)
    if isinstance(shred, dict):
        # provenance for shred="auto" re-ingest replay (recorded for
        # explicit specs too, so a later auto append replays them)
        _record_shred_properties(spark, target_table, shred)
    total = (spark.table(target_table).count() - before) if meter else -1
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
    shred: "dict | str | None" = None,
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
    # shred="auto" always keeps the raw column, so it can't lose the
    # watermark; only a concrete spec can drop it
    if isinstance(shred, dict) and shred["col"] == watermark_col and not shred.get("keep_raw"):
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
