"""Exactly-once streaming sink — the Storage Write API offset contract
(bigquery_write.go:448-460) carried into Structured Streaming.

``foreachBatch`` hands each micro-batch a monotonically increasing
``batch_id``; treating it as the append offset gives the managed-writer
idempotence: on restart-and-replay, already-committed batch ids are
silently skipped.  The committed offset is persisted next to the data so
the guarantee survives process restarts (the in-memory AtomicWriter covers
the single-process case; this covers the resumed-query case).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


class ExactlyOnceBatchSink:
    """foreachBatch handler with durable offset tracking.

    Each batch lands in its own ``batch_id=N`` partition directory with
    OVERWRITE mode, so the write itself is idempotent: a crash after the
    data write but before the offset persist (the r2-verdict crash window
    — a plain ``append`` with random part names would re-append on
    replay) just overwrites the same directory with the same rows on
    replay.  The offset gate then makes already-committed ids no-ops
    without re-running their plans.  Readers ``spark.read.parquet(target)``
    as usual — the batch_id partition column rides along.

    Usage::

        sink = ExactlyOnceBatchSink(target_dir)
        (stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt).trigger(availableNow=True)
            .start().awaitTermination())
    """

    def __init__(self, target: str):
        self.target = target
        self._offset_file = os.path.join(target, "_COMMITTED_BATCH")
        self._migrate_legacy_layout()
        self.next_batch_id = self._load()

    def _migrate_legacy_layout(self) -> None:
        """Pre-r3 versions of this sink appended flat ``part-*`` files at the
        target root; the current layout is ``batch_id=N/`` directories.  A
        mixed-depth target breaks Spark partition discovery ('Conflicting
        directory structures'), so a resumed stream over an old target would
        fail even with a valid offset file.  Absorb legacy flat part-files
        into a ``batch_id=-1`` partition directory (they predate offset
        tracking, so no real batch id claims them; -1 sorts before every
        genuine batch and can never collide with one)."""
        try:
            legacy = [
                f
                for f in os.listdir(self.target)
                if f.startswith("part-") and os.path.isfile(os.path.join(self.target, f))
            ]
        except OSError:
            return  # fresh target: nothing to migrate
        if not legacy:
            return
        legacy_dir = os.path.join(self.target, "batch_id=-1")
        os.makedirs(legacy_dir, exist_ok=True)
        for f in legacy:
            os.replace(os.path.join(self.target, f), os.path.join(legacy_dir, f))
        for marker in ("_SUCCESS",):
            marker_path = os.path.join(self.target, marker)
            if os.path.isfile(marker_path):
                os.remove(marker_path)

    def _load(self) -> int:
        try:
            with open(self._offset_file) as fh:
                return json.load(fh)["next_batch_id"]
        except (OSError, ValueError, KeyError):
            return 0

    def _persist(self) -> None:
        tmp = self._offset_file + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"next_batch_id": self.next_batch_id}, fh)
        os.replace(tmp, self._offset_file)  # atomic on POSIX

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id < self.next_batch_id:
            return  # replayed batch: already durable — exactly-once
        # overwrite INTO the batch's own partition dir: replay after a
        # crash-before-persist converges instead of duplicating
        batch_df.write.mode("overwrite").parquet(
            os.path.join(self.target, f"batch_id={batch_id}")
        )
        self.next_batch_id = batch_id + 1
        self._persist()


class ContinuousRollupSink:
    """Cascading continuous aggregate — the streaming twin of the batch
    ROLLUP (queries/events.q116): a ``foreachBatch`` handler that maintains
    an HOURLY table from the watermarked hourly aggregation stream and
    derives the DAILY tier from the hourly table's state.

    Per batch: (1) upsert the batch's changed hour rows into the hourly
    table (keyed MERGE on (hour_key, event_type) — late data re-emits an
    hour, the merge replaces it); (2) recompute ONLY the touched days from
    the merged hourly table and upsert them into the daily table.  The day
    tier always derives from hourly STATE, never from stream deltas, so
    replays and late-data re-emissions can never double-count — every step
    is idempotent on its key, which is a stronger property than the
    batch-id offset gate (sink above) and composes with it.

    Deployment shape: both tables day-partitioned with
    ``overwrite_partitions`` (or Delta MERGE) so each batch rewrites only
    the touched days, not the table; hours-per-day fan-in keeps the daily
    recompute bounded at 24 rows per (day, type) regardless of event
    volume."""

    def __init__(self, base_dir: str):
        self.hourly = os.path.join(base_dir, "hourly")
        self.daily = os.path.join(base_dir, "daily")

    def _upsert(self, target: str, rows: DataFrame, keys: list[str]) -> None:
        from bigquack_spark.sinks.merge import _recover_orphaned_swap, merge_upsert

        # a crash between merge_upsert's two swap renames leaves the table
        # in a .old- backup with target missing; recover BEFORE the exists
        # check or the fresh-write branch would silently truncate history
        _recover_orphaned_swap(target)
        if not os.path.exists(target):
            rows.write.parquet(target)
        else:
            merge_upsert(rows.sparkSession, target, rows, keys)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        self._upsert(self.hourly, batch_df, ["hour_key", "event_type"])
        touched_days = batch_df.select(
            F.substring("hour_key", 1, 10).alias("day_key")
        ).distinct()
        hourly_state = spark.read.parquet(self.hourly).withColumn(
            "day_key", F.substring("hour_key", 1, 10)
        )
        day_rows = (
            hourly_state.join(touched_days, "day_key")
            .groupBy("day_key", "event_type")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("total_value").alias("total_value"),
            )
        )
        self._upsert(self.daily, day_rows, ["day_key", "event_type"])


class SketchRollupSink:
    """Streaming Count-Min rollup — the streaming twin of the batch CMS
    (queries/sketch.q157): a ``foreachBatch`` handler that maintains ONE
    persisted DEPTH x WIDTH counter table by ADDING each micro-batch's
    partial sketch into it.

    Mergeability is the whole point of the sketch: per-batch partials
    combine by counter addition, so the persisted summary stays
    4 KB-class forever while summarizing an unbounded stream.  Addition
    is NOT idempotent, so this sink composes the batch-id offset gate
    (ExactlyOnceBatchSink's contract — replayed batch ids are skipped,
    offset persisted atomically next to the data) with the merge; replay
    convergence is exactly-once by offset, not by idempotence.

    The partial build is the q157 plan (DEPTH-way projection union +
    map-side-combined groupBy); md5 buckets keep the persisted sketch a
    portable artifact any engine can extend or query."""

    def __init__(self, target: str, key_col: str, depth: int = 4, width: int = 1024):
        self.target = target
        self.key_col = key_col
        self.depth = depth
        self.width = width
        self.table = os.path.join(target, "sketch")
        self._offset_file = os.path.join(target, "_COMMITTED_BATCH")
        self.next_batch_id = self._load()

    _load = ExactlyOnceBatchSink._load
    _persist = ExactlyOnceBatchSink._persist

    def _partial(self, batch_df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        rows = None
        for j in range(self.depth):
            bucket = (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", F.lit(j), F.col(self.key_col).cast("string"))),
                        1, 12,
                    ), 16, 10,
                ).cast("bigint") % self.width
            )
            r = batch_df.select(F.lit(j).alias("j"), bucket.alias("bucket"))
            rows = r if rows is None else rows.unionByName(r)
        return rows.groupBy("j", "bucket").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from bigquack_spark.sinks.merge import _recover_orphaned_swap

        if batch_id < self.next_batch_id:
            return  # replayed: the sketch already contains this batch
        # a crash between the two swap renames below leaves the table in a
        # .old-<id> backup with self.table missing; recover FIRST or the
        # exists() check silently resets the accumulated sketch to this
        # batch's partial (ADVICE r2) — same guard ContinuousRollupSink uses
        _recover_orphaned_swap(self.table)
        spark = batch_df.sparkSession
        partial = self._partial(batch_df)
        if os.path.exists(self.table):
            merged = (
                spark.read.parquet(self.table)
                .unionByName(partial)
                .groupBy("j", "bucket")
                .agg(F.sum("cnt").cast("long").alias("cnt"))
            )
        else:
            merged = partial
        tmp = self.table + f".staging-{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(self.table):
            backup = self.table + f".old-{batch_id}"
            os.rename(self.table, backup)
            os.rename(tmp, self.table)
            import shutil

            shutil.rmtree(backup, ignore_errors=True)
        else:
            os.rename(tmp, self.table)
        self.next_batch_id = batch_id + 1
        self._persist()

    def estimate(self, spark, keys: DataFrame, key_col: str) -> DataFrame:
        """CMS point estimates for a bounded key set: min over depth rows
        of the matching counters (the standard CMS upper-bound read)."""
        from pyspark.sql import functions as F

        sketch = spark.read.parquet(self.table)
        probes = None
        for j in range(self.depth):
            bucket = (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", F.lit(j), F.col(key_col).cast("string"))),
                        1, 12,
                    ), 16, 10,
                ).cast("bigint") % self.width
            )
            p = keys.select(F.col(key_col), F.lit(j).alias("j"), bucket.alias("bucket"))
            probes = p if probes is None else probes.unionByName(p)
        return (
            probes.join(sketch, ["j", "bucket"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
        )
