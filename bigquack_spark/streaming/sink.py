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

    Usage::

        sink = ExactlyOnceBatchSink(target_dir)
        (stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt).trigger(availableNow=True)
            .start().awaitTermination())
    """

    def __init__(self, target: str):
        self.target = target
        self._offset_file = os.path.join(target, "_COMMITTED_BATCH")
        self.next_batch_id = self._load()

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
        batch_df.write.mode("append").parquet(self.target)
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
