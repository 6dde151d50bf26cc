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
