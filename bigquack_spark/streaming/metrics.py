"""Streaming observability: per-micro-batch progress capture.

The reference logs transfer row counts and durations (bigquack.go:127-137);
a streaming pipeline needs the same observable per micro-batch.  Spark
already emits a progress document per batch — this module captures it via
``StreamingQueryListener`` (driver-side callback, zero cost in the data
path) and exposes the metrics a pipeline owner alerts on: input rows,
processing rate, batch duration, watermark lag.

Usage::

    cap = ProgressCapture.attach(spark)
    ... run streaming query ...
    cap.metrics()      # list of per-batch dicts
    cap.to_df(spark)   # same as a DataFrame (write it anywhere)
    cap.detach()
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

_SCHEMA = (
    "query_id string, batch_id bigint, num_input_rows bigint, "
    "process_rate double, duration_ms bigint, event_time_watermark string, "
    "rows_dropped_by_watermark bigint, observed string"
)


class ProgressCapture(StreamingQueryListener):
    """Collects one metrics row per completed micro-batch, across every
    streaming query on the session while attached."""

    def __init__(self) -> None:
        self._rows: list[dict] = []

    # -- listener callbacks (called by Spark on the driver) -----------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        dropped = 0
        for op in p.stateOperators or []:
            try:
                dropped += int(op.numRowsDroppedByWatermark or 0)
            except (AttributeError, TypeError):
                pass
        observed = {}
        try:
            for name, row in (p.observedMetrics or {}).items():
                observed[name] = row.asDict() if hasattr(row, "asDict") else dict(row)
        except (AttributeError, TypeError):
            pass
        import json as _json

        self._rows.append(
            {
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "process_rate": float(p.processedRowsPerSecond or 0.0),
                "duration_ms": int(p.durationMs.get("triggerExecution", 0)),
                "event_time_watermark": (p.eventTime or {}).get("watermark"),
                # the late-data loss ledger: rows the watermark silently
                # discarded this batch (summed over stateful operators) —
                # the number a pipeline owner alerts on before consumers
                # notice gaps
                "rows_dropped_by_watermark": dropped,
                # df.observe(...) custom metrics, serialized to one JSON
                # string per batch (scalar column, sink-portable)
                "observed": _json.dumps(observed, default=str) if observed else None,
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- user surface -------------------------------------------------------
    @classmethod
    def attach(cls, spark: SparkSession) -> "ProgressCapture":
        cap = cls()
        cap._spark = spark
        spark.streams.addListener(cap)
        return cap

    def detach(self) -> None:
        self._spark.streams.removeListener(self)

    def metrics(self) -> list[dict]:
        return list(self._rows)

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            (
                r["query_id"],
                r["batch_id"],
                r["num_input_rows"],
                r["process_rate"],
                r["duration_ms"],
                r["event_time_watermark"],
                r.get("rows_dropped_by_watermark", 0),
                r.get("observed"),
            )
            for r in self._rows
        ]
        return spark.createDataFrame(rows, _SCHEMA)
