from bigquack_spark.streaming.events import (  # noqa: F401
    hourly_counts,
    read_events_stream,
    run_available_now,
    sessionize_stateful,
)
from bigquack_spark.streaming.sink import ExactlyOnceBatchSink  # noqa: F401
