from bigquack_spark.sinks.table import ingest_create_append, table_exists  # noqa: F401
from bigquack_spark.sinks.atomic import AtomicWriter, WriteStreamType  # noqa: F401
