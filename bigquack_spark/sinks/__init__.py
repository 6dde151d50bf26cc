from bigquack_spark.sinks.table import ingest_create_append, table_exists  # noqa: F401
from bigquack_spark.sinks.atomic import AtomicWriter, WriteStreamType  # noqa: F401
from bigquack_spark.sinks.partitioned import overwrite_partitions, save_bucketed  # noqa: F401
from bigquack_spark.sinks.clustered import save_clustered, save_zordered  # noqa: F401
from bigquack_spark.sinks.merge import merge_upsert  # noqa: F401
from bigquack_spark.sinks.wap import write_audit_publish  # noqa: F401
