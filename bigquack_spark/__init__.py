"""bigquack_spark — a PySpark-native engine with the capabilities of TFMV/BigQuack.

The reference (/root/reference, Go) is a BigQuery<->DuckDB ETL bridge whose
relational surface is delegated SQL (duck.go:180,195,280).  This package
re-expresses that surface Spark-first:

- ``session``   — engine handle construction (bigquack.go:32-55 analogue)
- ``engine``    — SQL passthrough + ingest (duck.go:173-252 analogue)
- ``sources``   — pushdown-preserving scans (bigquery.go:85-129 analogue)
- ``sinks``     — create-or-append + atomic pending/committed writes
                  (duck.go:214-252, bigquery_write.go:384-485 analogues)
- ``pipeline``  — the BQ2Duck end-to-end pump (bigquack.go:64-141 analogue)
- ``codec``     — row encoding of query results (duck.go:274-317 analogue)
- ``protowire`` — protobuf wire-format row codec (duck.go:274-317 +
                  bigquery_write.go:219-294 analogues, real proto bytes)
- ``streaming`` — Structured Streaming twins + exactly-once / cascade sinks
- ``operators`` — 100 TB-scale extension ops: dedup, similarity search,
                  text analysis, multimodal plumbing
- ``queries``   — the declared query inventory w/ DuckDB oracle SQL
"""

__version__ = "0.1.0"

from bigquack_spark.session import get_spark, tune  # noqa: F401
from bigquack_spark.engine import Engine  # noqa: F401
