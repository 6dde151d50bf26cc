"""The declared query inventory.

Every operator claimed done in SURVEY.md §2 has a registry entry: a Spark
callable ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) the
equivalent DuckDB oracle SQL the driver diffs against.  Column names are
aliased identically on both sides — the driver's compare sorts columns by
name before hashing.
"""

from bigquack_spark.queries.registry import QUERIES, QuerySpec, oracle_sql, queries, query  # noqa: F401

# Importing the modules populates the registry.
from bigquack_spark.queries import relational  # noqa: E402,F401
from bigquack_spark.queries import events  # noqa: E402,F401
from bigquack_spark.queries import dedup  # noqa: E402,F401
from bigquack_spark.queries import simsearch  # noqa: E402,F401
from bigquack_spark.queries import text  # noqa: E402,F401
from bigquack_spark.queries import corpus  # noqa: E402,F401
from bigquack_spark.queries import sampling  # noqa: E402,F401
