"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real content lives in ``bigquack_spark.queries`` — this module is the
thin adapter the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this file from any CWD; make the package resolvable
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigquack_spark import queries as Q  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the six-way star join with
    broadcast dimensions (TPC-H Q5 shape, q05_region_revenue)."""
    return Q.queries()["q05_region_revenue"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.9."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query; keys
    absent here (q41 seeded LSH, q42 KMeans IVF) are the two genuinely
    non-portable ops the driver checks rows-only."""
    return Q.oracle_sql()
