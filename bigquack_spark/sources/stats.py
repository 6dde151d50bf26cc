"""Footer-stats table statistics: COUNT/MIN/MAX answered from parquet
metadata, no row data read.

The reference exposes schema introspection over its sources (duck.go:210-212
GetTableSchema; bigquery.go:243-248 session schema) but computes no
statistics.  At 100 TB, "how many rows, what's the value range" is the
first query every pipeline runs — and it is answerable from parquet
footers alone.  Spark's DSv2 parquet reader pushes COUNT(*)/MIN/MAX into
the scan (``PushedAggregation`` in the plan) when
``spark.sql.parquet.aggregatePushdown`` is on; the scan then reads ONLY
file footers: a metadata operation over any number of files, distributed
across executors, never touching a data page.

The v1 parquet path ignores aggregate pushdown, so :func:`table_stats`
flips the session to the DSv2 reader just long enough to *plan* the query
(source resolution happens at ``read.load`` time), then restores the prior
confs — the returned DataFrame keeps its pushed plan either way.

Limits (inherited from Spark's pushdown rules): no pushdown under a row
filter, for nested/timestamp-ntz edge types, or for aggregates other than
COUNT/MIN/MAX — Spark silently falls back to a real scan, which is the
correct-if-slower behavior; the plan contract test pins the fast path for
the supported shape.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_V1_LIST_KEY = "spark.sql.sources.useV1SourceList"
_AGG_PUSH_KEY = "spark.sql.parquet.aggregatePushdown"


@contextmanager
def _v2_parquet(spark: SparkSession):
    # NB: conf.get(key, None) returns None for a conf the session never set
    # (the engine-side default is not surfaced), so restore must UNSET in
    # that case — setting nothing would leave the whole session on the v2
    # reader, which silently changes every later scan (and trips a v2
    # columnar-cache NPE under MLlib's .cache()).
    prev_v1 = spark.conf.get(_V1_LIST_KEY, None)
    prev_push = spark.conf.get(_AGG_PUSH_KEY, None)
    spark.conf.set(_V1_LIST_KEY, "")
    spark.conf.set(_AGG_PUSH_KEY, "true")
    try:
        yield
    finally:
        if prev_v1 is None:
            spark.conf.unset(_V1_LIST_KEY)
        else:
            spark.conf.set(_V1_LIST_KEY, prev_v1)
        if prev_push is None:
            spark.conf.unset(_AGG_PUSH_KEY)
        else:
            spark.conf.set(_AGG_PUSH_KEY, prev_push)


def _footer_stats_usable(path: str, cols: list[str]) -> bool:
    """Pushdown pre-flight: Spark's footer-stats scan RAISES mid-query
    ("No min/max found") on a file whose row groups lack statistics — or
    has none at all (an empty table).  One pyarrow footer sweep decides
    whether the fast path is safe; on any doubt the caller takes the
    plain-scan fallback, which is correct at any input."""
    try:
        import os

        import pyarrow.parquet as pq

        files = (
            [os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")]
            if os.path.isdir(path)
            else [path]
        )
        saw_group = False
        for f in files:
            md = pq.read_metadata(f)
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            for g in range(md.num_row_groups):
                saw_group = True
                for c in cols:
                    st = md.row_group(g).column(names.index(c)).statistics
                    if st is None or not st.has_min_max:
                        return False
        return saw_group
    except Exception:
        return False


def table_stats(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """One-row DataFrame of (n_rows, min_<c>, max_<c> per requested col),
    computed from parquet footer statistics — a metadata-only query.
    Falls back to a plain scan when footers carry no usable stats (empty
    table, statless writer) — correct-if-slower, same contract."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    if not _footer_stats_usable(path, cols):
        return spark.read.parquet(path).agg(*aggs)
    with _v2_parquet(spark):
        out = spark.read.parquet(path).agg(*aggs)
        # Materialize the physical plan while the v2/pushdown confs are
        # live: QueryExecution phases are lazy, and V2ScanRelationPushDown
        # consults the conf at optimization time — planned after restore,
        # the aggregate would silently fall back to a full scan.
        out._jdf.queryExecution().executedPlan()
        return out
