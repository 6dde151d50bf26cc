"""Range-clustered writes — physical layout for data skipping.

At 100 TB, the cheapest query is the one that never opens the file: parquet
footers carry per-column min/max, and a scan with a selective predicate on
the clustering key skips every file whose range can't match.  That only
works if the writer made file ranges disjoint — unsorted ingest spreads
every key across every file and the stats prune nothing.

``save_clustered`` is the plain-parquet version of Delta OPTIMIZE ZORDER's
single-key case: a range repartition (sampled, skew-aware sizing by
Spark's RangePartitioner) so each output file owns one contiguous key
range, then an in-partition sort so row groups within a file are also
range-disjoint (parquet writers emit row-group-level stats too).

Pairs with :mod:`bigquack_spark.sinks.compact`: compaction fixes file
COUNT, clustering fixes file ORDER; a maintenance pipeline typically does
both in one rewrite (compact with ``cluster_cols=...``).

The reference's sink has no layout control at all (a single DuckDB table,
duck.go:214-252); this module is pure extension surface for the Spark
deployment (SURVEY §7 principles: declarative, no driver materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def save_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` range-clustered on ``cluster_cols``.

    Each output file covers one contiguous range of the clustering key
    (file ranges are pairwise disjoint except for rows equal at the
    boundary key), and rows are sorted within each file.  ``num_files``
    defaults to the session's shuffle parallelism.
    """
    parted = (
        df.repartitionByRange(num_files, *cluster_cols)
        if num_files
        else df.repartitionByRange(*cluster_cols)
    )
    parted.sortWithinPartitions(*cluster_cols).write.mode(mode).parquet(path)
