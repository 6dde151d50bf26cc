"""Small-file compaction — table maintenance for long-lived parquet layouts.

Why it exists: every incremental writer in this repo (AtomicWriter appends,
``overwrite_partitions`` backfills, the streaming exactly-once sink) adds
files per batch.  At 100 TB a table touched by thousands of micro-batches
degrades into millions of KB-sized files; scan parallelism then wastes a
task per file and the NameNode/object-store listing dominates query time.
The reference never hits this (its sink is a single DuckDB table,
duck.go:214-252), but any Spark deployment of the same pipeline does —
compaction is the OPTIMIZE half of the Delta/Iceberg maintenance loop,
re-expressed over plain parquet directories.

Design constraints for scale:
- **Per-partition work units.** The plan walks leaf directories and selects
  only partitions whose files are mostly undersized; each is rewritten
  independently (bounded memory, parallelizable across maintenance jobs,
  untouched partitions keep their files bit-identical).
- **Rewrite through Spark, not the driver.** Each selected partition is
  read and re-written as a DataFrame job with an explicit output-file
  budget (``ceil(bytes / target_file_bytes)``) — no row ever passes
  through driver memory.
- **Stage-then-swap, crash-safe.** New files land in a staging directory,
  are checksum-verified against the source, and a generation marker makes
  the swap roll forward from any crash point (the full protocol lives in
  operators/maintenance.py, which executes every compaction since r7).  On
  a production object store the same operator targets a Delta/Iceberg
  table where the txn log makes the swap atomic (SURVEY §2.2 K4 analogue).
- **Idempotent.** A partition already at its file budget is skipped, so
  re-running compaction converges (second run plans zero work).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def _leaf_dirs(path: str) -> list[str]:
    """Leaf data directories of a (possibly partitioned) parquet layout."""
    leaves = []
    for dirpath, dirnames, filenames in os.walk(path):
        dirnames[:] = [d for d in dirnames if not d.startswith((".", "_"))]
        if any(_is_data_file(f) for f in filenames):
            leaves.append(dirpath)
    return sorted(leaves)


def _is_data_file(name: str) -> bool:
    return name.endswith(".parquet") and not name.startswith((".", "_"))


@dataclass
class PartitionPlan:
    directory: str
    files: list[str]
    bytes: int
    n_out: int


def plan_compaction(
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    min_files: int = 2,
) -> list[PartitionPlan]:
    """Select partitions worth rewriting.

    A partition qualifies when it has at least ``min_files`` data files AND
    fewer bytes-per-file than half the target — i.e. compaction would
    actually reduce the file count.  Uses driver-side listing (the local
    parquet harness); at cluster scale the identical walk runs through the
    Hadoop FileSystem API against the object store.
    """
    plans = []
    for leaf in _leaf_dirs(path):
        files = sorted(f for f in os.listdir(leaf) if _is_data_file(f))
        if len(files) < min_files:
            continue
        total = sum(os.path.getsize(os.path.join(leaf, f)) for f in files)
        n_out = max(1, math.ceil(total / target_file_bytes))
        if n_out < len(files) and total / len(files) < target_file_bytes / 2:
            plans.append(PartitionPlan(leaf, files, total, n_out))
    return plans


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    min_files: int = 2,
    cluster_cols: list[str] | None = None,
    verify: bool = False,
) -> dict:
    """Rewrite undersized partitions of ``path`` into ~target-sized files.

    Returns a report ``{partitions_compacted, files_before, files_after,
    bytes_rewritten, ...}``.  Row content is preserved exactly (same rows,
    same schema); only the physical file layout changes.  With
    ``cluster_cols`` the rewrite also range-clusters each partition
    (sinks/clustered.py semantics): one maintenance pass fixes file count
    AND file order, so footer min/max prune scans afterwards.

    Since r7 this delegates to :func:`bigquack_spark.operators.maintenance.
    compact_small_files` — the checksum-verified, crash-safe (marker +
    roll-forward) executor — so the repo has exactly ONE compaction publish
    protocol.  ``verify=False`` here keeps the historical cheap path for
    callers that already checksum at a higher level."""
    from bigquack_spark.operators.maintenance import compact_small_files

    return compact_small_files(
        spark,
        path,
        target_file_bytes=target_file_bytes,
        min_files=min_files,
        cluster_cols=cluster_cols,
        verify=verify,
    )
