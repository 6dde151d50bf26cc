"""Keyed MERGE (upsert/delete) for plain-parquet tables — the write
primitive the reference's create-or-append sink lacks (duck.go:214-252 can
only CREATE or APPEND; correcting a row means rewriting the table by hand).

``merge_upsert`` applies a change set to a target directory with MERGE
semantics: match on key -> update, no match -> insert, and (optionally) a
delete flag column -> drop.  Plain-parquet constraints shape the design:

- **Read-combine-rewrite, staged.** The target is re-written through one
  full-outer combine (no in-place file surgery exists for parquet); new
  files land in a staging dir and swap in at the end — same
  stage-then-swap window as sinks/compact.py, txn-log-atomic when the
  target is Delta/Iceberg instead.
- **Change set wins.** On a key match the update row replaces the target
  row wholesale (the reference's writer has per-record replace semantics
  nowhere; this mirrors Delta's ``whenMatchedUpdateAll``).
- **Scale shape.** One shuffle on the key for the anti/union combine; at
  100 TB the rewrite cost is the table scan + write, which is what MERGE
  costs on any copy-on-write format.  Partitioned targets should route
  through ``overwrite_partitions`` (sinks/partitioned.py) so only touched
  partitions rewrite.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


#: Staging dirs younger than this are presumed owned by a live concurrent
#: merge and left alone; only genuinely abandoned staging is reclaimed.
_STAGING_REAP_SECONDS = 24 * 3600


def _recover_orphaned_swap(target_path: str) -> None:
    """Self-heal a crash inside the stage-then-swap window: if a previous
    merge died between its two renames, the table data sits in a
    ``.old-<id>`` backup dir and ``target_path`` is missing — restore the
    backup.  If the swap completed but cleanup didn't, drop the stale
    backup.  ``.merge-`` staging dirs are reclaimed only after
    ``_STAGING_REAP_SECONDS`` — a younger one may belong to a merge that
    is RUNNING right now, and deleting it would destroy in-flight work
    (concurrent merges still race at the swap itself; this keeps recovery
    from making that strictly worse)."""
    import time

    parent = os.path.dirname(os.path.abspath(target_path)) or "."
    base = os.path.basename(target_path)
    if not os.path.isdir(parent):
        return
    for entry in sorted(os.listdir(parent)):
        full = os.path.join(parent, entry)
        if entry.startswith(base + ".old-"):
            if not os.path.exists(target_path):
                try:
                    os.rename(full, target_path)
                except OSError:
                    pass  # concurrent owner completed its swap first
            else:
                shutil.rmtree(full, ignore_errors=True)
        elif entry.startswith(base + ".merge-"):
            try:
                abandoned = time.time() - os.path.getmtime(full) > _STAGING_REAP_SECONDS
            except OSError:
                abandoned = False
            if abandoned:
                shutil.rmtree(full, ignore_errors=True)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    changes: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
) -> dict:
    """MERGE ``changes`` into the parquet table at ``target_path``.

    Semantics per change row: key match -> replace target row; no match ->
    insert; ``delete_col`` true -> drop the key from the target (whether or
    not it matched).  Returns ``{rows_before, rows_after, upserts,
    deletes}``.  Idempotent: re-merging the same change set converges, and
    a crash mid-swap self-heals on the next call (backup restore above)."""
    _recover_orphaned_swap(target_path)
    target = spark.read.parquet(target_path)
    data_cols = target.columns
    if delete_col:
        deletes = changes.filter(F.col(delete_col)).select(*key_cols)
        upserts = changes.filter(~F.col(delete_col)).select(*data_cols)
    else:
        deletes = changes.limit(0).select(*key_cols)
        upserts = changes.select(*data_cols)
    removed_keys = upserts.select(*key_cols).union(deletes).distinct()
    kept = target.join(removed_keys, key_cols, "left_anti")
    merged = kept.unionByName(upserts)

    # rows_after rides the staging write via df.observe (no post-write
    # re-read of staging); upsert/delete counts come from ONE aggregate
    # over changes instead of two separate recomputes of its lineage
    from pyspark.sql import Observation

    obs = Observation("merge_rows_after")
    merged = merged.observe(obs, F.count(F.lit(1)).alias("n"))
    staging = f"{target_path}.merge-{uuid.uuid4().hex[:12]}"
    merged.write.mode("overwrite").parquet(staging)
    rows_after = int(obs.get["n"])
    rows_before = target.count()
    if delete_col:
        # count each branch by its own predicate: a NULL flag row is
        # ignored by BOTH branches (the filters drop it under 3-valued
        # logic), so total - deletes would overcount upserts
        chg = changes.agg(
            F.sum(F.when(F.col(delete_col), 1).otherwise(0)).alias("d"),
            F.sum(F.when(~F.col(delete_col), 1).otherwise(0)).alias("u"),
        ).first()
        n_deletes = int(chg["d"] or 0)
        n_upserts = int(chg["u"] or 0)
    else:
        n_deletes = 0
        n_upserts = changes.count()
    # swap: stage-then-swap window, txn-log-atomic on Delta/Iceberg
    backup = f"{target_path}.old-{uuid.uuid4().hex[:12]}"
    os.rename(target_path, backup)
    os.rename(staging, target_path)
    shutil.rmtree(backup, ignore_errors=True)
    return {
        "rows_before": rows_before,
        "rows_after": rows_after,
        "upserts": n_upserts,
        "deletes": n_deletes,
    }
