"""Concurrent-writer fencing (operators/lease.py, r8 verdict #3).

The contract under test: every filesystem-coordinated maintenance writer
runs under a table-level lease — a second writer REFUSES to start while a
live lease is held (LeaseHeldError), a writer whose lease expired and was
stolen dies loudly BEFORE its next commit point (LeaseFencedError) leaving
only pre-commit staging that roll-forward discards, and the table converges
when the surviving writer re-runs.
"""

import os
import time

import pytest

from bigquack_spark.operators.lease import (
    LEASE_FILE,
    LeaseFencedError,
    LeaseHeldError,
    acquire_table_lease,
)


def _checksum(spark, path):
    from bigquack_spark.operators.reconcile import table_checksum

    df = spark.read.parquet(path)
    row = table_checksum(df, sorted(df.columns)).collect()[0]
    return (row.n_rows, row.xor_checksum, row.sum_checksum_mod)


def _table(spark, tmp_path, name="t", n=600):
    path = str(tmp_path / name)
    spark.range(n).selectExpr(
        "id", "id % 3 AS k", "repeat('x', 20) AS pad"
    ).repartition(6).write.partitionBy("k").parquet(path)
    return path


# ---------------------------------------------------------------- protocol


def test_acquire_release_generation_monotonic(tmp_path):
    path = str(tmp_path)
    a = acquire_table_lease(path, owner="first")
    assert a.generation == 1
    a.release()
    b = acquire_table_lease(path, owner="second")
    assert b.generation == 2  # tombstone keeps the fencing sequence
    b.release()


def test_acquire_refuses_while_held(tmp_path):
    path = str(tmp_path)
    a = acquire_table_lease(path, owner="first")
    with pytest.raises(LeaseHeldError):
        acquire_table_lease(path, owner="second")
    a.release()
    acquire_table_lease(path, owner="second").release()


def test_expired_lease_is_stolen_and_loser_is_fenced(tmp_path):
    path = str(tmp_path)
    a = acquire_table_lease(path, owner="slow", ttl_s=0.01)
    time.sleep(0.05)
    b = acquire_table_lease(path, owner="fast")  # steals after TTL
    assert b.generation == a.generation + 1
    with pytest.raises(LeaseFencedError):
        a.check()  # the zombie must die at its next commit gate
    b.check()  # the live holder renews fine
    b.release()


def test_check_renews_deadline(tmp_path):
    path = str(tmp_path)
    a = acquire_table_lease(path, owner="w", ttl_s=0.2)
    for _ in range(3):
        time.sleep(0.1)
        a.check()  # each check pushes the deadline out
    with pytest.raises(LeaseHeldError):
        acquire_table_lease(path, owner="other")
    a.release()


def test_release_after_fence_does_not_clobber_successor(tmp_path):
    path = str(tmp_path)
    a = acquire_table_lease(path, owner="slow", ttl_s=0.01)
    time.sleep(0.05)
    b = acquire_table_lease(path, owner="fast")
    a.release()  # no-op: a no longer holds
    b.check()
    b.release()


# ---------------------------------------------------- writers refuse entry


def test_writers_refuse_while_lease_held(spark, tmp_path):
    """Every maintenance writer raises LeaseHeldError instead of
    interleaving with a live holder, and the table is untouched."""
    from bigquack_spark.operators.maintenance import (
        apply_retention,
        compact_small_files,
        purge_rows,
        snapshot_table,
        vacuum,
    )
    from bigquack_spark.sinks.merge import merge_upsert

    path = _table(spark, tmp_path)
    before = _checksum(spark, path)
    held = acquire_table_lease(path, owner="other-writer")
    changes = spark.range(5).selectExpr("id", "id % 3 AS k", "'y' AS pad")
    with pytest.raises(LeaseHeldError):
        merge_upsert(spark, path, changes, key_cols=["id"])
    with pytest.raises(LeaseHeldError):
        compact_small_files(spark, path, target_file_bytes=1 << 30)
    with pytest.raises(LeaseHeldError):
        purge_rows(spark, path, "id < 10")
    with pytest.raises(LeaseHeldError):
        apply_retention(spark, path, "k = 0")
    with pytest.raises(LeaseHeldError):
        snapshot_table(path, "s1")
    with pytest.raises(LeaseHeldError):
        vacuum(path)
    held.release()
    assert _checksum(spark, path) == before


def test_writer_releases_on_success_and_failure(spark, tmp_path):
    """In-process completion (or an in-process abort) releases the lease so
    the next writer proceeds immediately — only a real process death leaves
    the lease to TTL out."""
    from bigquack_spark.operators.maintenance import purge_rows

    path = _table(spark, tmp_path)
    purge_rows(spark, path, "id < 5")
    with pytest.raises(Exception):
        purge_rows(spark, path, "no_such_column < 5")  # analysis error
    # both calls released: a fresh acquire succeeds at once
    acquire_table_lease(path, owner="next").release()


def test_composed_pass_shares_one_lease(spark, tmp_path):
    """optimize_layout holds one lease across planning + compaction; the
    inner compact composes under it instead of deadlocking against it."""
    from bigquack_spark.operators.maintenance import (
        collect_table_stats,
        optimize_layout,
    )

    path = _table(spark, tmp_path)
    collect_table_stats(spark, path)
    report = optimize_layout(spark, path, target_file_bytes=1 << 30)
    assert report["partitions_compacted"] >= 1
    acquire_table_lease(path, owner="next").release()  # fully released


# ------------------------------------------------- injected interleave


def test_fenced_merge_dies_precommit_and_table_converges(spark, tmp_path):
    """The r8 verdict #3 'done' gate: writer A's lease expires mid-pass and
    writer B takes over; A dies at its first commit gate WITHOUT publishing,
    and B's re-run converges the table to the merged state."""
    from bigquack_spark.operators.maintenance import STAGING_DIR
    from bigquack_spark.sinks.merge import merge_upsert

    path = _table(spark, tmp_path)
    changes = spark.createDataFrame(
        [(1, 1, "UPDATED"), (9999, 0, "INSERTED")], "id long, k long, pad string"
    )

    # A acquires with a tiny TTL and stalls; B steals the table
    lease_a = acquire_table_lease(path, owner="merge-A", ttl_s=0.01)
    time.sleep(0.05)
    lease_b = acquire_table_lease(path, owner="merge-B")

    before = _checksum(spark, path)
    with pytest.raises(LeaseFencedError):
        merge_upsert(spark, path, changes, key_cols=["id"], lease=lease_a)
    # A died pre-commit: no leaf holds a committed marker, live data intact
    for dirpath, dirnames, filenames in os.walk(path):
        if os.path.basename(dirpath) == STAGING_DIR:
            assert "_COMPACT_ID" not in filenames
    assert _checksum(spark, path) == before

    report = merge_upsert(spark, path, changes, key_cols=["id"], lease=lease_b)
    lease_b.release()
    assert report["upserts"] == 2
    got = {
        r.id: r.pad for r in spark.read.parquet(path).filter("id in (1, 9999)").collect()
    }
    assert got == {1: "UPDATED", 9999: "INSERTED"}
    assert spark.read.parquet(path).count() == 601


def test_lease_file_survives_vacuum_and_is_invisible_to_readers(spark, tmp_path):
    from bigquack_spark.operators.maintenance import vacuum

    path = _table(spark, tmp_path)
    acquire_table_lease(path, owner="w").release()
    n = spark.read.parquet(path).count()
    vacuum(path)
    assert os.path.exists(os.path.join(path, LEASE_FILE))
    assert spark.read.parquet(path).count() == n


def test_streaming_append_sink_lease_participation(spark, tmp_path):
    """lease_table=True: a batch refuses to land while maintenance holds
    the table, the full commit (data + stats fold) runs inside one lease
    span, and a non-leased sink is unaffected."""
    from bigquack_spark.operators.maintenance import stats_are_fresh
    from bigquack_spark.streaming.sink import StatsMaintainedAppendSink

    target = str(tmp_path / "stream_t")
    sink = StatsMaintainedAppendSink(target, lease_table=True)
    batch = spark.range(50).selectExpr("id", "id % 5 AS k")

    held = acquire_table_lease(target, owner="compaction")
    with pytest.raises(LeaseHeldError):
        sink(batch, 0)
    held.release()
    assert sink.next_batch_id == 0  # nothing committed under contention

    sink(batch, 0)
    sink(spark.range(50, 80).selectExpr("id", "id % 5 AS k"), 1)
    assert spark.read.parquet(target).count() == 80
    assert stats_are_fresh(target)
    # the sink released between batches: maintenance can run now
    acquire_table_lease(target, owner="next").release()


def test_sketch_rollup_sink_lease_participation(spark, tmp_path):
    from bigquack_spark.streaming.sink import SketchRollupSink

    target = str(tmp_path / "sk_t")
    sink = SketchRollupSink(target, key_col="k", lease_table=True)
    batch = spark.range(100).selectExpr("id % 7 AS k")

    held = acquire_table_lease(target, owner="other")
    with pytest.raises(LeaseHeldError):
        sink(batch, 0)
    held.release()
    sink(batch, 0)
    keys = spark.createDataFrame([(0,)], "k long")
    est = sink.estimate(spark, keys, "k").first()
    assert est["est"] >= 15  # CMS upper bound of the true 15
    acquire_table_lease(target, owner="next").release()


# ------------------------------------------------ r9 review regressions


def test_concurrent_acquire_exactly_one_winner(tmp_path):
    """The O_EXCL mutex settles simultaneous acquisition: hammering a
    fresh table from many threads yields EXACTLY one holder, and every
    later successful acquisition gets a strictly increasing generation
    (plain write-then-read-back let two writers win with the SAME
    generation — r9 review)."""
    import threading

    path = str(tmp_path)
    results = []
    barrier = threading.Barrier(8)

    def contender():
        barrier.wait()
        try:
            results.append(acquire_table_lease(path, owner="t"))
        except LeaseHeldError:
            results.append(None)

    threads = [threading.Thread(target=contender) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [r for r in results if r is not None]
    assert len(winners) == 1
    winners[0].check()
    winners[0].release()
    nxt = acquire_table_lease(path, owner="next")
    assert nxt.generation == winners[0].generation + 1
    nxt.release()


def test_renew_cannot_clobber_a_stealer(tmp_path):
    """check() decides and renews inside one critical section: after a
    legitimate steal, the expired holder's check must FENCE, never
    overwrite the stealer's newer record (r9 review race #2)."""
    path = str(tmp_path)
    a = acquire_table_lease(path, owner="slow", ttl_s=0.01)
    time.sleep(0.05)
    b = acquire_table_lease(path, owner="fast")
    with pytest.raises(LeaseFencedError):
        a.check()
    # b's record survived a's failed renewal attempt intact
    b.check()
    assert b.generation == a.generation + 1
    b.release()


def test_orphaned_mutex_lock_is_broken(tmp_path):
    """A lock file orphaned by a crash mid-critical-section must not
    wedge the table forever: past the break window the next contender
    removes it and proceeds."""
    path = str(tmp_path)
    lock = os.path.join(path, LEASE_FILE + ".lock")
    os.makedirs(path, exist_ok=True)
    open(lock, "w").close()
    old = time.time() - 3600
    os.utime(lock, (old, old))
    lease = acquire_table_lease(path, owner="after-crash")
    lease.release()
    assert not os.path.exists(lock)


def test_streaming_replay_noops_outside_the_lease(spark, tmp_path):
    """A redelivered already-durable batch must no-op even while
    maintenance holds the table — only REAL commits contend (r9 review)."""
    from bigquack_spark.streaming.sink import ExactlyOnceBatchSink

    target = str(tmp_path / "replay_t")
    sink = ExactlyOnceBatchSink(target, lease_table=True)
    batch = spark.range(10).selectExpr("id")
    sink(batch, 0)
    held = acquire_table_lease(target, owner="compaction")
    sink(batch, 0)  # pure replay: must not raise LeaseHeldError
    with pytest.raises(LeaseHeldError):
        sink(batch, 1)  # a real commit still contends
    held.release()
    assert spark.read.parquet(target).count() == 10
