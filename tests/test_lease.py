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


# --------------------------------------------- multi-process chaos (r9 #7)


def _mutex_stress_worker(args):
    """Module-level for pickling: hammer the lease mutex from a separate
    PROCESS.  Each regular iteration does a deliberately non-atomic
    read-sleep-write increment of a shared counter inside the critical
    section — any mutual-exclusion failure loses updates.  A few
    iterations instead simulate a CRASH mid-section: win the raw O_EXCL
    lock, backdate it past the break window, and abandon it, forcing the
    other processes through the atomic rename-break path concurrently
    (the r10 TOCTOU fix under real contention)."""
    path, counter, worker_id, n_iters = args
    from bigquack_spark.operators import lease as L

    L._LOCK_BREAK_S = 0.05  # orphans become breakable immediately
    lock = os.path.join(path, LEASE_FILE + ".lock")
    increments = 0
    for it in range(n_iters):
        if worker_id == 0 and it % 7 == 3:
            # crash simulation: orphan a just-won lock (never inside
            # someone else's section — O_EXCL guarantees that)
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                old = time.time() - 3600
                os.utime(lock, (old, old))
            except (FileExistsError, OSError):
                pass
            continue
        with L._lease_mutex(path):
            with open(counter) as fh:
                v = int(fh.read())
            time.sleep(0.002)
            tmp = f"{counter}.{worker_id}.tmp"
            with open(tmp, "w") as fh:
                fh.write(str(v + 1))
            os.replace(tmp, counter)
        increments += 1
    return increments


def test_lease_mutex_multiprocess_stress(tmp_path):
    """TRUE multi-process mutual exclusion (r9 verdict #7 / advice #1):
    6 OS processes x 20 iterations of read-modify-write under the lease
    mutex, with one process repeatedly orphaning stale locks mid-run.
    Before the atomic rename-break fix, two contenders could both break
    the same orphan, double-enter the section, and lose increments; the
    counter must equal the exact number of completed sections."""
    import multiprocessing as mp

    path = str(tmp_path)
    os.makedirs(path, exist_ok=True)
    counter = os.path.join(path, "counter.txt")
    with open(counter, "w") as fh:
        fh.write("0")
    # plant a pre-aged orphan so the very first entries race on the break
    lock = os.path.join(path, LEASE_FILE + ".lock")
    open(lock, "w").close()
    os.utime(lock, (time.time() - 3600, time.time() - 3600))

    n_workers, n_iters = 6, 20
    ctx = mp.get_context("fork")
    with ctx.Pool(n_workers) as pool:
        entered = pool.map(
            _mutex_stress_worker,
            [(path, counter, i, n_iters) for i in range(n_workers)],
        )
    with open(counter) as fh:
        final = int(fh.read())
    assert final == sum(entered)  # zero lost updates == zero double-entries
    assert sum(entered) >= (n_workers - 1) * n_iters  # nobody starved
    # the table still works afterwards
    lease = acquire_table_lease(path, owner="after-stress")
    lease.release()


def _lease_acquire_worker(args):
    """Acquire/release the TABLE lease (not just the mutex) in a loop from
    a separate process; return every generation this process won."""
    path, n_iters = args
    from bigquack_spark.operators import lease as L

    gens = []
    for _ in range(n_iters):
        try:
            held = L.acquire_table_lease(path, owner=f"pid{os.getpid()}")
        except LeaseHeldError:
            time.sleep(0.005)
            continue
        gens.append(held.generation)
        held.check()
        held.release()
    return gens


def test_lease_generations_unique_across_processes(tmp_path):
    """Fencing token integrity under multi-process contention: across 5
    processes acquiring in a tight loop, every won generation is unique
    and the sequence has no duplicates — duplicate generations are
    exactly the failure the r9 lock-break race could admit."""
    import multiprocessing as mp

    path = str(tmp_path)
    ctx = mp.get_context("fork")
    with ctx.Pool(5) as pool:
        all_gens = pool.map(_lease_acquire_worker, [(path, 15)] * 5)
    flat = [g for gens in all_gens for g in gens]
    assert len(flat) > 0
    assert len(flat) == len(set(flat))  # no duplicate fencing tokens


def test_concurrent_maintain_single_writer_convergence(spark, tmp_path):
    """N concurrent maintain_table invocations over ONE table (r9 verdict
    #7): the lease admits one writer at a time — contenders either refuse
    with LeaseHeldError or run serially after the holder releases — and
    the table's row content is bit-identical afterwards (maintenance
    never mutates rows), with every file accounted for."""
    import threading

    from bigquack_spark.operators.maintain import maintain_table

    path = _table(spark, tmp_path, name="chaos_t", n=900)
    before = _checksum(spark, path)
    policy = {"target_file_bytes": 1 << 30, "collect_stats_if_missing": True}
    outcomes = []
    barrier = threading.Barrier(4)

    def worker():
        barrier.wait()
        for _ in range(3):  # retry: serial completion is a valid outcome
            try:
                outcomes.append(maintain_table(spark, path, policy))
                return
            except LeaseHeldError:
                time.sleep(0.2)
        outcomes.append(None)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    done = [o for o in outcomes if o is not None]
    assert len(done) >= 1  # at least one full pass completed
    # single-writer invariant: no interleaved writer ever corrupted rows
    assert _checksum(spark, path) == before
    # table remains acquirable and maintainable after the stampede
    maintain_table(spark, path, policy)
    assert _checksum(spark, path) == before


def test_stalled_holder_release_spares_next_holders_lock(tmp_path):
    """r10 advice: a holder whose orphaned lock was legitimately broken
    must NOT delete the next holder's live lock in its finally block —
    the remove is inode-guarded, so release only unlinks the path while
    it still names the stalled holder's own lock file."""
    from bigquack_spark.operators.lease import _lease_mutex, _lease_path

    path = str(tmp_path / "tbl")
    mgr = _lease_mutex(path)
    mgr.__enter__()  # holder A enters and "stalls"
    lock = _lease_path(path) + ".lock"
    # Simulate the break-and-retake: A's lock is unlinked by a breaker and
    # holder B creates a fresh lock at the same path (different inode).
    os.remove(lock)
    with open(lock, "w") as fh:
        fh.write("holder-B")
    b_ino = os.stat(lock).st_ino
    mgr.__exit__(None, None, None)  # A's release must spare B's lock
    assert os.path.exists(lock), "stalled holder deleted the next holder's lock"
    assert os.stat(lock).st_ino == b_ino
