"""Commit-primitive seam contracts (r10 verdict #5).

The rename-swap marker protocol assumes POSIX-atomic rename + O_EXCL —
both false on S3-class object stores.  These tests pin the seam: an
incapable backend makes every writer refuse LOUDLY at the lease choke
point (before anything is staged), and the POSIX protocol converges even
when a crash interleaves with the copy+delete window a non-atomic rename
would expose.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from bigquack_spark.operators import fsops
from bigquack_spark.operators.fsops import (
    PosixBackend,
    UnsupportedCommitStoreError,
    set_backend,
)
from tests.conftest import SF_SMOKE


class _ObjectStoreBackend(PosixBackend):
    """An S3-like store: rename is copy+delete (NOT atomic), no O_EXCL."""

    name = "fake-object-store"
    atomic_rename = False
    exclusive_create = False


class _ConditionalPutBackend(PosixBackend):
    """A 2024-era object store: conditional PUT gives exclusive-create,
    but rename is still copy+delete."""

    name = "fake-conditional-put"
    atomic_rename = False
    exclusive_create = True


@pytest.fixture
def object_store():
    prev = set_backend(_ObjectStoreBackend())
    try:
        yield
    finally:
        set_backend(prev)


def test_lease_refuses_on_incapable_store(tmp_path, object_store):
    from bigquack_spark.operators.lease import acquire_table_lease

    with pytest.raises(UnsupportedCommitStoreError) as ei:
        acquire_table_lease(str(tmp_path / "tbl"), owner="compact")
    msg = str(ei.value)
    assert "atomic rename" in msg and "exclusive create" in msg
    assert "lakehouse" in msg  # the remedy is named, not just the refusal
    assert not os.path.exists(tmp_path / "tbl"), "refusal must precede staging"


def test_conditional_put_still_refuses_marker_protocol(tmp_path):
    """Exclusive-create alone is not enough: the marker/data swap needs
    atomic rename, so a conditional-PUT store still refuses."""
    from bigquack_spark.operators.lease import acquire_table_lease

    prev = set_backend(_ConditionalPutBackend())
    try:
        with pytest.raises(UnsupportedCommitStoreError) as ei:
            acquire_table_lease(str(tmp_path / "tbl"))
        assert "atomic rename" in str(ei.value)
        assert "exclusive create" not in str(ei.value)
    finally:
        set_backend(prev)


def test_maintenance_writer_refuses_before_touching_table(spark, tmp_path, object_store):
    """The gate sits at the lease — every mutating pass inherits it, and
    the table bytes are untouched by the refusal."""
    from bigquack_spark.operators.maintenance import compact_small_files

    path = str(tmp_path / "t")
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").write.parquet(path)
    before = sorted(os.listdir(path))
    with pytest.raises(UnsupportedCommitStoreError):
        compact_small_files(spark, path)
    assert sorted(os.listdir(path)) == before


def test_default_backend_is_posix_and_seam_passthrough(tmp_path):
    assert fsops.backend().name == "posix"
    src, dst = str(tmp_path / "a"), str(tmp_path / "b")
    with open(src, "w") as fh:
        fh.write("x")
    fsops.replace(src, dst)
    assert not os.path.exists(src) and os.path.exists(dst)
    fd = fsops.create_exclusive(str(tmp_path / "lock"))
    os.close(fd)
    with pytest.raises(FileExistsError):
        fd2 = fsops.create_exclusive(str(tmp_path / "lock"))
        os.close(fd2)
    assert "lock" in fsops.listdir(str(tmp_path))


def test_marker_protocol_converges_across_torn_publish(spark, tmp_path):
    """POSIX convergence contract: simulate the exact state a non-atomic
    rename would strand — a staged data file already COPIED into the leaf
    (published name exists) while the staging copy and marker survive (the
    delete half never ran).  Resume must complete the swap idempotently:
    retired olds gone, each staged file published exactly once, staging
    cleaned — no duplicate rows."""
    from bigquack_spark.operators.maintenance import (
        MARKER,
        STAGING_DIR,
        _resume_partition,
    )

    leaf = str(tmp_path / "leaf")
    os.makedirs(leaf)
    spark.read.parquet(f"{SF_SMOKE}/region.parquet").coalesce(1).write.mode(
        "overwrite"
    ).parquet(leaf)
    olds = [
        [n, os.path.getsize(os.path.join(leaf, n))]
        for n in os.listdir(leaf)
        if n.endswith(".parquet")
    ]
    want = spark.read.parquet(leaf).count()

    staging = os.path.join(leaf, STAGING_DIR)
    data_dir = os.path.join(staging, "data")
    os.makedirs(data_dir)
    # the replacement file (same rows, rewritten)
    spark.read.parquet(leaf).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "new")
    )
    new_name = next(
        n for n in os.listdir(str(tmp_path / "new")) if n.endswith(".parquet")
    )
    shutil.copy(
        os.path.join(str(tmp_path / "new"), new_name),
        os.path.join(data_dir, new_name),
    )
    with open(os.path.join(staging, MARKER), "w") as fh:
        json.dump({"gen": "g1", "olds": olds, "prefix": "compacted"}, fh)
    # torn publish: the copy half of a copy+delete rename already landed
    shutil.copy(
        os.path.join(data_dir, new_name),
        os.path.join(leaf, f"compacted-g1-{new_name}"),
    )

    assert _resume_partition(leaf) == "resumed"
    names = [n for n in os.listdir(leaf) if n.endswith(".parquet")]
    assert names == [f"compacted-g1-{new_name}"], names
    assert not os.path.isdir(staging)
    assert spark.read.parquet(leaf).count() == want  # no duplicates
    assert _resume_partition(leaf) == "none"  # fully idempotent


def test_leaseless_publishers_hit_the_gate(tmp_path, object_store):
    """AtomicWriter's PENDING publish and merge's orphan recovery rename
    without taking a lease — they must hit the capability gate themselves
    (r11 review: the lease-side gate never covered them), but only for
    the rename they actually perform: COMMITTED appends in place and must
    keep working on a rename-less store (second review pass)."""
    from bigquack_spark.sinks.atomic import AtomicWriter, WriteStreamType
    from bigquack_spark.sinks.merge import _recover_orphaned_swap

    with pytest.raises(UnsupportedCommitStoreError):
        AtomicWriter(str(tmp_path / "t"))
    with pytest.raises(UnsupportedCommitStoreError):
        _recover_orphaned_swap(str(tmp_path / "t"))
    # COMMITTED: no rename, no lock — not gated
    AtomicWriter(str(tmp_path / "t2"), WriteStreamType.COMMITTED)
    # conditional-PUT store (rename still copy+delete): PENDING refuses on
    # the rename alone, without demanding the exclusive-create it never uses
    prev = set_backend(_ConditionalPutBackend())
    try:
        with pytest.raises(UnsupportedCommitStoreError) as ei:
            AtomicWriter(str(tmp_path / "t3"))
        assert "exclusive create" not in str(ei.value)
    finally:
        set_backend(prev)


def test_create_exclusive_write_failure_is_loud(tmp_path, monkeypatch):
    """r11 advice: a failed payload write inside create_exclusive must not
    yield a created-but-EMPTY marker with no signal — the half-created
    file is undone and the OSError propagates."""
    path = str(tmp_path / "marker")

    real_write = os.write

    def failing_write(fd, data):
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(os, "write", failing_write)
    with pytest.raises(OSError, match="No space left"):
        fsops.create_exclusive(path, b"payload")
    monkeypatch.setattr(os, "write", real_write)
    assert not os.path.exists(path)  # no empty marker left behind

    # success path unchanged: payload lands, fd usable
    fd = fsops.create_exclusive(path, b"payload")
    os.close(fd)
    with open(path, "rb") as fh:
        assert fh.read() == b"payload"
