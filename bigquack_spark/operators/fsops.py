"""The commit-primitive seam (r10 verdict #5).

Every maintenance writer in this repo (operators/maintenance.py,
sinks/merge.py, operators/lease.py) commits through exactly three
filesystem primitives:

1. **exclusive-create** — ``O_CREAT|O_EXCL`` on the lease lock: at most one
   creator wins.
2. **atomic-rename** — ``os.replace`` publishing the marker and swapping
   staged data files: readers see the old name or the new name, never a
   torn intermediate, and an existing destination is replaced atomically.
3. **listing** — directory enumeration the resume/adoption gates reason
   over: a listing must not show a file that a completed rename already
   retired.

POSIX guarantees all three; S3-class object stores historically guarantee
NONE of them (rename = copy+delete, visible in between; no O_EXCL;
eventually-consistent listings on older stores).  Running the marker
protocol on such a store silently reopens every crash window the protocol
closes, so the seam makes the assumption EXPLICIT and the failure LOUD:

- Writers call :func:`require_commit_capabilities` when they take the
  table lease (the one choke point every mutating pass goes through).
  A backend that does not declare both ``atomic_rename`` and
  ``exclusive_create`` raises :class:`UnsupportedCommitStoreError`
  instead of corrupting quietly.
- The marker/publish renames route through :func:`replace`, the lock
  create through :func:`create_exclusive`, and the gates' listings
  through :func:`listdir` — so a capable non-POSIX backend (below) plugs
  in at ONE place.

Object-store strategies, in preference order:

1. **Delegate the table format**: land the table as Delta/Iceberg via
   ``sinks/lakehouse.py`` — those formats already solve object-store
   commits (Delta: conditional-PUT / a DynamoDB LogStore; Iceberg: a
   catalog swap), and the maintenance surface here is then expressed as
   OPTIMIZE/expire-snapshots against the format instead of raw renames.
2. **Conditional-PUT backend**: S3 (since 2024-08) supports
   ``If-None-Match: *`` on PUT — an honest exclusive-create — and GCS/
   Azure have generation/etag preconditions.  A backend implementing
   ``create_exclusive`` with a conditional PUT and ``replace`` as
   PUT-new + conditional-delete-old CAN declare ``exclusive_create`` but
   must still leave ``atomic_rename`` False (copy+delete is visibly
   torn), so marker-protocol writers refuse while lease-only
   coordination (e.g. readers' freshness checks) still works.
3. **External lock service** (DynamoDB/ZooKeeper-style) replacing the
   lease file entirely — out of scope here, the seam is where it would
   plug in.

The default backend is POSIX and behavior is byte-for-byte what the
writers always did; ``set_backend`` exists for tests and for real
non-POSIX deployments.
"""

from __future__ import annotations

import contextlib
import os


class UnsupportedCommitStoreError(RuntimeError):
    """The active commit backend cannot host the marker protocol."""


class PosixBackend:
    """The default: a real POSIX filesystem (or NFSv4+/local-attached
    storage with POSIX rename semantics)."""

    name = "posix"
    #: os.replace is atomic and overwrite-safe within a filesystem
    atomic_rename = True
    #: O_CREAT|O_EXCL loses to at most one concurrent creator
    exclusive_create = True

    def replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def create_exclusive(self, path: str, data: bytes = b"") -> int:
        """Create ``path`` exclusively and return an open fd (the lease
        keeps it for its flock liveness beacon).  Raises FileExistsError
        when another creator won.

        On a failed payload write the half-created file is unlinked and
        the OSError re-raised.  A contender racing into the
        create-to-unlink window sees FileExistsError and backs off — a
        TRANSIENT spurious loss its next retry resolves (the unlink only
        ever removes THIS call's own file; O_EXCL guarantees ownership).
        That beats the alternative of leaving an empty marker, which
        would block every contender until the stale-lock break
        timeout."""
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        if data:
            try:
                os.write(fd, data)
            except OSError:
                # A created-but-empty marker would silently drop the caller's
                # payload (r11 advice): undo the half-created file and
                # re-raise so the caller sees the failure, not a bogus win.
                os.close(fd)
                with contextlib.suppress(OSError):
                    os.unlink(path)
                raise
        return fd

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)


_BACKEND: PosixBackend = PosixBackend()


def backend():
    return _BACKEND


def set_backend(b) -> object:
    """Install a commit backend (tests / non-POSIX deployments).  Returns
    the previous backend so callers can restore it."""
    global _BACKEND
    prev = _BACKEND
    _BACKEND = b
    return prev


def replace(src: str, dst: str) -> None:
    _BACKEND.replace(src, dst)


def create_exclusive(path: str, data: bytes = b"") -> int:
    return _BACKEND.create_exclusive(path, data)


def listdir(path: str) -> list[str]:
    return _BACKEND.listdir(path)


def require_commit_capabilities(operation: str, exclusive_create: bool = True) -> None:
    """Refuse loudly when the active backend cannot host the rename-swap
    marker protocol — called where every mutating pass converges (lease
    acquisition), so no writer can start a commit it cannot finish
    atomically.  ``exclusive_create=False`` checks atomic rename only —
    for publishers that rename but never take the O_EXCL lock
    (AtomicWriter's PENDING publish, merge's orphan recovery)."""
    b = _BACKEND
    missing = []
    if not getattr(b, "atomic_rename", False):
        missing.append("atomic rename")
    if exclusive_create and not getattr(b, "exclusive_create", False):
        missing.append("exclusive create")
    if missing:
        raise UnsupportedCommitStoreError(
            f"{operation}: commit backend {getattr(b, 'name', b)!r} lacks "
            f"{' and '.join(missing)} — the rename-swap marker protocol "
            "cannot run safely on this store.  Use the Delta/Iceberg "
            "lakehouse sink (sinks/lakehouse.py) whose format solves "
            "object-store commits, or plug in a backend with conditional-"
            "PUT exclusive-create plus an external lock (see "
            "operators/fsops.py)."
        )
