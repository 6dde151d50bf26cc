"""Table-level writer lease — the concurrency fence for the maintenance
writers (r8 verdict #3).

Every filesystem-coordinated writer in this repo (``merge_upsert``,
``compact_small_files``, ``purge_rows``, ``apply_retention``,
``restore_snapshot``, ``snapshot_table``, ``optimize_layout``) documents
"run while no concurrent writer mutates the table" — the marker/roll-forward
protocol makes each writer crash-safe against ITSELF, but two writers
interleaving on the same table could adopt each other's staging or retire
files the other just published.  The lease turns that documented discipline
into an enforced one: writers REFUSE to interleave, loudly, instead of
corrupting.

Design (the classic lock-file + TTL + fencing-generation recipe —
single-writer leases as in HDFS lease recovery / Delta's commit-owner
protocols, reduced to what a filesystem gives us):

- ``_LEASE.json`` at the table root holds ``{generation, holder, owner,
  deadline}``.  ``generation`` increases monotonically across every
  acquisition — the fencing token.
- **Acquire**: refuse while a live (unexpired, unreleased) lease is held
  (:class:`LeaseHeldError`).  Otherwise claim with generation+1 via
  tmp + ``os.replace`` and READ BACK — two stealers can both replace, but
  exactly one's token survives; the loser sees the other's token and
  refuses.  A crashed writer can never release; its lease simply expires
  (TTL) and the next writer steals with a higher generation.
- **Check** (at every leaf commit point, immediately before the marker
  write that commits a swap): re-read the file; if our token no longer
  holds — stolen after our TTL lapsed, or the file vanished — raise
  :class:`LeaseFencedError` BEFORE the commit point, leaving only
  pre-commit staging that the next writer's roll-forward discards.  A
  successful check renews the deadline, so a long multi-leaf pass stays
  live as long as it keeps committing.
- **Release**: rewrite the file as a tombstone (``holder: null``) keeping
  the generation, so the next acquire continues the monotonic sequence.

Scale posture: the lease is one KB-sized JSON at the table root — O(1)
bytes and O(leaves) checks per maintenance pass, nothing per-row.  On a
real object store the same protocol rides conditional PUTs
(if-generation-match); here ``os.replace`` + read-back gives the same
last-writer-wins-with-detection on a local filesystem.

The reference has no multi-writer story at all (its pipeline is a
one-shot single-process BQ->DuckDB pump, bigquack.go:64-141); this module
is part of the lakehouse-maintenance extension the 100 TB mandate needs.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from contextlib import contextmanager

LEASE_FILE = "_LEASE.json"

#: Long enough that a huge single-leaf rewrite between two commit-point
#: checks (each check renews) does not self-expire; short enough that a
#: crashed writer's table unblocks within the hour.
DEFAULT_TTL_S = 3600.0


class LeaseHeldError(RuntimeError):
    """Another writer holds a live lease on this table — refuse to start."""


class LeaseFencedError(RuntimeError):
    """Our lease was lost (TTL lapsed and another writer took over) — the
    commit point must not be crossed."""


def _lease_path(path: str) -> str:
    return os.path.join(path, LEASE_FILE)


def _read_lease(path: str) -> dict | None:
    try:
        with open(_lease_path(path)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def _write_lease(path: str, rec: dict) -> None:
    os.makedirs(path, exist_ok=True)
    tmp = _lease_path(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(rec, fh)
    os.replace(tmp, _lease_path(path))


class TableLease:
    """A held lease.  ``check()`` at every commit point; ``release()`` when
    done (the ``table_lease`` context manager does both)."""

    def __init__(self, path: str, owner: str, token: str, generation: int,
                 ttl_s: float):
        self.path = path
        self.owner = owner
        self.token = token
        self.generation = generation
        self.ttl_s = ttl_s

    def check(self) -> None:
        """Fencing gate: confirm we still hold the table, renew the
        deadline.  Raises :class:`LeaseFencedError` when the lease was
        stolen (or the file vanished) — callers MUST invoke this before
        each marker write, so a fenced writer dies pre-commit."""
        cur = _read_lease(self.path)
        if not cur or cur.get("holder") != self.token:
            raise LeaseFencedError(
                f"lease on {self.path!r} lost by {self.owner!r} "
                f"(generation {self.generation}): now held by "
                f"{(cur or {}).get('owner')!r} generation "
                f"{(cur or {}).get('generation')} — aborting before the "
                "commit point; pre-commit staging will be discarded by the "
                "next writer's roll-forward"
            )
        cur["deadline"] = time.time() + self.ttl_s
        _write_lease(self.path, cur)
        after = _read_lease(self.path)
        if not after or after.get("holder") != self.token:
            raise LeaseFencedError(
                f"lease on {self.path!r} lost by {self.owner!r} during renewal"
            )

    def release(self) -> None:
        """Tombstone the lease (keep the generation for monotonic fencing).
        Only releases if we still hold it — a fenced lease must not
        clobber its successor."""
        cur = _read_lease(self.path)
        if cur and cur.get("holder") == self.token:
            _write_lease(
                self.path,
                {"generation": self.generation, "holder": None,
                 "owner": None, "deadline": 0.0},
            )


def acquire_table_lease(
    path: str, owner: str = "maintenance", ttl_s: float = DEFAULT_TTL_S
) -> TableLease:
    """Take the single-writer lease on ``path`` or raise
    :class:`LeaseHeldError`.  An expired lease is stolen with a strictly
    higher generation; the steal race is settled by read-back."""
    now = time.time()
    cur = _read_lease(path)
    if cur and cur.get("holder") and now < float(cur.get("deadline", 0.0)):
        raise LeaseHeldError(
            f"table {path!r} is leased to {cur.get('owner')!r} "
            f"(generation {cur.get('generation')}, "
            f"{float(cur['deadline']) - now:.0f}s of TTL left) — "
            "maintenance writers refuse to interleave; retry after it "
            "releases or expires"
        )
    gen = int(cur.get("generation", 0)) + 1 if cur else 1
    token = uuid.uuid4().hex
    _write_lease(
        path,
        {"generation": gen, "holder": token, "owner": owner,
         "deadline": now + ttl_s},
    )
    after = _read_lease(path)
    if not after or after.get("holder") != token:
        raise LeaseHeldError(
            f"lost the acquisition race for {path!r} to "
            f"{(after or {}).get('owner')!r}"
        )
    return TableLease(path, owner, token, gen, ttl_s)


@contextmanager
def table_lease(
    path: str,
    owner: str = "maintenance",
    ttl_s: float = DEFAULT_TTL_S,
    lease: TableLease | None = None,
):
    """Hold the writer lease for a maintenance pass.  When ``lease`` is
    supplied (a composed pass, e.g. ``optimize_layout`` driving
    ``compact_small_files``), it is checked and reused WITHOUT releasing —
    the outermost owner releases.  In-process failures release in
    ``finally`` (only a real process death leaves the lease to expire)."""
    if lease is not None:
        lease.check()
        yield lease
        return
    held = acquire_table_lease(path, owner=owner, ttl_s=ttl_s)
    try:
        yield held
    finally:
        held.release()
