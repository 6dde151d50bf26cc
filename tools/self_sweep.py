#!/usr/bin/env python
"""Committed per-round self-verification sweep (r11 verdict #7).

The grading driver re-verifies ~50 names per round against a registry of
300+, so its own cumulative record for any given name can be several
rounds stale.  This tool bounds that staleness to ONE round from the
repo's side: it runs the full driver-shaped check (tools/driver_check.py,
--strict-driver-canon) over every registered query in N parallel chunks
and merges the per-name records into one machine-readable artifact —
``SWEEP_r{round}.json``, same shape as the driver's CORRECTNESS files —
which is committed alongside the round.  A judge (or future round) can
then read hash-green-at-HEAD for all names, not just the driver window.

Usage: python tools/self_sweep.py ROUND [sf_dir] [n_chunks]
       -> writes SWEEP_r{ROUND}.json at the repo root, exits non-zero on
          any mismatch.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    n_chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from bigquack_spark.queries import QUERIES

    names = sorted(QUERIES)
    chunks = [names[i::n_chunks] for i in range(n_chunks)]
    procs, parts = [], []
    for i, chunk in enumerate(chunks):
        part = os.path.join(tempfile.gettempdir(), f"sweep_r{rnd}_part{i}.json")
        parts.append(part)
        # exact names are also valid prefixes; passing them keeps one
        # process per chunk with a single Spark session
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, os.path.join(REPO, "tools", "driver_check.py"),
                    "--strict-driver-canon", "--json", part, sf_dir, *chunk,
                ],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            )
        )
    merged: dict[str, dict] = {}
    rc = 0
    for i, (p, part) in enumerate(zip(procs, parts)):
        out, _ = p.communicate()
        rc |= p.returncode
        tail = [ln for ln in out.splitlines() if ln.startswith("RESULT:")]
        print(tail[-1] if tail else f"(no RESULT line; rc={p.returncode})")
        # a chunk that died before writing its part file (OOM, Spark startup
        # failure) must not lose the other chunks' records (r12 review)
        if not os.path.exists(part):
            print(f"CHUNK {i} FAILED: no {part} written (rc={p.returncode})")
            rc |= 1
            continue
        with open(part) as fh:
            merged.update(json.load(fh))
        os.remove(part)
    missing = sorted(set(names) - set(merged))
    if missing:
        print(f"MISSING from sweep: {missing}")
        rc |= 1
    dest = os.path.join(REPO, f"SWEEP_r{rnd}.json")
    with open(dest, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    n_green = sum(1 for v in merged.values() if v.get("hash_match"))
    n_rows_only = sum(1 for v in merged.values() if v.get("err") == "no_oracle")
    print(
        f"SWEEP: {n_green}/{len(merged)} hash-green, {n_rows_only} rows-only "
        f"-> {dest}"
    )
    return rc


if __name__ == "__main__":
    sys.exit(main())
