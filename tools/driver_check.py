#!/usr/bin/env python
"""Driver-shaped verification (the real correctness gate, per
.claude/skills/verify/SKILL.md): simulate the grading driver end to end.

Builds a HOSTILE SparkSession (non-UTC timezone, default confs) to prove
session.tune() repairs whatever the driver constructs, imports the public
contract (__spark_entry__), smoke-runs entry(), then executes every
queries() entry at the given SF and diffs oracle-paired ones against DuckDB
under the FIXTURES.md §C canonicalization.

Usage: python tools/driver_check.py [--strict-driver-canon] [--json PATH]
                                    [sf_dir] [query_prefix ...]

``--json PATH`` additionally writes a machine-readable record per checked
name in the CORRECTNESS_r*.json shape ({name: {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}}) — the building block of the
committed per-round self-sweep artifact (SWEEP_r{N}.json, r11 verdict #7).

``--strict-driver-canon`` additionally replays the DRIVER's canonicalizer
(a plain pandas lexsort over every output column, NO per-cell coercion —
the code path that raised ``unhashable type: numpy.ndarray`` on q121 in
round 2) on both result frames, so any cell pandas cannot factorize
(arrays, maps, structs, mixed objects) fails HERE instead of in the
grading record.
"""

from __future__ import annotations

import datetime
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        return "0" if v == 0 else f"{v:.9e}"
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.floor("us").isoformat()
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat() + "T00:00:00"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_of(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    return sorted(tuple(canon(v) for v in r) for r in pdf[cols].itertuples(index=False))


def driver_canon_ok(pdf: pd.DataFrame) -> str | None:
    """Replay the grading driver's canonicalization verbatim: sort the raw
    frame by every column with pandas (lexsort via Categorical factorize —
    chokes on unhashable cells).  Returns an error string, or None if the
    driver would survive this frame."""
    try:
        cols = sorted(pdf.columns)
        pdf[cols].sort_values(by=cols, kind="mergesort")
    except Exception as exc:  # the exact failure class the driver records
        return f"{type(exc).__name__}: {exc}"
    return None


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    strict = "--strict-driver-canon" in argv
    if strict:
        argv.remove("--strict-driver-canon")
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            print("usage: --json requires an output path argument")
            return 2
        json_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    prefixes = tuple(argv[1:])

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")  # hostile
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    n_entry = len(entry_mod.entry(spark).collect())
    assert n_entry > 0, "entry() returned no rows"
    print(f"entry(): {n_entry} rows")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    fails, rows_only, checked = [], 0, 0
    records: dict[str, dict] = {}
    for name in sorted(qs):
        if prefixes and not name.startswith(prefixes):
            continue
        checked += 1
        try:
            pdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:
            fails.append(name)
            records[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": f"{type(exc).__name__}: {exc}"[:500],
            }
            print(f"{name}: ERROR {type(exc).__name__}")
            continue
        if name not in osql:
            rows_only += 1
            # no oracle: nothing was COMPARED, so every match field is None
            # (a True rows_match here would read as a verified row count)
            records[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": len(pdf),
                "oracle_rows": None, "err": "no_oracle",
            }
            print(f"{name}: rows-only ({len(pdf)} rows)")
            continue
        o = con.execute(osql[name]).fetchdf()
        strict_err = None
        if strict:
            strict_err = driver_canon_ok(pdf) or driver_canon_ok(o)
        schema_ok = sorted(pdf.columns) == sorted(o.columns)
        values_ok = schema_ok and rows_of(pdf) == rows_of(o)
        ok = strict_err is None and schema_ok and values_ok
        records[name] = {
            "rows_match": len(pdf) == len(o),
            "schema_match": schema_ok,
            "hash_match": ok,
            "spark_rows": len(pdf),
            "oracle_rows": len(o),
            "err": strict_err,
        }
        tag = "MATCH" if ok else ("DRIVER-CANON-FAIL " + strict_err if strict_err else "MISMATCH")
        print(f"{name}: {tag} ({len(pdf)} rows)")
        if not ok:
            fails.append(name)
    if json_path:
        import json as _json

        with open(json_path, "w") as fh:
            _json.dump(records, fh, indent=1, sort_keys=True)
    print(
        f"RESULT: {'ALL MATCH' if not fails else 'FAILS: ' + str(fails)} "
        f"({checked - rows_only} oracle-paired checked, {rows_only} rows-only, "
        f"{len(qs)} registered)"
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
