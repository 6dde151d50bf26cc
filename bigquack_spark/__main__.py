"""Command-line surface — the reference is DRIVEN as a CLI (one-shot
``bigquack`` pipeline runs, bigquack.go:64-141); this gives the Spark
port the same operational front door plus the lakehouse-maintenance
verbs the long-lived deployment needs.

    python -m bigquack_spark transfer  SRC_DIR TABLE TARGET [--columns a,b]
                                       [--predicate SQL] [--shred col=JSON..]
    python -m bigquack_spark query     "SELECT ..." --sf-dir DIR [--limit N]
    python -m bigquack_spark maintain  PATH [--retention SQL] [--keep-last N]
                                       [--older-than-s S] [--target-mb M]
                                       [--zorder a,b] [--optimize]
    python -m bigquack_spark snapshot  PATH NAME
    python -m bigquack_spark restore   PATH NAME [--dry-run]
    python -m bigquack_spark expire    PATH [--keep-last N] [--older-than-s S]
    python -m bigquack_spark vacuum    PATH
    python -m bigquack_spark stats     PATH [--refresh]
    python -m bigquack_spark advise    PATH

Every verb prints ONE JSON object on stdout (machine-parseable, the
reference's structured-logging spirit, bigquack.go:72-75) and exits
non-zero on failure.  ``main(argv, spark=...)`` is importable so tests
drive it on a shared session instead of paying a JVM per invocation.
"""

from __future__ import annotations

import argparse
import json
import sys


def _cols(s: str | None) -> list[str] | None:
    return [c.strip() for c in s.split(",") if c.strip()] if s else None


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="bigquack_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("transfer", help="BQ2Duck analogue: load a source table into a managed target")
    t.add_argument("src_dir")
    t.add_argument("table")
    t.add_argument("target")
    t.add_argument("--columns")
    t.add_argument("--predicate")
    t.add_argument("--format", default="parquet")
    t.add_argument(
        "--shred",
        help="schema-on-write JSON shred: COL=DDL "
        '(e.g. --shred \'payload=k INT, tag STRING\')',
    )
    t.add_argument("--shred-keep-raw", action="store_true",
                   help="retain the raw JSON column alongside shredded fields")

    q = sub.add_parser("query", help="run SQL over the registered tables")
    q.add_argument("sql")
    q.add_argument("--sf-dir", default=None)
    q.add_argument("--limit", type=int, default=20)

    m = sub.add_parser("maintain", help="one policy-driven maintenance pass")
    m.add_argument("path")
    m.add_argument("--retention")
    m.add_argument("--keep-last", type=int)
    m.add_argument("--older-than-s", type=float)
    m.add_argument("--target-mb", type=int)
    m.add_argument("--zorder")
    m.add_argument("--optimize", action="store_true")

    s = sub.add_parser("snapshot", help="zero-copy snapshot")
    s.add_argument("path")
    s.add_argument("name")

    r = sub.add_parser("restore", help="roll back to a snapshot")
    r.add_argument("path")
    r.add_argument("name")
    r.add_argument("--dry-run", action="store_true")

    e = sub.add_parser("expire", help="expire snapshots per policy")
    e.add_argument("path")
    e.add_argument("--keep-last", type=int)
    e.add_argument("--older-than-s", type=float)

    v = sub.add_parser("vacuum", help="housekeeping sweep")
    v.add_argument("path")

    st = sub.add_parser("stats", help="collect or refresh the stats manifest")
    st.add_argument("path")
    st.add_argument("--refresh", action="store_true")

    a = sub.add_parser("advise", help="layout advice from the captured workload log")
    a.add_argument("path")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = _build_parser().parse_args(argv)

    def _spark():
        nonlocal spark
        if spark is None:
            from bigquack_spark.session import get_spark

            spark = get_spark()
        return spark

    try:
        if args.cmd == "transfer":
            from bigquack_spark.pipeline import transfer

            shred = None
            if args.shred:
                col, sep, ddl = args.shred.partition("=")
                if not sep or not col.strip() or not ddl.strip():
                    raise ValueError(
                        "--shred expects COL=DDL, e.g. "
                        "--shred 'payload=k INT, tag STRING'"
                    )
                shred = {"col": col.strip(), "schema": ddl.strip(),
                         "keep_raw": args.shred_keep_raw}
            rows = transfer(
                _spark(), args.src_dir, args.table, args.target,
                columns=_cols(args.columns), predicate=args.predicate,
                fmt=args.format, shred=shred,
            )
            out = {"cmd": "transfer", "rows": rows, "target": args.target}
        elif args.cmd == "query":
            from bigquack_spark.sources.parquet import (
                DEFAULT_SF_DIR,
                register_views,
            )

            sp = _spark()
            register_views(sp, args.sf_dir or DEFAULT_SF_DIR)
            rows = [r.asDict() for r in sp.sql(args.sql).limit(args.limit).collect()]
            out = {"cmd": "query", "n_rows": len(rows), "rows": rows}
        elif args.cmd == "maintain":
            from bigquack_spark.operators.maintain import maintain_table

            policy: dict = {}
            if args.retention:
                policy["retention_predicate"] = args.retention
            if args.keep_last is not None:
                policy["snapshot_keep_last"] = args.keep_last
            if args.older_than_s is not None:
                policy["snapshot_older_than_s"] = args.older_than_s
            if args.target_mb is not None:
                policy["target_file_bytes"] = args.target_mb * 1024 * 1024
            if args.zorder:
                policy["zorder_cols"] = _cols(args.zorder)
            if args.optimize:
                policy["optimize_layout"] = True
            out = {"cmd": "maintain",
                   **maintain_table(_spark(), args.path, policy)}
        elif args.cmd == "snapshot":
            from bigquack_spark.operators.maintenance import snapshot_table

            out = {"cmd": "snapshot", **snapshot_table(args.path, args.name)}
        elif args.cmd == "restore":
            from bigquack_spark.operators.maintenance import restore_snapshot

            out = {"cmd": "restore",
                   **restore_snapshot(_spark(), args.path, args.name,
                                      dry_run=args.dry_run)}
        elif args.cmd == "expire":
            from bigquack_spark.operators.maintenance import expire_snapshots

            out = {"cmd": "expire",
                   **expire_snapshots(args.path,
                                      older_than_s=args.older_than_s,
                                      keep_last=args.keep_last)}
        elif args.cmd == "vacuum":
            from bigquack_spark.operators.maintenance import vacuum

            out = {"cmd": "vacuum", **vacuum(args.path)}
        elif args.cmd == "stats":
            from bigquack_spark.operators.maintenance import (
                collect_table_stats,
                refresh_table_stats,
            )

            stats = (
                refresh_table_stats(_spark(), args.path)
                if args.refresh
                else collect_table_stats(_spark(), args.path)
            )
            out = {"cmd": "stats", "rows": stats["rows"],
                   "columns": sorted(stats["columns"])}
        elif args.cmd == "advise":
            from bigquack_spark.operators.planner import (
                recommend_layout_from_log,
            )

            out = {"cmd": "advise",
                   **recommend_layout_from_log(_spark(), args.path)}
        else:  # pragma: no cover - argparse enforces the choices
            raise ValueError(args.cmd)
    except Exception as exc:
        print(json.dumps({"cmd": args.cmd, "error": str(exc)}),
              file=sys.stderr)
        return 1
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":  # pragma: no cover - exercised via main() in tests
    sys.exit(main())
