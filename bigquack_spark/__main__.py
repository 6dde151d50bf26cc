"""Command-line surface — the reference is DRIVEN as a CLI (one-shot
``bigquack`` pipeline runs, bigquack.go:64-141); this gives the Spark
port the same operational front door plus the lakehouse-maintenance
verbs the long-lived deployment needs.

    python -m bigquack_spark transfer  SRC_DIR TABLE TARGET [--columns a,b]
                                       [--predicate SQL] [--shred col=DDL|auto]
                                       [--bucket-by COLS[:N[:SORT]]]
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
    python -m bigquack_spark index-build PATH --src-dir DIR [--table T]
                                       [--n-lists N] [--metadata a,b] [--pq M,K]
    python -m bigquack_spark index-probe PATH --src-dir DIR --query-ids 0,1
                                       [--k K] [--n-probes P] [--pq]
                                       [--predicate SQL] [--rerank N]
                                       [--target-recall R]
    python -m bigquack_spark index-calibrate PATH [--k K] [--n-probes P]
                                       [--budgets a,b] [--sample N]
    python -m bigquack_spark index-rebuild PATH [--n-lists N]
    python -m bigquack_spark stream-ingest SRC_DIR TARGET [--checkpoint DIR]
    python -m bigquack_spark index-stream-ingest SRC_DIR INDEX [--drift-check]
                                       [--lease]

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


def _F():
    from pyspark.sql import functions as F

    return F


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
        '(e.g. --shred \'payload=k INT, tag STRING\'), or the literal '
        "'auto' (sample-inferred spec; re-ingest replays the target's "
        "recorded provenance)",
    )
    t.add_argument("--shred-keep-raw", action="store_true",
                   help="retain the raw JSON column alongside shredded fields")
    t.add_argument(
        "--bucket-by",
        help="land bucketed: COLS[:N[:SORT_COLS]] — comma-separated bucket "
        "columns, bucket count (default 32), optional sort columns "
        "(e.g. --bucket-by o_orderkey:32:o_orderkey)",
    )

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

    ib = sub.add_parser("index-build", help="build a persisted IVF(-PQ) ANN index")
    ib.add_argument("path")
    ib.add_argument("--src-dir", required=True)
    ib.add_argument("--table", default="embeddings")
    ib.add_argument("--id-col", default="vec_id")
    ib.add_argument("--vec-col", default="embedding")
    ib.add_argument("--n-lists", type=int, default=8)
    ib.add_argument("--seed", type=int, default=42)
    ib.add_argument("--metadata", help="comma-separated metadata columns for filtered probes")
    ib.add_argument("--pq", help="add PQ artifacts: M,K_CODES (e.g. --pq 8,16)")

    ip = sub.add_parser("index-probe", help="serve ANN queries from a persisted index")
    ip.add_argument("path")
    ip.add_argument("--src-dir", required=True)
    ip.add_argument("--table", default="embeddings")
    ip.add_argument("--id-col", default="vec_id")
    ip.add_argument("--vec-col", default="embedding")
    ip.add_argument("--query-ids", required=True, help="comma-separated ids of the query vectors")
    ip.add_argument("--k", type=int, default=10)
    ip.add_argument("--n-probes", type=int, default=2)
    ip.add_argument("--predicate", help="filtered ANN: metadata predicate pushed into the cell scans")
    ip.add_argument("--pq", action="store_true", help="two-stage IVF-PQ probe (codes + exact rerank)")
    ip.add_argument("--rerank", type=int, default=50)
    ip.add_argument("--target-recall", type=float, help="resolve rerank from the calibrated curve")

    ic = sub.add_parser("index-calibrate", help="measure + store the recall-vs-rerank curve")
    ic.add_argument("path")
    ic.add_argument("--k", type=int, default=10)
    ic.add_argument("--n-probes", type=int, default=2)
    ic.add_argument("--budgets", help="comma-separated rerank budgets (default k,2k,4k,8k)")
    ic.add_argument("--sample", type=int, default=32)

    ir = sub.add_parser("index-rebuild", help="refit the quantizer, publish a new generation")
    ir.add_argument("path")
    ir.add_argument("--n-lists", type=int)
    ir.add_argument("--seed", type=int, default=42)

    si = sub.add_parser(
        "stream-ingest",
        help="drain a parquet directory stream into a target exactly-once",
    )
    si.add_argument("src_dir")
    si.add_argument("target")
    si.add_argument("--checkpoint", help="checkpoint dir (default: TARGET/_checkpoint)")
    si.add_argument("--lease", action="store_true",
                    help="serialize batch commits with maintenance via the table lease")

    isi = sub.add_parser(
        "index-stream-ingest",
        help="drain a parquet embedding stream into a persisted IVF index "
        "exactly-once (frozen-quantizer appends + drift advice)",
    )
    isi.add_argument("src_dir")
    isi.add_argument("index_path")
    isi.add_argument("--id-col", default="vec_id")
    isi.add_argument("--vec-col", default="embedding")
    isi.add_argument("--checkpoint", help="checkpoint dir (default: INDEX/_checkpoint)")
    isi.add_argument("--drift-check", action="store_true",
                     help="run ivf_cell_drift after each committed batch")
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
            if args.shred == "auto":
                shred = "auto"
            elif args.shred:
                col, sep, ddl = args.shred.partition("=")
                if not sep or not col.strip() or not ddl.strip():
                    raise ValueError(
                        "--shred expects COL=DDL or 'auto', e.g. "
                        "--shred 'payload=k INT, tag STRING'"
                    )
                shred = {"col": col.strip(), "schema": ddl.strip(),
                         "keep_raw": args.shred_keep_raw}
            bucket_by = None
            if args.bucket_by:
                parts = args.bucket_by.split(":")
                if not parts[0].strip():
                    raise ValueError(
                        "--bucket-by expects COLS[:N[:SORT_COLS]], e.g. "
                        "--bucket-by o_orderkey:32:o_orderkey"
                    )
                bucket_by = {"cols": _cols(parts[0])}
                if len(parts) > 1 and parts[1].strip():
                    bucket_by["num_buckets"] = int(parts[1])
                if len(parts) > 2 and parts[2].strip():
                    bucket_by["sort_cols"] = _cols(parts[2])
            rows = transfer(
                _spark(), args.src_dir, args.table, args.target,
                columns=_cols(args.columns), predicate=args.predicate,
                fmt=args.format, shred=shred, bucket_by=bucket_by,
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
        elif args.cmd == "index-build":
            from bigquack_spark.operators.simsearch import (
                add_pq_to_ivf_index,
                build_ivf_index,
            )
            from bigquack_spark.sources.parquet import load_table

            corpus = load_table(_spark(), args.src_dir, args.table)
            cells = build_ivf_index(
                corpus, args.path, id_col=args.id_col, vec_col=args.vec_col,
                n_lists=args.n_lists, seed=args.seed,
                metadata_cols=_cols(args.metadata),
            )
            out = {"cmd": "index-build", "path": args.path, "cells": cells}
            if args.pq and cells:
                m, _, kc = args.pq.partition(",")
                out["pq"] = add_pq_to_ivf_index(
                    _spark(), args.path, m=int(m), k_codes=int(kc or 16),
                    seed=args.seed,
                )
        elif args.cmd == "index-probe":
            from bigquack_spark.operators.simsearch import (
                probe_ivf_index,
                probe_ivf_pq,
            )
            from bigquack_spark.sources.parquet import load_table

            ids = [int(s) for s in args.query_ids.split(",") if s.strip()]
            queries = load_table(_spark(), args.src_dir, args.table).filter(
                _F().col(args.id_col).isin(ids)
            )
            common = dict(k=args.k, n_probes=args.n_probes,
                          id_col=args.id_col, vec_col=args.vec_col,
                          predicate=args.predicate)
            if args.pq:
                df = probe_ivf_pq(_spark(), args.path, queries,
                                  rerank=args.rerank,
                                  target_recall=args.target_recall, **common)
            else:
                df = probe_ivf_index(_spark(), args.path, queries, **common)
            rows = [r.asDict() for r in df.collect()]
            out = {"cmd": "index-probe", "n_rows": len(rows), "rows": rows}
        elif args.cmd == "index-calibrate":
            from bigquack_spark.operators.simsearch import calibrate_pq_recall

            budgets = (
                [int(b) for b in args.budgets.split(",")] if args.budgets else None
            )
            curve = calibrate_pq_recall(
                _spark(), args.path, k=args.k, n_probes=args.n_probes,
                budgets=budgets, sample=args.sample,
            )
            out = {"cmd": "index-calibrate", "curve": curve}
        elif args.cmd == "index-rebuild":
            from bigquack_spark.operators.simsearch import rebuild_ivf_index

            out = {"cmd": "index-rebuild",
                   **rebuild_ivf_index(_spark(), args.path,
                                       n_lists=args.n_lists, seed=args.seed)}
        elif args.cmd == "stream-ingest":
            from bigquack_spark.streaming.sink import ExactlyOnceBatchSink

            sp = _spark()
            schema = sp.read.parquet(args.src_dir).schema
            stream = sp.readStream.schema(schema).parquet(args.src_dir)
            sink = ExactlyOnceBatchSink(args.target, lease_table=args.lease)
            ckpt = args.checkpoint or f"{args.target}/_checkpoint"
            (
                stream.writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )
            n = sp.read.parquet(args.target).count()
            out = {"cmd": "stream-ingest", "target": args.target,
                   "rows_total": n, "next_batch_id": sink.next_batch_id}
        elif args.cmd == "index-stream-ingest":
            from bigquack_spark.streaming.sink import AnnIndexIngestSink

            sp = _spark()
            schema = sp.read.parquet(args.src_dir).schema
            stream = sp.readStream.schema(schema).parquet(args.src_dir)
            sink = AnnIndexIngestSink(
                args.index_path, id_col=args.id_col, vec_col=args.vec_col,
                drift_check=args.drift_check,
            )
            ckpt = args.checkpoint or f"{args.index_path}/_checkpoint"
            (
                stream.writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )
            out = {"cmd": "index-stream-ingest", "index": args.index_path,
                   "appended": sink.appended,
                   "next_batch_id": sink.next_batch_id,
                   "drift": sink.last_drift}
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
