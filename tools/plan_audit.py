#!/usr/bin/env python
"""Registry-wide physical-plan audit (optimization-round evidence).

For EVERY registered query, build its DataFrame at the given sf dir and
record plan-health facts without executing anything: planlint findings,
exchange/broadcast/join-operator counts, Python-boundary nodes, scan count,
and whether any parquet scan reads a wider schema than the plan uses.
Writes one JSON artifact the round's OPTIMIZATION doc summarizes.

Usage: python tools/plan_audit.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import re
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bigquack_spark.planlint import lint_plan  # noqa: E402
from bigquack_spark.queries import QUERIES  # noqa: E402
from bigquack_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "plan_audit_r13.json")


def audit_one(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange RoundRobinPartitioning"),
        "single_partition_exchanges": plan.count("Exchange SinglePartition"),
        "broadcasts": plan.count("BroadcastExchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "batch_eval_python": plan.count("BatchEvalPython"),
        "arrow_eval_python": plan.count("ArrowEvalPython"),
        # 'MapInArrow' also matches the older 'PythonMapInArrow' spelling;
        # Spark 4.1.2 prints the physical node as plain 'MapInArrow'
        # (ADVICE r12: the old 'PythonMapInArrow'-only count missed q75).
        "map_in_arrow_or_pandas": plan.count("MapInPandas") + plan.count("MapInArrow"),
        "parquet_scans": len(re.findall(r"FileScan parquet|Scan parquet", plan)),
        "lint": [list(f) for f in lint_plan(df)],
    }


def main() -> None:
    spark = get_spark(app_name="bigquack-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name].fn(spark, SF)
            results[name] = audit_one(df)
        except Exception as exc:  # a build failure IS a finding
            results[name] = {"error": f"{type(exc).__name__}: {exc}",
                             "trace": traceback.format_exc(limit=3)}
        sys.stderr.write(f"{name} done\n")
    spark.stop()
    summary = {
        "sf_dir": SF,
        "n_queries": len(results),
        "n_errors": sum(1 for r in results.values() if "error" in r),
        "n_lint_errors": sum(
            1 for r in results.values()
            if any(f[0] == "error" for f in r.get("lint", []))
        ),
        "n_lint_warns": sum(
            1 for r in results.values()
            if any(f[0] == "warn" for f in r.get("lint", []))
        ),
        "n_batch_eval_python": sum(
            1 for r in results.values() if r.get("batch_eval_python")
        ),
        "queries": results,
    }
    with open(OUT, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "queries"}))


if __name__ == "__main__":
    main()
