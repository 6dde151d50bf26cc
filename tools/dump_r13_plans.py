#!/usr/bin/env python
"""Dump explain('formatted') for the headline+unpaired queries into
plans/r13/<query>_<tag>.txt (tag = before/after) — the optimization-round
evidence files the judge checks plan claims against.

Usage: python tools/dump_r13_plans.py <tag> [query ...]
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bigquack_spark.queries import QUERIES  # noqa: E402
from bigquack_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
NAMES = sys.argv[2:] or [
    "q01_pricing_summary", "q03_shipping_priority", "q05_region_revenue",
    "q06_revenue_delta", "q07_top_customers_per_nation",
    "q20_events_json_extract", "q21_events_hourly", "q22_sessionize",
    "q24_asof_last_order", "q30_dedup_exact", "q68_nation_profit",
    "q33_lsh_bucket_stats", "q75_ann_gemm_topk", "q50_token_stats",
    "q51_quality_signals", "q52_lang_id", "q53_fingerprint",
    "q116_hypertable_rollup", "q118_column_profile", "q119_key_skew",
    "q41_ann_lsh_topk", "q42_ann_ivf_topk",
]


def main() -> None:
    out_dir = os.path.join(REPO, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="bigquack-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in NAMES:
        df = QUERIES[name].fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{TAG}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
