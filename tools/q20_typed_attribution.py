#!/usr/bin/env python
"""r12 verdict #4: q20_typed at the 100x tier moved 1.48 (r11 driver run) ->
2.23 (r12 driver run) while its siblings improved.  The shred path was not
touched in r12 (git-verified: pipeline.py, operators/jsonshred.py,
sources/parquet._normalize_nanos all byte-identical 93df40a..fde0db8), so the
only honest attribution is a same-box replicate study: re-run the exact
`_events_shredded_block` protocol N times in one session and report the
spread of the q20_typed ratio and of its numerator/denominator separately.
If the r11/r12 driver values both fall inside the same-box spread (or the
DuckDB denominator moves as much as the ratio), the delta is window noise;
a tight spread excluding one of them would instead point at code.

Usage: python tools/q20_typed_attribution.py [n_reps] [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "q20_typed_attribution.json")


def main() -> None:
    import bench
    from bigquack_spark.session import default_parallelism, get_spark, pin

    cpus = default_parallelism()
    spark = get_spark(
        app_name="q20-typed-attribution",
        master=f"local[{cpus}]",
        warehouse_dir="/tmp/spark_graft_wh",
    )
    spark.sparkContext.setLogLevel("ERROR")
    pin("spark.sql.adaptive.enabled", "false")
    # the exact trend-tier confs bench.py times this block under
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    trend_dir = bench._scaled_copy(
        bench.SF_DIR, bench.TREND_FACTOR,
        tables={"events", "lineitem", "orders", "embeddings"},
    )
    if not trend_dir:
        print(json.dumps({"err": "no trend tier"}))
        return
    reps = []
    for i in range(N_REPS):
        blk = bench._events_shredded_block(spark, trend_dir)
        if not blk:
            reps.append({"err": "block failed"})
            continue
        reps.append({
            "spark_sec": blk["spark_sec"],
            "duckdb_sec": blk["duckdb_sec"],
            "ratios": blk["ratios"],
            "load_avg_1m": round(os.getloadavg()[0], 2),
        })
        sys.stderr.write(f"rep {i}: {blk['ratios']}\n")
    spark.stop()
    ratios = [r["ratios"]["q20_typed"] for r in reps if "ratios" in r]
    spark_secs = [r["spark_sec"]["q20_typed"] for r in reps if "spark_sec" in r]
    duck_secs = [r["duckdb_sec"]["q20_typed"] for r in reps if "duckdb_sec" in r]
    summary = {
        "question": "is q20_typed 1.48 (r11 driver) -> 2.23 (r12 driver) a code regression?",
        "code_delta_r11_r12": (
            "none: pipeline.transfer/shred path byte-identical across the r12 diff "
            "(git diff 93df40a..fde0db8 -- bigquack_spark/pipeline.py "
            "bigquack_spark/operators/jsonshred.py is empty)"
        ),
        "n_reps": N_REPS,
        "cpus": default_parallelism(),
        "q20_typed_ratio_reps": ratios,
        "q20_typed_spark_sec_reps": spark_secs,
        "q20_typed_duckdb_sec_reps": duck_secs,
        "ratio_median": round(statistics.median(ratios), 3) if ratios else None,
        "ratio_spread": (
            [round(min(ratios), 3), round(max(ratios), 3)] if ratios else None
        ),
        "driver_values": {"r11": 1.48, "r12": 2.23},
        "reps": reps,
    }
    with open(OUT, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "reps"}))


if __name__ == "__main__":
    main()
