import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from bigquack_spark.queries import QUERIES  # noqa: E402
from bigquack_spark.session import get_spark, pin, default_parallelism  # noqa: E402
from bigquack_spark.sources import parquet as P  # noqa: E402

SF = "/root/testdata/sf0.1"

# which table each candidate query's expensive pipeline hangs off, and a
# near-unique key it already reads (None -> round-robin)
CANDIDATES = {
    "q01_pricing_summary": ("lineitem", None),
    "q03_shipping_priority": ("lineitem", "l_orderkey"),
    "q05_region_revenue": ("lineitem", "l_orderkey"),
    "q06_revenue_delta": ("lineitem", None),
    "q68_nation_profit": ("lineitem", "l_orderkey"),
    "q20_events_json_extract": ("events", "event_id"),
    "q21_events_hourly": ("events", "event_id"),
    "q116_hypertable_rollup": ("events", "event_id"),
    "q118_column_profile": ("orders", "o_orderkey"),
    "q24_asof_last_order": ("orders", None),
    "q50_token_stats": ("documents", "doc_id"),
    "q51_quality_signals": ("documents", "doc_id"),
    "q52_lang_id": ("documents", "doc_id"),
    "q53_fingerprint": ("documents", "doc_id"),
    "q75_ann_gemm_topk": ("embeddings", "vec_id"),
    "q07_top_customers_per_nation": ("orders", "o_orderkey"),
    "q116b": None,  # placeholder, ignore
}

OVERRIDE: dict = {}
_orig_load = P.load_table


def patched(spark, sf_dir, name, *args, **kw):
    if name in OVERRIDE:
        kw = {**kw, **OVERRIDE[name]}
    return _orig_load(spark, sf_dir, name, *args, **kw)


# rebind the `t` alias inside every query module
import importlib
import pkgutil
import bigquack_spark.queries as QP

for m in pkgutil.iter_modules(QP.__path__):
    mod = importlib.import_module(f"bigquack_spark.queries.{m.name}")
    if getattr(mod, "t", None) is _orig_load:
        mod.t = patched


def timed_noop(df, runs=5):
    df.write.mode("overwrite").format("noop").save()
    s = []
    for _ in range(runs):
        t0 = time.monotonic()
        df.write.mode("overwrite").format("noop").save()
        s.append(time.monotonic() - t0)
    return round(statistics.median(s), 4)


def main():
    cpus = default_parallelism()
    spark = get_spark(app_name="rebalance-exp", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    pin("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    out = {}
    names = [n for n in sys.argv[1:] if n in CANDIDATES] or [
        n for n, v in CANDIDATES.items() if v
    ]
    for name in names:
        table, key = CANDIDATES[name]
        rec = {}
        OVERRIDE.clear()
        rec["base"] = timed_noop(QUERIES[name].fn(spark, SF))
        OVERRIDE[table] = {"rebalance": "auto"}
        rec["rr"] = timed_noop(QUERIES[name].fn(spark, SF))
        if key:
            OVERRIDE[table] = {"rebalance": "auto", "rebalance_key": key}
            rec["hash"] = timed_noop(QUERIES[name].fn(spark, SF))
        OVERRIDE.clear()
        out[name] = rec
        print(name, rec, flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
