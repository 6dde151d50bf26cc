"""Storage-layout tests: bucketed co-located joins (no exchange) and
idempotent dynamic partition overwrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquack_spark.sinks.partitioned import overwrite_partitions, save_bucketed
from tests.conftest import SF_SMOKE


def test_bucketed_join_is_exchange_free(spark):
    """Both sides bucketed on the join key -> the equi-join plans with ZERO
    shuffle exchanges: this is the repeated-join amortization that matters
    at 100 TB (pay the shuffle once at write time)."""
    for tbl in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    save_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8)
    save_bucketed(lineitem, "b_lineitem", ["l_orderkey"], num_buckets=8)

    # disable auto-broadcast: at test scale everything broadcasts, which
    # would hide the property under test (at 100 TB neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
        # and it still computes the right thing
        assert (
            joined.count()
            == lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for tbl in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE {tbl}")


def test_overwrite_partitions_idempotent(spark, tmp_path):
    """Re-running the same batch converges (no duplicates); untouched
    partitions survive."""
    path = str(tmp_path / "events_by_type")
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "user_id", "value", "event_type"
    )
    overwrite_partitions(e, path, ["event_type"])
    total = spark.read.parquet(path).count()
    assert total == 1000

    clicks = e.filter("event_type = 'click'")
    n_clicks = clicks.count()
    # replay the click partition twice: idempotent, siblings untouched
    overwrite_partitions(clicks, path, ["event_type"])
    overwrite_partitions(clicks, path, ["event_type"])
    after = spark.read.parquet(path)
    assert after.count() == total
    assert after.filter("event_type = 'click'").count() == n_clicks
    # conf restored to its prior value
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static"
