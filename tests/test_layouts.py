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


def test_headline_queries_over_bucketed_layout(spark):
    """r9 verdict #2: the HEADLINE q68/q21 bodies (via their shared frame
    functions) over the bucketed layout keep their results bit-identical
    and shed the exchanges the layout pays for once: q68's fact-fact join
    plans with no join-input exchange, and q21's wide first-phase
    (hour, user) distinct exchange disappears when events are bucketed by
    user_id (HashPartitioning(user_id) satisfies the clustered
    distribution on (hour_key, user_id))."""
    from bigquack_spark.queries.events import hourly_events_frame
    from bigquack_spark.queries.relational import nation_profit_frame

    for tbl in ("hb_orders", "hb_lineitem", "hb_events"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    save_bucketed(orders, "hb_orders", ["o_orderkey"], num_buckets=8,
                  sort_cols=["o_orderkey"])
    save_bucketed(lineitem, "hb_lineitem", ["l_orderkey"], num_buckets=8,
                  sort_cols=["l_orderkey"])
    save_bucketed(events, "hb_events", ["user_id"], num_buckets=8)

    part = spark.read.parquet(f"{SF_SMOKE}/part.parquet").filter(
        "p_type = 'PROMO'").select("p_partkey", "p_retailprice")
    supp = spark.read.parquet(f"{SF_SMOKE}/supplier.parquet").select(
        "s_suppkey", "s_nationkey")
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet").select(
        "n_nationkey", "n_name")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q68b = nation_profit_frame(
            spark.table("hb_lineitem"), F.broadcast(part), F.broadcast(supp),
            F.broadcast(nat),
            spark.table("hb_orders").select("o_orderkey", "o_orderdate"),
        )
        plan68 = q68b._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(l_orderkey" not in plan68
        assert "Exchange hashpartitioning(o_orderkey" not in plan68
        plain68 = nation_profit_frame(
            lineitem, part, supp, nat,
            orders.select("o_orderkey", "o_orderdate"),
        )
        assert sorted(map(tuple, q68b.collect())) == sorted(
            map(tuple, plain68.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    q21b = hourly_events_frame(spark.table("hb_events"))
    plan21 = q21b._jdf.queryExecution().executedPlan().toString()
    plain21 = hourly_events_frame(events)
    plain_plan21 = plain21._jdf.queryExecution().executedPlan().toString()
    assert plan21.count("Exchange hashpartitioning") \
        < plain_plan21.count("Exchange hashpartitioning")

    def canon(rows):
        # double sums are fold-order-dependent; the layout only changes
        # the order — compare at the oracle's 6-digit grain
        return sorted((r[0], r[1], r[2], round(r[3], 6)) for r in rows)

    assert canon(q21b.collect()) == canon(plain21.collect())
    for tbl in ("hb_orders", "hb_lineitem", "hb_events"):
        spark.sql(f"DROP TABLE {tbl}")
