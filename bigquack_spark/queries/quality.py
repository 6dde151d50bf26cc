"""Data-quality / operational observability queries.

A 100 TB pipeline's first production incident is almost never an operator
bug — it's silent input drift (a column gone null, cardinality collapse, a
hot key).  These queries are the observability surface: a one-pass column
profile and a key-skew report, both oracle-paired.

The reference has no quality surface at all (SURVEY §2.6: zero relational
operators of its own); this is extension surface in the spirit of its
structured logging (bigquack.go:72-75) — know what the pipeline did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquack_spark.queries.registry import query
from bigquack_spark.sources.parquet import load_table as t

#: (column, numeric-projection SQL or None) — numeric min/max are emitted as
#: DOUBLE (string min/max would hit engine float-formatting differences).
_PROFILE_COLS = [
    ("o_orderkey", "CAST(o_orderkey AS DOUBLE)"),
    ("o_custkey", "CAST(o_custkey AS DOUBLE)"),
    ("o_totalprice", "CAST(o_totalprice AS DOUBLE)"),
    ("o_orderstatus", None),
    ("o_orderpriority", None),
]


def _q118_oracle() -> str:
    parts = []
    for c, num in _PROFILE_COLS:
        min_expr = f"min({num})" if num else "CAST(NULL AS DOUBLE)"
        max_expr = f"max({num})" if num else "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{c}' AS col_name,"
            f" CAST(count(*) AS BIGINT) AS n_rows,"
            f" CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,"
            f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
            f" {min_expr} AS min_num, {max_expr} AS max_num FROM orders"
        )
    return " UNION ALL ".join(parts)


@query("q118_column_profile", oracle=_q118_oracle())
def q118_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact column profile (completeness, cardinality, numeric range) in
    long form — the pre-flight check before any expensive pipeline stage.
    Plan (r6): one single-distinct aggregate PER COLUMN, unioned — each
    branch is a column-pruned scan feeding Catalyst's two-phase distinct
    aggregate, so no branch ever carries more than its own column's
    values, and the branches run as independent parallel stages.  The
    previous one-scan form put all K DISTINCTs in one aggregate, which
    Expand-multiplies every row K-fold through a single pipeline —
    measured 2.3x slower at sf0.1 (0.77 s vs 0.34 s) and ~20% slower at
    the 100x tier (bench_full profile_approx_block; run-to-run 13-27%).  Columnar I/O makes
    the K scans read the same bytes one scan would.  min/max are DOUBLE
    so both engines emit identical IEEE values.  The 100 TB posture for
    this shape is still the q252 approx profile (no exact distinct at
    all); this is the best exact plan."""
    o = t(spark, sf_dir, "orders")
    parts = []
    for c, num in _PROFILE_COLS:
        parts.append(
            o.select(c).agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                (F.min(F.expr(num)) if num else F.lit(None).cast("double")).alias("min_num"),
                (F.max(F.expr(num)) if num else F.lit(None).cast("double")).alias("max_num"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def profile_approx(df: DataFrame, cols: list[tuple[str, str | None]]) -> DataFrame:
    """The pure-approximate column profile (the 100x-tier shape of q118):
    one scan, one aggregate, approx_count_distinct (HyperLogLog++, O(1)
    mergeable state per column) instead of exact DISTINCT — no per-column
    Expand fan-out, no distinct shuffle of key values, so the reduce stage
    carries K sketches instead of the columns' value sets.  This is the
    profile a 100 TB pre-flight actually runs; q118 keeps the exact form.
    Sketch estimates are engine-specific, so this frame is bench/ops
    surface — q252 wraps it with tolerance booleans for the driver diff.
    rsd stays at Spark's 0.05 default: register count drives the per-row
    update cost (5 columns at rsd=0.02 measured 1.49 s vs 0.59 s at 0.05
    on 15M rows), and a profile wants magnitude, not the last 2%."""
    aggs = []
    for c, num in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.approx_count_distinct(c).alias(f"{c}__distinct"),
            (F.min(F.expr(num)) if num else F.lit(None).cast("double")).alias(f"{c}__min"),
            (F.max(F.expr(num)) if num else F.lit(None).cast("double")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c, _ in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(col_name, n_rows, n_nulls, n_distinct_approx, min_num, max_num)"
    )


def _q252_oracle() -> str:
    parts = []
    for c, num in _PROFILE_COLS:
        min_expr = f"min({num})" if num else "CAST(NULL AS DOUBLE)"
        max_expr = f"max({num})" if num else "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{c}' AS col_name,"
            f" CAST(count(*) AS BIGINT) AS n_rows,"
            f" CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,"
            f" abs(CAST(approx_count_distinct({c}) AS DOUBLE)"
            f"     - CAST(count(DISTINCT {c}) AS DOUBLE))"
            f"   <= 0.05 * CAST(count(DISTINCT {c}) AS DOUBLE)"
            f"   AS distinct_within_5pct,"
            f" {min_expr} AS min_num, {max_expr} AS max_num FROM orders"
        )
    return " UNION ALL ".join(parts)


@query("q252_column_profile_approx", oracle=_q252_oracle())
def q252_column_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate column profile (r4 verdict #3: q118's exact per-column
    DISTINCT is its 100x cost driver).  The deployable shape is
    :func:`profile_approx` — HLL sketches, no distinct Expand — and its
    wall is measured against exact q118 at the 100x bench tier
    (bench_full trend_100x.profile_approx_block).  Raw sketch estimates
    can never hash-match across engines, so this driver-diffed variant
    carries the q62-style contract instead: each engine asserts ITS OWN
    sketch lands within 5% of ITS OWN exact distinct count, and the
    boolean verdicts (plus exact n_rows/n_nulls/min/max) are what get
    diffed.  Spark rsd=0.02 and DuckDB's HLL both sit far inside 5% at
    every SF, so the booleans are stably true; a sketch regression in
    either engine flips a row red."""
    o = t(spark, sf_dir, "orders")
    aggs = []
    for c, num in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            (
                F.abs(
                    F.approx_count_distinct(c, rsd=0.02).cast("double")
                    - F.countDistinct(c).cast("double")
                )
                <= 0.05 * F.countDistinct(c).cast("double")
            ).alias(f"{c}__within"),
            (F.min(F.expr(num)) if num else F.lit(None).cast("double")).alias(f"{c}__min"),
            (F.max(F.expr(num)) if num else F.lit(None).cast("double")).alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__within, {c}__min, {c}__max"
        for c, _ in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack}) AS "
        "(col_name, n_rows, n_nulls, distinct_within_5pct, min_num, max_num)"
    )


_SKEW_TOP_K = 20


@query(
    "q119_key_skew",
    oracle=f"""
    WITH per_key AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS total, CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys FROM events)
    SELECT per_key.user_id, per_key.n,
           CAST(per_key.n AS DOUBLE) / tot.total AS share,
           CAST(per_key.n AS DOUBLE) * tot.n_keys / tot.total AS hotness
    FROM per_key, tot
    ORDER BY per_key.n DESC, per_key.user_id
    LIMIT {_SKEW_TOP_K}
    """,
)
def q119_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew report: the top-20 hottest join/agg keys with their share
    of rows and hotness (ratio vs a perfectly uniform key) — the number you
    read before choosing salt_buckets for salted_aggregate or trusting AQE
    skew-join to cope.  One groupBy(key) shuffle; the totals ride in via a
    broadcast of a 1-row aggregate, and the top-k is TakeOrderedAndProject,
    never a global sort."""
    e = t(spark, sf_dir, "events")
    per_key = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    # totals derive from the already-shuffled per-key frame (a tiny
    # second-stage agg) — never a second scan of the fact table.
    # count("user_id") over groups = number of non-NULL keys, matching the
    # oracle's count(DISTINCT user_id); sum(n) spans all rows like count(*).
    tot = per_key.agg(
        F.sum("n").alias("total"),
        F.count("user_id").alias("n_keys"),
    )
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n",
            (F.col("n").cast("double") / F.col("total")).alias("share"),
            (F.col("n").cast("double") * F.col("n_keys") / F.col("total")).alias("hotness"),
        )
        .orderBy(F.desc("n"), "user_id")
        .limit(_SKEW_TOP_K)
    )


@query(
    "q124_snapshot_changelog",
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS k, o_totalprice AS v, o_orderstatus AS s FROM orders
    ),
    new AS (
      SELECT k, CASE WHEN k % 7 = 0 THEN v * 2 ELSE v END AS v, s
      FROM old WHERE k % 10 != 0
      UNION ALL
      SELECT k + 100000000 AS k, v, s FROM old WHERE k % 1000 = 0
    ),
    d AS (
      SELECT COALESCE(o.k, n.k) AS k,
             CASE WHEN o.k IS NULL THEN 'insert'
                  WHEN n.k IS NULL THEN 'delete'
                  WHEN (o.v IS DISTINCT FROM n.v) OR (o.s IS DISTINCT FROM n.s)
                    THEN 'update' END AS op,
             CASE WHEN n.k IS NULL THEN o.v ELSE n.v END AS v,
             CASE WHEN n.k IS NULL THEN o.s ELSE n.s END AS s
      FROM old o FULL OUTER JOIN new n ON o.k = n.k
    )
    SELECT k, op, v, s FROM d WHERE op IS NOT NULL
    """,
)
def q124_snapshot_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC extract (operators.reconcile.changelog): diff two snapshots into
    insert/update/delete rows carrying the after-image (before-image for
    deletes) — the feed for a keyed MERGE or a downstream change stream.
    The 'new' snapshot is derived deterministically from orders (drop
    k%10==0, double price on k%7==0, insert shifted copies of k%1000==0)
    identically in both engines, so the changelog itself is what's diffed.
    One full-outer shuffle, NULL-safe IS DISTINCT FROM compares, output
    bounded by change volume — never table size."""
    from bigquack_spark.operators.reconcile import changelog

    old = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("v"),
        F.col("o_orderstatus").alias("s"),
    )
    new = (
        old.filter(F.col("k") % 10 != 0)
        .select(
            "k",
            F.when(F.col("k") % 7 == 0, F.col("v") * 2).otherwise(F.col("v")).alias("v"),
            "s",
        )
        .unionByName(
            old.filter(F.col("k") % 1000 == 0).select(
                (F.col("k") + 100000000).alias("k"), "v", "s"
            )
        )
    )
    return changelog(old, new, key_cols=["k"])


#: The schema's FK edges: (child table, child key, parent table, parent key).
_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _q152_oracle() -> str:
    parts = []
    for child, ck, parent, pk in _FK_EDGES:
        parts.append(f"""
        SELECT '{child}.{ck} -> {parent}.{pk}' AS fk_edge,
               CAST(count(*) AS BIGINT) AS n_child_keys,
               CAST(count(*) FILTER (WHERE p.{pk} IS NULL) AS BIGINT) AS n_orphan_keys
        FROM (SELECT DISTINCT {ck} AS k FROM {child} WHERE {ck} IS NOT NULL) c
        LEFT JOIN {parent} p ON p.{pk} = c.k""")
    return " UNION ALL ".join(parts) + " ORDER BY fk_edge"


@query("q152_referential_integrity", oracle=_q152_oracle())
def q152_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across every FK edge of the schema:
    distinct child keys and orphan keys (child keys with no parent row),
    one output row per edge — the broken-join early-warning a pipeline
    runs before a silent inner-join row loss ships downstream.

    Scale shape per edge: the child side collapses to DISTINCT keys first
    (map-side combine; the shuffle carries the key set, not the fact
    rows), then ONE left join + conditional-count aggregate answers both
    columns — dims broadcast, and the one fact-sized key set (l_orderkey)
    joins on the same key the fact tables are bucketed on.  Seven bounded
    audit rows come back; nothing corpus-sized crosses the driver."""
    out = None
    for child, ck, parent, pk in _FK_EDGES:
        c = t(spark, sf_dir, child, columns=[ck])
        p = t(spark, sf_dir, parent, columns=[pk])
        ckeys = c.filter(F.col(ck).isNotNull()).select(F.col(ck).alias("k")).distinct()
        joined = ckeys.join(
            p.select(F.col(pk).alias("k"), F.lit(1).alias("_hit")), "k", "left"
        )
        row = joined.agg(
            F.count(F.lit(1)).cast("long").alias("n_child_keys"),
            F.count(F.when(F.col("_hit").isNull(), 1)).cast("long").alias("n_orphan_keys"),
        ).select(
            F.lit(f"{child}.{ck} -> {parent}.{pk}").alias("fk_edge"),
            "n_child_keys",
            "n_orphan_keys",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk_edge")


_DAY_US_Q159 = 86_400_000_000


@query(
    "q159_novelty_rate",
    oracle=f"""
    WITH fp AS (
      SELECT user_id, props,
             CAST(floor(epoch_us(ts) / {_DAY_US_Q159}) AS BIGINT) AS day_idx,
             md5(CAST(user_id AS VARCHAR) || '|' || event_type || '|' || props) AS fingerprint
      FROM events
    ),
    first_seen AS (
      SELECT fingerprint, min(day_idx) AS first_day FROM fp GROUP BY fingerprint
    )
    SELECT f.day_idx,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (WHERE s.first_day = f.day_idx) AS BIGINT) AS n_novel,
           CAST(count(*) FILTER (WHERE s.first_day = f.day_idx) AS DOUBLE)
             / count(*) AS novelty_rate
    FROM fp f JOIN first_seen s ON f.fingerprint = s.fingerprint
    GROUP BY f.day_idx
    ORDER BY f.day_idx
    """,
)
def q159_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day novelty rate: the fraction of each day's events whose
    content fingerprint is seen for the FIRST time that day — the
    ingest-health metric that separates a healthy crawl (high novelty)
    from a loop re-fetching yesterday's corpus (novelty collapse), and
    the time-sliced view of the dedup family's global dup ratio (q30).

    Two shuffles, both on the 16-byte fingerprint: the min-day aggregate
    (map-side combined; state = one BIGINT per distinct fingerprint) and
    the join back — then a day-keyed rollup of bounded cardinality.  The
    ratio is an exact-integer division.  At 100 TB the fingerprint join
    is the same shape as incremental dedup (q130) and shares its AQE
    bloom-filter benefit."""
    e = t(spark, sf_dir, "events", columns=["user_id", "event_type", "ts", "props"])
    fp = e.select(
        F.floor(F.unix_micros("ts") / _DAY_US_Q159).cast("long").alias("day_idx"),
        F.md5(
            F.concat_ws("|", F.col("user_id").cast("string"), "event_type", "props")
        ).alias("fingerprint"),
    )
    first_seen = fp.groupBy("fingerprint").agg(F.min("day_idx").alias("first_day"))
    joined = fp.join(first_seen, "fingerprint")
    novel = F.count(F.when(F.col("first_day") == F.col("day_idx"), 1))
    return (
        joined.groupBy("day_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            novel.cast("long").alias("n_novel"),
            (novel.cast("double") / F.count(F.lit(1))).alias("novelty_rate"),
        )
        .orderBy("day_idx")
    )


K_ANON = 5  # the k in k-anonymity


@query(
    "q163_k_anonymity",
    oracle=f"""
    WITH combos AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 100000) AS BIGINT) AS bal_band,
             CAST(count(*) AS BIGINT) AS group_size
      FROM customer
      GROUP BY c_nationkey, c_mktsegment, bal_band
    )
    SELECT CAST(count(*) AS BIGINT) AS n_combos,
           CAST(count(*) FILTER (WHERE group_size < {K_ANON}) AS BIGINT) AS n_risky_combos,
           CAST(sum(group_size) AS BIGINT) AS n_rows,
           CAST(coalesce(sum(group_size) FILTER (WHERE group_size < {K_ANON}), 0) AS BIGINT)
             AS n_risky_rows,
           CAST(coalesce(sum(group_size) FILTER (WHERE group_size < {K_ANON}), 0) AS DOUBLE)
             / sum(group_size) AS risk_rate
    FROM combos
    """,
)
def q163_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (nation, market
    segment, account-balance band): how many identifier combinations have
    fewer than k={K_ANON} members, and what fraction of rows sits in
    those re-identifiable groups — the privacy gate a dataset passes
    BEFORE export, sitting next to the PII scrub (q58) in the governance
    pipeline.

    One map-side-combined aggregate to the combo cardinality, then a
    single-row rollup — shuffle is the combo vocabulary, never rows.
    The balance band quantizes through the exact cents lattice
    (round(x*100) — the q87 money rule) so band edges are engine-exact;
    all ratios are exact-integer divisions."""
    c = t(spark, sf_dir, "customer", columns=["c_nationkey", "c_mktsegment", "c_acctbal"])
    band = F.floor(
        (F.round(F.col("c_acctbal") * 100).cast("long") / F.lit(100000)).cast("double")
    ).cast("long")
    combos = c.groupBy(
        "c_nationkey", "c_mktsegment", band.alias("bal_band")
    ).agg(F.count(F.lit(1)).cast("long").alias("group_size"))
    risky = F.col("group_size") < K_ANON
    return combos.agg(
        F.count(F.lit(1)).cast("long").alias("n_combos"),
        F.count(F.when(risky, 1)).cast("long").alias("n_risky_combos"),
        F.sum("group_size").cast("long").alias("n_rows"),
        F.coalesce(F.sum(F.when(risky, F.col("group_size"))), F.lit(0))
        .cast("long")
        .alias("n_risky_rows"),
        (
            F.coalesce(F.sum(F.when(risky, F.col("group_size"))), F.lit(0)).cast("double")
            / F.sum("group_size")
        ).alias("risk_rate"),
    )


#: Candidate functional dependencies to audit: (table, determinant, dependent).
#: Mix of true FDs (violations must be 0) and known-false ones (the
#: violation rate is the finding).
_FD_CANDIDATES = [
    ("nation", "n_nationkey", "n_regionkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
]


def _q166_oracle() -> str:
    parts = []
    for tbl, x, y in _FD_CANDIDATES:
        parts.append(f"""
        SELECT '{tbl}: {x} -> {y}' AS fd,
               CAST(count(*) AS BIGINT) AS n_lhs,
               CAST(count(*) FILTER (WHERE n_rhs > 1) AS BIGINT) AS n_violating_lhs,
               CAST(count(*) FILTER (WHERE n_rhs > 1) AS DOUBLE) / count(*) AS violation_rate
        FROM (
          SELECT {x}, count(DISTINCT {y}) AS n_rhs FROM {tbl} GROUP BY {x}
        )""")
    return " UNION ALL ".join(parts) + " ORDER BY fd"


@query("q166_fd_audit", oracle=_q166_oracle())
def q166_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: for each candidate X -> Y rule, the
    count and fraction of determinant values mapping to more than one
    dependent value — the schema-discovery / constraint-mining pass that
    distinguishes real invariants (nationkey -> regionkey must be 0
    violations) from folklore ones (custkey -> orderpriority is not an
    FD, and the rate says how far off).

    Per rule: one (X, Y)-distinct aggregate then an X-keyed rollup —
    both map-side combined, shuffle bounded by the distinct pair count;
    four bounded audit rows return.  The same shape mines FDs at 100 TB
    because nothing is ever row-cardinality wide after the first
    aggregate."""
    out = None
    for tbl, x, y in _FD_CANDIDATES:
        d = t(spark, sf_dir, tbl, columns=[x, y])
        per_x = d.groupBy(x).agg(F.countDistinct(y).alias("n_rhs"))
        viol = F.col("n_rhs") > 1
        row = per_x.agg(
            F.count(F.lit(1)).cast("long").alias("n_lhs"),
            F.count(F.when(viol, 1)).cast("long").alias("n_violating_lhs"),
            (F.count(F.when(viol, 1)).cast("double") / F.count(F.lit(1))).alias(
                "violation_rate"
            ),
        ).select(F.lit(f"{tbl}: {x} -> {y}").alias("fd"), "*")
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fd")


@query(
    "q167_join_cardinality",
    oracle="""
    WITH ha AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS ca FROM orders GROUP BY k),
    hb AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS cb FROM lineitem GROUP BY k),
    prod AS (
      SELECT ha.k, ha.ca * hb.cb AS rows_for_key
      FROM ha JOIN hb ON ha.k = hb.k
    )
    SELECT CAST((SELECT count(*) FROM ha) AS BIGINT) AS n_keys_orders,
           CAST((SELECT count(*) FROM hb) AS BIGINT) AS n_keys_lineitem,
           CAST(count(*) AS BIGINT) AS n_matching_keys,
           CAST(sum(rows_for_key) AS BIGINT) AS join_rows,
           CAST(max(rows_for_key) AS BIGINT) AS max_key_rows,
           CAST(max(rows_for_key) AS DOUBLE) * count(*) / sum(rows_for_key)
             AS skew_amplification
    FROM prod
    """,
)
def q167_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality pre-flight: the exact output size of
    orders x lineitem on the orderkey computed from per-key histograms
    (sum of count products) WITHOUT running the join, plus the hottest
    key's row contribution and its amplification over the mean — the
    planning diagnostic that decides between plain shuffle, AQE skew
    split, and an explicit salt BEFORE the 95 TB exchange is paid
    (q119's key-skew report generalized to the two-sided join form).

    Both histograms are map-side-combined aggregates; their join carries
    one row per distinct key.  At 100 TB this costs two key-count
    aggregates instead of the joined fact shuffle it sizes — the whole
    point."""
    o = t(spark, sf_dir, "orders", columns=["o_orderkey"])
    l = t(spark, sf_dir, "lineitem", columns=["l_orderkey"])
    ha = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("ca")
    )
    hb = l.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("cb")
    )
    prod = ha.join(hb, "k").select(
        "k", (F.col("ca") * F.col("cb")).alias("rows_for_key")
    )
    na = ha.agg(F.count(F.lit(1)).cast("long").alias("n_keys_orders"))
    nb = hb.agg(F.count(F.lit(1)).cast("long").alias("n_keys_lineitem"))
    agg = prod.agg(
        F.count(F.lit(1)).cast("long").alias("n_matching_keys"),
        F.sum("rows_for_key").cast("long").alias("join_rows"),
        F.max("rows_for_key").cast("long").alias("max_key_rows"),
        (
            F.max("rows_for_key").cast("double")
            * F.count(F.lit(1))
            / F.sum("rows_for_key")
        ).alias("skew_amplification"),
    )
    return na.crossJoin(nb).crossJoin(agg).select(
        "n_keys_orders",
        "n_keys_lineitem",
        "n_matching_keys",
        "join_rows",
        "max_key_rows",
        "skew_amplification",
    )


@query(
    "q186_table_checksum",
    oracle="""
    WITH h AS (
      SELECT CAST('0x' || substr(md5(
               concat_ws('|',
                 CAST(o_orderkey AS VARCHAR),
                 CAST(o_custkey AS VARCHAR),
                 o_orderstatus,
                 CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                 o_orderpriority)
             ), 1, 15) AS BIGINT) AS h
      FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS xor_checksum,
           CAST(sum(h % 1099511627776) % 1099511627776 AS BIGINT) AS sum_checksum_mod
    FROM h
    """,
)
def q186_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table content checksum
    (operators.reconcile.table_checksum) — the transfer-validation gate
    the reference's BQ2Duck pipeline lacks (it reports only a row count,
    bigquack.go:127-138): COUNT + BIT_XOR of 60-bit row digests + a
    modular digest sum, over a canonical column rendering (money on the
    cents lattice, keys as strings).  Commutative aggregates mean
    partition/shuffle/engine order never matters and a 1e12-row table
    checksums in one scan with 24 bytes of aggregate state.  Run it on
    source and target; equal rows = proceed, unequal = drill into
    reconcile.table_diff (q88) for the row-level story."""
    from bigquack_spark.operators.reconcile import table_checksum

    o = t(spark, sf_dir, "orders",
          columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"])
    canon = o.select(
        F.col("o_orderkey").cast("string").alias("o_orderkey"),
        F.col("o_custkey").cast("string").alias("o_custkey"),
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string").alias("price_cents"),
        "o_orderpriority",
    )
    return table_checksum(
        canon, ["o_orderkey", "o_custkey", "o_orderstatus", "price_cents", "o_orderpriority"]
    )


RLE_GOOD = 4.0   # avg run length above which RLE wins
DICT_GOOD = 0.01  # distinct ratio below which dictionary encoding wins


def _q196_col_sql(col: str) -> str:
    return f"""
      SELECT '{col}' AS col,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
             CAST(sum(CASE WHEN {col} IS DISTINCT FROM prev_{col} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_runs
      FROM (
        SELECT {col}, lag({col}) OVER (ORDER BY l_orderkey, l_linenumber) AS prev_{col}
        FROM lineitem
      )"""


_Q196_COLS = ["l_returnflag", "l_linestatus", "l_shipdate", "l_suppkey", "l_quantity"]


@query(
    "q196_encoding_advisor",
    oracle=f"""
    WITH stats AS ({' UNION ALL '.join(_q196_col_sql(c) for c in _Q196_COLS)})
    SELECT col, n_rows, n_distinct, n_runs,
           round(CAST(n_rows AS DOUBLE) / n_runs, 6) AS avg_run_len,
           round(CAST(n_distinct AS DOUBLE) / n_rows, 6) AS distinct_ratio,
           CASE WHEN CAST(n_rows AS DOUBLE) / n_runs >= {RLE_GOOD} THEN 'rle'
                WHEN CAST(n_distinct AS DOUBLE) / n_rows <= {DICT_GOOD} THEN 'dictionary'
                ELSE 'plain' END AS recommendation
    FROM stats
    """,
)
def q196_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar encoding / sort-key advisor: per column, the distinct
    ratio and the RUN LENGTH the column exhibits under the table's
    natural (orderkey, linenumber) order — the two numbers that decide
    parquet encoding wins (long runs -> RLE, tiny dictionaries ->
    dictionary) and, more importantly at 100 TB, which columns gain from
    re-sorting before write (a column whose distinct ratio is low but
    run length is ALSO low is exactly the one a sort or Z-order
    (sinks/clustered.py, save_zordered) would compress 10x).  One
    total-order window pass computes all change-point counts
    simultaneously; the per-column stats are |cols| rows.  Production
    note: the total-order window is the q107-style test-tier form — at
    scale, compute runs per FILE (parquet already orders within files)
    and sum, which this plan does unchanged once the window is keyed by
    file.  The oracle replays the identical scan."""
    li = t(spark, sf_dir, "lineitem",
           columns=["l_orderkey", "l_linenumber"] + _Q196_COLS)
    from pyspark.sql.window import Window

    w = Window.orderBy("l_orderkey", "l_linenumber")
    changes = li.select(
        *_Q196_COLS,
        *[
            F.when(
                ~F.col(c).eqNullSafe(F.lag(c).over(w)), 1
            ).otherwise(0).alias(f"chg_{c}")
            for c in _Q196_COLS
        ],
    )
    rows = None
    for c in _Q196_COLS:
        r = changes.agg(
            F.lit(c).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
            F.sum(f"chg_{c}").cast("long").alias("n_runs"),
        )
        rows = r if rows is None else rows.unionByName(r)
    avg_run = F.col("n_rows").cast("double") / F.col("n_runs")
    dr = F.col("n_distinct").cast("double") / F.col("n_rows")
    return rows.select(
        "col", "n_rows", "n_distinct", "n_runs",
        F.round(avg_run, 6).alias("avg_run_len"),
        F.round(dr, 6).alias("distinct_ratio"),
        F.when(avg_run >= RLE_GOOD, "rle")
        .when(dr <= DICT_GOOD, "dictionary")
        .otherwise("plain")
        .alias("recommendation"),
    )


@query(
    "q202_rollup_consistency",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS line_cents,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    ),
    joined AS (
      SELECT o.o_orderstatus,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_cents,
             coalesce(li.line_cents, 0) AS line_cents,
             coalesce(li.n_lines, 0) AS n_lines
      FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN n_lines = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_lineless,
           CAST(sum(CASE WHEN abs(header_cents - line_cents) <= 1 AND n_lines > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent,
           CAST(max(abs(header_cents - line_cents)) AS BIGINT) AS max_abs_delta_cents,
           CAST(sum(abs(header_cents - line_cents)) AS BIGINT) AS total_abs_delta_cents
    FROM joined
    GROUP BY o_orderstatus
    """,
)
def q202_rollup_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail rollup consistency audit — the cross-table
    invariant check (does orders.o_totalprice equal the sum of its line
    amounts?) that catches partial loads, double-applied CDC batches,
    and currency rounding bugs the single-table profiles (q118) can't
    see.  One map-side-combined rollup of the detail table to header
    grain, one left join at that grain (lineless headers surface
    explicitly — they're a different defect than a wrong sum), and a
    |status|-row report with exact cents-lattice deltas.  A tolerance
    of one cent absorbs legitimate per-line rounding.  Companion to
    q88's row diff and q186's table checksum: checksum says SOMETHING
    differs, q88 says which rows, this says which INVARIANT broke."""
    o = t(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"])
    li = t(spark, sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])
    rolled = li.groupBy("l_orderkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("line_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    joined = o.join(rolled, o.o_orderkey == rolled.l_orderkey, "left").select(
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("header_cents"),
        F.coalesce("line_cents", F.lit(0)).alias("line_cents"),
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
    )
    delta = F.abs(F.col("header_cents") - F.col("line_cents"))
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("n_lines") == 0, 1).otherwise(0)).cast("long").alias("n_lineless"),
        F.sum(
            F.when((delta <= 1) & (F.col("n_lines") > 0), 1).otherwise(0)
        ).cast("long").alias("n_consistent"),
        F.max(delta).cast("long").alias("max_abs_delta_cents"),
        F.sum(delta).cast("long").alias("total_abs_delta_cents"),
    )


ZORDER_FILES = 64   # simulated file count (ntile buckets over the sort order)
ZORDER_BITS = 16    # per-dimension bit budget for the interleave


def _zorder_oracle() -> str:
    interleave = (
        "list_sum(list_transform(range(0, {b}), i -> "
        "(((cb >> CAST(i AS INTEGER)) & 1) << CAST(2 * i AS INTEGER)) + "
        "(((db >> CAST(i AS INTEGER)) & 1) << CAST(2 * i + 1 AS INTEGER))))"
    ).format(b=ZORDER_BITS)
    return f"""
    WITH base AS (
      SELECT o_custkey AS ck, CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS BIGINT) AS dy
      FROM orders
    ),
    rng AS (
      SELECT min(ck) AS ck_lo, max(ck) AS ck_hi, min(dy) AS dy_lo, max(dy) AS dy_hi,
             CAST(count(*) AS BIGINT) AS n
      FROM base
    ),
    scaled AS (
      SELECT ck, dy,
             ((ck - ck_lo) * {(1 << ZORDER_BITS) - 1}) // greatest(ck_hi - ck_lo, 1) AS cb,
             ((dy - dy_lo) * {(1 << ZORDER_BITS) - 1}) // greatest(dy_hi - dy_lo, 1) AS db,
             ck_hi - ck_lo AS ck_span, dy_hi - dy_lo AS dy_span
      FROM base CROSS JOIN rng
    ),
    keyed AS (
      SELECT ck, dy, ck_span, dy_span,
             CAST({interleave} AS BIGINT) AS z
      FROM scaled
    ),
    linear_files AS (
      SELECT 'linear' AS layout, ntile({ZORDER_FILES}) OVER (ORDER BY dy, ck) AS f,
             ck, dy, ck_span, dy_span
      FROM keyed
    ),
    z_files AS (
      SELECT 'zorder' AS layout, ntile({ZORDER_FILES}) OVER (ORDER BY z, ck, dy) AS f,
             ck, dy, ck_span, dy_span
      FROM keyed
    ),
    files AS (
      SELECT layout, f,
             CAST(max(ck) - min(ck) AS DOUBLE) / greatest(any_value(ck_span), 1) AS ck_frac,
             CAST(max(dy) - min(dy) AS DOUBLE) / greatest(any_value(dy_span), 1) AS dy_frac
      FROM (SELECT * FROM linear_files UNION ALL SELECT * FROM z_files)
      GROUP BY layout, f
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_files,
           round(sum(ck_frac) / count(*), 6) AS avg_custkey_span_frac,
           round(sum(dy_frac) / count(*), 6) AS avg_day_span_frac,
           round(sum(ck_frac) / count(*) + sum(dy_frac) / count(*), 6) AS combined_span
    FROM files GROUP BY layout
    """


@query("q221_zorder_layout", oracle=_zorder_oracle())
def q221_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout advisor — the multi-dimensional clustering lever
    (Delta OPTIMIZE ZORDER BY, Iceberg sort orders) quantified on this
    data: orders keyed by the bit-interleave of (custkey, order-day)
    scaled to {ZORDER_BITS}-bit lattices, carved into {ZORDER_FILES}
    simulated files (ntile over the sort order), and each layout scored
    by the average per-file min/max span fraction per dimension — the
    exact statistic file skipping prunes on.  A linear (date, custkey)
    sort gives tight day spans but each file covers ~the whole custkey
    range (custkey predicates prune nothing); the z-order layout trades
    a little day-span for bounded spans in BOTH dimensions, so both
    predicate families skip files.  All integer bit arithmetic
    (identical both engines); spans are exact-int ratios rounded to 6.
    At 100 TB this query IS the advisor you run before choosing a table
    layout; the write itself is one sort — sinks/partitioned.py's
    save_bucketed with z as the sort key."""
    o = t(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    base = o.select(
        F.col("o_custkey").alias("ck"),
        (F.unix_micros(F.col("o_orderdate").cast("timestamp")) / F.lit(86400000000))
        .cast("bigint")
        .alias("dy"),
    )
    rng = base.agg(
        F.min("ck").alias("ck_lo"), F.max("ck").alias("ck_hi"),
        F.min("dy").alias("dy_lo"), F.max("dy").alias("dy_hi"),
    )
    mx = (1 << ZORDER_BITS) - 1
    scaled = base.crossJoin(F.broadcast(rng)).select(
        "ck", "dy",
        F.floor((F.col("ck") - F.col("ck_lo")) * mx / F.greatest(F.col("ck_hi") - F.col("ck_lo"), F.lit(1))).cast("long").alias("cb"),
        F.floor((F.col("dy") - F.col("dy_lo")) * mx / F.greatest(F.col("dy_hi") - F.col("dy_lo"), F.lit(1))).cast("long").alias("db"),
        (F.col("ck_hi") - F.col("ck_lo")).alias("ck_span"),
        (F.col("dy_hi") - F.col("dy_lo")).alias("dy_span"),
    )
    z = F.expr(
        f"aggregate(sequence(0, {ZORDER_BITS - 1}), CAST(0 AS BIGINT), (acc, i) -> "
        "acc + shiftleft(shiftright(cb, i) % 2, 2 * i) "
        "+ shiftleft(shiftright(db, i) % 2, 2 * i + 1))"
    )
    keyed = scaled.select("ck", "dy", "ck_span", "dy_span", z.alias("z"))
    from pyspark.sql.window import Window

    linear = keyed.select(
        F.lit("linear").alias("layout"),
        F.ntile(ZORDER_FILES).over(Window.orderBy("dy", "ck")).alias("f"),
        "ck", "dy", "ck_span", "dy_span",
    )
    zord = keyed.select(
        F.lit("zorder").alias("layout"),
        F.ntile(ZORDER_FILES).over(Window.orderBy("z", "ck", "dy")).alias("f"),
        "ck", "dy", "ck_span", "dy_span",
    )
    files = (
        linear.unionAll(zord)
        .groupBy("layout", "f")
        .agg(
            ((F.max("ck") - F.min("ck")).cast("double")
             / F.greatest(F.first("ck_span"), F.lit(1))).alias("ck_frac"),
            ((F.max("dy") - F.min("dy")).cast("double")
             / F.greatest(F.first("dy_span"), F.lit(1))).alias("dy_frac"),
        )
    )
    return files.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.round(F.sum("ck_frac") / F.count(F.lit(1)), 6).alias("avg_custkey_span_frac"),
        F.round(F.sum("dy_frac") / F.count(F.lit(1)), 6).alias("avg_day_span_frac"),
        F.round(
            F.sum("ck_frac") / F.count(F.lit(1)) + F.sum("dy_frac") / F.count(F.lit(1)), 6
        ).alias("combined_span"),
    )


QH_BIN = 50000  # $500 bins on the cents lattice
QH_QS = [0.5, 0.9]


@query(
    "q226_histogram_quantiles",
    oracle=f"""
    WITH h AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) // {QH_BIN} AS bin,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag, bin
    ),
    c AS (
      SELECT l_returnflag, bin, n,
             sum(n) OVER (PARTITION BY l_returnflag ORDER BY bin
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(n) OVER (PARTITION BY l_returnflag) AS total
      FROM h
    )
    SELECT l_returnflag, q, CAST(min(bin) * {QH_BIN} AS BIGINT) AS quantile_lo
    FROM c CROSS JOIN (SELECT unnest([{", ".join(str(q) for q in QH_QS)}]) AS q)
    WHERE cum >= ceil(q * total)
    GROUP BY l_returnflag, q
    """,
)
def q226_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles (operators.ivm histogram_partials +
    quantiles_from_histogram): per return flag, the median and p90 of
    extended price read off a $500-bin integer histogram — the
    incremental-maintenance answer to the one aggregate family q212's
    algebraic merge can't carry and q214's HLL doesn't cover.  The
    histogram partials merge by bin-count addition (pytest asserts
    merged == direct and error <= one bin), so yesterday's persisted
    histogram + today's delta histogram IS today's quantile state —
    no history rescan, per-key state = value-range/bin rows.  Unlike
    percentile sketches (t-digest/KLL), the equi-width histogram is
    engine-portable: DuckDB replays cumsum-over-bins bit-exactly."""
    from bigquack_spark.operators.ivm import histogram_partials, quantiles_from_histogram

    li = t(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    cents = li.select(
        "l_returnflag", F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    hist = histogram_partials(cents, ["l_returnflag"], "cents", QH_BIN)
    return quantiles_from_histogram(hist, ["l_returnflag"], QH_BIN, QH_QS)


DP_EPSILON = 1.0  # Laplace scale b = sensitivity/epsilon = 1/epsilon for counts
DP_SALT = "dp-v1"


@query(
    "q235_dp_counts",
    oracle=f"""
    WITH counts AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS true_n FROM events
      GROUP BY event_type
    ),
    noised AS (
      SELECT event_type, true_n,
             (CAST('0x' || substr(md5('{DP_SALT}|' || event_type), 1, 12) AS BIGINT) + 0.5)
               / 281474976710656.0 AS u
      FROM counts
    )
    SELECT event_type, true_n,
           CAST(round(true_n - (1.0 / {DP_EPSILON})
                 * CASE WHEN u < 0.5 THEN -ln(2.0 * u) ELSE ln(2.0 * (1.0 - u)) END)
                AS BIGINT) AS dp_n,
           CAST(abs(CAST(round(true_n - (1.0 / {DP_EPSILON})
                 * CASE WHEN u < 0.5 THEN -ln(2.0 * u) ELSE ln(2.0 * (1.0 - u)) END)
                AS BIGINT) - true_n) AS BIGINT) AS abs_err
    FROM noised
    """,
)
def q235_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (ε={DP_EPSILON} Laplace
    mechanism) — the privacy-preserving statistics surface next to
    q163's k-anonymity audit: per event type, the true count plus the
    released noisy count.  The Laplace draw inverts a uniform derived
    from md5(salt|key) — DETERMINISTIC noise, which is exactly how
    production DP release pipelines make audits reproducible (a keyed
    PRF per release; rotate the salt per epoch, never re-release the
    same statistic under two salts — the sequential-composition leak).
    Both engines invert the identical uniform through the identical
    branch, so even the noise hash-matches.  One map-side-combined
    aggregate; noise is a per-row projection."""
    e = t(spark, sf_dir, "events", columns=["event_type"])
    counts = e.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("true_n"))
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(DP_SALT + "|"), F.col("event_type"))), 1, 12), 16, 10)
        .cast("bigint")
        .cast("double")
        + 0.5
    ) / F.lit(281474976710656.0)
    lap = F.when(u < 0.5, -F.log(2.0 * u)).otherwise(F.log(2.0 * (1.0 - u)))
    dp_n = F.round(F.col("true_n") - (1.0 / DP_EPSILON) * lap).cast("long")
    return counts.select(
        "event_type", "true_n", dp_n.alias("dp_n"),
        F.abs(dp_n - F.col("true_n")).cast("long").alias("abs_err"),
    )


MERKLE_BUCKETS = 64  # checksum fan-out: which 1/64th of the keyspace differs


@query(
    "q244_merkle_buckets",
    oracle=f"""
    WITH h AS (
      SELECT o_orderkey % {MERKLE_BUCKETS} AS bucket,
             CAST('0x' || substr(md5(
               concat_ws('|',
                 CAST(o_orderkey AS VARCHAR),
                 CAST(o_custkey AS VARCHAR),
                 o_orderstatus,
                 CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR))
             ), 1, 15) AS BIGINT) AS h
      FROM orders
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS bucket_checksum
    FROM h GROUP BY bucket
    """,
)
def q244_merkle_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed content checksums — q186's one-row table digest upgraded
    to a LOCALIZING structure: the keyspace folds into {MERKLE_BUCKETS}
    buckets, each carrying its own count + XOR digest.  Transfer
    validation then works like a one-level Merkle tree: compare the
    bucket vectors of source and target, and a mismatch names WHICH
    1/{MERKLE_BUCKETS}th of the keys to re-sync or drill into with the
    row-level diff (q88) — instead of 'something differs somewhere,
    rescan everything'.  Deepening to a real Merkle hierarchy is
    re-bucketing the mismatched slice with a finer modulus — same
    query, narrower predicate, log-rounds convergence on the exact
    divergent keys.  One map-side-combined shuffle of
    {MERKLE_BUCKETS} groups; same commutative-XOR portability as q186."""
    o = t(spark, sf_dir, "orders",
          columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"])
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("bigint")
    return (
        o.select((F.col("o_orderkey") % MERKLE_BUCKETS).cast("long").alias("bucket"), h.alias("h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr("bit_xor(h)").alias("bucket_checksum"),
        )
    )


_STALE_SEC = 86400  # a source whose newest event trails the watermark by a day


@query(
    "q253_freshness_lag",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) AS us,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY event_type, CAST(ts AS DATE) ORDER BY epoch_us(ts)
             )) / 1000000.0 AS gap_sec
      FROM events
    ),
    per_type AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             max(us) AS max_us,
             quantile_cont(gap_sec, 0.95) AS p95_gap_sec
      FROM g GROUP BY event_type
    ),
    w AS (SELECT max(max_us) AS wm FROM per_type)
    SELECT per_type.event_type, per_type.n_events,
           CAST((w.wm - per_type.max_us) // 1000000 AS BIGINT) AS lag_sec,
           per_type.p95_gap_sec AS p95_gap_sec,
           CAST((w.wm - per_type.max_us) // 1000000 AS BIGINT) >= {_STALE_SEC}
             AS stale_24h
    FROM per_type, w
    """,
)
def q253_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-freshness report — the pipeline-ops twin of q119's skew
    report: per event_type, how far its newest event trails the table
    watermark (max ts over all types; deterministic, unlike now()), the
    p95 gap between consecutive events as the arrival-cadence yardstick,
    and a stale flag at 86400 s.  The gap window is partitioned
    (event_type, day) — day bounds keep every window partition
    batch-sized at 100 TB where a bare per-type window would funnel a
    whole source through one task; the lost cross-midnight boundary gaps
    are noise at p95.  One window shuffle + one per-type aggregate; the
    watermark rides in as a broadcast 1-row aggregate off the already-
    reduced per-type frame (q119's ReusedExchange shape, never a second
    scan)."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events", columns=["event_type", "ts"])
    base = e.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.unix_micros("ts").alias("us"),
    )
    w = Window.partitionBy("event_type", "day").orderBy("us")
    g = base.withColumn(
        "gap_sec", (F.col("us") - F.lag("us").over(w)) / F.lit(1000000.0)
    )
    per_type = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("us").alias("max_us"),
        F.expr("percentile(gap_sec, 0.95)").alias("p95_gap_sec"),
    )
    wm = per_type.agg(F.max("max_us").alias("wm"))
    lag_sec = F.expr("(wm - max_us) div 1000000").cast("bigint")
    return per_type.crossJoin(F.broadcast(wm)).select(
        "event_type",
        "n_events",
        lag_sec.alias("lag_sec"),
        "p95_gap_sec",
        (lag_sec >= _STALE_SEC).alias("stale_24h"),
    )


# --- round-5 pipeline-ops additions -----------------------------------------

_COMPACT_TARGET = 1 << 20  # 1 MiB target output file (test-scale constant)
_BYTES_PER_ROW = 256  # deterministic byte proxy for the synthetic manifest


@query(
    "q254_small_file_compaction_plan",
    oracle=f"""
    WITH files AS (
      SELECT l_returnflag,
             year(l_shipdate) * 12 + month(l_shipdate) AS file_month,
             CAST(count(*) * {_BYTES_PER_ROW} AS BIGINT) AS bytes
      FROM lineitem GROUP BY 1, 2
    ),
    small AS (
      SELECT l_returnflag, file_month, bytes,
             CAST(sum(bytes) OVER (
               PARTITION BY l_returnflag ORDER BY file_month
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - bytes AS BIGINT) AS cum_before
      FROM files WHERE bytes < {_COMPACT_TARGET}
    )
    SELECT l_returnflag,
           CAST(cum_before // {_COMPACT_TARGET} AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS bin_bytes,
           CAST(sum(bytes) AS DOUBLE) / {_COMPACT_TARGET} AS fill_pct
    FROM small GROUP BY 1, 2
    """,
)
def q254_small_file_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner — the declarative math behind
    sinks/compact.py's OPTIMIZE loop: bin-pack every undersized file into
    target-size rewrite groups by cumulative-sum bucketing (next-fit over
    the manifest's natural order), so each bin lands within one target of
    full and untouched big files are skipped.  The manifest here is
    synthesized deterministically from lineitem — one "file" per
    (returnflag, ship-month) with a 256 B/row proxy — because
    the bench container has no real multi-file table; the plan math is
    byte-for-byte what compact.py's planner runs on real directory
    listings.  Scale posture: the packing window runs over file METADATA
    (one row per file, millions at 100 TB, never data rows), partitioned
    by the layout key (returnflag here; table partition in deployments) so
    no single task orders the whole manifest."""
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_shipdate"])
    files = li.groupBy(
        "l_returnflag",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("file_month"),
    ).agg((F.count(F.lit(1)) * _BYTES_PER_ROW).alias("bytes"))
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("file_month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    small = files.filter(F.col("bytes") < _COMPACT_TARGET).withColumn(
        "cum_before", F.sum("bytes").over(w) - F.col("bytes")
    )
    return small.groupBy(
        "l_returnflag",
        F.expr(f"cum_before div {_COMPACT_TARGET}").alias("bin_id"),
    ).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("bin_bytes"),
        (F.sum("bytes").cast("double") / _COMPACT_TARGET).alias("fill_pct"),
    )


@query(
    "q255_schema_drift",
    oracle="""
    WITH snap AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS half,
             event_type,
             CASE WHEN event_id % 2 = 0 THEN props
                  WHEN event_type = 'click'
                    THEN '{"k_v2": ' || json_extract_string(props, '$.k') || '}'
                  WHEN event_type = 'error'
                    THEN '{"k": "v' || json_extract_string(props, '$.k') || '"}'
                  ELSE props END AS props
      FROM events WHERE props IS NOT NULL
    ),
    kv AS (
      SELECT half, event_type, unnest(json_keys(props)) AS key, props FROM snap
    ),
    typed AS (
      SELECT half, event_type, key,
             json_type(json_extract(props, '$.' || key)) IN
               ('INTEGER', 'UBIGINT', 'BIGINT', 'DOUBLE') AS is_num
      FROM kv
    ),
    agg AS (
      SELECT event_type, key,
             CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
             CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
             CAST(sum(CASE WHEN half = 0 AND is_num THEN 1 ELSE 0 END) AS BIGINT) AS num_early,
             CAST(sum(CASE WHEN half = 1 AND is_num THEN 1 ELSE 0 END) AS BIGINT) AS num_late
      FROM typed GROUP BY 1, 2
    )
    SELECT event_type, key, n_early, n_late,
           CASE WHEN n_early = 0 THEN NULL
                ELSE CAST(num_early AS DOUBLE) / n_early END AS num_rate_early,
           CASE WHEN n_late = 0 THEN NULL
                ELSE CAST(num_late AS DOUBLE) / n_late END AS num_rate_late,
           CASE WHEN n_early = 0 THEN 'added'
                WHEN n_late = 0 THEN 'removed'
                WHEN (num_early * 2 >= n_early) <> (num_late * 2 >= n_late)
                  THEN 'type_changed'
                ELSE 'stable' END AS status
    FROM agg
    """,
)
def q255_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift detector over a JSON property bag — q177's profile
    diffed across two snapshots into added / removed / type_changed /
    stable verdicts per (event_type, key), the producer-contract alarm a
    daily pipeline run fires before bad data propagates.  The synthetic
    events table is drift-free, so the "late" snapshot injects the three
    real failure modes deterministically (q124's technique): clicks rename
    k -> k_v2 (added+removed), errors stringify the value (type_changed,
    caught by the majority-numeric flip), everything else passes through
    (stable).  One scan: the snapshot split is an event_id-parity
    projection, keys explode map-side bounded by producer schema width
    (q177's argument), and the final aggregate is (type, key)-keyed —
    drift state is schema-sized, never data-sized."""
    e = t(spark, sf_dir, "events", columns=["event_id", "event_type", "props"])
    e = e.filter(F.col("props").isNotNull())
    kval = F.get_json_object("props", "$.k")
    half = (F.col("event_id") % 2).cast("int")
    props2 = (
        F.when(half == 0, F.col("props"))
        .when(
            F.col("event_type") == "click",
            F.concat(F.lit('{"k_v2": '), kval, F.lit("}")),
        )
        .when(
            F.col("event_type") == "error",
            F.concat(F.lit('{"k": "v'), kval, F.lit('"}')),
        )
        .otherwise(F.col("props"))
    )
    snap = e.select("event_type", half.alias("half"), props2.alias("props"))
    kv = snap.select(
        "half",
        "event_type",
        F.explode(F.from_json("props", "map<string,string>")).alias("key", "sval"),
    )
    is_num = (
        F.col("sval").cast("bigint").isNotNull()
        | F.col("sval").cast("double").isNotNull()
    )
    agg = kv.groupBy("event_type", "key").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long").alias("n_early"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("n_late"),
        F.sum(F.when((F.col("half") == 0) & is_num, 1).otherwise(0)).cast("long").alias("num_early"),
        F.sum(F.when((F.col("half") == 1) & is_num, 1).otherwise(0)).cast("long").alias("num_late"),
    )
    maj_early = F.col("num_early") * 2 >= F.col("n_early")
    maj_late = F.col("num_late") * 2 >= F.col("n_late")
    return agg.select(
        "event_type",
        "key",
        "n_early",
        "n_late",
        F.when(F.col("n_early") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("num_early").cast("double") / F.col("n_early"))
        .alias("num_rate_early"),
        F.when(F.col("n_late") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("num_late").cast("double") / F.col("n_late"))
        .alias("num_rate_late"),
        F.when(F.col("n_early") == 0, "added")
        .when(F.col("n_late") == 0, "removed")
        .when(maj_early != maj_late, "type_changed")
        .otherwise("stable")
        .alias("status"),
    )


_TOMBSTONE_MOD = 97  # deterministic erasure cohort: custkey % 97 == 0


@query(
    "q256_tombstone_purge_audit",
    oracle=f"""
    SELECT 'customer' AS table_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN c_custkey % {_TOMBSTONE_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
           CAST(sum(CASE WHEN c_custkey % {_TOMBSTONE_MOD} = 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS purge_pct
    FROM customer
    UNION ALL
    SELECT 'orders',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_custkey % {_TOMBSTONE_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN o_custkey % {_TOMBSTONE_MOD} = 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
    FROM orders
    UNION ALL
    SELECT 'lineitem',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_custkey % {_TOMBSTONE_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN o_custkey % {_TOMBSTONE_MOD} = 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def q256_tombstone_purge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure impact audit: given a tombstone cohort (custkey %
    97 == 0 — deterministic stand-in for a deletion-request
    table), count the rows a purge would remove from every table the key
    reaches: customer directly, orders through its FK, lineitem through
    the orders join — the blast-radius report reviewed before running the
    actual cascade (sinks/merge.py's delete path).  customer and orders
    are single-scan conditional aggregates (the tombstone test rides the
    scan, no join); lineitem takes the one orderkey-keyed shuffle join the
    FK chain requires (q81's single-shuffle family), with the orders side
    projected to (orderkey, custkey).  At 100 TB every branch is one scan
    + one metadata-sized result; the real tombstone table would broadcast
    or bloom-filter onto the fact scans (q169's shape)."""
    c = t(spark, sf_dir, "customer", columns=["c_custkey"])
    o = t(spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = t(spark, sf_dir, "lineitem", columns=["l_orderkey"])

    def audit(df: DataFrame, name: str, dead) -> DataFrame:
        purged = F.sum(F.when(dead, 1).otherwise(0)).cast("long")
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            purged.alias("n_purged"),
            (purged.cast("double") / F.count(F.lit(1))).alias("purge_pct"),
        )

    dead_c = F.col("c_custkey") % _TOMBSTONE_MOD == 0
    dead_o = F.col("o_custkey") % _TOMBSTONE_MOD == 0
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    return (
        audit(c, "customer", dead_c)
        .unionAll(audit(o, "orders", dead_o))
        .unionAll(audit(joined, "lineitem", dead_o))
    )


_ARRIVAL_BLOCK = 4096  # watermark window: bounded per-(type, block) running max
_LATE_SHIFT = 2 * _ARRIVAL_BLOCK  # displaced rows arrive two blocks late


@query(
    "q257_out_of_order_rate",
    oracle=f"""
    WITH a AS (
      SELECT event_type, event_id, epoch_us(ts) AS us,
             event_id + CASE WHEN event_id % 13 = 0 THEN {_LATE_SHIFT} ELSE 0 END AS arr
      FROM events
    ),
    b AS (
      SELECT event_type, us,
             max(us) OVER (
               PARTITION BY event_type, arr // {_ARRIVAL_BLOCK}
               ORDER BY arr, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS rm
      FROM a
    ),
    c AS (
      SELECT event_type, us,
             CASE WHEN rm > us THEN (rm - us) / 1000000.0 END AS late_sec
      FROM b
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(late_sec) AS BIGINT) AS n_late,
           CAST(count(late_sec) AS DOUBLE) / count(*) AS late_rate,
           max(late_sec) AS max_late_sec,
           quantile_cont(late_sec, 0.95) AS p95_late_sec
    FROM c GROUP BY event_type
    """,
)
def q257_out_of_order_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order arrival report — the measurement that sizes a
    streaming watermark (streaming/events.py's withWatermark delay): per
    event_type, how many events arrive carrying an event time OLDER than
    the running max already seen (= would be dropped by a zero-delay
    watermark), and the p95/max lateness in seconds (= the delay to
    configure).  The synthetic events table arrives perfectly ordered, so
    a deterministic reorder displaces every 13th event two arrival blocks
    later — the repeatable stand-in for real transport-induced disorder.
    The running max is bounded per (event_type, 4096-row
    arrival block), exactly a micro-batch watermark's granularity: every
    window partition is batch-sized at any scale (cross-block lateness
    beyond one block is invisible, matching how a per-batch watermark
    actually advances).  One window shuffle + one per-type aggregate."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events", columns=["event_id", "event_type", "ts"])
    a = e.select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("us"),
        (
            F.col("event_id")
            + F.when(F.col("event_id") % 13 == 0, _LATE_SHIFT).otherwise(0)
        ).alias("arr"),
    )
    w = (
        Window.partitionBy("event_type", F.expr(f"arr div {_ARRIVAL_BLOCK}"))
        .orderBy("arr", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b = a.withColumn("rm", F.max("us").over(w))
    c = b.select(
        "event_type",
        "us",
        F.when(F.col("rm") > F.col("us"), (F.col("rm") - F.col("us")) / F.lit(1000000.0)).alias("late_sec"),
    )
    return c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("late_sec").alias("n_late"),
        (F.count("late_sec").cast("double") / F.count(F.lit(1))).alias("late_rate"),
        F.max("late_sec").alias("max_late_sec"),
        F.expr("percentile(late_sec, 0.95)").alias("p95_late_sec"),
    )


#: (rule name, failure predicate) — one predicate string shared verbatim by
#: both engines (Spark F.expr and DuckDB SQL), so a rule edit can't drift.
_DQ_RULES = [
    ("quantity_in_1_50", "l_quantity < 1 OR l_quantity > 50"),
    ("discount_in_0_10pct", "l_discount < 0 OR l_discount > 0.1"),
    ("tax_in_0_8pct", "l_tax < 0 OR l_tax > 0.08"),
    ("price_positive", "l_extendedprice <= 0"),
    ("returnflag_enum", "l_returnflag NOT IN ('R', 'A', 'N')"),
    ("linestatus_enum", "l_linestatus NOT IN ('O', 'F')"),
    ("shipdate_not_null", "l_shipdate IS NULL"),
]


def _q258_oracle() -> str:
    fails = ",\n".join(
        f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS f{i}"
        for i, (_, pred) in enumerate(_DQ_RULES)
    )
    rows = [
        "SELECT 'pk_unique' AS rule, n AS n_checked, n - n_pk AS n_failed,"
        " CAST(n - n_pk AS DOUBLE) / n AS fail_rate, n - n_pk = 0 AS passed FROM m"
    ]
    rows += [
        f"SELECT '{name}', n, f{i}, CAST(f{i} AS DOUBLE) / n, f{i} = 0 FROM m"
        for i, (name, _) in enumerate(_DQ_RULES)
    ]
    return (
        "WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n,"
        " CAST(count(DISTINCT l_orderkey * 8 + l_linenumber) AS BIGINT) AS n_pk,\n"
        f"{fails}\nFROM lineitem)\n" + "\nUNION ALL ".join(rows)
    )


@query("q258_dq_expectations", oracle=_q258_oracle())
def q258_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite (the Deequ / dbt-test
    pattern): every ingest contract on lineitem — primary-key uniqueness,
    domain ranges, enum membership, completeness — checked in ONE scan as
    conditional aggregates over a shared pass, then unpivoted to a
    per-rule scorecard (rule, n_checked, n_failed, fail_rate, passed).
    The rule table is a shared constant interpolated into both engines'
    predicates, so a rule edit cannot drift between the Spark run and the
    oracle.  pk_uniqueness folds l_linenumber (1..7) into the orderkey via
    an injective *8 pack so it rides the same aggregate as the range
    rules instead of a second distinct pass.  At 100 TB this is one
    full scan, partial-aggregated map-side, with a 1-row reduce — the
    cheapest possible shape for N rules (adding a rule adds a column,
    not a pass)."""
    li = t(spark, sf_dir, "lineitem")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(
            F.col("l_orderkey") * 8 + F.col("l_linenumber")
        ).alias("n_pk"),
    ]
    for i, (_, pred) in enumerate(_DQ_RULES):
        aggs.append(
            F.sum(F.when(F.expr(pred), 1).otherwise(0)).cast("long").alias(f"f{i}")
        )
    m = li.agg(*aggs)
    tuples = [
        "'pk_unique', n, n - n_pk, CAST(n - n_pk AS DOUBLE) / n, n - n_pk = 0"
    ] + [
        f"'{name}', n, f{i}, CAST(f{i} AS DOUBLE) / n, f{i} = 0"
        for i, (name, _) in enumerate(_DQ_RULES)
    ]
    n_rows = len(tuples)
    return m.selectExpr(
        f"stack({n_rows}, {', '.join(tuples)}) AS "
        "(rule, n_checked, n_failed, fail_rate, passed)"
    )


_L_DIVERSITY = 3  # a QI group with fewer distinct sensitive values is risky


@query(
    "q259_l_diversity",
    oracle=f"""
    WITH groups AS (
      SELECT c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS bal_band,
             CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS diversity,
             CAST(count(*) AS BIGINT) AS group_rows
      FROM customer GROUP BY 1, 2
    )
    SELECT diversity,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(group_rows) AS BIGINT) AS n_rows,
           diversity < {_L_DIVERSITY} AS is_risky
    FROM groups GROUP BY diversity
    """,
)
def q259_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the attribute-disclosure complement of q163's
    k-anonymity: a quasi-identifier group can be large (k-anonymous) yet
    leak its members' sensitive attribute if everyone in it shares one
    value.  Per QI group (nation, account-balance band) count the DISTINCT
    sensitive values (market segment), then histogram the groups by that
    diversity with an l=3 risk flag — the release gate reads
    the risky mass straight off the lowest rows.  Two cascaded aggregates:
    the first shuffles the QI vocabulary (map-side combined), the second
    the diversity histogram (≤|segments| rows); the balance band uses the
    exact cents lattice (q87's money rule) so band edges are
    engine-exact."""
    c = t(spark, sf_dir, "customer", columns=["c_nationkey", "c_acctbal", "c_mktsegment"])
    band = F.expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000")
    groups = c.groupBy("c_nationkey", band.alias("bal_band")).agg(
        F.countDistinct("c_mktsegment").alias("diversity"),
        F.count(F.lit(1)).alias("group_rows"),
    )
    return (
        groups.groupBy("diversity")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("group_rows").alias("n_rows"),
        )
        .withColumn("is_risky", F.col("diversity") < _L_DIVERSITY)
    )


#: Shared first-digit + Benford-expectation expressions (identical IEEE
#: math on both engines; x is the positive cents-lattice total).
_BENFORD_DIGIT = "CAST(floor(x / power(10.0, floor(log10(x)))) AS BIGINT)"
_BENFORD_EXP = "log10(1.0 + 1.0 / d)"


@query(
    "q261_benford_audit",
    oracle=f"""
    WITH v AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x
      FROM orders WHERE o_totalprice > 0
    ),
    digits AS (
      SELECT {_BENFORD_DIGIT} AS d FROM v
    ),
    counts AS (
      SELECT d, CAST(count(*) AS BIGINT) AS n_obs FROM digits GROUP BY d
    ),
    tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM counts)
    SELECT counts.d AS digit, counts.n_obs,
           {_BENFORD_EXP} AS expected_share,
           CAST(counts.n_obs AS DOUBLE) / tot.n AS observed_share,
           power(CAST(counts.n_obs AS DOUBLE) / tot.n - {_BENFORD_EXP}, 2)
             / {_BENFORD_EXP} AS chi2_term
    FROM counts, tot
    """,
)
def q261_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of the money column — the classic
    fabricated-data tripwire: naturally-occurring amounts put ~30.1% of
    first digits at 1, while generated or tampered figures drift toward
    uniform.  Per digit: observed vs Benford-expected share and the
    chi-square term (sum them for the test statistic; TPC-H's uniform
    price generator rightly FAILS Benford — the audit exists to measure
    exactly that kind of synthetic signature).  One scan to a 9-row
    digit histogram (map-side combined); the total rides back as a
    broadcast 1-row aggregate off the reduced frame; first-digit and
    expectation expressions are shared constants evaluated identically
    in both engines on the exact cents lattice."""
    o = t(spark, sf_dir, "orders", columns=["o_totalprice"])
    v = o.filter(F.col("o_totalprice") > 0).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x")
    )
    counts = v.select(F.expr(_BENFORD_DIGIT).alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    tot = counts.agg(F.sum("n_obs").cast("long").alias("n"))
    obs_share = F.col("n_obs").cast("double") / F.col("n")
    exp_share = F.expr(_BENFORD_EXP)
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("digit"),
        "n_obs",
        exp_share.alias("expected_share"),
        obs_share.alias("observed_share"),
        (F.pow(obs_share - exp_share, 2) / exp_share).alias("chi2_term"),
    )


@query(
    "q268_pk_dedup_survivorship",
    oracle="""
    WITH ranked AS (
      SELECT l_orderkey, l_linenumber,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
             l_quantity, l_shipdate,
             count(*) OVER (PARTITION BY l_orderkey, l_linenumber) AS n_versions,
             row_number() OVER (
               PARTITION BY l_orderkey, l_linenumber
               ORDER BY l_shipdate DESC,
                        round(l_extendedprice * 100) DESC,
                        l_quantity DESC, l_suppkey DESC, l_partkey DESC
             ) AS rn,
             min(l_quantity) OVER (PARTITION BY l_orderkey, l_linenumber) AS q_min,
             max(l_quantity) OVER (PARTITION BY l_orderkey, l_linenumber) AS q_max
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           CAST(n_versions AS BIGINT) AS n_versions,
           l_shipdate AS surv_shipdate,
           price_cents AS surv_price_cents,
           q_max - q_min AS qty_spread
    FROM ranked WHERE rn = 1 AND n_versions > 1
    """,
)
def q268_pk_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship resolution over the REAL duplicate primary keys the
    q258 expectation suite exposed (the synthetic generator reuses
    (orderkey, linenumber) pairs): per duplicated key, keep the row a
    latest-then-richest policy selects — (shipdate desc, price desc,
    quantity/supplier/part tiebreaks: a deterministic TOTAL order, the
    tie-stable-argmax rule the oracle needs) — and report the version
    count plus the quantity disagreement the merge papered over.  This
    is the repair half of a DQ finding: q258 detects, q268 resolves (the
    MDM survivorship pattern).  One key-partitioned window pass (count /
    rank / spread share the same partition), no joins; survivor state is
    |dup keys|-sized."""
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem")
    price_cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    pk = Window.partitionBy("l_orderkey", "l_linenumber")
    order = pk.orderBy(
        F.desc("l_shipdate"),
        F.desc(price_cents),
        F.desc("l_quantity"),
        F.desc("l_suppkey"),
        F.desc("l_partkey"),
    )
    ranked = li.select(
        "l_orderkey",
        "l_linenumber",
        price_cents.alias("price_cents"),
        "l_quantity",
        "l_shipdate",
        F.count(F.lit(1)).over(pk).alias("n_versions"),
        F.row_number().over(order).alias("rn"),
        F.min("l_quantity").over(pk).alias("q_min"),
        F.max("l_quantity").over(pk).alias("q_max"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("n_versions") > 1)).select(
        "l_orderkey",
        "l_linenumber",
        F.col("n_versions").cast("long").alias("n_versions"),
        F.col("l_shipdate").alias("surv_shipdate"),
        F.col("price_cents").alias("surv_price_cents"),
        (F.col("q_max") - F.col("q_min")).alias("qty_spread"),
    )


@query(
    "q269_stale_overwrite_audit",
    oracle=f"""
    WITH upd AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS v_cents,
             event_id + CASE WHEN event_id % 13 = 0 THEN {_LATE_SHIFT} ELSE 0 END AS arr
      FROM events
    ),
    by_event AS (
      SELECT user_id, v_cents AS v_event FROM (
        SELECT user_id, v_cents,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY us DESC, event_id DESC) AS rn
        FROM upd
      ) WHERE rn = 1
    ),
    by_arrival AS (
      SELECT user_id, v_cents AS v_arrival FROM (
        SELECT user_id, v_cents,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY arr DESC, event_id DESC) AS rn
        FROM upd
      ) WHERE rn = 1
    )
    SELECT by_event.user_id, by_event.v_event, by_arrival.v_arrival,
           by_event.v_event <> by_arrival.v_arrival AS stale_overwrite
    FROM by_event JOIN by_arrival ON by_event.user_id = by_arrival.user_id
    WHERE by_event.v_event <> by_arrival.v_arrival
    """,
)
def q269_stale_overwrite_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stale-overwrite audit for a last-writer-wins CDC sink: when
    updates arrive OUT OF ORDER (q257's deterministic late-arrival
    reorder), an arrival-order LWW apply ends up holding a different
    value than the event-time-correct one for every key whose true
    latest update was overtaken in transit — exactly the keys a naive
    upsert consumer silently corrupts (the defect sinks/merge.py's
    keyed MERGE avoids by carrying event time).  Reports each corrupted
    key with both values.  Two rank windows over the same user
    partition + one user-keyed join; key state is |users|-sized.  The
    tie rule is the row_number rank-CTE form on both engines (the
    min-ORDER-BY pitfall)."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])
    upd = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
        (
            F.col("event_id")
            + F.when(F.col("event_id") % 13 == 0, _LATE_SHIFT).otherwise(0)
        ).alias("arr"),
    )

    def last_by(col: str, alias: str) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(F.desc(col), F.desc("event_id"))
        return (
            upd.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("v_cents").alias(alias))
        )

    by_event = last_by("us", "v_event")
    by_arrival = last_by("arr", "v_arrival").withColumnRenamed("user_id", "uid")
    return (
        by_event.join(by_arrival, by_event.user_id == F.col("uid"))
        .filter(F.col("v_event") != F.col("v_arrival"))
        .select(
            "user_id",
            "v_event",
            "v_arrival",
            (F.col("v_event") != F.col("v_arrival")).alias("stale_overwrite"),
        )
    )


@query(
    "q270_bot_cadence_flags",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS gap_us
      FROM events
    ),
    s AS (
      SELECT user_id,
             CAST(count(gap_us) AS BIGINT) AS n_gaps,
             CAST(sum(gap_us) AS BIGINT) AS sg,
             CAST(sum(CAST(gap_us AS HUGEINT) * gap_us) AS DOUBLE) AS sgg_d,
             CAST(sum(gap_us) AS DOUBLE) AS sg_d
      FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n_gaps,
           sg_d / n_gaps / 1000000.0 AS mean_gap_sec,
           (n_gaps * sgg_d - sg_d * sg_d) * n_gaps
             / ((n_gaps - 1) * sg_d * sg_d) AS cv2,
           (n_gaps * sgg_d - sg_d * sg_d) * n_gaps * 100
             < (n_gaps - 1) * sg_d * sg_d AS robotic_cadence
    FROM s WHERE n_gaps >= 5
    """,
)
def q270_bot_cadence_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automation/bot cadence detector — a curation gate for
    behavior-derived training data: a human's inter-event gaps are
    bursty (squared coefficient of variation cv2 well above 1); a
    script's are metronomic (cv2 near 0).  Per user with >= 5 gaps:
    mean gap, cv2, and a robotic flag at cv2 < 0.01.  All statistics
    build from EXACT integer power sums of microsecond gaps (the
    q87/q260 rule — DuckDB's HUGEINT product mirrors Spark's decimal
    accumulation) cast to double only for one shared final expression,
    so both engines emit identical IEEE values.  One per-user window for
    gaps + one user-keyed aggregate; state is |users|-sized.  The
    per-user window is unbounded by day here because the output grain
    needs whole-history cadence; for 100 TB event logs, bound it per
    (user, day) as q253 does and roll the power sums up — they are
    exactly mergeable."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events", columns=["user_id", "event_id", "ts"])
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    g = e.select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    ).withColumn("gap_us", F.col("us") - F.lag("us").over(w))
    s = (
        g.filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.sum("gap_us").cast("double").alias("sg_d"),
            F.sum(
                F.col("gap_us").cast("decimal(19,0)") * F.col("gap_us").cast("decimal(19,0)")
            )
            .cast("double")
            .alias("sgg_d"),
        )
        .filter(F.col("n_gaps") >= 5)
    )
    var_num = (F.col("n_gaps") * F.col("sgg_d") - F.col("sg_d") * F.col("sg_d"))
    denom = (F.col("n_gaps") - 1) * F.col("sg_d") * F.col("sg_d")
    return s.select(
        "user_id",
        "n_gaps",
        (F.col("sg_d") / F.col("n_gaps") / F.lit(1000000.0)).alias("mean_gap_sec"),
        (var_num * F.col("n_gaps") / denom).alias("cv2"),
        (var_num * F.col("n_gaps") * 100 < denom).alias("robotic_cadence"),
    )


@query(
    "q296_outlier_fences",
    oracle="""
WITH cents AS (
  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
),
ranked AS (
  SELECT o_orderpriority, v,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM cents
),
quart AS (
  SELECT o_orderpriority,
         CAST(max(n) AS BIGINT) AS n_rows,
         max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN v END) AS q1,
         max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN v END) AS q3
  FROM ranked GROUP BY o_orderpriority
),
fenced AS (
  SELECT o_orderpriority, n_rows, q1, q3,
         q3 + 3 * (q3 - q1) // 2 AS hi_fence
  FROM quart
)
SELECT f.o_orderpriority, f.n_rows,
       round(f.q1 / 100.0, 2) AS q1,
       round(f.q3 / 100.0, 2) AS q3,
       round(f.hi_fence / 100.0, 2) AS hi_fence,
       CAST(sum(CASE WHEN c.v > f.hi_fence THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       round(sum(CASE WHEN c.v > f.hi_fence THEN 1 ELSE 0 END)
             / CAST(f.n_rows AS DOUBLE), 6) AS outlier_rate
FROM fenced f JOIN cents c USING (o_orderpriority)
GROUP BY f.o_orderpriority, f.n_rows, f.q1, f.q3, f.hi_fence
""",
)
def q296_outlier_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit per segment: exact quartiles by rank
    selection on the cents lattice (the q293 rule — engine quantile
    functions interpolate differently; order statistics don't), upper
    fence at Q3 + 1.5 IQR in integer arithmetic, then the outlier count
    per priority class — the pre-clipping audit before value columns
    feed a model.  Scale shape: one per-segment sort for the quartiles,
    then the fence re-scan folds map-side against the broadcast 5-row
    fence table; at 100 TB the quartiles become approx_percentile and
    the second pass disappears into the same scan."""
    from pyspark.sql.window import Window

    o = t(spark, sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    cents = o.select(
        "o_orderpriority", F.round(F.col("o_totalprice") * 100).cast("long").alias("v")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("v")
    wc = Window.partitionBy("o_orderpriority")
    ranked = cents.select(
        "o_orderpriority", "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )

    def at(q):
        return F.max(
            F.when(F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("long"), F.col("v"))
        )

    quart = ranked.groupBy("o_orderpriority").agg(
        F.max("n").cast("long").alias("n_rows"),
        at(0.25).alias("q1"),
        at(0.75).alias("q3"),
    )
    fenced = quart.withColumn(
        "hi_fence", F.col("q3") + (3 * (F.col("q3") - F.col("q1")) / 2).cast("long")
    )
    out = F.when(F.col("v") > F.col("hi_fence"), 1).otherwise(0)
    return (
        cents.join(F.broadcast(fenced), "o_orderpriority")
        .groupBy("o_orderpriority", "n_rows", "q1", "q3", "hi_fence")
        .agg(
            F.sum(out).cast("long").alias("n_outliers"),
            F.round(F.sum(out) / F.col("n_rows").cast("double"), 6).alias("outlier_rate"),
        )
        .select(
            "o_orderpriority", "n_rows",
            F.round(F.col("q1") / 100.0, 2).alias("q1"),
            F.round(F.col("q3") / 100.0, 2).alias("q3"),
            F.round(F.col("hi_fence") / 100.0, 2).alias("hi_fence"),
            "n_outliers", "outlier_rate",
        )
    )


# --- round-7 maintenance-planning additions ---------------------------------


@query(
    "q301_erasure_preflight",
    oracle="""
WITH marked AS (
  SELECT l_returnflag,
         year(l_shipdate) * 12 + month(l_shipdate) AS ship_month,
         CASE WHEN l_orderkey % 113 = 0 THEN 1 ELSE 0 END AS is_del
  FROM lineitem
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(is_del) AS BIGINT) AS n_del,
       round(sum(is_del) / CAST(count(*) AS DOUBLE), 6) AS del_share,
       CAST(sum(is_del) * 256 AS BIGINT) AS est_bytes_del,
       CAST(min(CASE WHEN is_del = 1 THEN ship_month END) AS BIGINT) AS first_month,
       CAST(max(CASE WHEN is_del = 1 THEN ship_month END) AS BIGINT) AS last_month
FROM marked GROUP BY l_returnflag
""",
)
def q301_erasure_preflight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure pre-flight sizing — the read-only estimate run BEFORE
    operators/maintenance.purge_rows executes a deletion cohort (here the
    synthetic cohort l_orderkey % 113 = 0): per returnflag partition, how
    many rows and estimated bytes the purge touches and the ship-month
    span those rows occupy (the file-touch span under a month-partitioned
    layout).  One groupBy with conditional aggregates — the same one-pass
    shape as q279's skew probe; nothing row-scale leaves the executors."""
    li = t(spark, sf_dir, "lineitem",
           columns=["l_orderkey", "l_returnflag", "l_shipdate"])
    is_del = (F.col("l_orderkey") % 113 == 0).cast("int")
    month = F.year("l_shipdate") * 12 + F.month("l_shipdate")
    m = li.select("l_returnflag", month.alias("ship_month"), is_del.alias("is_del"))
    return m.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("is_del").cast("long").alias("n_del"),
        F.round(F.sum("is_del") / F.count(F.lit(1)).cast("double"), 6).alias("del_share"),
        (F.sum("is_del") * 256).cast("long").alias("est_bytes_del"),
        F.min(F.when(F.col("is_del") == 1, F.col("ship_month"))).cast("long").alias("first_month"),
        F.max(F.when(F.col("is_del") == 1, F.col("ship_month"))).cast("long").alias("last_month"),
    )


@query(
    "q303_storage_tiering",
    oracle="""
WITH aged AS (
  SELECT (SELECT max(epoch_us(o_orderdate)) FROM orders) AS max_us,
         epoch_us(o_orderdate) AS us
  FROM orders
),
tiered AS (
  SELECT CASE WHEN (max_us - us) // 86400000000 < 365 THEN 'hot'
              WHEN (max_us - us) // 86400000000 < 730 THEN 'warm'
              ELSE 'cold' END AS tier,
         CASE WHEN (max_us - us) // 86400000000 < 365 THEN 0
              WHEN (max_us - us) // 86400000000 < 730 THEN 1
              ELSE 2 END AS tier_rank
  FROM aged
),
cells AS (
  SELECT tier, tier_rank, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) * 128 AS BIGINT) AS est_bytes
  FROM tiered GROUP BY tier, tier_rank
)
SELECT tier, n_rows, est_bytes,
       round(n_rows / CAST(SUM(n_rows) OVER () AS DOUBLE), 6) AS row_share,
       CAST(SUM(est_bytes) OVER (ORDER BY tier_rank DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS reclaim_bytes_if_ttl_here
FROM cells
""",
)
def q303_storage_tiering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-tiering audit: classify orders by age (days behind the
    table's max order date, exact integer micros division) into
    hot/warm/cold, and report per-tier rows, byte estimate, share, and the
    bytes reclaimed if the TTL were set at each tier boundary (coldest-
    first running sum) — the planning query behind moving cold partitions
    to cheap storage.  Scale shape: one scalar max (broadcast), one
    groupBy over 3 tiers, a 3-row window."""
    from pyspark.sql.window import Window

    o = t(spark, sf_dir, "orders", columns=["o_orderdate"])
    mx = o.agg(F.max(F.unix_micros("o_orderdate")).alias("max_us"))
    age_days = F.expr("(max_us - us) div 86400000000")
    tiered = (
        o.select(F.unix_micros("o_orderdate").alias("us"))
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(age_days < 365, F.lit("hot"))
            .when(age_days < 730, F.lit("warm"))
            .otherwise(F.lit("cold"))
            .alias("tier"),
            F.when(age_days < 365, F.lit(0))
            .when(age_days < 730, F.lit(1))
            .otherwise(F.lit(2))
            .alias("tier_rank"),
        )
    )
    cells = tiered.groupBy("tier", "tier_rank").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) * 128).cast("long").alias("est_bytes"),
    )
    w_all = Window.partitionBy()
    w_cum = (
        Window.partitionBy()
        .orderBy(F.desc("tier_rank"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cells.select(
        "tier", "n_rows", "est_bytes",
        F.round(F.col("n_rows") / F.sum("n_rows").over(w_all).cast("double"), 6)
        .alias("row_share"),
        F.sum("est_bytes").over(w_cum).cast("long").alias("reclaim_bytes_if_ttl_here"),
    )


@query(
    "q304_column_null_profile",
    oracle="""
WITH agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_user_id,
         CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_event_type,
         CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_value,
         CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_props
  FROM events
)
SELECT col_name, n_rows, n_nulls,
       round(n_nulls / CAST(n_rows AS DOUBLE), 6) AS null_share
FROM (
  SELECT 'user_id' AS col_name, n AS n_rows, nn_user_id AS n_nulls FROM agg
  UNION ALL SELECT 'event_type', n, nn_event_type FROM agg
  UNION ALL SELECT 'value', n, nn_value FROM agg
  UNION ALL SELECT 'props', n, nn_props FROM agg
)
""",
)
def q304_column_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-density profile of the events table — the lightweight always-on
    sibling of q118's full column profile (no DISTINCT, so no Expand and
    no per-column value sets through the shuffle: ONE aggregate pass
    computes every column's null count as a conditional sum, then a
    4-row unpivot).  This is the profile a drift monitor runs per batch;
    q118/q252 are the deep profiles run per day."""
    e = t(spark, sf_dir, "events",
          columns=["user_id", "event_type", "value", "props"])
    cols = ["user_id", "event_type", "value", "props"]
    agg = e.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}")
            for c in cols
        ],
    )
    stack = ", ".join(f"'{c}', nn_{c}" for c in cols)
    return agg.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col_name, n_nulls)", "n AS n_rows"
    ).select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.round(F.col("n_nulls") / F.col("n_rows").cast("double"), 6).alias("null_share"),
    )


@query(
    "q305_partition_key_audit",
    oracle="""
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS cell_rows
  FROM orders GROUP BY year(o_orderdate) * 12 + month(o_orderdate)
),
p AS (
  SELECT CAST(count(*) AS BIGINT) AS cell_rows FROM orders GROUP BY o_orderpriority
),
mp AS (
  SELECT CAST(count(*) AS BIGINT) AS cell_rows
  FROM orders
  GROUP BY year(o_orderdate) * 12 + month(o_orderdate), o_orderpriority
)
SELECT candidate, n_cells, min_cell_rows, max_cell_rows, avg_cell_bytes, small_file_risk
FROM (
  SELECT 'month' AS candidate, CAST(count(*) AS BIGINT) AS n_cells,
         CAST(min(cell_rows) AS BIGINT) AS min_cell_rows,
         CAST(max(cell_rows) AS BIGINT) AS max_cell_rows,
         round(sum(cell_rows) * 128 / CAST(count(*) AS DOUBLE), 6) AS avg_cell_bytes,
         sum(cell_rows) * 128 / CAST(count(*) AS DOUBLE) < 1048576.0 AS small_file_risk
  FROM m
  UNION ALL
  SELECT 'priority', CAST(count(*) AS BIGINT), CAST(min(cell_rows) AS BIGINT),
         CAST(max(cell_rows) AS BIGINT),
         round(sum(cell_rows) * 128 / CAST(count(*) AS DOUBLE), 6),
         sum(cell_rows) * 128 / CAST(count(*) AS DOUBLE) < 1048576.0
  FROM p
  UNION ALL
  SELECT 'month_priority', CAST(count(*) AS BIGINT), CAST(min(cell_rows) AS BIGINT),
         CAST(max(cell_rows) AS BIGINT),
         round(sum(cell_rows) * 128 / CAST(count(*) AS DOUBLE), 6),
         sum(cell_rows) * 128 / CAST(count(*) AS DOUBLE) < 1048576.0
  FROM mp
)
""",
)
def q305_partition_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key suitability audit — the query run BEFORE choosing a
    partitionBy layout, closing the loop with q254/compact_small_files
    (which clean up AFTER a bad choice): for each candidate key (ship
    month, priority, and their product), the cell count, min/max cell
    rows, and average cell bytes at a 128 B/row proxy, flagging keys whose
    average cell would land under 1 MiB (small-file debt by construction).
    Same per-column-union plan shape as q118: each candidate is one
    groupBy over the same pruned scan, unioned — columnar pruning makes
    the three passes read the same two columns."""
    o = t(spark, sf_dir, "orders", columns=["o_orderdate", "o_orderpriority"])
    month = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("k1")

    def audit(name, keys):
        cells = o.groupBy(*keys).agg(F.count(F.lit(1)).alias("cell_rows"))
        avg_bytes = F.sum("cell_rows") * 128 / F.count(F.lit(1)).cast("double")
        return cells.agg(
            F.lit(name).alias("candidate"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.min("cell_rows").cast("long").alias("min_cell_rows"),
            F.max("cell_rows").cast("long").alias("max_cell_rows"),
            F.round(avg_bytes, 6).alias("avg_cell_bytes"),
            (avg_bytes < 1048576.0).alias("small_file_risk"),
        )

    return (
        audit("month", [month])
        .unionByName(audit("priority", [F.col("o_orderpriority")]))
        .unionByName(audit("month_priority", [month, F.col("o_orderpriority")]))
    )


@query(
    "q306_retention_policy_sizing",
    oracle="""
WITH aged AS (
  SELECT (SELECT max(epoch_us(l_shipdate)) FROM lineitem) AS max_us,
         epoch_us(l_shipdate) AS us
  FROM lineitem
),
buckets AS (
  SELECT CAST(least((max_us - us) // 31536000000000, 6) AS BIGINT) AS age_years
  FROM aged
),
cells AS (
  SELECT age_years, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) * 256 AS BIGINT) AS est_bytes
  FROM buckets GROUP BY age_years
)
SELECT age_years, n_rows, est_bytes,
       CAST(SUM(est_bytes) OVER (ORDER BY age_years DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS bytes_reclaimed_if_ttl_here,
       round(SUM(est_bytes) OVER (ORDER BY age_years DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         / CAST(SUM(est_bytes) OVER () AS DOUBLE), 6) AS reclaim_share
FROM cells
""",
)
def q306_retention_policy_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-policy sizing: bucket lineitem by whole years of age
    behind the newest ship date (exact integer micros division, capped at
    6+) and report, for a TTL placed at each boundary, the bytes and share
    reclaimed (oldest-first running sum) — the number a data-retention
    review actually asks for.  One scalar max, one groupBy over <=7
    buckets, a 7-row window."""
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem", columns=["l_shipdate"])
    mx = li.agg(F.max(F.unix_micros("l_shipdate")).alias("max_us"))
    buckets = (
        li.select(F.unix_micros("l_shipdate").alias("us"))
        .crossJoin(F.broadcast(mx))
        .select(
            F.least(
                F.expr("(max_us - us) div 31536000000000"), F.lit(6)
            ).cast("long").alias("age_years")
        )
    )
    cells = buckets.groupBy("age_years").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) * 256).cast("long").alias("est_bytes"),
    )
    w_all = Window.partitionBy()
    w_cum = (
        Window.partitionBy()
        .orderBy(F.desc("age_years"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cells.select(
        "age_years", "n_rows", "est_bytes",
        F.sum("est_bytes").over(w_cum).cast("long").alias("bytes_reclaimed_if_ttl_here"),
        F.round(
            F.sum("est_bytes").over(w_cum) / F.sum("est_bytes").over(w_all).cast("double"),
            6,
        ).alias("reclaim_share"),
    )


@query(
    "q308_compaction_roi",
    oracle=f"""
WITH files AS (
  SELECT l_returnflag,
         year(l_shipdate) * 12 + month(l_shipdate) AS file_month,
         CAST(count(*) * {_BYTES_PER_ROW} AS BIGINT) AS bytes
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN bytes < {_COMPACT_TARGET} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small,
       CAST(sum(CASE WHEN bytes < {_COMPACT_TARGET} THEN bytes ELSE 0 END) AS BIGINT)
         AS small_bytes,
       CAST(CASE WHEN sum(CASE WHEN bytes < {_COMPACT_TARGET} THEN bytes ELSE 0 END) = 0
                 THEN 0
                 ELSE (sum(CASE WHEN bytes < {_COMPACT_TARGET} THEN bytes ELSE 0 END)
                       + {_COMPACT_TARGET} - 1) // {_COMPACT_TARGET} END AS BIGINT)
         AS est_files_after,
       CAST(sum(CASE WHEN bytes < {_COMPACT_TARGET} THEN 1 ELSE 0 END)
            - CASE WHEN sum(CASE WHEN bytes < {_COMPACT_TARGET} THEN bytes ELSE 0 END) = 0
                   THEN 0
                   ELSE (sum(CASE WHEN bytes < {_COMPACT_TARGET} THEN bytes ELSE 0 END)
                         + {_COMPACT_TARGET} - 1) // {_COMPACT_TARGET} END AS BIGINT)
         AS files_removed,
       round((sum(CASE WHEN bytes < {_COMPACT_TARGET} THEN 1 ELSE 0 END)
              - CASE WHEN sum(CASE WHEN bytes < {_COMPACT_TARGET} THEN bytes ELSE 0 END) = 0
                     THEN 0
                     ELSE (sum(CASE WHEN bytes < {_COMPACT_TARGET} THEN bytes ELSE 0 END)
                           + {_COMPACT_TARGET} - 1) // {_COMPACT_TARGET} END)
             / CAST(count(*) AS DOUBLE), 6) AS file_reduction_share
FROM files GROUP BY l_returnflag
""",
)
def q308_compaction_roi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction ROI estimator — the before/after arithmetic a scheduler
    runs to decide WHETHER tonight's compact_small_files pays: over q254's
    synthetic per-(returnflag, ship-month) file manifest, how many files
    are undersized, how many target-size files they bin-pack into
    (ceiling division on the exact byte lattice), and the file-count
    reduction share — at 100 TB that share IS the scan-task and
    object-store-listing reduction (measured at the bench tier in
    bench_full's compaction_block).  One groupBy over file METADATA;
    everything integer-exact."""
    li = t(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_shipdate"])
    files = li.groupBy(
        "l_returnflag",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("file_month"),
    ).agg((F.count(F.lit(1)) * _BYTES_PER_ROW).alias("bytes"))
    small = F.when(F.col("bytes") < _COMPACT_TARGET, 1).otherwise(0)
    small_bytes = F.when(F.col("bytes") < _COMPACT_TARGET, F.col("bytes")).otherwise(0)
    agg = files.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(small).cast("long").alias("n_small"),
        F.sum(small_bytes).cast("long").alias("small_bytes"),
    )
    est_after = F.when(F.col("small_bytes") == 0, F.lit(0)).otherwise(
        F.expr(f"(small_bytes + {_COMPACT_TARGET} - 1) div {_COMPACT_TARGET}")
    )
    return agg.select(
        "l_returnflag", "n_files", "n_small", "small_bytes",
        est_after.cast("long").alias("est_files_after"),
        (F.col("n_small") - est_after).cast("long").alias("files_removed"),
        F.round(
            (F.col("n_small") - est_after) / F.col("n_files").cast("double"), 6
        ).alias("file_reduction_share"),
    )


@query(
    "q309_functional_dependency_audit",
    oracle="""
SELECT candidate, n_lhs, n_pairs,
       CAST(n_pairs - n_lhs AS BIGINT) AS violations,
       n_pairs = n_lhs AS holds
FROM (
  SELECT 'o_orderkey->o_custkey' AS candidate,
         CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_lhs,
         CAST(count(DISTINCT (o_orderkey, o_custkey)) AS BIGINT) AS n_pairs
  FROM orders
  UNION ALL
  SELECT 'o_custkey->o_orderpriority',
         CAST(count(DISTINCT o_custkey) AS BIGINT),
         CAST(count(DISTINCT (o_custkey, o_orderpriority)) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'o_orderdate->o_orderstatus',
         CAST(count(DISTINCT o_orderdate) AS BIGINT),
         CAST(count(DISTINCT (o_orderdate, o_orderstatus)) AS BIGINT)
  FROM orders
)
""",
)
def q309_functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — schema inference for a table nobody
    documented: a candidate A->B holds iff distinct (A,B) pairs equal
    distinct A values (violations = extra pairs).  Audits the true pk
    dependency (o_orderkey->o_custkey) beside two expected failures.  The
    q305/q118 per-candidate union shape: each branch is one two-column
    distinct aggregate over the same pruned scan; exact integers."""
    o = t(
        spark, sf_dir, "orders",
        columns=[
            "o_orderkey", "o_custkey", "o_orderpriority",
            "o_orderdate", "o_orderstatus",
        ],
    )

    def branch(name, a, b):
        return o.agg(
            F.lit(name).alias("candidate"),
            F.countDistinct(a).cast("long").alias("n_lhs"),
            F.countDistinct(a, b).cast("long").alias("n_pairs"),
        )

    u = (
        branch("o_orderkey->o_custkey", "o_orderkey", "o_custkey")
        .unionByName(branch("o_custkey->o_orderpriority", "o_custkey", "o_orderpriority"))
        .unionByName(branch("o_orderdate->o_orderstatus", "o_orderdate", "o_orderstatus"))
    )
    return u.select(
        "candidate", "n_lhs", "n_pairs",
        (F.col("n_pairs") - F.col("n_lhs")).cast("long").alias("violations"),
        (F.col("n_pairs") == F.col("n_lhs")).alias("holds"),
    )


@query(
    "q314_merge_preflight",
    oracle="""
WITH g AS (
  SELECT l_returnflag AS rf,
         year(l_shipdate) * 12 + month(l_shipdate) AS fg,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN l_orderkey % 211 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_matched
  FROM lineitem GROUP BY 1, 2
)
SELECT rf AS l_returnflag,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN n_matched > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS groups_touched,
       CAST(sum(n_matched) AS BIGINT) AS rows_matched,
       CAST(sum(CASE WHEN n_matched > 0 THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_rewritten,
       round(sum(CASE WHEN n_matched > 0 THEN n_rows ELSE 0 END)
             / CAST(nullif(sum(n_matched), 0) AS DOUBLE), 6)
         AS write_amplification,
       round(sum(CASE WHEN n_matched > 0 THEN n_rows ELSE 0 END)
             / CAST(sum(n_rows) AS DOUBLE), 6) AS rewrite_share
FROM g GROUP BY rf
""",
)
def q314_merge_preflight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE pre-flight sizing (the planning twin of
    ``sinks/merge.merge_upsert``, as q301 is purge_rows'): for a CDC
    change-key cohort (synthetic: l_orderkey % 211 = 0) against lineitem
    laid out as (returnflag, ship-month) file groups, how many groups
    and rows the apply would rewrite, the WRITE AMPLIFICATION (rows
    rewritten per matched row — the copy-on-write tax the file-pruned
    merge pays instead of a table rewrite) and the rewrite share of the
    table.  Two map-side-combined aggregates, group-vocabulary bounded;
    nothing row-scale leaves the executors."""
    li = t(spark, sf_dir, "lineitem",
           columns=["l_orderkey", "l_returnflag", "l_shipdate"])
    month = F.year("l_shipdate") * 12 + F.month("l_shipdate")
    g = (
        li.select(
            F.col("l_returnflag").alias("rf"),
            month.alias("fg"),
            (F.col("l_orderkey") % 211 == 0).cast("int").alias("m"),
        )
        .groupBy("rf", "fg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("m").cast("long").alias("n_matched"),
        )
    )
    touched_rows = F.sum(F.when(F.col("n_matched") > 0, F.col("n_rows")).otherwise(0))
    return g.groupBy(F.col("rf").alias("l_returnflag")).agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum((F.col("n_matched") > 0).cast("int")).cast("long").alias("groups_touched"),
        F.sum("n_matched").cast("long").alias("rows_matched"),
        touched_rows.cast("long").alias("rows_rewritten"),
        F.round(
            touched_rows / F.nullif(F.sum("n_matched"), F.lit(0)).cast("double"), 6
        ).alias("write_amplification"),
        F.round(touched_rows / F.sum("n_rows").cast("double"), 6).alias("rewrite_share"),
    )


@query(
    "q319_evolved_merge_null_profile",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_evolved,
       round(1.0 - sum(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS evolved_null_share,
       CAST(min(CASE WHEN o_orderkey % 97 = 0 THEN o_orderkey % 1000 END)
            AS BIGINT) AS min_q,
       CAST(max(CASE WHEN o_orderkey % 97 = 0 THEN o_orderkey % 1000 END)
            AS BIGINT) AS max_q
FROM orders GROUP BY o_orderpriority
""",
)
def q319_evolved_merge_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution preflight (the planning twin of
    ``sinks/merge.merge_upsert(schema_evolution=True)``, as q314 is the
    plain merge's): a CDC cohort (o_orderkey % 97 = 0) carries an ADDED
    column — after the evolved merge, every non-cohort row reads the new
    column as NULL (old files are untouched; mergeSchema NULL-fills).
    Per priority group: rows, evolved-carrier count, the NULL share the
    stats fold will record for the new column, and its value range over
    the carriers — exactly the numbers ``update_table_stats`` must
    produce post-evolution and the planners' null-fraction viability
    gates will consume.  One map-side-combined aggregate over a
    three-column scan; group-vocabulary bounded."""
    o = t(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    carrier = F.col("o_orderkey") % 97 == 0
    q = F.when(carrier, F.col("o_orderkey") % 1000)
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(carrier.cast("int")).cast("long").alias("n_evolved"),
        F.round(
            1.0 - F.sum(carrier.cast("int")) / F.count(F.lit(1)).cast("double"), 6
        ).alias("evolved_null_share"),
        F.min(q).cast("long").alias("min_q"),
        F.max(q).cast("long").alias("max_q"),
    )


@query(
    "q320_stats_fold_consistency",
    oracle="""
WITH merged AS (
  SELECT l_returnflag AS rf,
         year(l_shipdate) * 12 + month(l_shipdate) AS fg,
         CAST(l_quantity AS BIGINT)
           + CASE WHEN l_orderkey % 211 = 0 THEN 5 ELSE 0 END AS q
  FROM lineitem
),
direct AS (
  SELECT 'direct' AS leg, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(min(q) AS BIGINT) AS min_q, CAST(max(q) AS BIGINT) AS max_q,
         CAST(sum(q) AS BIGINT) AS sum_q
  FROM merged
),
partials AS (
  SELECT rf, fg, CAST(count(*) AS BIGINT) AS p_rows,
         CAST(min(q) AS BIGINT) AS p_min, CAST(max(q) AS BIGINT) AS p_max,
         CAST(sum(q) AS BIGINT) AS p_sum
  FROM merged GROUP BY rf, fg
),
folded AS (
  SELECT 'folded' AS leg, CAST(sum(p_rows) AS BIGINT) AS n_rows,
         CAST(min(p_min) AS BIGINT) AS min_q, CAST(max(p_max) AS BIGINT) AS max_q,
         CAST(sum(p_sum) AS BIGINT) AS sum_q
  FROM partials
)
SELECT * FROM direct UNION ALL SELECT * FROM folded
""",
)
def q320_stats_fold_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-fold consistency over a CDC merge (the oracle-paired twin the
    r8 stats-lifecycle work owed): lineitem after an upsert cohort
    (l_orderkey % 211 = 0, quantity +5) is profiled two ways — 'direct'
    (one pass over the merged state, ``collect_table_stats``'s shape) and
    'folded' (per-(returnflag, ship-month) file-group partials re-derived
    to table level, ``update_table_stats``'s shape: drop retired
    partials, re-union survivors).  The two rows must carry IDENTICAL
    numbers — the algebraic claim behind folding stats through
    merge/retention instead of recollecting 100 TB.  Exact BIGINT
    lattice (quantity is integer-valued), so equality is bit-exact, not
    approximate.  Plan: one scan, two map-side-combined aggregates."""
    li = t(spark, sf_dir, "lineitem",
           columns=["l_orderkey", "l_returnflag", "l_shipdate", "l_quantity"])
    q = (
        F.col("l_quantity").cast("long")
        + F.when(F.col("l_orderkey") % 211 == 0, F.lit(5)).otherwise(F.lit(0))
    )
    merged = li.select(
        F.col("l_returnflag").alias("rf"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("fg"),
        q.alias("q"),
    )
    direct = merged.agg(
        F.lit("direct").alias("leg"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("q").cast("long").alias("min_q"),
        F.max("q").cast("long").alias("max_q"),
        F.sum("q").cast("long").alias("sum_q"),
    )
    folded = (
        merged.groupBy("rf", "fg")
        .agg(
            F.count(F.lit(1)).alias("p_rows"),
            F.min("q").alias("p_min"),
            F.max("q").alias("p_max"),
            F.sum("q").alias("p_sum"),
        )
        .agg(
            F.lit("folded").alias("leg"),
            F.sum("p_rows").cast("long").alias("n_rows"),
            F.min("p_min").cast("long").alias("min_q"),
            F.max("p_max").cast("long").alias("max_q"),
            F.sum("p_sum").cast("long").alias("sum_q"),
        )
    )
    return direct.unionByName(folded)


_Q322_WORKLOAD = [
    ("o_orderdate", 5),
    ("o_orderpriority", 3),
    ("o_custkey", 2),
    ("o_orderstatus", 0),
]


def _q322_oracle() -> str:
    legs = " UNION ALL ".join(
        f"SELECT '{c}' AS candidate, CAST({u} AS BIGINT) AS n_uses,"
        f" CAST(count(*) AS BIGINT) AS n_rows,"
        f" CAST(count(DISTINCT {c}) AS BIGINT) AS ndv FROM orders"
        for c, u in _Q322_WORKLOAD
    )
    return f"""
WITH cand AS ({legs}),
scored AS (
  SELECT candidate, n_uses, n_rows, ndv,
         CAST(n_rows // ndv AS BIGINT) AS est_rows_per_partition,
         (ndv BETWEEN 2 AND 10000 AND n_uses > 0) AS eligible
  FROM cand
)
SELECT candidate, n_uses, n_rows, ndv, est_rows_per_partition, eligible,
       eligible AND row_number() OVER (
         ORDER BY eligible DESC, n_uses DESC, est_rows_per_partition DESC,
                  candidate
       ) = 1 AS is_pick
FROM scored
"""


@query("q322_workload_layout_scoring", oracle=_q322_oracle())
def q322_workload_layout_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Workload-weighted partition-key scoring (the oracle-paired twin of
    ``planner.recommend_layout_from_log``'s ranking, as q305 is the
    unweighted audit's): each candidate column carries its captured
    workload usage count; viability is the advisor's exact gate (2 <=
    ndv <= 10000 partitions AND the workload actually filters on it) and
    the pick maximizes (usage, est-rows-per-partition)
    lexicographically — a column no query filters on prunes nothing no
    matter its cardinality (o_orderstatus: viable ndv, zero uses, not
    picked).
    The query computes exact ndv where the metadata-only advisor reads
    the HLL estimate — same arithmetic, scan-priced twin (the q304/q305
    convention).  Plan: one map-side-combined distinct-aggregate per
    candidate over a pruned scan, 4-row frame, bounded window."""
    from pyspark.sql.window import Window

    legs = None
    for c, u in _Q322_WORKLOAD:
        o = t(spark, sf_dir, "orders", columns=[c])
        leg = o.agg(
            F.lit(c).alias("candidate"),
            F.lit(u).cast("long").alias("n_uses"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct(c).cast("long").alias("ndv"),
        )
        legs = leg if legs is None else legs.unionByName(leg)
    scored = legs.select(
        "candidate", "n_uses", "n_rows", "ndv",
        F.expr("n_rows div ndv").cast("long").alias("est_rows_per_partition"),
        (F.col("ndv").between(2, 10000) & (F.col("n_uses") > 0)).alias("eligible"),
    )
    w = Window.orderBy(
        F.desc("eligible"), F.desc("n_uses"),
        F.desc("est_rows_per_partition"), F.asc("candidate"),
    )
    return scored.withColumn(
        "is_pick", F.col("eligible") & (F.row_number().over(w) == 1)
    )


@query(
    "q323_snapshot_expiry_policy",
    oracle="""
WITH snaps AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d FROM events WHERE ts IS NOT NULL
),
m AS (SELECT max(d) AS maxd FROM snaps),
scored AS (
  SELECT d, date_diff('day', d, (SELECT maxd FROM m)) AS age_days,
         row_number() OVER (ORDER BY d DESC) AS rk
  FROM snaps
),
decided AS (
  SELECT CASE WHEN rk <= 7 THEN 'protected'
              WHEN age_days > 14 THEN 'expired'
              ELSE 'kept' END AS decision, age_days
  FROM scored
)
SELECT decision, CAST(count(*) AS BIGINT) AS n_snapshots,
       CAST(min(age_days) AS BIGINT) AS min_age_days,
       CAST(max(age_days) AS BIGINT) AS max_age_days
FROM decided GROUP BY decision
""",
)
def q323_snapshot_expiry_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-expiry policy sizing (the planning twin of
    ``maintenance.expire_snapshots(older_than_s=, keep_last=)``, as q306
    is retention's): a daily-snapshot timeline derived from the events
    table, decided under keep_last=7 + older_than=14 days — the newest 7
    are PROTECTED regardless of age, older-than-14 of the rest EXPIRE,
    the remainder are KEPT.  Per decision: snapshot count and age range —
    exactly the preview an operator wants before an expiry actually
    drops restore points.  Plan: the timeline is date-vocabulary bounded
    (distinct-date aggregate), the newest date is a 1-row bounded collect
    inlined as a literal, and the ranking window runs over the bounded
    timeline — nothing row-scale shuffles."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events", columns=["ts"])
    snaps = (
        e.filter(F.col("ts").isNotNull())
        .select(F.to_date("ts").alias("d"))
        .distinct()
    )
    row = snaps.agg(F.max("d")).first()
    if row is None or row[0] is None:
        return spark.createDataFrame(
            [], "decision string, n_snapshots long, min_age_days long, "
                "max_age_days long"
        )
    maxd = row[0]
    w = Window.orderBy(F.desc("d"))
    scored = snaps.select(
        F.datediff(F.lit(maxd), F.col("d")).alias("age_days"),
        F.row_number().over(w).alias("rk"),
    )
    decision = (
        F.when(F.col("rk") <= 7, F.lit("protected"))
        .when(F.col("age_days") > 14, F.lit("expired"))
        .otherwise(F.lit("kept"))
    )
    return scored.groupBy(decision.alias("decision")).agg(
        F.count(F.lit(1)).cast("long").alias("n_snapshots"),
        F.min("age_days").cast("long").alias("min_age_days"),
        F.max("age_days").cast("long").alias("max_age_days"),
    )


@query(
    "q324_snapshot_diff_decomposition",
    oracle="""
WITH f AS (
  SELECT CAST(sum(CASE WHEN o_orderkey % 89 = 0 AND o_orderkey % 131 <> 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
         CAST(sum(CASE WHEN o_orderkey % 131 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed,
         CAST(sum(CASE WHEN o_orderkey % 97 = 0 AND o_orderkey % 131 <> 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
         CAST(sum(CASE WHEN o_orderkey % 131 <> 0 AND o_orderkey % 97 <> 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
         CAST(count(*) AS BIGINT) AS n_total
  FROM orders
)
SELECT 'added' AS change_type, n_added AS n_rows,
       round(n_added / CAST(n_total AS DOUBLE), 6) AS share FROM f
UNION ALL SELECT 'removed', n_removed, round(n_removed / CAST(n_total AS DOUBLE), 6) FROM f
UNION ALL SELECT 'changed', n_changed, round(n_changed / CAST(n_total AS DOUBLE), 6) FROM f
UNION ALL SELECT 'unchanged', n_unchanged, round(n_unchanged / CAST(n_total AS DOUBLE), 6) FROM f
""",
)
def q324_snapshot_diff_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff CDC decomposition (the planning twin of
    ``maintenance.diff_snapshots(key_cols=)``): against a snapshot of
    orders, a synthetic writer inserts cohort C (key % 89, re-keyed),
    deletes cohort A (key % 131) and updates cohort B (key % 97, net of
    deletes) — the diff splits every key into added / removed / changed /
    unchanged with its share of the table, exactly the four numbers a
    re-merge or restore plan is priced on.  One map-side-combined
    aggregate over a single key-column scan; the four-row frame is
    driver-shaped from one collected row."""
    o = t(spark, sf_dir, "orders", columns=["o_orderkey"])
    k = F.col("o_orderkey")
    row = o.agg(
        F.sum(((k % 89 == 0) & (k % 131 != 0)).cast("long")).alias("n_added"),
        F.sum((k % 131 == 0).cast("long")).alias("n_removed"),
        F.sum(((k % 97 == 0) & (k % 131 != 0)).cast("long")).alias("n_changed"),
        F.sum(((k % 131 != 0) & (k % 97 != 0)).cast("long")).alias("n_unchanged"),
        F.count(F.lit(1)).alias("n_total"),
    ).first()
    total = float(row["n_total"]) if row["n_total"] else float("nan")
    data = [
        (ct, int(row[f"n_{ct}"]), round(int(row[f"n_{ct}"]) / total, 6))
        for ct in ("added", "removed", "changed", "unchanged")
    ]
    return spark.createDataFrame(
        data, "change_type string, n_rows long, share double"
    )


@query(
    "q325_maintenance_gate",
    oracle=f"""
WITH files AS (
  SELECT l_returnflag,
         year(l_shipdate) * 12 + month(l_shipdate) AS file_month,
         CAST(count(*) * {_BYTES_PER_ROW} AS BIGINT) AS bytes
  FROM lineitem GROUP BY 1, 2
),
roi AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(CASE WHEN bytes < {_COMPACT_TARGET} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_small,
         CAST(CASE WHEN sum(CASE WHEN bytes < {_COMPACT_TARGET} THEN bytes ELSE 0 END) = 0
                   THEN 0
                   ELSE (sum(CASE WHEN bytes < {_COMPACT_TARGET} THEN bytes ELSE 0 END)
                         + {_COMPACT_TARGET} - 1) // {_COMPACT_TARGET} END AS BIGINT)
           AS est_files_after
  FROM files GROUP BY l_returnflag
)
SELECT l_returnflag,
       round(n_small / CAST(n_files AS DOUBLE), 6) AS small_file_fraction,
       CAST(n_small - est_files_after AS BIGINT) AS files_removed,
       (n_small / CAST(n_files AS DOUBLE) >= 0.5
        AND n_small - est_files_after >= 1) AS run_compaction,
       CASE WHEN n_small / CAST(n_files AS DOUBLE) < 0.5
              THEN 'small-file fraction below gate'
            WHEN n_small - est_files_after < 1
              THEN 'no task reduction'
            ELSE 'ok' END AS reason
FROM roi
""",
)
def q325_maintenance_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The autopilot's compaction GATE (the decision twin of
    ``operators/maintain.maintain_table``, as q308 is its ROI input):
    per candidate table (returnflag cohort over the synthetic
    ship-month file manifest), the two policy thresholds the pass
    evaluates before paying a rewrite — small-file fraction >= 0.5 AND
    estimated task reduction >= 1 — with the run/skip verdict and the
    exact skip reason the report records.  Same integer-exact byte
    lattice as q308; one metadata-grain groupBy, nothing row-scale."""
    li = t(spark, sf_dir, "lineitem", columns=["l_returnflag", "l_shipdate"])
    files = li.groupBy(
        "l_returnflag",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("file_month"),
    ).agg((F.count(F.lit(1)) * _BYTES_PER_ROW).alias("bytes"))
    small = F.when(F.col("bytes") < _COMPACT_TARGET, 1).otherwise(0)
    small_bytes = F.when(F.col("bytes") < _COMPACT_TARGET, F.col("bytes")).otherwise(0)
    roi = files.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(small).cast("long").alias("n_small"),
        F.sum(small_bytes).cast("long").alias("small_bytes"),
    ).withColumn(
        "est_files_after",
        F.when(F.col("small_bytes") == 0, F.lit(0)).otherwise(
            F.expr(f"(small_bytes + {_COMPACT_TARGET} - 1) div {_COMPACT_TARGET}")
        ).cast("long"),
    )
    frac = F.col("n_small") / F.col("n_files").cast("double")
    removed = (F.col("n_small") - F.col("est_files_after")).cast("long")
    return roi.select(
        "l_returnflag",
        F.round(frac, 6).alias("small_file_fraction"),
        removed.alias("files_removed"),
        ((frac >= 0.5) & (removed >= 1)).alias("run_compaction"),
        F.when(frac < 0.5, F.lit("small-file fraction below gate"))
        .when(removed < 1, F.lit("no task reduction"))
        .otherwise(F.lit("ok"))
        .alias("reason"),
    )
