"""Distributed graph operators: edge-list PageRank with exact-lattice
accumulation.

The reference has no graph surface; this extends the corpus toolkit the
same way connected components (operators.dedup) does — link analysis over
artifact graphs (doc KNN graphs, event-transition graphs, citation-ish
structures) for corpus weighting and crawl prioritization.

Cross-engine float strategy (shared with queries.clustering): each
iteration's edge contributions are quantized onto a 2^40 integer lattice
before the per-node sum, so the aggregate is an exact, order-free BIGINT
sum and the resulting ranks are bit-identical regardless of partitioning,
executor count, or engine.  An unrolled-SQL oracle can therefore replay
the identical iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 2^40 — rank values are O(1), so lattice units stay far below 2^63 even
#: summed over billions of incoming edges (1e9 * 2^40 * O(1) < 2^63 holds
#: for ranks < 8; normalized PageRank masses are <= 1).
LATTICE = 1099511627776.0


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """Weighted PageRank over an edge list, ``iterations`` unrolled rounds.

    r_{t+1}(v) = (1-d)/N + d * sum_{(u,v) in E} r_t(u) * w(u,v) / W_out(u)

    Dangling-node mass is dropped (the simplified variant) — ranks then
    measure received link mass, which is what corpus-weighting consumers
    want.  Plan shape per iteration: ranks (|V| rows) join edges (|E|
    rows) on src — AQE broadcasts the rank side when |V| is small,
    otherwise both shuffle on the key — then one map-side-combined
    aggregate on dst.  No driver state, no collect: the DAG is static, so
    the whole multi-iteration plan optimizes as one Catalyst tree.  At
    100 TB of edges each iteration is one keyed shuffle of the edge list;
    pre-bucketing edges by src (sinks.partitioned.save_bucketed) makes
    the per-iteration join exchange-free.
    """
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("long").alias("w"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).cast("long").alias("n"))
    outw = e.groupBy("src").agg(F.sum("w").alias("wout"))
    base = F.lit(1.0 - damping) / F.col("n")

    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", "n", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(iterations):
        contrib = (
            e.join(ranks.select(F.col("node").alias("src"), "r"), "src")
            .join(outw, "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(
                    F.lit(damping) * F.col("r") * F.col("w") / F.col("wout") * LATTICE
                    + 0.5
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            ranks.select("node", "n")
            .join(contrib, "node", "left")
            .select(
                "node",
                "n",
                (base + F.coalesce(F.col("s"), F.lit(0)).cast("double") / LATTICE).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank"))


def pagerank_oracle_sql(
    edges_cte: str,
    iterations: int = 3,
    damping: float = 0.85,
) -> str:
    """DuckDB twin of :func:`pagerank`: unrolled iterations over the same
    2^40 lattice.  ``edges_cte`` must be a SELECT yielding
    (src, dst, w BIGINT)."""
    d = repr(float(damping))
    lat = repr(LATTICE)
    sql = f"""
    WITH e AS ({edges_cte}),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
      )
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM e GROUP BY src),
    r0 AS (SELECT node, n, 1.0 / n AS r FROM nodes CROSS JOIN nn)"""
    prev = "r0"
    for it in range(1, iterations + 1):
        sql += f""",
    r{it} AS (
      SELECT p.node, p.n,
             (1.0 - {d}) / p.n
               + CAST(coalesce(c.s, 0) AS DOUBLE) / {lat} AS r
      FROM (SELECT node, n FROM {prev}) AS p
      LEFT JOIN (
        SELECT e.dst AS node,
               sum(CAST(floor({d} * pr.r * e.w / outw.wout * {lat} + 0.5) AS BIGINT)) AS s
        FROM e
        JOIN {prev} AS pr ON e.src = pr.node
        JOIN outw ON e.src = outw.src
        GROUP BY e.dst
      ) AS c ON p.node = c.node
    )"""
        prev = f"r{it}"
    sql += f"""
    SELECT node, r AS rank FROM {prev}
    """
    return sql
