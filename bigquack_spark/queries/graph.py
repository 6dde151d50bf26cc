"""Graph-analytics query inventory: PageRank over the event-transition
graph (operators.graph) — link analysis as a first-class corpus tool.

The edge list here (event-type transition counts) is small, but the
operator is the generic distributed edge-list form: the same call ranks a
billion-node document KNN graph; see operators/graph.py for the per-
iteration shuffle budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigquack_spark.operators.graph import pagerank, pagerank_oracle_sql
from bigquack_spark.queries.registry import query
from bigquack_spark.sources.parquet import load_table as t

ITERS = 3
DAMPING = 0.85

#: Transition edge list: consecutive event types per user, ordered on
#: exact microsecond epochs with event_id as the total-order tiebreak.
_EDGES_CTE = """
      SELECT event_type AS src, next_type AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM (
        SELECT event_type,
               lead(event_type) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS next_type
        FROM events
      )
      WHERE next_type IS NOT NULL
      GROUP BY src, dst
"""


@query(
    "q148_transition_pagerank",
    oracle=f"""
    SELECT node AS event_type, round(rank, 6) AS rank
    FROM ({pagerank_oracle_sql(_EDGES_CTE, iterations=ITERS, damping=DAMPING)})
    ORDER BY rank DESC, event_type
    """,
)
def q148_transition_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the user-journey transition graph: which event types
    accumulate attention mass when users walk click->view->purchase
    chains.  Edge build is one user_id-keyed window (same shuffle q22
    reuses) collapsed to a type x type count matrix; the rank loop is
    operators.graph.pagerank — {ITERS} unrolled iterations, every
    per-node sum an exact 2^40-lattice BIGINT aggregate, so the ranks are
    bit-identical cross-engine and the oracle replays the same math in
    SQL.  Generic at scale: swap the edge CTE for a doc-KNN edge list
    (q140) and the identical plan ranks a billion-document graph —
    per-iteration cost is one keyed shuffle of the edge list."""
    e = t(spark, sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    edges = (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src"), F.col("next_type").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
    ranks = pagerank(edges, iterations=ITERS, damping=DAMPING)
    return ranks.select(
        F.col("node").alias("event_type"), F.round("rank", 6).alias("rank")
    ).orderBy(F.desc("rank"), "event_type")
