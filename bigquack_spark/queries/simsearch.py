"""Similarity-search query inventory (SURVEY §2.9).

q40 (brute-force top-k) is the oracle-diffed baseline: both engines compute
cosine as an explicit double-precision dot/norm formula over the same cast
arrays, rounded to 6 decimals before ranking so the order is engine-
invariant.  q41 (LSH-bucketed ANN) is the scale path — its hyperplanes are
driver-seeded literals with no DuckDB equivalent, so it is a rows-only check
with recall measured against q40 in tests/test_simsearch.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigquack_spark.operators import simsearch as S
from bigquack_spark.queries.registry import query
from bigquack_spark.sources.parquet import load_table as t

TOP_K = 10
N_QUERY_VECS = 5  # vec_id < 5 is the query set

# One oracle, two physical strategies: q40 (declarative codegen fold) and
# q75 (Arrow-batched GEMM kernel) must both hash-match this exact SQL.
ANN_ORACLE = f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < {N_QUERY_VECS}),
    sims AS (
      SELECT q.qid, v.vec_id AS neighbor_id,
             round(
               list_dot_product(v.e, q.qe)
               / (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(q.qe, q.qe))),
               6
             ) AS cosine_sim
      FROM v CROSS JOIN q
      WHERE v.vec_id <> q.qid
    )
    SELECT qid, neighbor_id, cosine_sim, CAST(rk AS INTEGER) AS rank
    FROM (
      SELECT qid, neighbor_id, cosine_sim,
             row_number() OVER (
               PARTITION BY qid ORDER BY cosine_sim DESC, neighbor_id
             ) AS rk
      FROM sims
    )
    WHERE rk <= {TOP_K}
    """


@query("q40_ann_cosine_topk", oracle=ANN_ORACLE)
def q40_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast query set x corpus scan, JVM fold
    for the dot product, window-ranked per query.  The corpus never
    shuffles — this plan holds at any corpus size (work = corpus x |Q|)."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERY_VECS)
    return S.cosine_topk(e, queries, k=TOP_K, id_col="vec_id", vec_col="embedding")


@query(
    "q41_ann_lsh_topk",
    doc="LSH-bucketed approximate top-k (Spark-only; recall vs q40 in tests)",
)
def q41_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: sign-LSH buckets + single-bit multiprobe prune the
    candidate set before ranking.  Seeded-literal hyperplanes are not
    reproducible in DuckDB SQL -> rows-only driver check; recall@10 vs the
    brute-force baseline is asserted in tests."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERY_VECS)
    return S.lsh_topk(
        e, queries, k=TOP_K, id_col="vec_id", vec_col="embedding",
        num_planes=4, seed=42, dim=64, multiprobe_bits=2,
    )


@query(
    "q42_ann_ivf_topk",
    doc="IVF (KMeans coarse-quantizer) approximate top-k (Spark-only; recall vs q40 in tests)",
)
def q42_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: seeded MLlib KMeans partitions the corpus into inverted
    lists; queries probe their 2 nearest cells.  Iterative training has no
    DuckDB equivalent -> rows-only driver check; recall@10 vs brute force
    asserted in tests."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERY_VECS)
    return S.ivf_topk(
        e, queries, k=TOP_K, id_col="vec_id", vec_col="embedding",
        n_lists=8, n_probes=2, seed=42,
    )


@query("q75_ann_gemm_topk", oracle=ANN_ORACLE)
def q75_ann_gemm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k, GEMM kernel: identical semantics and oracle
    as q40, but the corpus is scored batch-at-a-time with one dense numpy
    matrix multiply inside mapInPandas and each batch pre-reduces to its
    local top-k, so the only shuffled rows are #batches x |Q| x k.  The
    bench headline uses this variant; q40 remains the all-codegen twin."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERY_VECS)
    return S.gemm_topk(e, queries, k=TOP_K, id_col="vec_id", vec_col="embedding")


@query(
    "q121_int8_quantization",
    oracle="""
    WITH q AS (
      SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) / 127.0 AS q_scale
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    )
    SELECT vec_id, q_scale,
           CASE WHEN q_scale > 0
                THEN list_transform(e, x -> CAST(floor(x / q_scale + 0.5) AS INTEGER))
                ELSE list_transform(e, x -> 0) END AS q_vec,
           CASE WHEN q_scale > 0
                THEN list_max(list_transform(e,
                       x -> abs(CAST(floor(x / q_scale + 0.5) AS INTEGER) * q_scale - x)))
                     <= q_scale * 0.5
                ELSE true END AS err_ok
    FROM q
    """,
)
def q121_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (operators.simsearch
    quantize_int8): per-vector scale = max|x|/127, components rounded
    half-up via floor (floor over identical doubles is engine-portable
    where round()'s tie rule is not), plus a per-vector bound check that
    the reconstruction error stays within scale/2.  Zero-shuffle
    projection; at 100 TB this is the 4x scan-bandwidth/cache cut the ANN
    family rides.  Both engines evaluate the identical IEEE expressions,
    so the int arrays, scales, AND boundary booleans agree bitwise."""
    e = t(spark, sf_dir, "embeddings", rebalance=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    q = S.quantize_int8(e, vec_col="e", scale_col="q_scale", out_col="q_vec")
    scale = F.col("q_scale")
    err = F.array_max(
        F.zip_with(
            "q_vec", "e", lambda qi, xi: F.abs(qi.cast("double") * scale - xi)
        )
    )
    return q.select(
        "vec_id",
        "q_scale",
        "q_vec",
        F.when(scale > 0, err <= scale * 0.5).otherwise(F.lit(True)).alias("err_ok"),
    )


@query(
    "q136_embedding_quality",
    oracle="""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    m AS (
      SELECT vec_id, label,
             CAST(len(e) AS INTEGER) AS dim,
             round(sqrt(list_dot_product(e, e)), 6) AS l2_norm,
             len(list_filter(e, x -> isnan(x))) > 0 AS has_nan
      FROM v
    )
    SELECT vec_id, label, dim, l2_norm, has_nan,
           (NOT has_nan AND dim = 64 AND l2_norm > 0.1 AND l2_norm < 10.0) AS vector_ok
    FROM m
    """,
)
def q136_embedding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding data-quality gate — the hygiene pass that runs BEFORE any
    ANN/near-dup consumer: per-vector dimension check, L2 norm (rounded to
    the same 6 digits the ANN family ranks on), NaN detection, and a
    composite vector_ok verdict (a zero or NaN vector silently poisons
    cosine ranking; a wrong-dim vector crashes a GEMM batch mid-job at
    3 a.m. instead of here).  Pure per-row projection over the scan — zero
    shuffle, linear at any corpus size; the same left-to-right double fold
    as cosine_topk, so the norms are bit-identical cross-engine before
    rounding."""
    e = t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    dot = F.aggregate(
        F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    m = e.select(
        "vec_id",
        "label",
        F.size(v).cast("int").alias("dim"),
        F.round(F.sqrt(dot), 6).alias("l2_norm"),
        F.exists(v, lambda x: F.isnan(x)).alias("has_nan"),
    )
    ok = (
        ~F.col("has_nan")
        & (F.col("dim") == 64)
        & (F.col("l2_norm") > 0.1)
        & (F.col("l2_norm") < 10.0)
    )
    return m.withColumn("vector_ok", ok)


HARDNEG_LO, HARDNEG_HI = 0.15, 0.4  # similar-but-not-duplicate cosine band
HARDNEG_K = 2


@query(
    "q179_hard_negatives",
    oracle=None,  # filled below to reuse dedup's plane SQL without an import cycle
)
def q179_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor vector,
    the top-{HARDNEG_K} bucket-mates whose cosine lands in the
    similar-but-not-duplicate band [{HARDNEG_LO}, {HARDNEG_HI}) — above
    it is q172's dedup territory, far below it the negative is trivial
    and teaches the model nothing.  Candidates come from the SAME seeded
    sign-LSH buckets as q35/q172 (one bucket-keyed self-join, bounded by
    bucket occupancy — never corpus x corpus), ranked by (cosine desc,
    neg_id) per anchor with a window over the anchor key.  Cosines are
    rounded to 6 decimals BEFORE ranking so the order is engine-
    invariant; the oracle replays plane literals, band, and ranking
    exactly.  At 100 TB this inherits q172's posture: bucket caps,
    per-anchor output bounded at k rows."""
    from pyspark.sql.window import Window

    from bigquack_spark.operators.simsearch import cosine, random_hyperplane_lsh

    e = t(spark, sf_dir, "embeddings")
    v = random_hyperplane_lsh(
        e, vec_col="embedding", num_planes=2, seed=42, bucket_col="bkt"
    ).select("vec_id", "bkt", F.col("embedding").cast("array<double>").alias("v"))
    a = v.select(F.col("vec_id").alias("anchor"), "bkt", F.col("v").alias("va"))
    b = v.select(F.col("vec_id").alias("neg_id"), "bkt", F.col("v").alias("vb"))
    sims = (
        a.join(b, "bkt")
        .filter(F.col("anchor") != F.col("neg_id"))
        .select(
            "anchor", "neg_id",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .filter((F.col("cos") >= HARDNEG_LO) & (F.col("cos") < HARDNEG_HI))
    )
    w = Window.partitionBy("anchor").orderBy(F.desc("cos"), "neg_id")
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= HARDNEG_K)
        .select("anchor", "neg_id", "cos", F.col("rnk").cast("int").alias("rnk"))
    )


def _install_q179_oracle() -> None:
    from bigquack_spark.queries import dedup as _dq
    from bigquack_spark.queries.registry import QUERIES, QuerySpec

    plane = _dq._q35_plane_sql(2, 64, 42)
    sql = f"""
    WITH v AS (
      SELECT vec_id, e, {plane} AS bkt
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    ),
    sims AS (
      SELECT a.vec_id AS anchor, b.vec_id AS neg_id,
             round(
               list_dot_product(a.e, b.e)
               / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
               6
             ) AS cos
      FROM v a JOIN v b ON a.bkt = b.bkt AND a.vec_id <> b.vec_id
    ),
    banded AS (
      SELECT *, row_number() OVER (PARTITION BY anchor ORDER BY cos DESC, neg_id) AS rnk
      FROM sims WHERE cos >= {HARDNEG_LO} AND cos < {HARDNEG_HI}
    )
    SELECT anchor, neg_id, cos, CAST(rnk AS INTEGER) AS rnk
    FROM banded WHERE rnk <= {HARDNEG_K}
    """
    spec = QUERIES["q179_hard_negatives"]
    QUERIES["q179_hard_negatives"] = QuerySpec(
        name=spec.name, fn=spec.fn, oracle=sql, doc=spec.doc
    )


_install_q179_oracle()


@query(
    "q198_contrastive_pairs",
    oracle=None,  # installed below (shares the seeded-plane SQL)
)
def q198_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair manifest: one table of (anchor, other,
    label, score) where label 1 = near-duplicate positives (cosine >=
    {0.4}, q35's blocked pairs) and label 0 = hard negatives (q179's
    similar-not-duplicate band, top-{2} per anchor) — the
    ready-to-sample input for embedding-model fine-tuning, emitted by
    the SAME bucket-bounded candidate join computed once.  Balance
    accounting rides along (the trainer needs the ratio).  The oracle
    replays both branches from one shared CTE."""
    from pyspark.sql.window import Window

    from bigquack_spark.operators.simsearch import cosine, random_hyperplane_lsh

    e = t(spark, sf_dir, "embeddings")
    v = random_hyperplane_lsh(
        e, vec_col="embedding", num_planes=2, seed=42, bucket_col="bkt"
    ).select("vec_id", "bkt", F.col("embedding").cast("array<double>").alias("v"))
    a = v.select(F.col("vec_id").alias("anchor"), "bkt", F.col("v").alias("va"))
    b = v.select(F.col("vec_id").alias("other"), "bkt", F.col("v").alias("vb"))
    sims = (
        a.join(b, "bkt")
        .filter(F.col("anchor") != F.col("other"))
        .select("anchor", "other", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
    )
    pos = sims.filter((F.col("cos") >= 0.4) & (F.col("anchor") < F.col("other"))).select(
        "anchor", "other", F.lit(1).alias("label"), F.col("cos").alias("score")
    )
    w = Window.partitionBy("anchor").orderBy(F.desc("cos"), "other")
    neg = (
        sims.filter((F.col("cos") >= HARDNEG_LO) & (F.col("cos") < HARDNEG_HI))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= HARDNEG_K)
        .select("anchor", "other", F.lit(0).alias("label"), F.col("cos").alias("score"))
    )
    return pos.unionByName(neg)


def _install_q198_oracle() -> None:
    from bigquack_spark.queries import dedup as _dq
    from bigquack_spark.queries.registry import QUERIES, QuerySpec

    plane = _dq._q35_plane_sql(2, 64, 42)
    sql = f"""
    WITH v AS (
      SELECT vec_id, e, {plane} AS bkt
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    ),
    sims AS (
      SELECT a.vec_id AS anchor, b.vec_id AS other,
             round(
               list_dot_product(a.e, b.e)
               / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
               6
             ) AS cos
      FROM v a JOIN v b ON a.bkt = b.bkt AND a.vec_id <> b.vec_id
    )
    SELECT anchor, other, 1 AS label, cos AS score
    FROM sims WHERE cos >= 0.4 AND anchor < other
    UNION ALL
    SELECT anchor, other, 0, cos FROM (
      SELECT *, row_number() OVER (PARTITION BY anchor ORDER BY cos DESC, other) AS rnk
      FROM sims WHERE cos >= {HARDNEG_LO} AND cos < {HARDNEG_HI}
    ) WHERE rnk <= {HARDNEG_K}
    """
    spec = QUERIES["q198_contrastive_pairs"]
    QUERIES["q198_contrastive_pairs"] = QuerySpec(
        name=spec.name, fn=spec.fn, oracle=sql, doc=spec.doc
    )


_install_q198_oracle()
