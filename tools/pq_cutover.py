"""IVF vs IVF-PQ probe cutover experiment (r11 verdict #1).

The question: is there a tier where the PQ/ADC probe beats the plain IVF
probe, and if not, WHY — so the advisor can encode the answer instead of
letting a user pick the losing path.

Method: the same serving corpus at two dimensions — the native 64-dim
embeddings and a deterministic 512-dim expansion (each subvector is a
seeded elementwise reweighting of the base vector, so vectors stay
non-degenerate and recall math is unchanged).  For each dim: build the
cell-partitioned IVF index, attach PQ codes, then time probe_ivf_index
vs probe_ivf_pq (arrow scoring, static cell pruning, 9-run median) and
measure recall@10 of both against GEMM brute force.  Also recorded: raw
index bytes vs code bytes (the I/O the ADC first pass is supposed to
save) and the stage anatomy that explains the result.

Run:  python tools/pq_cutover.py [factor] [> JSON]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(df, runs: int = 9) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.monotonic() - t0)
    return round(statistics.median(samples), 4)


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(dirpath, f))
            for f in files
            if not f.startswith(("_", "."))
        )
    return total


def main(factor: int = 500) -> dict:
    from pyspark.sql import functions as F

    from bigquack_spark.operators import simsearch as S
    from bigquack_spark.session import get_spark

    spark = get_spark()
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n_base = base.count()
    # replicate factor x under fresh ids (same construction as bench.py's
    # serving tier, Spark-side so the 512-dim expansion stays distributed)
    # repartition BEFORE any cache/fit: the replicate crossJoin inherits the
    # single-file base's partitioning, and a 1-partition multi-GB corpus
    # serializes every downstream pass
    corpus64 = (
        base.crossJoin(spark.range(factor).withColumnRenamed("id", "rep"))
        .select(
            (F.col("vec_id") + F.col("rep") * n_base).alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        .repartition(32, "vec_id")
    )
    # deterministic 512-dim expansion: 8 reweighted copies of the base
    # vector (weights fixed, non-zero, distinct per copy)
    weights = [1.0, -0.7, 0.45, 1.3, -1.1, 0.85, -0.6, 1.05]
    corpus512 = corpus64.select(
        "vec_id",
        F.flatten(
            F.array(
                *[
                    F.transform(F.col("embedding"), lambda x, w=w: x * F.lit(w))
                    for w in weights
                ]
            )
        ).alias("embedding"),
    )

    out: dict = {"factor": factor, "n_corpus": n_base * factor, "tiers": {}}
    for dim, corpus in ((64, corpus64), (512, corpus512)):
        root = tempfile.mkdtemp(prefix=f"pq_cutover_d{dim}_")
        try:
            corpus = corpus.cache()
            corpus.count()
            qrows = [
                (r["vec_id"], [float(x) for x in r["embedding"]])
                for r in corpus.filter(F.col("vec_id") < 5).collect()
            ]
            queries = spark.createDataFrame(
                qrows, "vec_id long, embedding array<double>"
            )
            n_lists, n_probes, k = 256, 4, 10
            train_n = n_lists * 100
            t0 = time.monotonic()
            S.build_ivf_index(
                corpus, root, n_lists=n_lists, train_sample=train_n
            )
            build_s = round(time.monotonic() - t0, 2)
            t0 = time.monotonic()
            pq_meta = S.add_pq_to_ivf_index(
                spark, root, m=8, k_codes=16, train_sample=train_n,
                arrow_encode=True,
            )
            pq_s = round(time.monotonic() - t0, 2)
            corpus.unpersist()

            gemm = S.gemm_topk(
                corpus, queries, k=k, id_col="vec_id", vec_col="embedding"
            )
            t0 = time.monotonic()
            ivf = S.probe_ivf_index(
                spark, root, queries, k=k, n_probes=n_probes,
                arrow_scoring=True, collect_cells=True,
            )
            ivf_resolve = round(time.monotonic() - t0, 4)
            t0 = time.monotonic()
            pq = S.probe_ivf_pq(
                spark, root, queries, k=k, n_probes=n_probes, rerank=64,
                arrow_scoring=True, collect_cells=True,
            )
            pq_resolve = round(time.monotonic() - t0, 4)

            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            try:
                t_ivf = _timed(ivf)
                t_pq = _timed(pq)
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev)

            gt: dict = {}
            for r in gemm.collect():
                gt.setdefault(r.qid, set()).add(r.neighbor_id)

            def recall(df) -> float:
                ids: dict = {}
                for r in df.collect():
                    ids.setdefault(r.qid, set()).add(r.neighbor_id)
                return round(
                    sum(
                        len(ids.get(q, set()) & g) / len(g)
                        for q, g in gt.items()
                    )
                    / len(gt),
                    4,
                )

            idx_root = S._resolve_index_root(root)
            out["tiers"][f"dim{dim}"] = {
                "dim": dim,
                "raw_index_bytes": _dir_bytes(os.path.join(idx_root, "index")),
                "pq_code_bytes": _dir_bytes(os.path.join(idx_root, "pq_codes")),
                "build_sec": build_s,
                "pq_encode_sec": pq_s,
                "pq_meta": pq_meta,
                "ivf_probe_sec": t_ivf,
                "ivf_resolve_sec": ivf_resolve,
                "ivf_pq_probe_sec": t_pq,
                "ivf_pq_resolve_sec": pq_resolve,
                "ivf_recall_at_10": recall(ivf),
                "ivf_pq_recall_at_10": recall(pq),
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return out


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    print(json.dumps(main(factor), indent=1))
