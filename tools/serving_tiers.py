#!/usr/bin/env python
"""r12 verdict #7: finish the serving-path choice.

The driver's r12 run had the GEMM brute-force kernel beating the IVF probe
at the 2M-vector/dim-64 tier (1.34 s vs 1.68 s) while pq_cutover.json shows
the ADC probe winning at dim 512 — so the path choice needs (a) a tier
where each path WINS, measured in one block, and (b) the advisor extended
so the dominated pick is refused at both ends (gemm below the scan-cost
floor, ivf/ivf_pq above it).

This harness measures, per tier (dim 64 corpus at 2M vectors — the bench's
serving tier — and the deterministic dim-512 expansion at 1M vectors from
tools/pq_cutover.py):

- gemm_sec: brute-force mapInArrow GEMM top-k (the q75 kernel)
- ivf_sec / ivf_pq_sec: persisted-index probes (arrow scoring, static cell
  pruning) — 9-run interleaved medians against gemm so window drift hits
  all arms equally
- resolve_sec for each probe, and the r13 literal-probes A/B:
  collect_cells=True (literal re-issued assignment) vs False (runtime DPP)
- recall@10 of every path vs the brute-force ground truth
- the advisor's recommendation for the tier, and whether it names the
  measured winner

Usage: python tools/serving_tiers.py [> serving_tiers.json]
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


def _interleaved(dfs: dict, pairs: int = 9) -> dict:
    """Median per arm of `pairs` interleaved noop runs (r12 protocol)."""
    for df in dfs.values():  # warm every arm once
        df.write.format("noop").mode("overwrite").save()
    samples = {a: [] for a in dfs}
    for _ in range(pairs):
        for a, df in dfs.items():
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            samples[a].append(time.monotonic() - t0)
    return {a: round(statistics.median(s), 4) for a, s in samples.items()}


def main() -> dict:
    from pyspark.sql import functions as F

    from bigquack_spark.operators import simsearch as S
    from bigquack_spark.session import default_parallelism, get_spark, pin

    cpus = default_parallelism()
    spark = get_spark(app_name="serving-tiers", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    pin("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n_base = base.count()

    def corpus_at(factor: int, dim: int):
        c = (
            base.crossJoin(spark.range(factor).withColumnRenamed("id", "rep"))
            .select(
                (F.col("vec_id") + F.col("rep") * n_base).alias("vec_id"),
                F.col("embedding").cast("array<double>").alias("embedding"),
            )
            .repartition(32, "vec_id")
        )
        if dim == 512:
            weights = [1.0, -0.7, 0.45, 1.3, -1.1, 0.85, -0.6, 1.05]
            c = c.select(
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
        return c

    out: dict = {
        "note": (
            "each serving path must win a tier (r12 verdict #7): gemm at the "
            "warm low-dim tier, the ADC probe at the high-dim tier; plus the "
            "r13 literal-probes resolve A/B (collect_cells True vs False)"
        ),
        "cpus": cpus,
        "tiers": {},
    }
    k, n_probes, n_lists = 10, 4, 256
    train_n = n_lists * 100
    for tag, factor, dim in (("dim64_2M", 1000, 64), ("dim512_1M", 500, 512)):
        root = tempfile.mkdtemp(prefix=f"serving_{tag}_")
        try:
            corpus = corpus_at(factor, dim).cache()
            n_corpus = corpus.count()
            qrows = [
                (r["vec_id"], [float(x) for x in r["embedding"]])
                for r in corpus.filter(F.col("vec_id") < 5).collect()
            ]
            queries = spark.createDataFrame(
                qrows, "vec_id long, embedding array<double>"
            )
            t0 = time.monotonic()
            S.build_ivf_index(corpus, root, n_lists=n_lists, train_sample=train_n)
            build_s = round(time.monotonic() - t0, 2)
            t0 = time.monotonic()
            S.add_pq_to_ivf_index(spark, root, m=8, k_codes=16,
                                  train_sample=train_n, arrow_encode=True)
            pq_s = round(time.monotonic() - t0, 2)
            corpus.unpersist()
            # rebuild the un-cached frame for gemm (serving reads storage,
            # not an artificially cached corpus)
            corpus = corpus_at(factor, dim)

            gemm = S.gemm_topk(corpus, queries, k=k, id_col="vec_id",
                               vec_col="embedding")
            t0 = time.monotonic()
            ivf_lit = S.probe_ivf_index(spark, root, queries, k=k,
                                        n_probes=n_probes, arrow_scoring=True,
                                        collect_cells=True)
            ivf_resolve = round(time.monotonic() - t0, 4)
            ivf_dpp = S.probe_ivf_index(spark, root, queries, k=k,
                                        n_probes=n_probes, arrow_scoring=True)
            t0 = time.monotonic()
            pq_lit = S.probe_ivf_pq(spark, root, queries, k=k,
                                    n_probes=n_probes, rerank=64,
                                    arrow_scoring=True, collect_cells=True)
            pq_resolve = round(time.monotonic() - t0, 4)
            pq_dpp = S.probe_ivf_pq(spark, root, queries, k=k,
                                    n_probes=n_probes, rerank=64,
                                    arrow_scoring=True)

            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            try:
                med = _interleaved({
                    "gemm": gemm,
                    "ivf_lit": ivf_lit,
                    "ivf_dpp": ivf_dpp,
                    "ivf_pq_lit": pq_lit,
                    "ivf_pq_dpp": pq_dpp,
                })
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
                    sum(len(ids.get(q, set()) & g) / len(g) for q, g in gt.items())
                    / len(gt), 4,
                )

            advice = S.recommend_probe_path(spark, root, n_probes=n_probes)
            probe_best = min(
                ("ivf", med["ivf_lit"]), ("ivf_pq", med["ivf_pq_lit"]),
                key=lambda kv: kv[1],
            )
            winner = min(
                ("gemm", med["gemm"]), ("ivf", med["ivf_lit"]),
                ("ivf_pq", med["ivf_pq_lit"]), key=lambda kv: kv[1],
            )
            out["tiers"][tag] = {
                "n_corpus": n_corpus,
                "dim": dim,
                "index_build_sec": build_s,
                "pq_encode_sec": pq_s,
                "medians_sec": med,
                "ivf_resolve_sec": ivf_resolve,
                "ivf_pq_resolve_sec": pq_resolve,
                "recall_at_10": {
                    "ivf_lit": recall(ivf_lit),
                    "ivf_dpp": recall(ivf_dpp),
                    "ivf_pq_lit": recall(pq_lit),
                },
                "advice": advice,
                "measured_winner": winner[0],
                "measured_probe_best": probe_best[0],
                "advice_matches_winner": advice["recommendation"] == winner[0],
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return out


if __name__ == "__main__":
    print(json.dumps(main(), indent=1))
