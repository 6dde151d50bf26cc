"""Property-based tests (hypothesis) for the join-shaped operators: the
as-of join and the bucketed range join are checked against brute-force
pandas references on randomized small inputs — the class of boundary bugs
(equal timestamps, empty keys, duplicate right rows, negative values)
fixture-based tests under-sample.  Mirrors the reference's golden-test
philosophy (duck_test.go) extended with generative coverage."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigquack_spark.operators.joins import asof_join, bloom_semi_join, range_join_buckets

KEYS = st.integers(min_value=0, max_value=2)
TS = st.integers(min_value=0, max_value=30)
VAL = st.integers(min_value=-5, max_value=5)

left_rows = st.lists(st.tuples(KEYS, TS), min_size=1, max_size=12)
right_rows = st.lists(st.tuples(KEYS, TS, VAL), min_size=0, max_size=12)


def _brute_asof(left, right, direction):
    out = []
    for k, lts in left:
        cands = [
            (rts, v) for (rk, rts, v) in right
            if rk == k and (rts <= lts if direction == "backward" else rts >= lts)
        ]
        if not cands:
            out.append((k, lts, None))
            continue
        # matches operator: max ts (backward) / min ts (forward); among
        # equal-ts rows the greatest tiebreak value is carried
        if direction == "backward":
            best_ts = max(ts for ts, _ in cands)
        else:
            best_ts = min(ts for ts, _ in cands)
        best_v = max(v for ts, v in cands if ts == best_ts)
        out.append((k, lts, best_v))
    return sorted(out, key=lambda r: (r[0], r[1], r[2] is None, r[2]))


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=left_rows, right=right_rows, direction=st.sampled_from(["backward", "forward"]))
def test_asof_join_matches_bruteforce(spark, left, right, direction):
    ldf = spark.createDataFrame(left, "k int, lts int")
    rdf = spark.createDataFrame(right, "k int, rts int, v int") if right else (
        spark.createDataFrame([], "k int, rts int, v int")
    )
    got = asof_join(
        ldf, rdf, on="k", left_ts="lts", right_ts="rts",
        right_cols=["v"], direction=direction, right_tiebreak="v",
    )
    got_rows = sorted(
        ((r.k, r.lts, r.v) for r in got.collect()),
        key=lambda r: (r[0], r[1], r[2] is None, r[2]),
    )
    assert got_rows == _brute_asof(left, right, direction)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(st.tuples(KEYS, st.integers(0, 50)), min_size=1, max_size=10),
    right=st.lists(st.tuples(KEYS, st.integers(0, 50)), min_size=0, max_size=10),
    maxd=st.integers(min_value=1, max_value=10),
)
def test_range_join_matches_bruteforce(spark, left, right, maxd):
    ldf = spark.createDataFrame(left, "k int, lv int")
    rdf = spark.createDataFrame(right, "k int, rv int") if right else (
        spark.createDataFrame([], "k int, rv int")
    )
    got = range_join_buckets(ldf, rdf, on="k", left_val="lv", right_val="rv", max_distance=maxd)
    got_rows = sorted((r.k, r.lv, r.rv) for r in got.collect())
    want = sorted(
        (k, lv, rv)
        for (k, lv) in left
        for (rk, rv) in right
        if rk == k and abs(lv - rv) <= maxd
    )
    assert got_rows == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    big=st.lists(st.integers(0, 40), min_size=1, max_size=25),
    keys=st.lists(st.integers(0, 40), min_size=0, max_size=10),
)
def test_bloom_semi_join_matches_bruteforce(spark, big, keys):
    bdf = spark.createDataFrame([(x,) for x in big], "k bigint")
    kdf = spark.createDataFrame([(x,) for x in keys], "ok bigint") if keys else (
        spark.createDataFrame([], "ok bigint")
    )
    got = sorted(r.k for r in bloom_semi_join(bdf, "k", kdf, "ok", num_bits=1 << 12).collect())
    want = sorted(x for x in big if x in set(keys))
    assert got == want


def _brute_asof_tol(left, right, direction, tol):
    out = []
    for k, lts in left:
        cands = [
            (rts, v) for (rk, rts, v) in right
            if rk == k
            and (rts <= lts if direction == "backward" else rts >= lts)
            and abs(lts - rts) <= tol
        ]
        if not cands:
            out.append((k, lts, None))
            continue
        best_ts = max(ts for ts, _ in cands) if direction == "backward" else min(
            ts for ts, _ in cands
        )
        best_v = max(v for ts, v in cands if ts == best_ts)
        out.append((k, lts, best_v))
    return sorted(out, key=lambda r: (r[0], r[1], r[2] is None, r[2]))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=left_rows,
    right=right_rows,
    direction=st.sampled_from(["backward", "forward"]),
    tol=st.integers(min_value=0, max_value=8),
)
def test_asof_join_tolerance_matches_bruteforce(spark, left, right, direction, tol):
    ldf = spark.createDataFrame(left, "k int, lts int")
    rdf = spark.createDataFrame(right, "k int, rts int, v int") if right else (
        spark.createDataFrame([], "k int, rts int, v int")
    )
    got = asof_join(
        ldf, rdf, on="k", left_ts="lts", right_ts="rts",
        right_cols=["v"], direction=direction, right_tiebreak="v", tolerance=tol,
    )
    got_rows = sorted(
        ((r.k, r.lts, r.v) for r in got.collect()),
        key=lambda r: (r[0], r[1], r[2] is None, r[2]),
    )
    assert got_rows == _brute_asof_tol(left, right, direction, tol)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    big=st.lists(st.integers(0, 40), min_size=1, max_size=25),
    keys=st.lists(st.integers(0, 40), min_size=1, max_size=10),
)
def test_bloom_semi_join_exact_under_fp_pressure(spark, big, keys):
    """With a deliberately tiny bitmap (64 bits for up to 10 keys x 5
    probes) the bloom filter passes many false positives — the trailing
    exact semi join must still make the result identical to the plain
    semi join.  This pins the operator's correctness-vs-pruning split:
    the bitmap is ONLY an optimization."""
    bdf = spark.createDataFrame([(x,) for x in big], "k bigint")
    kdf = spark.createDataFrame([(x,) for x in keys], "ok bigint")
    got = sorted(r.k for r in bloom_semi_join(bdf, "k", kdf, "ok", num_bits=64).collect())
    want = sorted(x for x in big if x in set(keys))
    assert got == want


orders_rows = st.lists(
    st.tuples(st.integers(0, 20), st.sampled_from(["1-URGENT", "2-HIGH", "3-LOW"])),
    min_size=0, max_size=15,
)
lines_rows = st.lists(
    st.tuples(st.integers(0, 20), st.integers(1, 4), st.integers(-50, 200)),
    min_size=0, max_size=20,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(orders=orders_rows, lines=lines_rows, omod=st.integers(1, 9), lmod=st.integers(1, 9))
def test_join_ivm_decomposition_matches_full_recompute(spark, orders, lines, omod, lmod):
    """q250's bilinear decomposition, property-tested: for ANY split of
    orders and lineitems into old/delta (including empty sides and
    misaligned splits), view_old + the three delta-term partials merged
    algebraically must equal the full join aggregate."""
    from bigquack_spark.operators.ivm import merge_agg_partials

    o_dedup = list({k: (k, p) for k, p in orders}.values())
    o = spark.createDataFrame(o_dedup, schema="okey long, prio string")
    li = spark.createDataFrame(lines, schema="lkey long, ln long, cents long")
    o_old = o.filter(F.col("okey") % 10 < omod)
    o_new = o.filter(F.col("okey") % 10 >= omod)
    l_split = (F.col("lkey") + F.col("ln")) % 10 < lmod
    l_old, l_new = li.filter(l_split), li.filter(~l_split)

    def partial(od, ld):
        return (
            ld.join(od, F.col("lkey") == F.col("okey"))
            .groupBy("prio")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("cents").cast("long").alias("c"))
        )

    merged = merge_agg_partials(
        [partial(o_old, l_old), partial(o_new, l_old),
         partial(o_old, l_new), partial(o_new, l_new)],
        keys=["prio"], spec={"n": "count", "c": "sum"},
    )
    got = sorted((r.prio, r.n, r.c) for r in merged.collect())
    want = sorted((r.prio, r.n, r.c) for r in partial(o, li).collect())
    assert got == want


TOKENS = st.integers(min_value=0, max_value=500)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    a_toks=st.lists(TOKENS, min_size=0, max_size=30),
    b_toks=st.lists(TOKENS, min_size=0, max_size=30),
    run=st.lists(TOKENS, min_size=7, max_size=15),  # >= k+w-1 = 7
    a_pos=st.integers(0, 30),
    b_pos=st.integers(0, 30),
)
def test_winnowing_guarantee_shared_run_shares_fingerprint(
    spark, a_toks, b_toks, run, a_pos, b_pos
):
    """Schleimer et al.'s winnowing guarantee, property-tested on the
    actual operator: ANY two documents sharing a token run of length
    >= k+w-1 (= 7 at the current constants) MUST share at least one
    winnowed fingerprint, wherever the run sits in either document."""
    from bigquack_spark.operators.text import winnow_fingerprints

    a_pos = min(a_pos, len(a_toks))
    b_pos = min(b_pos, len(b_toks))
    doc_a = " ".join(str(t) for t in a_toks[:a_pos] + run + a_toks[a_pos:])
    doc_b = " ".join(str(t) for t in b_toks[:b_pos] + run + b_toks[b_pos:])
    df = spark.createDataFrame([(1, doc_a), (2, doc_b)], "doc_id long, text string")
    rows = {r.doc_id: set(r.fps) for r in winnow_fingerprints(df).collect()}
    assert rows[1] & rows[2], "shared run >= k+w-1 must share a fingerprint"


def test_training_order_is_per_epoch_permutation(spark):
    """q248 invariants: every epoch contains every document exactly once;
    within each (epoch, shard) positions are a contiguous 0..n-1 range;
    and the two epochs produce genuinely different orders (independent
    seeded shuffles)."""
    from collections import Counter

    from bigquack_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    rows = QUERIES["q248_training_order"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    by_epoch = Counter(r.epoch for r in rows)
    assert set(by_epoch) == {0, 1} and all(v == docs for v in by_epoch.values())
    for e in (0, 1):
        per_doc = Counter(r.doc_id for r in rows if r.epoch == e)
        assert all(v == 1 for v in per_doc.values())  # permutation
    shard_pos = {}
    for r in rows:
        shard_pos.setdefault((r.epoch, r.shard), []).append(r.pos)
    for key, poss in shard_pos.items():
        assert sorted(poss) == list(range(len(poss))), key  # contiguous ranks
    order0 = [r.doc_id for r in sorted(rows, key=lambda r: (r.shard, r.pos)) if r.epoch == 0]
    order1 = [r.doc_id for r in sorted(rows, key=lambda r: (r.shard, r.pos)) if r.epoch == 1]
    assert order0 != order1  # epochs reshuffle independently
