"""Packed-shard writer (sinks/packing.py, r6 verdict #3): deterministic
pack assignment under a token budget, shared audit path with q300, and
exactly-once shard publish through the existing wds/arrow sinks."""

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", "text")
        .filter(F.col("doc_id") < 120)
    )


def _assigned(spark, strategy, budget=64):
    from bigquack_spark.sinks.packing import _with_tokens, assign_packs

    d = _with_tokens(_docs(spark), "text", None)
    return assign_packs(d, budget=budget, group_col="source",
                        id_col="doc_id", strategy=strategy)


def test_ffd_respects_budget_and_covers_every_doc(spark):
    """FFD contract: every doc lands in exactly one pack; no pack exceeds
    the budget unless it is a single oversize document; fill positions are
    dense from 0 within each pack."""
    budget = 64
    a = _assigned(spark, "ffd", budget).collect()
    docs = _docs(spark).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in docs)

    packs = {}
    for r in a:
        packs.setdefault((r.source, r.pack_id), []).append(r)
    for members in packs.values():
        total = sum(r.n_tokens for r in members)
        if total > budget:
            # only an oversize single document may exceed the budget
            assert len(members) == 1 and members[0].n_tokens > budget
        assert sorted(r.pack_pos for r in members) == list(range(len(members)))


def test_ffd_is_deterministic_and_no_worse_than_chunk_pack_count(spark):
    budget = 64
    one = sorted(map(tuple, _assigned(spark, "ffd", budget).collect()))
    two = sorted(map(tuple, _assigned(spark, "ffd", budget).collect()))
    assert one == two

    # FFD pack-count lower bound per source: every oversize doc (> budget)
    # provably sits alone in its own pack, and the remaining tokens need at
    # least ceil(rest / budget) packs
    import math

    by_src = {}
    for r in _assigned(spark, "ffd", budget).collect():
        by_src.setdefault(r.source, []).append(r)
    for rows in by_src.values():
        n_packs = len({r.pack_id for r in rows})
        oversize = [r for r in rows if r.n_tokens > budget]
        rest = sum(r.n_tokens for r in rows) - sum(r.n_tokens for r in oversize)
        assert n_packs >= len(oversize) + math.ceil(rest / budget)


def test_chunk_assignment_matches_q278_math(spark):
    """The chunk strategy is q278's exclusive-running-sum bucketing in
    (tokens desc, id) order — recomputed independently here."""
    a = _assigned(spark, "chunk", 64).collect()
    by_src = {}
    for r in a:
        by_src.setdefault(r.source, []).append(r)
    for rows in by_src.values():
        rows.sort(key=lambda r: (-r.n_tokens, r.doc_id))
        cum = 0
        for r in rows:
            assert r.pack_id == cum // 64
            cum += r.n_tokens


def test_export_packed_shards_wds_roundtrip(spark, tmp_path):
    from bigquack_spark.sinks.packing import PACKING_FILE, export_packed_shards
    from bigquack_spark.sinks.wds import read_webdataset_shards

    path = str(tmp_path / "packed")
    got = export_packed_shards(
        _docs(spark), path, budget=64, strategy="ffd", fmt="wds", n_shards=3
    )
    packing = got["packing"]
    assert packing["budget"] == 64 and packing["strategy"] == "ffd"
    n_packs = sum(g["n_packs"] for g in packing["groups"].values())
    assert got["n_samples"] == n_packs > 0

    back = read_webdataset_shards(spark, path)
    rows = back.collect()
    assert len(rows) == n_packs
    # meta rebuilds boundaries: doc ids cover the input exactly once, and
    # each pack's token sum matches its members
    seen = []
    for r in rows:
        meta = json.loads(r.meta)
        assert meta["budget"] == 64
        assert sum(meta["doc_tokens"]) == meta["pack_tokens"]
        assert len(meta["doc_ids"]) == len(r.text.split("\n")) or len(meta["doc_ids"]) == 1
        seen += meta["doc_ids"]
    assert sorted(seen) == sorted(r.doc_id for r in _docs(spark).collect())

    with open(os.path.join(path, PACKING_FILE)) as fh:
        on_disk = json.load(fh)
    assert on_disk["groups"] == packing["groups"]
    assert os.path.exists(os.path.join(path, "_LINEAGE.json"))


def test_export_packed_shards_exactly_once_republish(spark, tmp_path):
    """Exactly-once publish: a stale temp from a crashed attempt is swept,
    and a full re-export lands byte-identical shards (idempotent)."""
    from bigquack_spark.sinks.packing import export_packed_shards

    path = str(tmp_path / "packed2")
    first = export_packed_shards(
        _docs(spark), path, budget=64, strategy="ffd", fmt="wds", n_shards=2
    )
    tars = sorted(f for f in os.listdir(path) if f.endswith(".tar"))
    bytes_first = {f: open(os.path.join(path, f), "rb").read() for f in tars}

    # plant a crashed attempt's temp; the re-export must sweep it
    stale = os.path.join(path, "shard-00000.tar.999.tmp")
    open(stale, "wb").write(b"junk")

    second = export_packed_shards(
        _docs(spark), path, budget=64, strategy="ffd", fmt="wds", n_shards=2
    )
    assert not os.path.exists(stale)
    assert second["shards"] == first["shards"]
    assert second["packing"] == first["packing"]
    for f, want in bytes_first.items():
        assert open(os.path.join(path, f), "rb").read() == want


def test_export_packed_shards_arrow_fmt(spark, tmp_path):
    from bigquack_spark.sinks.arrow import read_arrow_shards
    from bigquack_spark.sinks.packing import export_packed_shards

    path = str(tmp_path / "packed3")
    got = export_packed_shards(
        _docs(spark), path, budget=64, strategy="chunk", fmt="arrow", n_shards=2
    )
    n_packs = sum(g["n_packs"] for g in got["packing"]["groups"].values())
    back = read_arrow_shards(spark, path)
    assert back.count() == n_packs == got["n_records"]
    assert set(back.columns) == {"__key__", "text", "meta"}


def test_assign_packs_rejects_bad_inputs(spark):
    from bigquack_spark.sinks.packing import _with_tokens, assign_packs

    d = _with_tokens(_docs(spark), "text", None)
    with pytest.raises(ValueError, match="budget"):
        assign_packs(d, 0, "source", "doc_id")
    with pytest.raises(ValueError, match="strategy"):
        assign_packs(d, 64, "source", "doc_id", strategy="best-fit")


def test_pack_run_priced_on_trained_tokenizer_tokens(spark, tmp_path):
    """r9 (r8 verdict #2, closing leg): the pack sizer runs on counts from
    the TRAINED BPE encoder (encode_bpe_trained) instead of the whitespace
    proxy — budgets audit against real tokenizer symbols, every pack
    within budget, and the exported meta carries the trained counts."""
    import json as _json
    import tarfile

    from bigquack_spark.operators.text import encode_bpe_trained, train_bpe
    from bigquack_spark.sinks.packing import export_packed_shards

    docs = _docs(spark)
    merges = train_bpe(docs, n_merges=12).collect()
    priced = encode_bpe_trained(docs, merges)

    out = str(tmp_path / "trained_packs")
    budget = 600
    rep = export_packed_shards(
        priced, out, token_col="n_bpe_tokens", budget=budget,
        group_col="source", strategy="ffd", fmt="wds", n_shards=2,
    )
    audit = rep["packing"]
    assert audit["strategy"] == "ffd" and audit["budget"] == budget

    # every non-oversize pack is within the trained-token budget, and the
    # meta's doc_tokens are the encoder's counts (not whitespace words)
    want = {r.doc_id: r.n_bpe_tokens for r in priced.collect()}
    seen_docs = []
    for shard in sorted(os.listdir(out)):
        if not shard.endswith(".tar"):
            continue
        with tarfile.open(os.path.join(out, shard)) as tf:
            metas = []
            for m in tf.getmembers():
                if m.name.endswith(".json"):
                    v = _json.load(tf.extractfile(m))
                    metas.append(_json.loads(v) if isinstance(v, str) else v)
        for meta in metas:
            assert meta["budget"] == budget
            if len(meta["doc_ids"]) > 1:
                assert meta["pack_tokens"] <= budget
            for did, tok in zip(meta["doc_ids"], meta["doc_tokens"]):
                assert tok == want[did]
            seen_docs += meta["doc_ids"]
    assert sorted(seen_docs) == sorted(want)  # every doc packed exactly once
