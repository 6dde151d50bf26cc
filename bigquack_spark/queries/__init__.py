"""The declared query inventory.

Every operator claimed done in SURVEY.md §2 has a registry entry: a Spark
callable ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) the
equivalent DuckDB oracle SQL the driver diffs against.  Column names are
aliased identically on both sides — the driver's compare sorts columns by
name before hashing.
"""

from bigquack_spark.queries.registry import QUERIES, QuerySpec, oracle_sql, queries, query  # noqa: F401

# Importing the modules populates the registry.  Registration order matters:
# the driver's per-round correctness run walks the dict in insertion order and
# caps how many queries it checks (~50 per round), so the families that still
# need driver-verified rows go FIRST.  Rounds 1-3 verified 147 distinct names
# (relational; dedup/simsearch/text/corpus; sampling/search/clustering/graph/
# sketch/analytics/quality).  The rebuild below is self-maintaining: it reads
# every CORRECTNESS_r*.json at import time and rotates driver-green names to
# the back, so each round's window covers whatever has never been checked.
# Round 4 pins the 31-query events family to the very front of the window.
from bigquack_spark.queries import sampling  # noqa: E402,F401
from bigquack_spark.queries import search  # noqa: E402,F401
from bigquack_spark.queries import clustering  # noqa: E402,F401
from bigquack_spark.queries import graph  # noqa: E402,F401
from bigquack_spark.queries import sketch  # noqa: E402,F401
from bigquack_spark.queries import analytics  # noqa: E402,F401
from bigquack_spark.queries import quality  # noqa: E402,F401
from bigquack_spark.queries import events  # noqa: E402,F401
from bigquack_spark.queries import corpus  # noqa: E402,F401
from bigquack_spark.queries import text  # noqa: E402,F401
from bigquack_spark.queries import dedup  # noqa: E402,F401
from bigquack_spark.queries import simsearch  # noqa: E402,F401
from bigquack_spark.queries import relational  # noqa: E402,F401

# Module imports cascade (graph pulls in dedup, etc.), so insertion order
# alone can't express the window priority.  Rebuild the dict explicitly:
# (1) the round-3 fixes, (2) every query with no driver row yet (kept in
# registration order, which groups families), (3) the already-driver-
# verified names.  The verified set is SELF-MAINTAINING: on top of the
# static r01/r02 seed below, every CORRECTNESS_r*.json the driver has
# written is read at import time and its hash-matched names are pushed to
# the back — each round's window automatically rotates to whatever has
# never been driver-checked, with no manual reorder.


def _driver_rounds_from_disk() -> tuple[dict[str, int], dict[str, int]]:
    """(hash_rounds, rowsonly_rounds): name -> LATEST round with that kind of
    green driver row, read from every CORRECTNESS_r*.json at import time.
    The two kinds are kept apart because a rows-only ``no_oracle`` row only
    retires a name that is rows-only BY DESIGN: a name that has an oracle
    registered today but whose best driver row is ``no_oracle`` (its oracle
    landed after the driver last saw it — q41/q42/q214 after round 10) must
    re-enter the debt window until a hash-green row exists (r10 verdict #1)."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    hash_rounds: dict[str, int] = {}
    rowsonly_rounds: dict[str, int] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnum = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
            for name, row in rows.items():
                if not isinstance(row, dict):
                    continue
                if row.get("hash_match") is True:
                    hash_rounds[name] = max(hash_rounds.get(name, 0), rnum)
                elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                    rowsonly_rounds[name] = max(rowsonly_rounds.get(name, 0), rnum)
        except (OSError, ValueError):
            continue  # a malformed record must never break the import
    return hash_rounds, rowsonly_rounds

#: Names with green driver rows in CORRECTNESS_r01.json / r02 — they go to
#: the BACK of the window so never-checked families get their turn.
_DRIVER_VERIFIED = {
    # round 1 (relational families)
    "q01_pricing_summary", "q02_supplier_pushdown", "q03_shipping_priority",
    "q04_order_priority", "q05_region_revenue", "q06_revenue_delta",
    "q07_top_customers_per_nation", "q08_rollup_acctbal", "q09_set_ops",
    "q10_distinct_segments", "q11_customers_without_orders",
    "q12_scalar_functions", "q13_orders_by_month", "q14_limit_scan",
    "q15_full_outer_counts", "q16_status_pivot", "q17_above_nation_average",
    "q18_cumulative_revenue", "q19_cube_volumes", "q25_brand_revenue",
    "q26_promo_share", "q27_supplier_part_breadth", "q29_multiset_ops",
    "q43_left_join_coverage", "q44_date_arithmetic", "q45_string_agg",
    "q46_scalar_subquery_select", "q47_percentiles", "q61_grouping_sets",
    "q62_approx_aggregates", "q63_bilateral_trade", "q64_returned_items",
    "q68_nation_profit", "q69_priority_lines", "q70_disjunctive_revenue",
    "q71_dormant_rich_customers", "q72_cheapest_supplier",
    "q73_gap_filled_months", "q76_order_count_distribution",
    "q77_promo_revenue_share", "q78_top_supplier", "q79_small_order_revenue",
    "q80_large_volume_customers", "q81_sole_late_shipper",
    "q82_nation_value_share", "q87_statistical_profile",
    "q88_table_reconciliation", "q89_supplier_diversity",
    "q90_event_anomalies", "q91_excess_shippers",
    # round 2 (dedup / ANN / text / multimodal / corpus window)
    "q30_dedup_exact", "q31_dedup_by_key", "q32_minhash_signatures",
    "q33_lsh_bucket_stats", "q34_simhash", "q35_embedding_near_dup",
    "q36_lsh_near_dup_pairs", "q86_dedup_clusters",
    "q99_dedup_clusters_twostar", "q117_ngram_jaccard_near_dup",
    "q129_chunk_dedup", "q130_incremental_dedup", "q140_knn_graph",
    "q160_lsh_eval", "q164_dedup_savings", "q172_semantic_dedup",
    "q185_prefix_filter_join", "q190_split_leakage", "q40_ann_cosine_topk",
    "q41_ann_lsh_topk", "q42_ann_ivf_topk", "q75_ann_gemm_topk",
    "q136_embedding_quality", "q179_hard_negatives", "q198_contrastive_pairs",
    "q50_token_stats", "q51_quality_signals", "q52_lang_id",
    "q53_fingerprint", "q60_multimodal_features", "q54_top_tokens",
    "q55_tf_idf_top_term", "q56_top_bigrams", "q57_chunking",
    "q58_pii_scrub", "q59_token_sharding", "q93_multimodal_retrieval",
    "q120_c4_quality_filter", "q131_nfc_canonical_fingerprint",
    "q138_bpe_token_count", "q139_winnowing_fingerprint",
    "q155_lang_confusion", "q173_boilerplate_spans", "q193_zipf_fit",
    "q199_truncation_loss", "q204_audio_segments", "q83_train_val_split",
}
_HASH_ROUNDS, _ROWSONLY_ROUNDS = _driver_rounds_from_disk()
# A name is VERIFIED when it has a hash-green row, OR a rows-only row while
# it remains rows-only by design (oracle is None today).  A name whose
# oracle landed AFTER its last driver sighting is debt again — it needs a
# hash-green row before the rotation may push it to the back.
_ROUNDS = dict(_HASH_ROUNDS)
for _n, _r in _ROWSONLY_ROUNDS.items():
    if _n not in _ROUNDS and (_n not in QUERIES or QUERIES[_n].oracle is None):
        _ROUNDS[_n] = _r
_DRIVER_VERIFIED = {n for n in _DRIVER_VERIFIED if n in _HASH_ROUNDS or (n in QUERIES and QUERIES[n].oracle is None)}
_DRIVER_VERIFIED = _DRIVER_VERIFIED | set(_ROUNDS)
# Round 8: the ordering is now fully derived — no hand-edited floor (the
# r7 "_WINDOW_BACK >= 300" constant needed a per-round bump; if forgotten,
# unverified names would sort last indefinitely — r7 advisor finding).
# Rule: (1) every name with NO green driver row in any CORRECTNESS_r*.json
# goes FIRST, in registration order (family-grouped) — this covers both
# last round's additions that the driver never reached (q300-q309 after
# r7) and this round's brand-new names; (2) every driver-verified name
# follows, sorted by its LATEST green round ascending (stalest first;
# qnum breaks ties).  With ~50 checks per round and debt held near zero,
# the window is automatically "all unchecked names + the stalest rows".
def _qnum(name: str) -> int:
    # every registry name is "qNNN_slug"; parse defensively anyway
    try:
        return int(name[1:].split("_", 1)[0])
    except ValueError:
        return 0


_debt = [n for n in QUERIES if n not in _DRIVER_VERIFIED]
_checked = sorted(
    (n for n in QUERIES if n in _DRIVER_VERIFIED),
    key=lambda n: (_ROUNDS.get(n, 1), _qnum(n)),
)
_ordered = {n: QUERIES[n] for n in _debt + _checked}
QUERIES.clear()
QUERIES.update(_ordered)
del _DRIVER_VERIFIED, _ROUNDS, _HASH_ROUNDS, _ROWSONLY_ROUNDS, _debt, _checked, _ordered, _qnum
