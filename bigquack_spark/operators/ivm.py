"""Incremental materialized-view maintenance for algebraic aggregates —
the batch twin of streaming/sink.ContinuousRollupSink's upsert loop.

The reference's pipeline re-ingests whole tables (bigquack.go:64-141 pumps
every batch of the source on every run); a 100 TB rollup cannot afford
that.  For ALGEBRAIC aggregates (sum/count/min/max — and anything derived
from them at read time: avg = sum/count) the maintained view can instead
merge yesterday's materialized partials with today's delta partials:

    new_view = combine(view_partials, agg(delta))

which costs one scan of the DELTA plus one scan of the (key-sized) view —
never a rescan of history.  ``merge_agg_partials`` is that combine step as
a pure DataFrame function: union the partial tables, re-aggregate with the
merge function of each column's aggregate kind (sum+sum, count: sum,
min: min, max: max).  Holistic aggregates (median, distinct counts) do NOT
merge this way — route those through sketches (queries/sketch.py CMS, q62
HLL) whose partials ARE mergeable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregate kind -> merge function over partial columns
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by SUMMING partial counts
    "min": F.min,
    "max": F.max,
}


def merge_agg_partials(
    partials: list[DataFrame],
    keys: list[str],
    spec: dict[str, str],
) -> DataFrame:
    """Combine partial-aggregate tables into one (same schema: ``keys`` +
    the columns named in ``spec``).  ``spec`` maps each value column to
    its aggregate kind (``sum``/``count``/``min``/``max``); the merge
    applies that kind's combine function.  Keys present in only some
    partials pass through (union semantics) — exactly Spark's own
    partial/final aggregation contract, applied across materialization
    boundaries.  One key-hashed shuffle of key-cardinality rows."""
    unknown = {k for k in spec.values() if k not in _MERGE}
    if unknown:
        raise ValueError(f"non-algebraic aggregate kinds: {sorted(unknown)}")
    cols = keys + list(spec)
    merged = None
    for p in partials:
        part = p.select(*cols)
        merged = part if merged is None else merged.unionByName(part)
    return merged.groupBy(*keys).agg(
        *[_MERGE[kind](c).alias(c) for c, kind in spec.items()]
    )


def distinct_partials(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-key Datasketches HLL partials for COUNT(DISTINCT value_col) —
    the mergeable form of the one aggregate ``merge_agg_partials`` cannot
    carry (distinct counts are holistic; their SKETCHES are algebraic).
    Output: ``keys`` + a binary ``sketch`` column, key-cardinality rows."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def merge_distinct_partials(
    partials: list[DataFrame], keys: list[str], lg_k: int = 12
) -> DataFrame:
    """Union per-key HLL partials and read the estimate: the incremental-
    view path for distinct counts (yesterday's sketches + today's delta
    sketches -> today's estimate, no history rescan).  Estimates are
    deterministic for given inputs (Datasketches is seed-stable), so
    merge(agg(A), agg(B)) reads the SAME estimate as agg(A ∪ B) — the
    test-asserted mergeability theorem."""
    merged = None
    for p in partials:
        part = p.select(*keys, "sketch")
        merged = part if merged is None else merged.unionByName(part)
    return merged.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg("sketch", F.lit(True))
        ).alias("n_distinct_est")
    )


def histogram_partials(
    df: DataFrame, keys: list[str], value_col: str, bin_width: int
) -> DataFrame:
    """Per-key equi-width histogram partials over an INTEGER value column —
    the mergeable summary for quantiles (quantiles are holistic like
    distinct counts; their histograms are algebraic: partials merge by
    adding bin counts, via ``merge_agg_partials`` with ``{"n": "sum"}``).
    Output: ``keys`` + (bin, n); state per key is value-range/bin_width
    rows regardless of row count."""
    return (
        df.select(*keys, F.floor(F.col(value_col) / bin_width).cast("long").alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def quantiles_from_histogram(
    hist: DataFrame, keys: list[str], bin_width: int, qs: list[float]
) -> DataFrame:
    """Read approximate quantiles off a (possibly merged) histogram: for
    each requested q, the LOWER EDGE of the first bin whose cumulative
    count reaches ceil(q * total) — deterministic integer arithmetic, so
    any engine reading the same histogram gets the same answer, with
    error bounded by one bin width.  One key-partitioned cumulative
    window over bin-cardinality rows."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy(*keys)
    cum = hist.select(
        *keys, "bin", "n",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(wt).alias("total"),
    )
    out = None
    for q in qs:
        rank = F.ceil(F.lit(q) * F.col("total")).cast("long")
        hit = (
            cum.filter(F.col("cum") >= rank)
            .groupBy(*keys)
            .agg(F.min("bin").alias("qbin"))
            .select(
                *keys,
                F.lit(q).alias("q"),
                (F.col("qbin") * bin_width).cast("long").alias("quantile_lo"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out
