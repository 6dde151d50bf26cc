"""Join-shaped operators Spark lacks as single primitives: as-of join and
skew-tolerant (salted) aggregation.

Both are built from one-shuffle compositions of DataFrame ops — no custom
physical operators, no Python in the row path — so Catalyst/AQE still own
the physical strategy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
    right_tiebreak: str | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the single right row with the
    latest ``right_ts`` <= ``left_ts`` (direction='backward'; 'forward' is
    earliest >=), matching on the equi-key ``on``.  ``tolerance`` (same
    units as the ts columns — pass integer epochs for time) additionally
    requires |left_ts - matched right_ts| <= tolerance, the pandas
    merge_asof staleness bound: a match older than the tolerance is
    reported as NO match, not a stale one.

    Implementation is the union-and-carry construction: tag both sides,
    union them, sort within each key by (ts, side-priority), and carry the
    most recent right payload forward with a running ``last(...,
    ignorenulls)`` window.  ONE shuffle on the key — no range-explosion
    cross join, no per-row subquery — and the window state is O(1) per row,
    so the plan holds at any scale.  (A sort-merge range join would shuffle
    the same data but risks quadratic range expansion on hot keys.)
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = [c for c in left.columns]
    tie = right_tiebreak or right_cols[0]
    # the carried payload includes the matched right ts so a tolerance
    # bound can disqualify stale matches after the carry
    rstruct = F.struct(
        *[F.col(c) for c in right_cols], F.col(right_ts).alias("__rts")
    )
    rstruct_type = right.select(rstruct.alias("s")).schema["s"].dataType
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right.schema[tie].dataType).alias("__tie"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(rstruct_type).alias("__r"),
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(tie).alias("__tie"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("__l"),
        rstruct.alias("__r"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    # right rows sort before left rows at equal ts => ties match; among
    # equal-ts right rows the greatest tiebreak is carried (deterministic)
    if direction == "backward":
        order = [F.asc("__ts"), F.asc("__is_left"), F.asc_nulls_last("__tie")]
    else:
        order = [F.desc("__ts"), F.asc("__is_left"), F.asc_nulls_last("__tie")]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    if tolerance is not None:
        age = (
            F.col("__ts") - F.col("__match").getField("__rts")
            if direction == "backward"
            else F.col("__match").getField("__rts") - F.col("__ts")
        )
        carried = carried.withColumn(
            "__match", F.when(age <= tolerance, F.col("__match"))
        )
    out = carried.filter(F.col("__is_left") == 1).select("__l.*", "__match")
    for c in right_cols:
        out = out.withColumn(c, F.col("__match").getField(c))
    return out.drop("__match")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, "object"]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: first aggregate on
    (keys + random salt) so a hot key's rows spread over ``salt_buckets``
    reducers, then combine the partials on the true keys.

    Scope, measured (SCALING.md round-4): for simple algebraic aggregates
    plain ``groupBy`` already neutralizes key skew — Spark's map-side
    partial aggregation collapses the hot key to one row per task BEFORE
    the shuffle, and the salted form's second exchange measured ~20%
    SLOWER on a 50%-hot key at the 100x tier.  Reach for this operator
    when the per-key partial state itself is large (collect_list-class
    accumulation, exact per-key distinct sets) so a single reducer would
    hold the hot key's full state; for skewed JOINS use
    :func:`salted_join` (measured 2x); for distinct counts use the HLL
    sketch partials (operators/ivm.py).

    Only algebraic aggregates compose this way; ``aggs`` maps output name ->
    ``(partial_expr, combiner)`` where ``combiner`` is a Column -> Column
    aggregate re-combining the per-salt partials (``F.sum`` for sum AND
    count, ``F.min``/``F.max`` for min/max).  The pair is explicit — no
    introspection of the partial expression — so non-algebraic mistakes
    (avg, distinct) fail at the author's keyboard, not in the plan.
    """
    for name, pair in aggs.items():
        if not (isinstance(pair, tuple) and len(pair) == 2 and callable(pair[1])):
            raise TypeError(
                f"aggs[{name!r}] must be (partial_expr, combiner) — e.g. "
                f"(F.count(F.lit(1)), F.sum); got {type(pair).__name__}"
            )
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _) in aggs.items()]
    )
    finals = [
        combiner(F.col(f"__p_{name}")).alias(name)
        for name, (_, combiner) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*finals)


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_val: str,
    right_val: str,
    max_distance: int,
    bucket_width: int | None = None,
) -> DataFrame:
    """Bounded-distance (range) join: pairs with the same ``on`` key and
    |left_val - right_val| <= max_distance.

    A naive non-equi join degenerates to a per-key cross product.  This
    implementation buckets both sides by floor(val / width) and joins each
    left bucket to right buckets {b-1, b, b+1} (width >= max_distance makes
    any qualifying pair land in adjacent buckets), then applies the exact
    distance filter as a residual.  The join is a pure equi-join on
    (key, bucket) — shuffle-partitionable, AQE-skew-splittable — and the
    candidate set is bounded by bucket occupancy, never the key cross
    product.
    """
    width = bucket_width or max_distance
    if width < max_distance:
        raise ValueError("bucket_width must be >= max_distance")
    lb = left.withColumn("__b", F.floor(F.col(left_val) / width))
    rb = right.withColumn(
        "__b", F.explode(
            F.array(
                F.floor(F.col(right_val) / width) - 1,
                F.floor(F.col(right_val) / width),
                F.floor(F.col(right_val) / width) + 1,
            )
        )
    )
    joined = lb.join(rb, [on, "__b"])
    return joined.filter(
        F.abs(F.col(left_val) - F.col(right_val)) <= max_distance
    ).drop("__b")


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-tolerant equi-join: salt the skewed side's key with a random
    bucket and replicate the small side across all buckets, so one hot key
    spreads over ``salt_buckets`` reducers.  AQE's skew-join splitting does
    this adaptively; the explicit form is for engines/paths where AQE can't
    see the skew (e.g. a first-stage join right after a custom source).
    Results are identical to a plain join — only the shuffle shape changes.
    """
    salted_left = skewed.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    replicated_right = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_left.join(replicated_right, [on, "__salt"]).drop("__salt")


#: 1 << i as a signed 64-bit literal for i in 0..63 (bit 63 wraps negative).
_BIT_MASKS = [ (1 << i) if i < 63 else -(1 << 63) for i in range(64) ]


def _bloom_probe(col: Column, num_bits: int, seed: int) -> tuple[Column, Column]:
    """(slot, mask) for one bloom hash: bit position = xxhash64(col, seed)
    mod num_bits, split into a 64-bit-word slot and an in-word mask.  Pure
    JVM expressions, deterministic across engines and runs.  The mask is an
    element_at into a 64-long literal array (F.shiftleft only accepts a
    Python-int shift amount)."""
    pos = F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(num_bits))
    slot = F.floor(pos / F.lit(64)).cast("long")
    powers = F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS])
    mask = F.element_at(powers, F.pmod(pos, F.lit(64)).cast("int") + F.lit(1))
    return slot, mask


def bloom_semi_join(
    big: DataFrame,
    big_on: str,
    keys: DataFrame,
    keys_on: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Semi join with a bloom-filter pre-prune of the big side — the
    runtime-row-level-filtering shape (Spark's internal
    ``bloom_filter_agg`` isn't in the public registry, so the filter is
    built from portable primitives: k xxhash64 probes OR-ed into a
    ``map<slot, bits>`` bitmap).

    Why it matters at 100 TB: a plain semi join shuffles EVERY big-side
    row to its key's reducer before any row can be rejected.  Here the
    bitmap (num_bits/8 bytes — 128 KiB at the default) is built with one
    key-side aggregation, broadcast as a single-row literal map, and
    applied as a scan-adjacent filter, so rows whose keys cannot be in
    the key set die before the exchange.  False positives only cost
    shuffle bytes; the exact semi join behind the filter makes the result
    IDENTICAL to ``big SEMI JOIN keys`` — which is exactly what the
    oracle checks.

    The key side is aggregated (k probes -> bit_or per word -> one map
    row), so it may be far larger than the broadcast-join threshold: only
    the bitmap is broadcast, never the keys.

    xxhash64 is input-TYPE-sensitive: hashing an int column and a bigint
    column of equal values gives different bits, and a probe-side miss is
    a silent FALSE NEGATIVE the trailing exact semi join cannot restore
    (a plain semi join would have coerced the types).  Both probe columns
    are therefore canonicalized before hashing: integral types (and exact
    decimal(p,0)) widen to long; otherwise the dtypes must already match,
    or the call raises instead of silently dropping rows.
    """
    import pyspark.sql.types as T

    def _canon_type(dt) -> str:
        integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        if isinstance(dt, integral) or (isinstance(dt, T.DecimalType) and dt.scale == 0):
            return "bigint"
        return dt.simpleString()

    big_ct = _canon_type(big.schema[big_on].dataType)
    keys_ct = _canon_type(keys.schema[keys_on].dataType)
    if big_ct != keys_ct:
        raise ValueError(
            f"bloom_semi_join probe types must match after integral widening: "
            f"{big_on}:{big.schema[big_on].dataType.simpleString()} vs "
            f"{keys_on}:{keys.schema[keys_on].dataType.simpleString()} "
            f"(xxhash64 is type-sensitive; align the columns explicitly)"
        )
    big_probe = F.col(big_on).cast(big_ct)

    kd = keys.select(F.col(keys_on).cast(keys_ct).alias("__bk")).distinct()
    probes = None
    for j in range(num_hashes):
        slot, mask = _bloom_probe(F.col("__bk"), num_bits, j)
        p = kd.select(slot.alias("__slot"), mask.alias("__mask"))
        probes = p if probes is None else probes.unionByName(p)
    words = probes.groupBy("__slot").agg(F.bit_or("__mask").alias("__bits"))
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("__slot", "__bits"))).alias("__bloom")
    )
    pruned = big.join(F.broadcast(bloom))
    cond = None
    for j in range(num_hashes):
        slot, mask = _bloom_probe(big_probe, num_bits, j)
        hit = (
            F.coalesce(F.element_at(F.col("__bloom"), slot), F.lit(0).cast("long"))
            .bitwiseAND(mask)
            == mask
        )
        cond = hit if cond is None else (cond & hit)
    pruned = pruned.filter(cond).drop("__bloom")
    return pruned.join(
        kd.select(F.col("__bk").alias(big_on)), on=big_on, how="left_semi"
    )


class JoinExplosionError(RuntimeError):
    """Raised by :func:`guarded_join` when the exact pre-computed output
    cardinality exceeds the caller's budget."""


def guarded_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    max_output_rows: int,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an EXACT output-cardinality pre-check — the guard a
    100 TB pipeline wants in front of any join on a key whose uniqueness
    nobody has actually verified (the classic incident: a 'dimension' with
    duplicate keys quietly turns a 1:N join into N:M and the job runs for
    hours before dying in shuffle spill).

    The estimate is not a sample or a sketch: per-key row counts on both
    sides (one map-side-combined aggregate each, shuffling only
    key-cardinality rows) joined and summed give the EXACT inner-join
    output size — sum over matching keys of n_left * n_right — at a cost
    of two cheap aggregates, orders of magnitude below the join it
    protects.  If the total exceeds ``max_output_rows``, raises
    :class:`JoinExplosionError` naming the worst keys (the q119-shaped
    evidence: the fix is usually dedup on the offending side or
    salted_join), BEFORE any wide shuffle of payload rows is scheduled.
    For outer joins the inner-match total is still the explosion term and
    is what's checked.  Semi/anti joins cannot explode (output is bounded
    by the left side's rows), so the guard is bypassed for
    ``how='left_semi'/'left_anti'`` rather than spuriously raising on a
    join that is safe by construction.

    Note the pre-check evaluates both inputs' lineage a second time; with
    non-deterministic sources (sampling, rand(), now()) the checked total
    can diverge from the actual join — ``.cache()`` such inputs first.

    Returns the joined DataFrame unchanged when within budget."""
    keys = [on] if isinstance(on, str) else list(on)
    # Spark resolves join-type strings case-insensitively and ignores
    # underscores ("LEFT_SEMI" == "leftsemi"); normalize before matching
    if how.lower().replace("_", "") in ("leftsemi", "semi", "leftanti", "anti"):
        return left.join(right, keys, how)
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("__nl"))
    rc = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("__nr"))
    per_key = lc.join(rc, keys).select(
        *keys, (F.col("__nl").cast("decimal(38,0)") * F.col("__nr")).alias("__out")
    )
    total_row = per_key.agg(F.sum("__out").alias("t")).first()
    total = int(total_row["t"] or 0)
    if total > max_output_rows:
        worst = per_key.orderBy(F.desc("__out")).limit(3).collect()
        detail = ", ".join(
            "(" + ", ".join(f"{k}={r[k]}" for k in keys) + f" -> {int(r['__out'])} rows)"
            for r in worst
        )
        raise JoinExplosionError(
            f"join on {keys} would produce {total} rows "
            f"(budget {max_output_rows}); worst keys: {detail}.  "
            f"Dedup the offending side, pre-aggregate, or salt the key."
        )
    return left.join(right, keys, how)
