"""Table reconciliation — the verification operator a data-movement bridge
needs (the reference IS such a bridge: BQ -> DuckDB, bigquack.go:64-141,
with only a row-count check at the end, bigquack.go:127-137.  Row counts
prove nothing about content; this operator proves content).

``table_diff`` compares two tables keyed the same way and emits ONE row per
discrepancy: keys only in the left, only in the right, or present in both
with differing values.  Equal rows are filtered out as early as possible —
at 100 TB the join must shuffle both sides once (or ride bucketed layouts
exchange-free, sinks/partitioned.py), but the output and everything after
it is bounded by the diff size, which for a healthy pipeline is ~0.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Full-outer key join + column-wise IS DISTINCT FROM compare.

    Returns (key_cols..., status, n_cols_differ) where status is
    'left_only' | 'right_only' | 'differs'.  NULL-safe throughout: a NULL
    vs non-NULL cell counts as a difference, NULL vs NULL does not (IS
    DISTINCT FROM semantics — no string formatting, so float columns
    compare bit-exactly and portably)."""
    compare_cols = compare_cols or [c for c in left.columns if c not in key_cols]
    lt = left.select(
        *[F.col(k).alias(f"lk_{k}") for k in key_cols],
        *[F.col(c).alias(f"l_{c}") for c in compare_cols],
        F.lit(1).alias("l_present"),
    )
    rt = right.select(
        *[F.col(k).alias(f"rk_{k}") for k in key_cols],
        *[F.col(c).alias(f"r_{c}") for c in compare_cols],
        F.lit(1).alias("r_present"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"lk_{k}").eqNullSafe(F.col(f"rk_{k}")) for k in key_cols],
    )
    joined = lt.join(rt, cond, "full_outer")
    diff_flags = [
        (~F.col(f"l_{c}").eqNullSafe(F.col(f"r_{c}"))).cast("int")
        for c in compare_cols
    ]
    n_differ = reduce(lambda a, b: a + b, diff_flags)
    status = (
        F.when(F.col("r_present").isNull(), "left_only")
        .when(F.col("l_present").isNull(), "right_only")
        .when(n_differ > 0, "differs")
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"lk_{k}"), F.col(f"rk_{k}")).alias(k)
                for k in key_cols
            ],
            "status",
            F.when(F.col("status") == "differs", n_differ)
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("n_cols_differ"),
        )
    )


def changelog(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """CDC extract between two table snapshots: one row per changed key
    with ``op`` in insert/update/delete and the after-image values (the
    before-image for deletes) — what you feed a MERGE (sinks/merge.py) or
    ship downstream as a change stream.

    Same one-shuffle full-outer + IS DISTINCT FROM core as
    :func:`table_diff` (NULL-safe, float-bit-exact), but emitting the
    payload instead of just the discrepancy count.  Output is bounded by
    the change volume, not the table size."""
    compare_cols = compare_cols or [c for c in old.columns if c not in key_cols]
    lt = old.select(
        *[F.col(k).alias(f"lk_{k}") for k in key_cols],
        *[F.col(c).alias(f"l_{c}") for c in compare_cols],
        F.lit(1).alias("l_present"),
    )
    rt = new.select(
        *[F.col(k).alias(f"rk_{k}") for k in key_cols],
        *[F.col(c).alias(f"r_{c}") for c in compare_cols],
        F.lit(1).alias("r_present"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"lk_{k}").eqNullSafe(F.col(f"rk_{k}")) for k in key_cols],
    )
    joined = lt.join(rt, cond, "full_outer")
    any_differ = reduce(
        lambda a, b: a | b,
        [~F.col(f"l_{c}").eqNullSafe(F.col(f"r_{c}")) for c in compare_cols],
    )
    op = (
        F.when(F.col("l_present").isNull(), "insert")
        .when(F.col("r_present").isNull(), "delete")
        .when(any_differ, "update")
    )
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"lk_{k}"), F.col(f"rk_{k}")).alias(k)
                for k in key_cols
            ],
            "op",
            # after-image for insert/update, before-image for delete
            *[
                F.when(F.col("op") == "delete", F.col(f"l_{c}"))
                .otherwise(F.col(f"r_{c}"))
                .alias(c)
                for c in compare_cols
            ],
        )
    )


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-insensitive one-row table checksum for transfer validation —
    the cheap first gate before :func:`table_diff`'s row-level full-outer
    diff (the reference's BQ2Duck pipeline reports only a row COUNT,
    bigquack.go:127-138; this adds content).

    Per row: a canonical '|'-joined string over ``cols`` (callers must
    pre-normalize floats/timestamps to lattice ints or formatted strings
    — raw doubles would make the digest engine-sensitive), hashed to a
    60-bit md5 prefix.  Aggregates: COUNT plus BIT_XOR of the hashes —
    commutative/associative, so partition order, shuffle order, and
    engine never matter, and neither channel overflows at any row count
    (XOR is closed over 64 bits; the sum channel accumulates the mod-2^40
    terms in decimal(38,0) — good past 1e26 rows — and reduces mod 2^40
    at the end, mirroring the oracle's HUGEINT sum).  XOR's known blind
    spot (a row appearing an EVEN number of times cancels out) is covered
    by the count plus the modular-sum channel: a duplicated+dropped pair
    that fools XOR shifts the modular sum."""
    canon = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("bigint")
    mod = F.lit(1 << 40)
    return (
        df.select(h.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(h)").alias("xor_checksum"),
            (F.sum((F.col("h") % mod).cast("decimal(38,0)")) % mod)
            .cast("bigint")
            .alias("sum_checksum_mod"),
        )
    )


def schema_diff(old: DataFrame, new: DataFrame) -> list[dict]:
    """Schema-evolution compatibility report between two frames: added,
    dropped, and type-changed columns, each tagged with whether the
    change is append-safe for a create-or-append sink (the reference's
    writer hard-rejects ANY schema inequality, bigquery_write.go:422-424;
    this tells you WHY before the job dies).  Widening numeric changes
    (int->long, float->double) are append-safe under mergeSchema; drops
    and narrowings are not.  Driver-side metadata only — no data read."""
    WIDENINGS = {("int", "bigint"), ("smallint", "int"), ("smallint", "bigint"),
                 ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
                 ("float", "double")}
    old_t = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    new_t = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    report: list[dict] = []
    for name in sorted(set(old_t) | set(new_t)):
        if name not in old_t:
            report.append({"column": name, "change": "added",
                           "from": None, "to": new_t[name], "append_safe": True})
        elif name not in new_t:
            report.append({"column": name, "change": "dropped",
                           "from": old_t[name], "to": None, "append_safe": False})
        elif old_t[name] != new_t[name]:
            safe = (old_t[name], new_t[name]) in WIDENINGS
            report.append({"column": name, "change": "type_changed",
                           "from": old_t[name], "to": new_t[name], "append_safe": safe})
    return report
