"""Physical-plan lint: the pre-flight guardrail for cluster-scale jobs.

The plan contracts in tests/test_plans.py protect THIS repo's queries; this
module is the same checks as a library API, so a user can gate their own
pipeline before submitting it against 100 TB:

    from bigquack_spark.planlint import lint_plan, assert_scales
    findings = lint_plan(df)           # list of (severity, code, message)
    assert_scales(df)                  # raises on any 'error' finding

Checks are string inspections of the executed plan — the exact surface
``df.explain("formatted")`` prints, so every finding can be reproduced by
eye.  They encode the scale rules this repo builds to (SCALING.md):

- ``cartesian``        error  CartesianProduct — O(n*m) pairwise work.
- ``nested_loop``      warn   BroadcastNestedLoopJoin — fine for bounded
                              broadcast sides (ANN query sets, scalar
                              aggregates), quadratic otherwise.
- ``single_partition`` error  a global-order window/exchange: one reducer
                              owns the whole dataset.
- ``python_row_udf``   error  BatchEvalPython — row-at-a-time Python in
                              the hot path (~10-100x slower than Arrow).
- ``no_pushed_filters``warn   a parquet scan with filters above it but
                              nothing pushed — often a cast/udf blocking
                              predicate pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

Finding = tuple[str, str, str]  # (severity, code, message)


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def lint_plan(df: DataFrame) -> list[Finding]:
    """Inspect the executed physical plan; return (severity, code, message)
    findings, empty when the plan passes every scale rule."""
    plan = _plan_string(df)
    findings: list[Finding] = []
    if "CartesianProduct" in plan:
        findings.append(
            (
                "error",
                "cartesian",
                "CartesianProduct in plan: pairwise O(n*m) work — a join key "
                "is missing or degenerated (typo'd equi-condition?)",
            )
        )
    if "BroadcastNestedLoopJoin" in plan:
        findings.append(
            (
                "warn",
                "nested_loop",
                "BroadcastNestedLoopJoin: acceptable only when the broadcast "
                "side is bounded (query sets, scalar aggregates); quadratic "
                "against an unbounded side",
            )
        )
    if "SinglePartition" in plan:
        findings.append(
            (
                "error",
                "single_partition",
                "SinglePartition exchange: a global-order window or global "
                "aggregate funnels the whole dataset through one task — "
                "partition the window, or pre-aggregate",
            )
        )
    if "BatchEvalPython" in plan:
        findings.append(
            (
                "error",
                "python_row_udf",
                "BatchEvalPython: row-at-a-time Python UDF in the hot path — "
                "rewrite as built-in expressions or an Arrow-batched "
                "mapInPandas/pandas_udf",
            )
        )
    # Exact distinct aggregates shuffle the columns' VALUE SETS (multi-
    # distinct additionally Expand-multiplies every input row); at the
    # 100x tier the repo's exact column profile (q118) measured 8.98x the
    # engine baseline while the sketch profile (q252) holds a within-5pct
    # contract.  Exact distinct should be a CHOICE at scale, not a default
    # (r11 verdict #5) — warn, because correctness-critical exact counts
    # are legitimate.
    if "count(distinct " in plan or "count(DISTINCT " in plan:
        findings.append(
            (
                "warn",
                "exact_distinct",
                "exact count(DISTINCT ...) in plan: shuffles the column's "
                "value set (and Expand-multiplies rows when combined with "
                "other aggregates) — over large tables prefer "
                "approx_count_distinct(rsd) (HyperLogLog++, mergeable O(1) "
                "state; see recommend_distinct_strategy and the q252 "
                "within-5pct contract)",
            )
        )
    # Filter sitting directly on a parquet scan whose PushedFilters is empty
    # usually means a cast/expression blocked pushdown.
    if "PushedFilters: []" in plan and "Filter" in plan and "Scan parquet" in plan:
        findings.append(
            (
                "warn",
                "no_pushed_filters",
                "a parquet scan pushed no filters while the plan filters "
                "above it — check for casts/expressions wrapping the "
                "predicate column",
            )
        )
    return findings


def assert_scales(df: DataFrame) -> None:
    """Raise ``ValueError`` listing every error-severity finding; warnings
    pass.  The one-line pre-submit gate."""
    errors = [f for f in lint_plan(df) if f[0] == "error"]
    if errors:
        msgs = "; ".join(f"[{code}] {msg}" for _, code, msg in errors)
        raise ValueError(f"plan fails scale lint: {msgs}")
