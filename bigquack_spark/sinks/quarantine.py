"""Row-level quarantine routing — the per-row complement of sinks/wap.py.

WAP gates a whole batch: one violation and nothing publishes.  Real ingest
feeds are rarely that binary — a 100 TB daily drop with 0.01% malformed
rows should land the 99.99% and park the rest where an operator can triage
them.  This router splits rows by declarative failure predicates (the same
(name, predicate) shape as q258's expectation suite), tags every rejected
row with the rules it violated, and writes BOTH streams in one pass.

Scale posture:
- **One scan, one write.** The router never runs the input twice: the
  quarantine flag becomes a partition column, so one distributed write
  lands good rows under ``quarantined=false/`` and rejects under
  ``quarantined=true/``.  Splitting into two DataFrames and writing each
  would scan the source twice (or force a cache of the whole batch).
- **Counts ride the write** via ``df.observe`` (the r4 verdict #4 rule):
  no post-write re-read for metrics.
- **Rejects carry their evidence**: a ``violated_rules`` column with the
  comma-joined rule names, so triage never re-derives why a row was
  parked.

The reference has no quality surface at all (SURVEY §2.6); this extends
its PENDING/COMMITTED visibility gate (bigquery_write.go:384-394) to row
granularity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: A routing rule: (name, FAILURE predicate as a SQL expression string) —
#: a row violating ANY rule is quarantined.  Same shape as q258's
#: _DQ_RULES so an expectation suite doubles as a routing policy.
Rule = tuple[str, str]

QUARANTINE_COL = "quarantined"
REASON_COL = "violated_rules"


def tag_violations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Append ``violated_rules`` (comma-joined names of every failed rule;
    NULL for clean rows) and the boolean ``quarantined`` partition flag.
    Pure projection — zero shuffle, whole-stage codegen.

    A predicate must evaluate TRUE to quarantine: a NULL result (SQL
    three-valued logic, e.g. ``v > 5`` on NULL v) passes the row.  Guard
    nullable columns explicitly (``v IS NULL OR v > 5``) when NULL itself
    is a violation."""
    if not rules:
        raise ValueError("tag_violations: at least one rule is required")
    for name, _ in rules:
        if "," in name:
            raise ValueError(f"rule name {name!r} contains ','(the join separator)")
    clash = {QUARANTINE_COL, REASON_COL} & set(df.columns)
    if clash:
        raise ValueError(
            f"tag_violations: input already has column(s) {sorted(clash)} — "
            "the router would silently overwrite them; rename before routing"
        )
    tags = F.array_compact(
        F.array(*[F.when(F.expr(pred), F.lit(name)) for name, pred in rules])
    )
    reason = F.when(F.size(tags) > 0, F.array_join(tags, ","))
    return df.withColumn(REASON_COL, reason).withColumn(
        QUARANTINE_COL, F.col(REASON_COL).isNotNull()
    )


def write_with_quarantine(
    df: DataFrame, base_path: str, rules: list[Rule]
) -> dict:
    """Route ``df`` through ``rules`` and write both streams in ONE pass:
    ``base_path/quarantined=false/`` holds the accepted rows,
    ``base_path/quarantined=true/`` the rejects with their
    ``violated_rules`` evidence.  Returns ``{n_rows, n_quarantined,
    accepted_path, quarantined_path, per_rule}`` with every count derived
    from the write pass itself (df.observe) — no re-read.

    ``base_path`` is REPLACED (mode=overwrite): this is the one-batch
    router.  For continuous ingest use streaming.QuarantineIngestSink,
    which nests the same layout under exactly-once per-batch dirs."""
    from pyspark.sql import Observation

    tagged = tag_violations(df, rules)
    obs = Observation("quarantine_route")
    metrics = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(QUARANTINE_COL).cast("long")).alias("n_quarantined"),
    ]
    metrics += [
        F.sum(F.expr(pred).cast("long")).alias(f"rule_{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    tagged = tagged.observe(obs, *metrics)
    tagged.write.mode("overwrite").partitionBy(QUARANTINE_COL).parquet(base_path)
    got = obs.get
    return {
        "n_rows": int(got["n_rows"]),
        "n_quarantined": int(got["n_quarantined"] or 0),
        "accepted_path": os.path.join(base_path, f"{QUARANTINE_COL}=false"),
        "quarantined_path": os.path.join(base_path, f"{QUARANTINE_COL}=true"),
        "per_rule": {
            name: int(got[f"rule_{i}"] or 0) for i, (name, _) in enumerate(rules)
        },
    }


def _flag_is(df: DataFrame, value: str):
    # partition-value inference reads the boolean flag back as a string
    # ("true"/"false") — compare via a cast so both read paths work
    return F.lower(F.col(QUARANTINE_COL).cast("string")) == value


def read_accepted(spark: SparkSession, base_path: str) -> DataFrame:
    """The clean stream, evidence columns dropped — what downstream reads."""
    df = spark.read.parquet(base_path)
    return df.filter(_flag_is(df, "false")).drop(QUARANTINE_COL, REASON_COL)


def read_quarantined(spark: SparkSession, base_path: str) -> DataFrame:
    """The triage stream, evidence retained."""
    df = spark.read.parquet(base_path)
    return df.filter(_flag_is(df, "true")).drop(QUARANTINE_COL)
