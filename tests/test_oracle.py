"""DuckDB-as-oracle differential tests over the full declared query
inventory (SURVEY §5 rebuild strategy) at sf0.001.

This mirrors the driver's t2 gate: for every registry entry with oracle SQL,
run the Spark callable and the DuckDB SQL on the same parquet and require a
canonical (column-sorted, row-sorted, float-canonicalized) match.
"""

from __future__ import annotations

import pytest

from bigquack_spark.queries import QUERIES
from tests.conftest import SF_SMOKE
from tests.util import assert_frames_match

ORACLE_CASES = sorted(name for name, spec in QUERIES.items() if spec.oracle)
ROWS_ONLY_CASES = sorted(name for name, spec in QUERIES.items() if not spec.oracle)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_match(spark, duck, name):
    spec = QUERIES[name]
    spark_pdf = spec.fn(spark, SF_SMOKE).toPandas()
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(spark, name):
    """Non-SQL-expressible ops: must run and produce a stable schema with
    >= 0 rows (the driver's weaker check); semantic tests live in their
    dedicated test modules."""
    df = QUERIES[name].fn(spark, SF_SMOKE)
    assert df.columns  # schema resolves
    assert df.count() >= 0


def test_oracle_paired_debt_fronts_window():
    """r10 verdict #1: a name that has an oracle registered today but whose
    only driver rows are ``no_oracle`` (the oracle landed after the driver
    last saw it) must precede every hash-green name in QUERIES order, so
    the driver's ~50-name window reaches it next round.  Vacuously true
    once every oracle-paired name has a hash-green row."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hash_green, rows_only = set(), set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        for qname, row in json.load(open(path)).items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                hash_green.add(qname)
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                rows_only.add(qname)
    debt = {n for n, spec in QUERIES.items() if spec.oracle and n in (rows_only - hash_green)}
    if not debt:
        return
    order = list(QUERIES)
    last_debt = max(order.index(n) for n in debt)
    first_green = min((order.index(n) for n in order if n in hash_green), default=len(order))
    assert last_debt < first_green, f"debt names {sorted(debt)} must front the window"
