"""Oracle-normalization helpers (FIXTURES.md §C): mirror the driver's
compare — sort columns by name, sort rows canonically, canonicalize floats
to 9 significant decimals, timestamps to microseconds."""

from __future__ import annotations

import datetime
import math

import numpy as np
import pandas as pd


def _canon_value(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isinf(v):
            return repr(v)
        if v == 0:
            return "0"
        return f"{v:.9e}"  # 9 significant decimals (FIXTURES.md §C2)
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.floor("us").isoformat()
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        # dates and midnight timestamps canonicalize identically
        return v.isoformat() + "T00:00:00"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_value(v) for v in rec) for rec in df[cols].itertuples(index=False)]
    return sorted(rows)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    s_rows, o_rows = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
    assert len(s_rows) == len(o_rows), f"{name}: row count {len(s_rows)} != {len(o_rows)}"
    mismatches = [i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first at {mismatches[0]}: "
        f"spark={s_rows[mismatches[0]]} oracle={o_rows[mismatches[0]]}"
    )
