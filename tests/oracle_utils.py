"""Local mirror of the driver's DuckDB-oracle comparison.

Sorts columns by name, normalizes types, sorts rows, and compares values —
an intentionally stricter local stand-in for the driver's row-count + schema +
order-insensitive value-hash check.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import pandas as pd


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)  # full precision — bitwise-equal doubles match
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        if pd.isna(v):
            return "∅"
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        # DuckDB's fetchdf maps DATE to midnight datetime64 while Spark keeps
        # datetime.date — collapse both to the date-only form so the harness
        # doesn't flag a pandas-conversion artifact (engine types are aligned).
        if ts == ts.normalize():
            return ts.date().isoformat()
        return ts.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bool,)):
        return str(bool(v))
    if isinstance(v, int):
        return str(v)
    if pd.isna(v):
        return "∅"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    out.sort()
    return out


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"{name}: column mismatch spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = canonical_rows(spark_pdf), canonical_rows(duck_pdf)
    if a != b:
        diffs = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
        sample = [(a[i], b[i]) for i in diffs]
        problems.append(f"{name}: value mismatch; first diffs {sample}")
    return problems
