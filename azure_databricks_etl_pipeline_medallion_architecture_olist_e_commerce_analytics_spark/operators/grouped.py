"""Grouped custom transforms via ``applyInPandas`` (Arrow-batched grouped map).

The SURVEY §2.10 finding is that the reference needs no UDFs — but the
engine's extension surface does, and ``applyInPandas`` is the idiomatic
Spark shape for per-group logic the built-in operators can't express:
each group arrives as ONE pandas DataFrame (Arrow transfer, no per-row
Python), the transform is vectorized numpy/pandas, and the output schema
is declared up front so Catalyst plans around it.

Scale notes: one shuffle on the group key; each group must fit in one
executor's memory (the applyInPandas contract) — for unbounded groups
pre-aggregate or salt first. Feature normalization groups (per-language,
per-source, per-day) are naturally bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def group_minmax_normalize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "normalized",
) -> DataFrame:
    """Per-group min-max normalization: ``(v - min) / (max - min)``, 0.0 for
    constant groups — a standard feature-scaling step before training.

    Implemented as a grouped-map Pandas UDF to exercise the custom-operator
    path end-to-end; min/max involve no floating-point accumulation, so the
    result is bit-identical to the SQL window formulation in any engine
    (which is exactly how the DuckDB oracle verifies it).
    """
    fields = df.schema.fields + [T.StructField(out_col, T.DoubleType())]
    out_schema = T.StructType(fields)

    def normalize(pdf):
        v = pdf[value_col].astype("float64")
        lo, hi = v.min(), v.max()
        pdf[out_col] = 0.0 if hi == lo else (v - lo) / (hi - lo)
        return pdf

    return df.groupBy(*group_cols).applyInPandas(normalize, out_schema)


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo_p: float = 0.05,
    hi_p: float = 0.95,
    out_col: str = "value_w",
) -> DataFrame:
    """Per-group percentile clipping (winsorization) — the standard outlier
    guard before loss-weighting or feature scaling.

    Exact continuous percentiles per group via one hash aggregation, then a
    broadcast join back onto the fact rows (group cardinality is tiny by
    construction — event types, languages, sources — so the percentile table
    always fits in a broadcast). Two scans of nothing: the agg and the clip
    read the same cached scan, and the clip itself is a pure row-local
    ``least/greatest`` — no window over the full fact table, which at 100 TB
    would global-sort every partition for no reason.
    """
    pct = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, {lo_p})").alias("__lo"),
        F.expr(f"percentile({value_col}, {hi_p})").alias("__hi"),
    )
    return (
        df.join(F.broadcast(pct), group_cols)
        .withColumn(
            out_col,
            F.round(
                F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")), 6
            ),
        )
        .drop("__lo", "__hi")
    )
