"""Date/time gap-fillers for Databricks-only SQL functions.

``dayname``/``monthname`` are Databricks SQL builtins used by the reference's
date dimension (/root/reference/scripts/gold/dim_date.sql:36-37) but absent
from OSS Spark — supplied here via ``date_format`` patterns (SURVEY.md §7.2).

``date_series`` replaces the reference's LIMIT-1000 ROW_NUMBER hack
(dim_date.sql:21-27) with ``F.sequence`` + ``explode`` — identical output
semantics, but scale-safe: the series derives from the aggregated min/max
(2 rows cross-joined), not from scanning an arbitrary 1000-row sample of a
source table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dayname(col) -> Column:
    """Three-letter English day name (Mon..Sun → 'Monday' style full name).

    Databricks ``dayname`` returns the abbreviated name ('Wed'); DuckDB's
    ``dayname`` returns the full name. We expose the full name ('Wednesday')
    for oracle comparability and readability.
    """
    return F.date_format(col, "EEEE")


def monthname(col) -> Column:
    """Full English month name ('March'). Databricks ``monthname`` is 'Mar'."""
    return F.date_format(col, "MMMM")


def date_series(bounds_df: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """Explode a one-row (min_date, max_date) frame into one row per day.

    ``sequence(min, max, interval 1 day)`` runs JVM-side; the explode produces
    a single-partition array that Spark redistributes — fine for any realistic
    calendar span (100 years ≈ 36.5k rows).
    """
    return bounds_df.select(
        F.explode(
            F.sequence(F.col(min_col), F.col(max_col), F.expr("INTERVAL 1 DAY"))
        ).alias("date_day")
    )
