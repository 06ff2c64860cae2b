"""Skew mitigation: salted joins and two-stage distinct aggregation.

AQE's skew-join splitting (enabled in tuning.py) handles most skew in
sort-merge joins at runtime; these helpers cover the cases AQE cannot:
a hot key in a shuffle hash join / aggregation, or a deliberately
pre-partitioned pipeline where a runtime re-plan is unwanted.

- :func:`salted_join` — classic salt-and-explode: the probe side gets a
  random salt in [0, n); the build side is exploded n×, so one hot key's
  rows spread over n reducers instead of one straggler task.
- :func:`two_stage_distinct_count` — COUNT(DISTINCT x) per key without
  funneling a hot key's whole value set through one reducer: stage 1
  deduplicates on (key, x) — a shuffle whose width is the *distinct* pair
  count — stage 2 counts per key. This is the shape Catalyst itself expands
  distinct aggregates into; exposed here for composition with salting.

All helpers are pure DataFrame transformations — results are identical to
their unsalted equivalents (asserted in tests), only the physical shuffle
layout changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the left side salted and the right side exploded.

    Use when ``left`` has heavy key skew and ``right`` is too large to
    broadcast but small enough to replicate ``salt``×. The join keys become
    ``on + [salt]`` so each of a hot key's partitions matches exactly one
    replica of the right row — same rows out, ``salt``× wider key space.

    Supported ``how``: ``inner`` and ``left`` (the preserved side is the
    salted one, so unmatched left rows survive exactly once). ``right`` /
    ``full`` would emit every unmatched right row ``salt`` times (one per
    replica) — rejected rather than silently wrong; salt the other side
    instead.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join supports how='inner'/'left' only — an outer-"
            "preserved exploded side would duplicate unmatched rows "
            f"salt times (got how={how!r})"
        )
    salted_left = left.withColumn(SALT_COL, (F.rand(seed=7) * salt).cast("int"))
    exploded_right = right.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_left.join(exploded_right, on + [SALT_COL], how).drop(SALT_COL)


def two_stage_distinct_count(
    df: DataFrame,
    key: str,
    value: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key as dedup-then-count.

    Stage 1's shuffle is keyed on (key, value) — a hot key's values spread
    across reducers; stage 2 aggregates already-unique pairs, so the final
    per-key shuffle moves one row per distinct value, with map-side partial
    counting keeping the hot key's fan-in small.
    """
    return (
        df.select(key, value)
        .dropDuplicates([key, value])
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
