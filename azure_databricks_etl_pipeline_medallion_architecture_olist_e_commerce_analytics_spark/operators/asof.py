"""As-of (point-in-time) join — an operator Spark lacks, composed scale-safe.

For each left row, attach the most recent right row with the same key whose
timestamp is at-or-before the left timestamp. The classic implementations are
either a range-join + reduce (O(pairs) blow-up on hot keys) or a sorted merge;
this module uses the **union + last_value(ignoreNulls) window** composition,
which Spark executes as ONE shuffle on the key plus a per-partition sort:

    union(left tagged 1, right tagged 0)
    → window PARTITION BY key ORDER BY (ts, tag) ROWS UNBOUNDED PRECEDING
    → last(struct(values), ignorenulls=True) carries the latest right ROW
    → keep left rows

The carried payload is ONE struct of all value columns, not per-column
last() calls: per-column carry would mix values from DIFFERENT right rows
whenever the latest right row holds a NULL (the stale non-null from an
older row would leak through), fabricating rows that never existed. The
struct is non-null exactly for right rows, so ignorenulls picks the latest
right row wholesale and NULLs inside that row stay NULL.

At 100 TB that is the minimal movement for this semantics: no pair explosion
(each row passes the window exactly once), sort amortized into the shuffle,
and hot keys cost O(their rows), not O(rows²). Right rows sort before left
rows on timestamp ties, giving at-or-before (``<=``) semantics — the same
contract as DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` (the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: the latest right ROW at-or-before each left row.

    ``value_cols`` defaults to every right column except keys and timestamp.
    Output = all left columns + value_cols (NULL where no prior right row).
    Right-side (key, ts) pairs should be unique for deterministic output —
    pre-aggregate the right side otherwise. Value columns may not collide
    with left column names (the output would be ambiguous) — rename first.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(on) | {right_ts}]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"as_of_join: right value columns {sorted(clash)} collide with "
            "left columns — alias them on the right side first"
        )

    payload = F.struct(*[F.col(c) for c in value_cols])
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias("__tag"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in value_cols)
            + ">"
        )
        .alias("__r"),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias("__tag"),
        payload.alias("__r"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy("__asof_ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[c for c in left.columns],
        F.col("__tag"),
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    return (
        carried.filter(F.col("__tag") == 1)
        .select(
            *[c for c in left.columns],
            *[F.col(f"__r.{c}").alias(c) for c in value_cols],
        )
    )
