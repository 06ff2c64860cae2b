"""Skew-safe gap-based sessionization: time-range pre-split + boundary stitch.

The classic batch sessionization (``q_sessionize_batch``: lag + running-sum
"islands" over ``PARTITION BY user_id ORDER BY ts``) is correct but has one
pathological shape at scale: the per-user window is sequential, so a
hyperactive key's WHOLE timeline — a bot user with 10⁹ events at 100 TB —
funnels through one task (measured 2.1× on the hostile-skew probe with a
50%-hot user).

:func:`sessionize_split` removes that funnel without changing the result:

1. **Pre-split by coarse time range.** Each event gets a bucket
   ``floor(unix_micros(ts) / split_micros)``; the event-level window runs
   per ``(user, bucket)``, so the hot user's timeline spreads across
   ``span / split_micros`` parallel tasks. Any positive split width is
   CORRECT (the stitch below re-checks real gaps); width only tunes
   parallelism vs stitch volume.
2. **Aggregate local sessions.** Events collapse to one row per local
   session inside the bucket — the per-event data volume never crosses a
   per-user boundary again.
3. **Stitch at boundaries.** Over the per-user *session summaries* (orders
   of magnitude smaller than events), re-run the same islands construction
   on the session start/end timestamps: a local session merges into its
   predecessor iff the boundary gap ≤ the session gap. Only the last
   session of bucket *i* and the first of bucket *i+1* can ever merge —
   interior sessions re-emerge unchanged — because within a bucket
   consecutive local sessions are gap-separated by construction.

Equivalence argument (shared value oracle ``sessionize_batch``): sessions
are disjoint time intervals, so merging is transitive along consecutive
pairs in start order, which is exactly what the running-sum stitch
computes; the stitched running sum of new-session flags equals the
original per-event ``session_seq`` because each final session contains
exactly one flag=1 row. NULL-timestamp rows reproduce the original
window's semantics exactly: ``lag(ts)`` is NULL for every row after a
NULL-ts row, so in BOTH forms each NULL-ts event is a singleton session
ordered before the key's real sessions (Spark ASC = NULLS FIRST), and a
NULL boundary gap never merges (the stitch flags on ``prev_end IS NULL``
just like the event form flags on ``prev_ts IS NULL``).

Scale notes (100 TB): one event-volume shuffle either way — this form
hashes on (user, bucket) instead of (user), which is what breaks the hot
key apart. The stitch adds two session-volume shuffles (window + final
merge agg), both map-side-combinable and proportional to the number of
sessions, not events. The stitch window is still per-user sequential, but
over session summaries; an adversary needs every event in its own session
(all gaps > gap_micros) to regrow it to O(events) — at which point the
data has no session structure to compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MICROS = 1_800_000_000  # 30 min, matching q_sessionize_batch
DEFAULT_SPLIT_MICROS = 21_600_000_000  # 6 h coarse pre-split ranges


def sessionize_split(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    gap_micros: int = SESSION_GAP_MICROS,
    split_micros: int = DEFAULT_SPLIT_MICROS,
) -> DataFrame:
    """Gap-based sessions, skew-safe; value-identical to the window form.

    Returns one row per (user, session): ``user_id, session_seq,
    session_start, session_end, n_events, session_value`` — the exact
    output contract of ``q_sessionize_batch``.
    """
    if split_micros <= 0:
        raise ValueError("split_micros must be positive")
    user = F.col(user_col)
    ts = F.col(ts_col)

    # -- stage 1: event-level sessionize WITHIN (user, time bucket) --------
    bucket = F.floor(F.unix_micros(ts) / F.lit(split_micros)).alias("__bucket")
    w_local = Window.partitionBy(user_col, "__bucket").orderBy(ts_col, order_col)
    prev_ts = F.lag(ts_col).over(w_local)
    is_new_local = F.when(
        prev_ts.isNull()
        | (F.unix_micros(ts) - F.unix_micros(prev_ts) > gap_micros),
        1,
    ).otherwise(0)
    local = (
        events.select(user_col, ts_col, order_col, value_col, bucket)
        .withColumn("__local_seq", F.sum(is_new_local).over(w_local))
        .groupBy(user_col, "__bucket", "__local_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__value_dec"),
        )
    )

    # -- stage 2: stitch over per-user SESSION summaries -------------------
    # Bucket ranges partition time, so start order never interleaves
    # buckets; NULL-ts singletons (bucket NULL) sort first, mirroring the
    # event window's NULLS FIRST. __local_seq breaks the all-NULL-start tie
    # in original event order.
    w_user = Window.partitionBy(user_col).orderBy(
        F.col("session_start").asc_nulls_first(),
        F.col("__bucket").asc_nulls_first(),
        F.col("__local_seq"),
    )
    prev_end = F.lag("session_end").over(w_user)
    is_new = F.when(
        prev_end.isNull()
        | (
            F.unix_micros(F.col("session_start")) - F.unix_micros(prev_end)
            > gap_micros
        ),
        1,
    ).otherwise(0)
    stitched = local.withColumn("session_seq", F.sum(is_new).over(w_user))

    return stitched.groupBy(user_col, "session_seq").agg(
        F.min("session_start").alias("session_start"),
        F.max("session_end").alias("session_end"),
        F.sum("n_events").alias("n_events"),
        F.sum("__value_dec").cast("double").alias("session_value"),
    )
