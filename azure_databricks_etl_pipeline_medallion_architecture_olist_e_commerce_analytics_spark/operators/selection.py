"""Distributed selection: exact k-th order statistic with no global sort.

A GLOBAL exact quantile has no partition key to hide behind — the window
trick grouped per-key medians use would funnel every row through one task.
This module is histogram-pruned quickselect instead: each round buckets
the current candidate range into ``bins`` histogram bins with one
map-side-combined aggregate, the driver reads the O(bins)-row histogram,
picks the bin containing the target rank, and the next round recurses into
that bin. The candidate range shrinks ``bins``× per round, so 64-bit
doubles converge in ≤ log_bins(2^52) ≈ 5 rounds; a degenerate
single-value bin answers immediately and a remnant at or below
``threshold`` rows resolves by a bounded sorted collect.

Driver traffic is O(bins) rows per round plus the final ≤ threshold
values — the same bounded-collect class as the IVF centroid seeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_kth(
    df: DataFrame,
    value_col: str,
    k: int,
    bins: int = 1024,
    threshold: int = 65_536,
) -> float:
    """The k-th smallest (1-based) value of ``value_col`` (non-null rows).

    ``threshold`` bounds the final driver collect; ``bins`` trades rounds
    against histogram width. Exact for any distribution, including heavy
    duplication (a bin that collapses to one value IS the answer).
    """
    cur = df.select(F.col(value_col).alias("__v")).where(F.col("__v").isNotNull())
    below = 0
    first_round = True
    while True:
        mn, mx, cnt = cur.agg(F.min("__v"), F.max("__v"), F.count(F.lit(1))).first()
        if first_round:
            # guard once on the full relation: an empty input would return
            # None (TypeError far from the cause) and k beyond the row
            # count would silently return the maximum — both must raise
            if not 1 <= k <= cnt:
                raise ValueError(
                    f"exact_kth: k={k} outside 1..{cnt} non-null rows"
                )
            first_round = False
        if mn == mx:
            return mn
        if cnt <= threshold:
            rows = cur.orderBy("__v").limit(k - below).collect()
            return rows[-1]["__v"]
        width = (mx - mn) / float(bins)
        bucket = F.least(
            F.floor((F.col("__v") - F.lit(mn)) / F.lit(width)), F.lit(bins - 1)
        )
        hist = {
            int(r["b"]): r["c"]
            for r in cur.groupBy(bucket.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        cum = below
        target = bins - 1
        for b in range(bins):
            c = hist.get(b, 0)
            if cum + c >= k:
                target = b
                break
            cum += c
        below = cum
        cur = cur.where(bucket == target).localCheckpoint()


def global_exact_median(
    df: DataFrame, value_col: str, bins: int = 1024, threshold: int = 65_536
) -> tuple[int, float]:
    """(n_values, exact median) — median = (lo + hi) / 2 of the explicit
    middle ranks, the same no-interpolation-ambiguity contract as the
    per-group grouped_median query, so the float math is engine-identical."""
    vals = df.select(F.col(value_col)).where(F.col(value_col).isNotNull())
    n = vals.count()
    if n == 0:
        raise ValueError("global_exact_median: no non-null values")
    k_lo, k_hi = (n + 1) // 2, (n + 2) // 2
    lo = exact_kth(vals, value_col, k_lo, bins, threshold)
    # odd n: both middle ranks coincide — don't re-run the whole selection
    hi = lo if k_hi == k_lo else exact_kth(vals, value_col, k_hi, bins, threshold)
    return n, (lo + hi) / 2
