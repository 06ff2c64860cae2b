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
    """The k-th smallest (1-based) value of ``value_col``.

    Null and NaN rows are excluded (NaN would poison min/max and every
    bucket expression — Spark sorts NaN greatest, so treating it as a
    value would also diverge from any SQL oracle); ±inf participate as
    ordinary extreme values via a one-pass pre-split. ``threshold``
    bounds the final driver collect; ``bins`` trades rounds against
    histogram width. Exact for any distribution, including heavy
    duplication (a bin that collapses to one value IS the answer).
    """
    cur = df.select(F.col(value_col).alias("__v")).where(F.col("__v").isNotNull())
    is_float = dict(cur.dtypes)["__v"] in ("float", "double")
    if is_float:
        cur = cur.where(~F.isnan("__v"))
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
                    f"exact_kth: k={k} outside 1..{cnt} non-null/non-NaN rows"
                )
            first_round = False
            if is_float and (mn == float("-inf") or mx == float("inf")):
                # infinities break range arithmetic (mx-mn = inf/NaN); they
                # are order-extremes, so resolve-or-strip them in one pass
                n_neg, n_pos = cur.agg(
                    F.count(F.when(F.col("__v") == float("-inf"), 1)),
                    F.count(F.when(F.col("__v") == float("inf"), 1)),
                ).first()
                if k <= n_neg:
                    return float("-inf")
                if k > cnt - n_pos:
                    return float("inf")
                cur = cur.where(F.col("__v") > float("-inf")).where(
                    F.col("__v") < float("inf")
                ).localCheckpoint()
                below = n_neg
                continue
        if mn == mx:
            return mn
        if cnt <= threshold:
            rows = cur.orderBy("__v").limit(k - below).collect()
            return rows[-1]["__v"]
        # overflow-safe bin width and bucket: (mx - mn) can overflow to inf
        # for extreme finite ranges, so divide each endpoint first; the
        # bucket uses v/width - mn/width (never forms v - mn), keeping
        # every intermediate <= ~bins * mx/(mx-mn)
        width = mx / float(bins) - mn / float(bins)
        if width <= 0.0:
            # near-degenerate range: (mx-mn)/bins rounds to 0 even though
            # mn < mx — the range then spans only O(bins) representable
            # doubles, so a value-histogram is a bounded driver collect
            return _resolve_by_value_counts(cur, k, below)
        bucket = F.least(
            F.floor(F.col("__v") / F.lit(width) - F.lit(mn / width)),
            F.lit(bins - 1),
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
        if hist.get(target, 0) == cnt:
            # no progress: every row fell in one bucket, which only happens
            # when |mn|/(mx-mn) is so large the bucket arithmetic loses
            # integer precision — a relative range that tiny spans only
            # O(2^53/bins) ulps, i.e. a bounded set of distinct values
            return _resolve_by_value_counts(cur, k, below)
        below = cum
        cur = cur.where(bucket == target).localCheckpoint()


def _resolve_by_value_counts(cur: DataFrame, k: int, below: int) -> float:
    """Resolve the k-th value by exact per-value counts.

    Only called when the candidate range is degenerate relative to double
    precision (bin-width underflow or a no-progress round), which bounds
    the distinct-value count — see the call sites' comments.
    """
    rows = sorted(
        cur.groupBy("__v").agg(F.count(F.lit(1)).alias("c")).collect(),
        key=lambda r: r["__v"],
    )
    cum = below
    for r in rows:
        cum += r["c"]
        if cum >= k:
            return r["__v"]
    raise AssertionError("exact_kth: rank disappeared during value-count resolve")


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
