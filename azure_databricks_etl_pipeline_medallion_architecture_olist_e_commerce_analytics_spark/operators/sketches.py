"""Heavy hitters (frequent items) with the Misra-Gries sketch — candidates
from one bounded-memory pass, exact counts from a candidates-only recount.

``top_ngrams`` (textops.py) computes exact frequencies for everything — an
O(distinct items) shuffle. On a 100 TB corpus the distinct-token universe is
billions of rows of aggregation state, while the items anyone asks about are
the few above a frequency threshold. The classic fix is a two-phase plan:

1. **Sketch pass** — each partition runs Misra-Gries with k counters over
   its rows (bounded memory, one pass, inside ``mapInPandas`` so batches
   arrive as Arrow and counting uses vectorized ``value_counts``). A
   partition's surviving items are a superset of every item with
   within-partition frequency > n_p/k; by pigeonhole, any item with GLOBAL
   frequency > n/k exceeds n_p/k in at least one partition, so the union of
   survivors — O(k × partitions) rows, independent of data size — contains
   every true heavy hitter. No false negatives, provably.
2. **Recount pass** — exact counts for candidates only: a broadcast semi
   join prunes the stream to candidate rows, then one aggregation whose
   state is O(candidates), not O(distinct). The final ``> n/k`` filter uses
   the exact counts, so false positives from phase 1 drop out.

Result: exact answers (same rows as a full groupBy + HAVING), aggregation
state bounded by O(k × partitions) instead of O(distinct items).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partition(k: int):
    """Per-partition Misra-Gries over Arrow batches of a single `item` column.

    Batch-merge variant: add each batch's ``value_counts`` into the counter
    table, then decrement by the (len-k)-th smallest count in ONE step and
    drop non-positives — at most two passes reduce to <= k counters, where
    min-at-a-time decrementing is worst-case quadratic in batch cardinality
    (a high-distinct batch would loop thousands of O(len) subtractions).
    Decrements only ever shrink counts, so survivors still over-approximate
    the > n_p/k set (the guarantee the candidate phase needs).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: pd.Series | None = None
        for pdf in batches:
            vc = pdf["item"].value_counts()
            counters = vc if counters is None else counters.add(vc, fill_value=0)
            while len(counters) > k:
                # the smallest (len-k) counters must die; subtracting the
                # largest of their counts kills them all in one pass
                cut = counters.nsmallest(len(counters) - k).max()
                counters = counters - cut
                counters = counters[counters > 0]
        if counters is None or counters.empty:
            return
        yield pd.DataFrame({"item": counters.index.astype(str)})

    return gen


def heavy_hitters(df: DataFrame, col, k: int = 100) -> DataFrame:
    """Items of ``col`` with frequency strictly greater than n/k, with exact
    counts — computed with O(k × partitions) sketch state + a candidates-only
    recount (see module docstring).

    ``col`` may be a column name or an expression producing one value per
    row (pre-explode arrays yourself). Items are counted by their string
    form (the sketch's Arrow schema is ``item string``), which is lossless
    for strings and integers.
    """
    c = F.col(col) if isinstance(col, str) else col
    items = df.select(c.cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )

    candidates = (
        items.mapInPandas(_misra_gries_partition(k), "item string")
        .distinct()
    )
    totals = items.agg(F.count(F.lit(1)).alias("__n"))
    exact = (
        items.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        exact.join(F.broadcast(totals))
        .filter(F.col("freq") > F.col("__n") / k)
        .select("item", "freq")
    )
