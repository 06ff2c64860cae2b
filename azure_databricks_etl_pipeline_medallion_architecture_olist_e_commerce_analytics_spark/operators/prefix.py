"""Scale-safe global prefix sums and training-shard packing.

A global running total (``SUM() OVER (ORDER BY ...)``) in Spark executes
the window over a SINGLE partition — every row funnels through one task,
the textbook scale cliff. This module implements the classic two-phase
distributed scan instead:

1. range-partition + locally sort on the order key (one shuffle — the same
   one any global ordering pays),
2. per-partition partial sums via one cheap aggregate (map-side combined;
   result is O(partitions) rows collected to the driver — bounded by
   cluster size, not data),
3. an Arrow-batched ``mapInPandas`` pass adds each partition's broadcast
   prefix offset to its local cumulative sum — zero additional shuffles.

The partitioned frame is persisted across the two passes so both see the
identical partitioning (range boundaries come from sampling).

``pack_shards`` builds on it: assign documents to fixed-token-budget
training shards in a deterministic global order — the export step that
turns a curated corpus into training shards. Shard id is
``floor(tokens_before / budget)`` (exact integer math, so a SQL window
twin reproduces it bit-for-bit).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_running_total(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out: str = "running_total",
) -> DataFrame:
    """Global running total of ``value_col`` in ``order_cols`` order,
    emitted EXCLUSIVE of the current row (``tokens_before`` semantics —
    the inclusive total is ``out + value_col``).

    Returns the input columns plus ``out`` (long). One range shuffle total.
    """
    ranged = df.repartitionByRange(*order_cols).sortWithinPartitions(*order_cols)
    ranged = ranged.persist()
    try:
        partials = (
            ranged.withColumn("__pid", F.spark_partition_id())
            .groupBy("__pid")
            .agg(F.sum(F.col(value_col).cast("long")).alias("__psum"))
            .collect()
        )
    except Exception:
        ranged.unpersist()
        raise
    # __psum is NULL for a partition whose every value is NULL (SQL SUM
    # skips nulls) — such a partition contributes 0 to the prefix
    sums = {int(r["__pid"]): int(r["__psum"] or 0) for r in partials}
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]

    fields = ranged.schema.fields
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in fields] + [f"{out} long"]
    )

    def scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        running = offsets.get(pid, 0)
        for pdf in it:
            # NULL values add 0 to the scan — the same skip-null semantics
            # the JVM SUM applied in the offsets phase, so the two phases
            # stay consistent on data with missing values
            vals = pdf[value_col].fillna(0).astype("int64")
            inclusive = vals.cumsum() + running
            pdf = pdf.copy()
            pdf[out] = inclusive - vals  # exclusive prefix
            running = int(inclusive.iloc[-1]) if len(pdf) else running
            yield pdf

    result = ranged.mapInPandas(scan, schema=out_schema)
    # note: unpersist is deferred to action completion by Spark's cache
    # manager; eager unpersist here would recompute the two passes with
    # potentially different range samples. Callers holding many of these
    # can unpersist via spark.catalog.clearCache() between jobs.
    return result


def pack_shards(
    docs: DataFrame,
    budget: int,
    order_cols: list[str],
    token_col: str,
) -> DataFrame:
    """Assign each document to a training shard of ~``budget`` tokens.

    Deterministic: documents pack in ``order_cols`` order; a document
    belongs to ``floor(tokens_before / budget)``. Oversized documents
    simply span budget boundaries (standard greedy packing).
    """
    with_prefix = with_running_total(docs, order_cols, token_col, out="tokens_before")
    return with_prefix.withColumn(
        "shard_id", F.expr(f"tokens_before div {int(budget)}")
    )
