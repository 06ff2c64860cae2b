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
    # NULL values contribute 0 to the running total — deliberately NOT
    # windowed-SUM semantics (which stays NULL until the key's first
    # non-null value; streaming/stateful.py masks its output for exactly
    # that contract). Here the contract is `tokens_before`: a NULL-sized
    # row occupies a position but adds no tokens, so an all-NULL prefix
    # correctly reads 0, not NULL. The coalesce happens JVM-SIDE so the
    # Arrow column arriving in the Python scan is a non-null int64: a
    # nullable long column would reach pandas as float64, silently
    # rounding values above 2^53 while the JVM offsets phase stayed exact.
    ranged = (
        df.withColumn("__v", F.coalesce(F.col(value_col).cast("long"), F.lit(0).cast("long")))
        .repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
    )
    ranged = ranged.persist()
    try:
        partials = (
            ranged.withColumn("__pid", F.spark_partition_id())
            .groupBy("__pid")
            .agg(F.sum("__v").alias("__psum"))
            .collect()
        )
    except Exception:
        ranged.unpersist()
        raise
    sums = {int(r["__pid"]): int(r["__psum"] or 0) for r in partials}
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]

    fields = [f for f in ranged.schema.fields if f.name != "__v"]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in fields] + [f"{out} long"]
    )

    def scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        running = offsets.get(pid, 0)
        for pdf in it:
            vals = pdf["__v"]  # non-null int64 by construction
            inclusive = vals.cumsum() + running
            pdf = pdf.drop(columns="__v")
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
