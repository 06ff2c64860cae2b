"""Bucketed-table co-located joins: pre-shuffle once at write time, join
with ZERO runtime exchange forever after.

The reference's Databricks substrate gets this from Delta liquid clustering
+ the Photon shuffle-less join; the open-Spark equivalent is hash
bucketing (``DataFrameWriter.bucketBy``): both tables are written
pre-partitioned into the same number of hash buckets on the join key, the
catalog records the bucket spec, and Catalyst plans every subsequent
equi-join on that key as a SortMergeJoin with NO Exchange on either side —
the single biggest shuffle eliminated for a fact table that is joined on
the same key by every downstream query.

Scale notes:
- The write pays one hash shuffle (the same shuffle a single join would
  pay) and then amortizes it over every future join/aggregation on the
  key. At 100 TB a fact-to-fact join without bucketing shuffles BOTH
  sides every run; with it, neither side, ever.
- ``sortBy`` within buckets additionally removes the runtime sort of the
  SortMergeJoin (files arrive sorted), leaving pure streaming merge.
- Bucket counts must match across tables to co-locate; a power of two
  lets a later scale-up coalesce buckets pairwise.
- groupBy on the bucket key also becomes exchange-free (partial = final
  aggregation within each bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed, in-bucket-sorted parquet table.

    ``mode("overwrite")`` makes the operator idempotent per run; the one
    hash shuffle here is the *last* shuffle this data pays on ``key``.
    """
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_equi_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    key: str,
    buckets: int = 16,
    table_prefix: str = "__bucketed",
    base_path: str | None = None,
) -> DataFrame:
    """Materialize both sides bucketed on ``key`` and return the co-located
    join of the bucketed reads.

    The returned plan contains no ShuffleExchange (asserted in
    tests/test_plans.py): each task merge-joins bucket i of the left table
    against bucket i of the right table straight off the files.
    """
    lt, rt = f"{table_prefix}_l", f"{table_prefix}_r"
    # The two writes are independent jobs writing disjoint tables — submit
    # them from a 2-thread pool so the second write's tasks back-fill the
    # first's straggler tail (optimization guide §2.6) instead of waiting
    # for it. Each invocation still performs BOTH writes; only their wall
    # clocks overlap. InheritableThread propagates the caller's job group/
    # description so a driver-side cancel still reaches both jobs.
    from pyspark.util import InheritableThread

    errs: list[BaseException] = []

    def _write(df: DataFrame, table: str) -> None:
        try:
            write_bucketed(
                df, table, key, buckets,
                path=None if base_path is None else f"{base_path}/{table}",
            )
        except BaseException as exc:  # surface on the caller thread
            errs.append(exc)

    threads = [
        InheritableThread(target=_write, args=(left, lt)),
        InheritableThread(target=_write, args=(right, rt)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]
    return spark.table(lt).join(spark.table(rt), key)
