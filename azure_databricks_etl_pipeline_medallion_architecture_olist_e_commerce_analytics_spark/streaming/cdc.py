"""Streaming CDC apply: keyed upserts from a change stream into a table.

The reference's silver layer is append-only streaming tables
(/root/reference/scripts/silver/Silver_orders.py:16-26); real CDC feeds
(Debezium, change exports) instead carry *updates* per key, and the sink must
apply them as a MERGE. On Databricks that is ``foreachBatch`` +
``MERGE INTO`` a Delta table; this module is the same shape on stock Spark +
parquet:

- each microbatch is first collapsed to its **latest change per key**
  (``row_number`` over the sequencing column, descending — a batch can carry
  several versions of one key and only the last may win),
- then merged into the current table snapshot with
  a per-key latest-wins window over union(snapshot, batch) — the
  sequence comparison covers the STORED row too, so stale late batches
  cannot overwrite newer data,
- and the result is committed as a **new versioned snapshot directory**
  (``v=N+1``) with a tiny ``_VERSION`` pointer file flipped last — readers
  resolve the pointer, then read an immutable directory, so a crash
  mid-write never corrupts the current version (the pointer still names the
  old complete snapshot). This is the minimal open-source stand-in for a
  table format's atomic commit log.

Scale notes:
- Per microbatch the cost is one key-partitioned window over
  union(snapshot, batch). At 100 TB the snapshot side is the dominant
  term — partition the snapshot by a stable hash of the key so the union
  prunes to the key ranges the batch actually touches, or bucket both
  sides (sinks.py ``bucket_by``) to drop the Exchange entirely.
- Full-snapshot rewrite per batch is the parquet tax relative to a
  format with row-level commits; the versioned layout at least makes each
  rewrite atomic, keeps readers unblocked, and old versions double as
  time-travel snapshots until vacuumed (:func:`vacuum_versions`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_POINTER = "_VERSION"


def _version_path(table_path: str, version: int) -> str:
    return os.path.join(table_path, f"v={version}")


def current_version(table_path: str) -> int:
    """Resolve the committed snapshot version (0 = empty table)."""
    ptr = os.path.join(table_path, _POINTER)
    if not os.path.exists(ptr):
        return 0
    with open(ptr, encoding="utf-8") as fh:
        return int(fh.read().strip())


def read_current(spark: SparkSession, table_path: str) -> DataFrame | None:
    """Read the current committed snapshot, or None for an empty table."""
    v = current_version(table_path)
    return spark.read.parquet(_version_path(table_path, v)) if v else None


def _commit(df: DataFrame, table_path: str, version: int) -> None:
    df.write.mode("overwrite").parquet(_version_path(table_path, version))
    tmp = os.path.join(table_path, _POINTER + ".tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(table_path, _POINTER))  # atomic pointer flip


def apply_changes_batch(
    spark: SparkSession,
    batch: DataFrame,
    table_path: str,
    keys: list[str],
    sequence_by: str,
) -> None:
    """Apply one change-batch: highest ``sequence_by`` per key wins —
    compared against BOTH the rest of the batch and the stored snapshot
    row, so a stale change delivered in a later batch cannot overwrite
    newer data (the same contract DLT's APPLY CHANGES enforces by
    comparing SEQUENCE BY against the target).

    Requirements: ``sequence_by`` must totally order each key's changes
    (pass a struct(ts, unique_id) when timestamps can tie — an arbitrary
    tie winner would also break replay idempotency), and rows with a NULL
    key are dropped as malformed (NULL never equi-matches, so they would
    accumulate as duplicates instead of upserting).

    Idempotent per batch content: re-applying the same batch produces an
    identical next snapshot, which is what makes foreachBatch's
    at-least-once redelivery safe here.
    """
    keyed = batch
    for k in keys:
        keyed = keyed.filter(F.col(k).isNotNull())
    v = current_version(table_path)
    target = read_current(spark, table_path)
    candidates = (
        keyed.unionByName(target.select(*keyed.columns))
        if target is not None
        else keyed
    )
    w = Window.partitionBy(*keys).orderBy(F.desc(sequence_by))
    merged = (
        candidates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    _commit(merged, table_path, v + 1)


def run_cdc_apply(
    changes: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: list[str],
    sequence_by: str,
) -> None:
    """Run a change stream into a keyed table with one availableNow pass.

    ``foreachBatch`` gives the batch DataFrame + exactly-once-tracked batch
    id; the merge itself runs as a plain batch job per microbatch (the same
    execution DLT's ``apply_changes`` bottoms out in).
    """
    spark = changes.sparkSession

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        apply_changes_batch(spark, batch, table_path, keys, sequence_by)

    q = (
        changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def vacuum_versions(table_path: str, keep: int = 2) -> list[int]:
    """Delete snapshot directories older than the newest ``keep`` versions
    (never the current one); returns the versions removed."""
    import shutil

    cur = current_version(table_path)
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(table_path)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    )
    doomed = [v for v in versions if v < cur and v <= cur - keep]
    for v in doomed:
        shutil.rmtree(_version_path(table_path, v), ignore_errors=True)
    return doomed
