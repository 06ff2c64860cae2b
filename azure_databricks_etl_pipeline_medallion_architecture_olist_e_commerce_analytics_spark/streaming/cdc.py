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

Concurrent writers (optimistic concurrency control, the Delta commit-log
protocol re-expressed over directories):

- a writer computes its merge against the snapshot version it read, writes
  the result to a private ``.staging-*`` directory, then **claims** the
  ``v=N+1`` slot with one atomic ``os.rename(staging, v=N+1)`` — POSIX
  rename onto an existing non-empty directory fails, so exactly one of two
  racing writers wins the slot (the same put-if-absent contract Delta's
  LogStore needs from S3/ABFS; on an object store swap the rename for a
  conditional put),
- the loser detects the conflict, re-reads the NEW head, **recomputes its
  merge on top of the winner's snapshot**, and retries at ``v=N+2`` — no
  update is ever lost, which is strictly stronger than last-writer-wins
  (the failure mode of the naive overwrite-then-flip protocol is a lost
  batch, not a stale row),
- the pointer flip is monotonic under an ``flock`` (same-host scope —
  documented limitation; multi-host needs a lock service or a
  rename-as-pointer scheme), and a writer that crashes between claiming
  the slot and flipping the pointer leaves a complete, ``_SUCCESS``-marked
  snapshot that the next writer detects and repairs (flips the pointer
  forward) before retrying — claimed slots are always complete because the
  staging write finishes before the rename.

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
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_POINTER = "_VERSION"
_STAGING_PREFIX = ".staging-"


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


def _advance_pointer(table_path: str, version: int) -> None:
    """Monotonic pointer flip under an exclusive flock: concurrent flips
    (a slow winner racing a repairer, or v+1 racing v+2) can never move the
    pointer backwards. flock is same-host scope — the documented boundary
    of this substitute; multi-host needs a lock service."""
    import fcntl

    lock = os.path.join(table_path, _POINTER + ".lock")
    with open(lock, "a", encoding="utf-8") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        if version > current_version(table_path):
            tmp = os.path.join(
                table_path, _POINTER + f".tmp-{os.getpid()}-{uuid.uuid4().hex}"
            )
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write(str(version))
            os.replace(tmp, os.path.join(table_path, _POINTER))


def _commit(df: DataFrame, table_path: str, version: int) -> bool:
    """Stage the snapshot privately, then atomically claim the ``version``
    slot. Returns False when another writer already owns the slot — the
    caller must recompute its merge against the new head and retry.

    The claim is ``os.rename(staging, v=N)``: atomic on POSIX, and it
    FAILS (ENOTEMPTY/EEXIST) when the target exists as a non-empty
    directory — snapshot dirs are never empty (``_SUCCESS`` at minimum),
    so exactly one racing writer wins. Because the parquet write completes
    before the rename, a claimed slot is always a complete snapshot.
    """
    staging = os.path.join(
        table_path, f"{_STAGING_PREFIX}v{version}-{os.getpid()}-{uuid.uuid4().hex}"
    )
    df.write.mode("overwrite").parquet(staging)
    try:
        os.rename(staging, _version_path(table_path, version))
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        return False
    _advance_pointer(table_path, version)
    return True


def _repair_orphan(table_path: str, version: int) -> None:
    """Crash repair: a writer that died between claiming ``v=N`` and the
    pointer flip leaves a complete snapshot the pointer doesn't name yet.
    Flip it forward so waiters make progress instead of spinning on a head
    that never advances. Safe to race with the (slow, alive) winner — the
    flip is monotonic and the content identical."""
    vdir = _version_path(table_path, version)
    if os.path.exists(os.path.join(vdir, "_SUCCESS")):
        _advance_pointer(table_path, version)


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

    Concurrent-writer safe: the merge is recomputed from the head snapshot
    on every attempt and committed with an atomic slot claim (module
    docstring), so a writer that loses the race folds the winner's rows
    into its retry — neither batch is lost. ``max_attempts`` bounds the
    livelock case (every attempt lost to a faster writer) and raises
    rather than dropping the batch.
    """
    keyed = batch
    for k in keys:
        keyed = keyed.filter(F.col(k).isNotNull())
    max_attempts = 8
    for attempt in range(max_attempts):
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
        if _commit(merged, table_path, v + 1):
            return
        # lost the v+1 race: if the winner crashed pre-flip, repair the
        # pointer so the re-read below sees the new head; deterministic
        # linear backoff (no randomness) keeps retries reproducible
        _repair_orphan(table_path, v + 1)
        time.sleep(0.05 * (attempt + 1))
    raise RuntimeError(
        f"CDC commit conflict: lost {max_attempts} consecutive version races "
        f"at {table_path!r}; batch NOT applied (rerun the stream — the "
        "checkpoint will redeliver it)"
    )


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
    (never the current one); returns the versions removed. Also sweeps
    ``.staging-*`` leftovers from writers that crashed before their claim
    rename (a claimed slot is a ``v=N`` dir, never staging)."""
    for d in os.listdir(table_path):
        if d.startswith(_STAGING_PREFIX):
            shutil.rmtree(os.path.join(table_path, d), ignore_errors=True)
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
