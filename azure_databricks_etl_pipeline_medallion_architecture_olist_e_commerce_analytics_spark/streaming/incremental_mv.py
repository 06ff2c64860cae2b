"""Incremental materialized-view maintenance — the Enzyme analog.

The reference recomputes every gold MV in full per refresh ("CREATE OR
REFRESH MATERIALIZED VIEW", full-refresh per /root/reference docs/
pipeline-flow.png). Databricks' DLT can instead maintain some MVs
*incrementally* (Enzyme); this module is that capability for grouped
aggregates on stock Spark: each microbatch folds its partial aggregate
state into a small standing state table, so a refresh costs
O(batch + groups) and never rescans history.

Composition of existing engine pieces:
- ``operators/incremental_agg``: mergeable (commutative-monoid) aggregate
  state — count/decimal-sum/min/max, avg derived at read time. DECIMAL
  accumulation makes the incremental path bit-identical to a full
  recompute under any batch split (the invariant the tests assert).
- ``streaming/cdc``'s versioned-snapshot layout: state commits land in an
  immutable ``v=N`` directory with a tiny pointer file flipped last
  (atomic on POSIX/HDFS), so readers never observe a torn state.

Exactly-once: merging is NOT content-idempotent (re-folding a delivered
batch double-counts), so the pointer records the last applied foreachBatch
batch id in the SAME atomic file as the version — redelivered batch ids
are skipped, and a crash between state write and pointer flip leaves the
old pointer naming the old complete state (the batch replays cleanly).

Scale shape per batch: one partial aggregation over the batch (map-side
combine), one state merge shuffling O(group) rows. The state table is the
only thing ever rewritten — at 100 TB of history with bounded group
cardinality the refresh cost stays flat while full refresh grows linearly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.incremental_agg import aggregate_state, finalize, merge_states

_POINTER = "_MV_STATE"


def _state_path(mv_path: str, version: int) -> str:
    return os.path.join(mv_path, f"v={version}")


def _read_pointer(mv_path: str) -> tuple[int, int]:
    """(version, last_applied_batch_id); (0, -1) for an empty MV."""
    ptr = os.path.join(mv_path, _POINTER)
    if not os.path.exists(ptr):
        return 0, -1
    with open(ptr, encoding="utf-8") as fh:
        version, batch_id = fh.read().split()
    return int(version), int(batch_id)


def _flip_pointer(mv_path: str, version: int, batch_id: int) -> None:
    tmp = os.path.join(mv_path, _POINTER + ".tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(f"{version} {batch_id}")
    os.replace(tmp, os.path.join(mv_path, _POINTER))


def read_state(spark: SparkSession, mv_path: str) -> DataFrame | None:
    v, _ = _read_pointer(mv_path)
    return spark.read.parquet(_state_path(mv_path, v)) if v else None


def read_mv(spark: SparkSession, mv_path: str) -> DataFrame | None:
    """The queryable MV: finalized view over the standing state."""
    state = read_state(spark, mv_path)
    return finalize(state) if state is not None else None


def refresh_increment(
    spark: SparkSession,
    batch: DataFrame,
    mv_path: str,
    keys: list[str],
    value: str,
    batch_id: int,
) -> bool:
    """Fold one batch into the MV state; returns False on a skipped replay."""
    version, last_batch = _read_pointer(mv_path)
    if batch_id <= last_batch:
        return False  # at-least-once redelivery of an already-folded batch
    bstate = aggregate_state(batch, keys, value)
    cur = read_state(spark, mv_path)
    merged = merge_states(cur, bstate, keys) if cur is not None else bstate
    os.makedirs(mv_path, exist_ok=True)
    merged.write.mode("overwrite").parquet(_state_path(mv_path, version + 1))
    _flip_pointer(mv_path, version + 1, batch_id)
    _vacuum_state(mv_path, keep=2)
    return True


def _vacuum_state(mv_path: str, keep: int = 2) -> None:
    """Drop state snapshots older than the newest ``keep`` (never the
    current one) — each fold writes a full new state dir, so without
    cleanup disk grows with batch count, not state size."""
    import shutil

    cur, _ = _read_pointer(mv_path)
    for d in os.listdir(mv_path):
        if d.startswith("v=") and d.split("=", 1)[1].isdigit():
            v = int(d.split("=", 1)[1])
            if v < cur and v <= cur - keep:
                shutil.rmtree(os.path.join(mv_path, d), ignore_errors=True)


def maintain_aggregate_mv(
    source: DataFrame,
    mv_path: str,
    checkpoint: str,
    keys: list[str],
    value: str,
) -> None:
    """Run an availableNow pass folding a streaming source into the MV.

    The replay guard keys on the checkpoint's foreachBatch batch ids — the
    checkpoint and the MV state pointer share a lifetime. Two skip shapes
    must be told apart:

    - ``batch_id == stored high-water mark``: the documented crash-recovery
      redelivery (crash between the MV pointer flip and the streaming
      checkpoint commit re-delivers the last batch once). refresh_increment
      correctly skips it and the MV is intact — NOT an error, even when no
      newer data arrived and the whole run is applied=0/skipped=1.
    - ``batch_id <  stored high-water mark``: the checkpoint was genuinely
      reset/relocated while mv_path persists; every restarted id replays
      below the mark and the MV would silently freeze. Raised loudly
      (reset both, or neither).
    """
    spark = source.sparkSession
    stats = {"applied": 0, "reset_skips": []}

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        bid = int(batch_id)
        _, last_batch = _read_pointer(mv_path)
        if refresh_increment(spark, batch, mv_path, keys, value, bid):
            stats["applied"] += 1
        elif bid < last_batch:
            stats["reset_skips"].append(bid)
        # bid == last_batch: benign crash-recovery redelivery — skip quietly

    q = (
        source.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if stats["reset_skips"] and not stats["applied"]:
        raise RuntimeError(
            f"maintain_aggregate_mv: batch ids {stats['reset_skips']} replayed "
            f"BELOW the MV pointer's stored batch id — the checkpoint at "
            f"{checkpoint} was reset while {mv_path} persists. The checkpoint "
            "and MV state share a lifetime: reset both or neither."
        )
