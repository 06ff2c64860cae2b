"""Table maintenance: small-file compaction and clustered rewrite — the
parquet-native analog of Delta ``OPTIMIZE [ZORDER BY]``.

The reference leans on Databricks auto-compaction
(``delta.autoOptimize.autoCompact``, /root/reference/scripts/gold/
fact_order_items.sql:15; ``pipelines.autoOptimize.managed``,
bronze_ingestion.py:43). Full-refresh MV writes here come out sized by AQE,
but STREAMING appends accumulate small files over many microbatches — this
module is the scheduled maintenance pass that rewrites them.

Design for scale:
- File inventory comes from the Hadoop FileSystem API (works on HDFS/S3A/
  local alike), never a driver-side ``os.walk`` of a distributed store.
- Plain compaction uses ``coalesce`` — a NARROW dependency that bin-packs
  existing partitions into fewer write tasks with no shuffle at all; the
  rewrite cost is one read + one write of the data, the floor for any
  compactor.
- Clustered rewrite (the OPTIMIZE ZORDER analog) routes through
  layout.cluster_frame over the ALREADY-WRITTEN files — reading cheap
  columnar data instead of re-running the build DAG, which is exactly why
  Delta runs OPTIMIZE post-write too.
- The swap is write-to-temp + delete + rename. Directory rename is atomic
  on POSIX/HDFS; object stores without atomic rename need a manifest-commit
  layer (that is the part of Delta this module does not replicate —
  documented in README's degradation matrix).
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def parquet_file_stats(spark: SparkSession, path: str) -> dict:
    """(file count, total bytes, small-file count, partitioned flag) for a
    parquet directory, via the Hadoop FS API (no driver-side local-FS
    assumptions). Recurses into subdirectories so hive-partitioned layouts
    (``k=v/part-*.parquet``) are counted, not silently reported empty."""
    fs, hpath, jvm = _fs(spark, path)
    n = total = small = 0
    partitioned = False
    stack = [hpath]
    while stack:
        cur = stack.pop()
        for status in fs.listStatus(cur):
            name = status.getPath().getName()
            if status.isDirectory():
                if "=" in name:
                    partitioned = True
                if not name.startswith((".", "_")):
                    stack.append(status.getPath())
                continue
            if not name.endswith(".parquet"):
                continue
            n += 1
            size = status.getLen()
            total += size
            if size < DEFAULT_TARGET_BYTES // 2:
                small += 1
    return {
        "n_files": n,
        "total_bytes": total,
        "n_small": small,
        "partitioned": partitioned,
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    zorder_by: tuple | list = (),
) -> dict:
    """Rewrite a parquet directory into ~``target_bytes`` files; with
    ``zorder_by`` the rewrite is Morton-clustered (OPTIMIZE ZORDER analog).

    Returns before/after file stats. No-op (returns early) when the
    directory is already within one file of the target packing and no
    clustering was requested.

    Hive-partitioned directories are rejected: a flat rewrite would drop
    the partition structure — compact each partition directory instead.
    A crash between the delete and the rename of a previous run is
    recovered on entry (the completed tmp rewrite is restored).
    """
    fs, hpath, jvm = _fs(spark, path)
    tmp = path.rstrip("/") + "._compact_tmp"
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    # crash recovery: a prior run's verified rewrite may be stranded in the
    # tmp dir with the original already deleted — restore it before stats
    if not fs.exists(hpath) and fs.exists(tmp_path):
        if not fs.rename(tmp_path, hpath):
            raise RuntimeError(f"recovery rename {tmp} -> {path} failed")

    before = parquet_file_stats(spark, path)
    if before["partitioned"]:
        raise ValueError(
            f"compact_parquet: {path} is hive-partitioned — a flat rewrite "
            "would drop the partition layout; compact each partition "
            "directory individually"
        )
    n_out = max(1, math.ceil(before["total_bytes"] / target_bytes))
    if not zorder_by and before["n_files"] <= n_out + 1:
        return {"before": before, "after": before, "skipped": True}

    df = spark.read.parquet(path)
    if zorder_by:
        from .layout import cluster_frame

        out = cluster_frame(df, list(zorder_by), num_files=n_out)
    else:
        out = df.coalesce(n_out)

    out.write.mode("overwrite").parquet(tmp)

    # verify the rewrite landed before dropping the original
    written = parquet_file_stats(spark, tmp)
    if written["n_files"] == 0:
        raise RuntimeError(f"compaction produced no files at {tmp}")
    fs.delete(hpath, True)
    if not fs.rename(tmp_path, hpath):
        raise RuntimeError(f"rename {tmp} -> {path} failed")
    after = parquet_file_stats(spark, path)
    return {"before": before, "after": after, "skipped": False}
