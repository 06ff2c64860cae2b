"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[N]`` but every default here is chosen to also be
the right call on a 1000-executor cluster reading 100 TB:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting, dynamic
  broadcast conversion) — replaces hand-tuned shuffle partition counts.
- Arrow on — every Pandas-UDF extension operator moves batches, not rows.
- Session timezone pinned to UTC so results are reproducible across machines
  (and comparable against the DuckDB oracle, whose timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "medallion-engine", extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    On a real cluster the ``master`` is supplied externally and the
    local[] default is ignored by spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet TIMESTAMP(NANOS) is rejected by default; read as long and
        # convert to microsecond timestamps in sources/loader.py (same
        # truncation DuckDB applies when reading nanos into its us timestamps).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # A 150-query session generates thousands of whole-stage-codegen
        # classes; the JDK17 default 240 MB code cache fills mid-session,
        # the JIT stops compiling, and LATE queries run partially
        # interpreted (the r04 "TPC-H block 1.3-1.5x at position 120+"
        # drift). Double the cache and let the sweeper evict cold code.
        # Applies at driver-JVM launch (first session in the process);
        # harmless no-op via getOrCreate on an already-running JVM.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
        )
    )
    if not os.environ.get("SPARK_MASTER_OVERRIDE"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
