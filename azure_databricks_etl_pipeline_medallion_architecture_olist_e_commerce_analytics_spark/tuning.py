"""Runtime session tuning for externally-created SparkSessions.

The driver hands ``entry``/``queries`` an already-built SparkSession; these
are the runtime-settable confs the engine depends on for correctness
(UTC timezone for oracle comparability, nanos-as-long for the events table)
and scale behavior (AQE).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # restore the runaway-recursion admission guard to its default on every
    # query entry: q_recursive_chain must raise it for the duration of its
    # (lazy) execution, and the returned DataFrame is collected by the
    # caller after the function returns — so the reset lives here, at the
    # next query's entry point, not in a finally that would fire too early
    "spark.sql.cteRecursionRowLimit": "1000000",
}


def tune_session(spark: SparkSession) -> SparkSession:
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this session build; engine defaults apply
    return spark
