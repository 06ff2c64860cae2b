"""Skew probe: hostile-key stress for the grouping/window/join operators.

Builds a skewed twin of the sf0.1 events/lineitem tables in which HALF of
all rows share one hot key (user_id 0 / one hot orderkey), then times the
operators whose cost concentrates on the hottest key. The point is to show
which formulations stay flat under skew (hash aggregates with map-side
partial combine, AQE skew-split joins, salted joins) and what the
known-pathological shape costs (a per-key window sort funnels the hot
group through one task) — with the engine's skew-safe twin measured
side-by-side.

Usage: python tools/skew_probe.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark import (  # noqa: E402
    get_spark,
)
from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.queries import (  # noqa: E402
    SPARK_QUERIES,
)
from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.sources.loader import (  # noqa: E402
    load_table,
)

SRC = "/tmp/spark_graft_scale/sf1"  # the 10x replica (gen_scale_data.py)
OUT = "/tmp/spark_graft_scale/skew"

PROBE = [
    "gold_fact_lineitem",  # flagship star fact: hot orderkey hits the big
    #                        SMJ chain AND the order_totals hash aggregate
    #                        (AQE skew-split + map-side combine must hold)
    "window_dedup",       # per-key window sort: the pathological shape
    "window_dedup_agg",   # skew-safe twin: map-side-combined hash agg
    "order_totals",       # hash agg on the hot lineitem key
    "grouped_median",     # per-key window over 5 event types (already coarse)
    "sessionize_batch",
    "date_expr_join",
    "skew_salted_join",   # explicit salting
    "tpch_q18",           # HAVING over the hot order
]


def build() -> None:
    spark = get_spark("skew-gen")
    os.makedirs(OUT, exist_ok=True)
    ev = load_table(spark, SRC, "events")
    # half of all events land on user 0 (deterministic by event_id parity)
    ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 2 == 0, F.lit(0)).otherwise(F.col("user_id")),
    ).write.mode("overwrite").parquet(os.path.join(OUT, "events.parquet"))
    li = load_table(spark, SRC, "lineitem")
    hot = li.agg(F.min("l_orderkey")).first()[0]
    li.withColumn(
        "l_orderkey",
        F.when(F.col("l_linenumber") % 2 == 0, F.lit(hot)).otherwise(
            F.col("l_orderkey")
        ),
    ).write.mode("overwrite").parquet(os.path.join(OUT, "lineitem.parquet"))
    for tbl in ("region", "nation", "customer", "supplier", "part", "orders",
                "documents", "embeddings"):
        load_table(spark, SRC, tbl).write.mode("overwrite").parquet(
            os.path.join(OUT, f"{tbl}.parquet")
        )


from bench import time_noop  # noqa: E402


if __name__ == "__main__":
    if not os.path.exists(os.path.join(OUT, "events.parquet")):
        build()
    spark = get_spark("skew-probe")
    print("| query | uniform sf1 (s) | 50%-hot-key sf1 (s) | ratio |")
    print("|---|---|---|---|")
    for name in PROBE:
        fn = SPARK_QUERIES[name]
        try:
            t_u = time_noop(spark, fn, SRC)
            t_s = time_noop(spark, fn, OUT)
            print(f"| {name} | {t_u:.2f} | {t_s:.2f} | {t_s / t_u:.1f}x |", flush=True)
        except Exception as exc:
            print(f"| {name} | — | — | ERROR {type(exc).__name__} |", flush=True)
