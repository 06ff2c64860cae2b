"""Generate a 10x replica of the sf0.1 testdata for scaling probes.

Tiles every table K times with key offsets that preserve referential
integrity (orders->customer, lineitem->orders/part/supplier, events->user),
so every catalog query runs unchanged. Document texts get a per-replica
suffix token so near-dup structure stays per-replica (a pure copy would
make cross-replica duplicate pairs grow quadratically — a semantic change,
not a scaling measurement).

Output: /tmp/spark_graft_scale/sf1/*.parquet  (lineitem ~6M rows)

Never touches /root/testdata (read-only).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark import (  # noqa: E402
    get_spark,
)
from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.sources.loader import (  # noqa: E402
    load_table,
)

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_scale/sf1"
K = 10

# table -> {column: stride_source_table}  (stride = 1 + max(key) of source)
OFFSETS = {
    "customer": {"c_custkey": "customer.c_custkey"},
    "supplier": {"s_suppkey": "supplier.s_suppkey"},
    "part": {"p_partkey": "part.p_partkey"},
    "orders": {"o_orderkey": "orders.o_orderkey", "o_custkey": "customer.c_custkey"},
    "lineitem": {
        "l_orderkey": "orders.o_orderkey",
        "l_partkey": "part.p_partkey",
        "l_suppkey": "supplier.s_suppkey",
    },
    "events": {"event_id": "events.event_id", "user_id": "events.user_id"},
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}


def main() -> None:
    spark = get_spark("gen-scale")
    os.makedirs(OUT, exist_ok=True)

    strides: dict[str, int] = {}
    for ref in {r for m in OFFSETS.values() for r in m.values()}:
        tbl, col = ref.split(".")
        strides[ref] = (
            load_table(spark, SRC, tbl).agg(F.max(col)).first()[0] + 1
        )

    for tbl in ("region", "nation"):
        load_table(spark, SRC, tbl).write.mode("overwrite").parquet(
            os.path.join(OUT, f"{tbl}.parquet")
        )
        print(f"{tbl}: copied")

    for tbl, keymap in OFFSETS.items():
        base = load_table(spark, SRC, tbl)
        reps = []
        for k in range(K):
            rep = base
            for col, ref in keymap.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(k * strides[ref]))
            if tbl == "documents":
                rep = rep.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" rep{k}"))
                ).withColumn("n_chars", F.length("text").cast("long"))
            reps.append(rep)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(os.path.join(OUT, f"{tbl}.parquet"))
        print(f"{tbl}: {out.count()} rows")


if __name__ == "__main__":
    main()
