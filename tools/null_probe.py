"""Null-injection robustness probe: every catalog query must RUN against
tables where ~10% of every nullable column is NULL.

At 100 TB, nulls are routine — optional fields, failed upstream parses,
schema evolution backfills. The round-4 empty-tables probe caught eight
latent crashes; this is the next rung: rows exist but any value may be
missing. The check is crash-freedom (and sane Python-side handling), not
value parity — SQL NULL semantics make most results legitimately different
from the clean run.

Determinism: a row's value in column c is nulled iff
crc32(f"{table}:{c}:{row_ordinal}") % 10 == 0 — no RNG, so reruns probe the
identical dataset.

Usage: python tools/null_probe.py [query ...]   (default: full catalog)
"""

from __future__ import annotations

import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/spark_graft_nulls/sf0.001"
SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(OUT, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        cols = []
        for name in tbl.column_names:
            col = tbl.column(name)
            mask = pa.array(
                [
                    zlib.crc32(f"{t}:{name}:{i}".encode()) % 10 == 0
                    for i in range(len(tbl))
                ]
            )
            cols.append(pa.compute.if_else(mask, pa.scalar(None, col.type), col))
        pq.write_table(
            pa.table(dict(zip(tbl.column_names, cols))), f"{OUT}/{t}.parquet"
        )


def main() -> int:
    from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark import (
        get_spark,
    )
    from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.queries import (
        SPARK_QUERIES,
    )

    if not os.path.exists(f"{OUT}/lineitem.parquet"):
        build()
    only = set(sys.argv[1:])
    spark = get_spark("null-probe")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for name, fn in SPARK_QUERIES.items():
        if only and name not in only:
            continue
        try:
            n = fn(spark, OUT).count()
            print(f"ok   {name} ({n} rows)", flush=True)
        except ValueError as exc:
            if name == "global_median_select" and "no non-null" in str(exc):
                print(f"ok   {name} (documented empty-input contract)", flush=True)
                continue
            failures.append(f"{name}: ValueError: {exc}")
            print(f"FAIL {name}: {exc}", flush=True)
        except Exception as exc:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:200]}")
            print(f"FAIL {name}: {type(exc).__name__}: {str(exc)[:160]}", flush=True)
    print(f"\n=== {len(failures)} failures ===")
    for f in failures:
        print(f)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
