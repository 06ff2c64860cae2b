"""Time a named subset of catalog queries with bench.py's exact methodology
(untimed warm pass, then min-of-N noop-sink runs, cache release between
queries) — the per-query iteration loop of an optimization round without
paying the full 190-query sweep.

    python tools/bench_subset.py q1 q2 ...
    SPARK_GRAFT_BENCH_RUNS=3 python tools/bench_subset.py q1
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark import (  # noqa: E402
    get_spark,
)
from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.queries import (  # noqa: E402
    SPARK_QUERIES,
)

from bench import release_cached_state, time_noop_raw  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    names = sys.argv[1:]
    spark = get_spark("bench-subset")
    out = {}
    for name in names:
        fn = SPARK_QUERIES.get(name)
        if fn is None:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench-subset: {name}")
        raw = time_noop_raw(spark, fn, sf_dir, runs=runs)
        out[name] = {"min": round(min(raw), 3), "raw": [round(x, 3) for x in raw]}
        release_cached_state(spark)
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
