"""Dump ``explain("formatted")`` for named catalog queries to files.

Round-10 optimization evidence: the judge checks plan claims against
committed ``plans/r10/<query>_{before,after}.txt`` files. Usage:

    python tools/explain_dump.py before q1 q2 ...   # -> plans/r10/<q>_before.txt
    python tools/explain_dump.py after  q1 q2 ...   # -> plans/r10/<q>_after.txt

Runs on the bench's session shape (local[$SPARK_GRAFT_CPUS], sf from
$SPARK_GRAFT_SF_DIR) so the captured plans are the ones the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark import (  # noqa: E402
    get_spark,
)
from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.queries import (  # noqa: E402
    SPARK_QUERIES,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get(
    "SPARK_GRAFT_PLANS_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"
    ),
)


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), "first arg must be before|after"
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("explain-dump")
    rc = 0
    for name in names:
        fn = SPARK_QUERIES.get(name)
        if fn is None:
            print(f"unknown query: {name}", file=sys.stderr)
            rc = 1
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure instead of dying
            plan = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}"
            rc = 1
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
