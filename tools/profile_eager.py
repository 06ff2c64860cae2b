"""Per-eager-job profile of a catalog query: monkey-times every driver-side
action (localCheckpoint / count / collect / first / limit().count) during
fn(spark, sf_dir) construction, then times the noop-sink execution — the
construct-vs-execute split that guided the round-10 ANN work, applied to any
query.

    python tools/profile_eager.py community_modularity kcore_decompose ...
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:  # Spark 4: concrete instances are the classic subclass, which
    # overrides these methods — patch the class actually in the MRO
    from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
except ImportError:  # pragma: no cover - Spark 3.x layout
    from pyspark.sql import DataFrame  # noqa: E402

from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark import (  # noqa: E402
    get_spark,
)
from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.queries import (  # noqa: E402
    SPARK_QUERIES,
)

from bench import release_cached_state  # noqa: E402


def _wrap(name, orig, log):
    def inner(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig(self, *a, **kw)
        dt = time.perf_counter() - t0
        # innermost repo frame (skip this file)
        site = ""
        for fr in reversed(traceback.extract_stack()[:-1]):
            if "profile_eager" in fr.filename:
                continue
            if "azure_databricks" in fr.filename or fr.filename.endswith(
                "queries.py"
            ):
                site = f"{os.path.basename(fr.filename)}:{fr.lineno}"
                break
        log.append((name, dt, site))
        return out

    return inner


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-eager")
    log: list = []
    orig = {
        "localCheckpoint": DataFrame.localCheckpoint,
        "count": DataFrame.count,
        "collect": DataFrame.collect,
        "first": DataFrame.first,
    }
    for name in sys.argv[1:]:
        fn = SPARK_QUERIES.get(name)
        if fn is None:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        # one untimed warm pass (codegen/classload), as bench.py does
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_cached_state(spark)
        for attr, f in orig.items():
            setattr(DataFrame, attr, _wrap(attr, f, log))
        log.clear()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_construct = time.perf_counter() - t0
        for attr, f in orig.items():
            setattr(DataFrame, attr, f)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec = time.perf_counter() - t1
        print(f"\n=== {name}: construct {t_construct:.3f}s  execute {t_exec:.3f}s")
        for op, dt, site in log:
            print(f"    {dt:7.3f}s  {op:<16s} {site}")
        release_cached_state(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
