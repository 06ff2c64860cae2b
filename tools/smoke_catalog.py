"""Pre-commit gate: run EVERY catalog query exactly the way the driver does.

For each entry in ``__spark_entry__.queries()``, call ``fn(spark, sf_dir)``
and execute the resulting plan through the ``noop`` sink (full computation,
no output cost) — the same shape the driver's bench loop uses.  A query that
throws at plan or execution time is reported and the script exits non-zero,
so a single broken entry can never again take down the driver's whole bench
pass silently (round-1 failure mode: one AnalysisException, zero timings).

Usage:
    python tools/smoke_catalog.py                    # sf0.1, all queries
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/smoke_catalog.py
    python tools/smoke_catalog.py name1 name2        # subset
    SPARK_GRAFT_SMOKE_SHUFFLE=<seed> python tools/smoke_catalog.py
        # randomized execution order: catches inter-query state leaks
        # (temp-view collisions, cache/checkpoint interference) that a
        # fixed catalog order could mask — the driver may run any prefix
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark import (  # noqa: E402
    get_spark,
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("smoke")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    subset = set(sys.argv[1:])

    items = list(queries.items())
    seed = os.environ.get("SPARK_GRAFT_SMOKE_SHUFFLE")
    if seed is not None:
        import random

        random.Random(int(seed)).shuffle(items)

    failed: list[str] = []
    for name, fn in items:
        if subset and name not in subset:
            continue
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            status = "ok"
        except Exception:
            failed.append(name)
            status = "FAIL"
            traceback.print_exc()
        elapsed = time.perf_counter() - t0
        oracle = "oracle" if name in oracles else "rows-only"
        print(f"{status:4s} {elapsed:7.2f}s  {name}  [{oracle}]", flush=True)
        from bench import release_cached_state

        release_cached_state(spark)

    n_run = len([1 for name, _ in items if not subset or name in subset])
    print(
        f"\n{n_run - len(failed)}/{n_run} ok "
        f"(catalog {len(queries)}, {len(oracles)} with oracles), sf_dir={sf_dir}"
    )
    if failed:
        print("FAILED:", ", ".join(failed))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
