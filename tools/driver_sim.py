"""Full driver simulation: vanilla session, entry() on sf0.001, then every
queries()/oracle_sql() pair value-compared against DuckDB at sf0.01 — the
exact shape of the grading driver's CORRECTNESS check, run locally in ONE
session (~2 min for the full catalog).

Usage:
    python tools/driver_sim.py                 # full catalog
    python tools/driver_sim.py name1 name2 ... # subset
    SPARK_GRAFT_SIM_SF=/root/testdata/sf0.01 python tools/driver_sim.py

High-SF shuffle-stress sweep (verdict r3 item 5): point at the sf1
replica and deliberately mis-align shuffle partitions with the core
count (a prime) so every exchange produces a different partition layout
and row arrival order than the sf0.01 runs — any hidden dependence on
shuffle order (double summation order, first()-without-sort, GK sketch
insertion order) breaks the value hash:

    SPARK_GRAFT_SIM_SF=/tmp/spark_graft_scale/sf1 \
    SPARK_GRAFT_SIM_CPUS=32 SPARK_GRAFT_SIM_SHUFFLE=37 \
    python tools/driver_sim.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from oracle_utils import compare_frames

    sf = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    cpus = os.environ.get("SPARK_GRAFT_SIM_CPUS", "8")
    shuffle = os.environ.get("SPARK_GRAFT_SIM_SHUFFLE", "8")
    mem = os.environ.get("SPARK_GRAFT_SIM_MEM", "12g")  # raise for sf1 sweeps
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.driver.memory", mem)
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_SIM_MAXRESULT", "2g"),
        )
        .config("spark.ui.showConsoleProgress", "false")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = e.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema ok", flush=True)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = f"{sf}/{t}.parquet"
        # driver testdata is a single file per table; the sf1 scale replica
        # is a Spark-written DIRECTORY of part files — glob for DuckDB
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = e.queries()
    oracles = e.oracle_sql()
    try:
        from bench import release_cached_state
    except Exception:
        release_cached_state = lambda s: None  # noqa: E731

    failures, rows_only = [], []
    t_all = time.time()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            try:
                sdf = fn(spark, sf).toPandas()
            except Exception as big:
                # high-SF sweeps: a full-width result (e.g. the 6M-row fact
                # table at sf1) can exceed spark.driver.maxResultSize — the
                # value-level compare for those ran at sf0.01; at this SF
                # fall back to a row-count + oracle-count check rather than
                # collecting gigabytes into pandas
                if "maxResultSize" not in str(big) or name not in oracles:
                    raise
                n_s = fn(spark, sf).count()
                n_d = con.execute(
                    f"SELECT COUNT(*) FROM ({oracles[name]})"
                ).fetchone()[0]
                if n_s == n_d:
                    print(
                        f"ok   {name} (count-only at this SF: {n_s} rows, "
                        f"{time.time()-t0:.1f}s)",
                        flush=True,
                    )
                else:
                    failures.append((name, [f"count {n_s} != oracle {n_d}"]))
                    print(f"FAIL {name}: count {n_s} != {n_d}", flush=True)
                release_cached_state(spark)
                continue
            if name in oracles:
                ddf = con.execute(oracles[name]).fetchdf()
                probs = compare_frames(sdf, ddf, name)
                if probs:
                    failures.append((name, probs))
                    print(f"FAIL {name}: {probs[0][:300]}", flush=True)
                else:
                    print(f"ok   {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)", flush=True)
            else:
                rows_only.append(name)
                print(f"ROWS {name} ({len(sdf)} rows) — no oracle", flush=True)
        except Exception as ex:  # noqa: BLE001
            failures.append((name, [f"err: {ex}"]))
            print(f"ERR  {name}: {str(ex)[:300]}", flush=True)
        release_cached_state(spark)

    n_run = len([q for q in queries if not only or q in only])
    print(
        f"\n=== {n_run} queries in {time.time()-t_all:.0f}s: "
        f"{n_run - len(failures) - len(rows_only)} value-match, "
        f"{len(rows_only)} rows-only, {len(failures)} FAILURES ==="
    )
    for name, probs in failures:
        print(f"  {name}: {probs[0][:200]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
