"""Same-boot A/B harness for the text-family bench cluster (round-8).

The round-7 gate bench showed a thematic cluster of tokenize+explode
queries moving up vs round 6 (bm25_rank 1.56x, bpe_pairs 1.43x,
dedup_minhash_lsh 1.30x, inverted_index 1.29x, top_ngrams 1.29x,
dedup_simhash 1.23x) with zero plan movement — probably the documented
mid-round host reboot, but that was never proven on one boot. This script
times EXACTLY those queries against an arbitrary repo tree (a git worktree
of any past round), so two trees run back-to-back in one session on one
boot: if the r6 and r8 trees agree here, the r7 artifact deltas were host
drift; if they diverge, the regression is real and bisectable.

Usage:  python tools/ab_text_cluster.py <repo_root> [query ...]
Prints one JSON line. Run trees SEQUENTIALLY (never two Spark JVMs while
timing); A/B/A ordering bounds within-session drift.
"""

from __future__ import annotations

import json
import os
import sys
import time

CLUSTER = [
    "bm25_rank",
    "bpe_pairs",
    "dedup_minhash_lsh",
    "inverted_index",
    "top_ngrams",
    "dedup_simhash",
]

PKG = "azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark"


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    names = sys.argv[2:] or CLUSTER
    # the target tree FIRST on sys.path so its package wins over any other
    # checkout; keep this script free of imports from the calling tree
    sys.path.insert(0, repo)
    import importlib

    pkg = importlib.import_module(PKG)
    queries = importlib.import_module(f"{PKG}.queries")
    spark = pkg.get_spark("ab-text-cluster")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def run(fn):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def release():
        spark.catalog.clearCache()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(False)

    # fixed prologue: one untimed pass over the cluster itself (JIT + page
    # cache steady state for exactly the code under test)
    for name in names:
        run(queries.SPARK_QUERIES[name])
        release()

    out: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    for name in names:
        fn = queries.SPARK_QUERIES[name]
        run(fn)  # warm immediately before timing (codegen-cache adjacency)
        passes = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(fn)
            passes.append(time.perf_counter() - t0)
        raw[name] = [round(x, 3) for x in passes]
        out[name] = round(min(passes), 3)
        release()
    print(
        json.dumps(
            {"repo": repo, "total": round(sum(out.values()), 3), "queries": out, "raw": raw}
        )
    )


if __name__ == "__main__":
    main()
