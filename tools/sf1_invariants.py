"""Invariant-level sf1 oracle for `dedup_minhash_lsh` (round-5 verdict
ask #4 — close the sweep's oracle-cost exclusions).

The full DuckDB value oracle for the banded-LSH pair output is inherently
all-pairs (O(n²) signature + intersect evaluations: 1.25B pair evals at
the 50k-doc sf1 replica — hours of DuckDB time for a check whose Spark
side finishes in seconds). Instead of burning that, this tool validates
the complete output contract with LINEAR / output-bounded checks:

1. **Structural**: id_a < id_b, no duplicate pairs.
2. **Threshold**: every emitted jaccard ≥ 0.8.
3. **Exactness**: the emitted jaccard equals the exact token-set Jaccard
   recomputed by DuckDB, on a deterministic 1-in-101 sample of the output
   (the dup-dense replica emits 180M+ pairs; the sample still re-derives
   ~1.8M of them value-exactly — O(|sample|·tokens), not O(n²)).
4. **Collision necessity**: the same sampled pairs' md5 minhash signatures
   collide in ≥ 1 of the 10 bands — signatures recomputed ONLY for the
   doc ids in the sample.
5. **Identical-set completeness**: jaccard = 1.0 ⟺ identical token sets,
   so the count of emitted 1.0-pairs must equal Σ C(m,2) over groups of
   identical sets (linear group-by). Combined with (3), the emitted
   1.0-pair set *equals* the identical-set pair set (an equal-size subset
   is the set).

What this deliberately does NOT re-verify at sf1: banding recall for
0.8 ≤ j < 1 near-dups — that is probabilistic by construction (S-curve
≥ 95% per pair at j = 0.8) and is value-verified EXACTLY by the full
all-pairs oracle at sf0.01 in every driver round. Checks 1–5 are the
properties that could silently break at scale (partitioning, banding,
chunked giant buckets, group expansion) without breaking at sf0.01.

Usage: python tools/sf1_invariants.py [sf_dir]
       (default /tmp/spark_graft_scale/sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/spark_graft_invariants"


def main() -> int:
    import duckdb

    from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark import (
        get_spark,
    )
    from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.queries import (
        SPARK_QUERIES,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf1"
    spark = get_spark("sf1-invariants")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    pairs_path = os.path.join(OUT, "minhash_pairs.parquet")
    SPARK_QUERIES["dedup_minhash_lsh"](spark, sf_dir).write.mode(
        "overwrite"
    ).parquet(pairs_path)
    t_spark = time.perf_counter() - t0

    con = duckdb.connect()
    doc_glob = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(doc_glob):
        doc_glob = os.path.join(doc_glob, "*.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{doc_glob}')")
    con.execute(
        f"CREATE VIEW p AS SELECT * FROM read_parquet('{pairs_path}/*.parquet')"
    )
    con.execute(
        r"""CREATE TABLE d AS
        SELECT doc_id,
               list_distinct(regexp_split_to_array(lower(trim(text, ' ')), '\s+')) AS s
        FROM documents"""
    )

    t0 = time.perf_counter()
    failures: list[str] = []

    def check(name: str, sql: str, want) -> None:
        got = con.execute(sql).fetchone()[0]
        status = "ok  " if got == want else "FAIL"
        if got != want:
            failures.append(f"{name}: got {got}, want {want}")
        print(f"{status} {name}: {got}", flush=True)

    n_pairs = con.execute("SELECT COUNT(*) FROM p").fetchone()[0]
    print(f"pairs emitted at sf1: {n_pairs} (spark {t_spark:.1f}s)")

    check("structural id_a < id_b violations", "SELECT COUNT(*) FROM p WHERE id_a >= id_b", 0)
    check(
        "duplicate pairs",
        "SELECT COUNT(*) FROM (SELECT id_a, id_b FROM p GROUP BY 1, 2 HAVING COUNT(*) > 1)",
        0,
    )
    check("pairs below threshold", "SELECT COUNT(*) FROM p WHERE jaccard < 0.8", 0)
    # The per-pair recompute checks are the expensive ones (a list_intersect
    # / 60-hash signature per pair). The replica is deliberately dup-dense —
    # 180M+ pairs at sf1 from mega-clusters — so these run on a DETERMINISTIC
    # 1-in-101 sample of the output (seed-free: a fixed residue of a pair-id
    # hash), which still re-derives ~1.8M pairs exactly; the structural /
    # threshold / count-equality checks above and below stay exact over the
    # FULL output.
    con.execute(
        "CREATE TABLE ps AS SELECT * FROM p WHERE (id_a * 31 + id_b) % 101 = 0"
    )
    n_sample = con.execute("SELECT COUNT(*) FROM ps").fetchone()[0]
    print(f"deterministic recompute sample: {n_sample} pairs")
    check(
        "jaccard exactness violations (sampled recompute)",
        """
        SELECT COUNT(*) FROM ps
        JOIN d da ON da.doc_id = ps.id_a
        JOIN d db ON db.doc_id = ps.id_b
        WHERE round(CAST(len(list_intersect(da.s, db.s)) AS DOUBLE)
              / (len(da.s) + len(db.s) - len(list_intersect(da.s, db.s))), 6)
              <> ps.jaccard
        """,
        0,
    )
    check(
        "band-collision violations (sampled recompute)",
        """
        WITH ids AS MATERIALIZED (
          SELECT DISTINCT id FROM (SELECT id_a AS id FROM ps UNION ALL SELECT id_b FROM ps)
        ),
        sig AS MATERIALIZED (
          SELECT d.doc_id,
                 list_transform(range(1, 61),
                   h -> list_min(list_transform(d.s, t -> md5(h::VARCHAR || ':' || t))))
                   AS sig
          FROM d JOIN ids ON ids.id = d.doc_id
        )
        SELECT COUNT(*) FROM ps
        JOIN sig a ON a.doc_id = ps.id_a
        JOIN sig b ON b.doc_id = ps.id_b
        WHERE NOT len(list_filter(range(0, 10),
              k -> a.sig[k*6+1 : k*6+6] = b.sig[k*6+1 : k*6+6])) > 0
        """,
        0,
    )
    expected_ones = con.execute(
        """
        SELECT COALESCE(CAST(SUM(m * (m - 1) // 2) AS BIGINT), 0) FROM (
          SELECT COUNT(*) AS m
          FROM d GROUP BY md5(array_to_string(list_sort(s), chr(1)))
          HAVING COUNT(*) > 1
        )
        """
    ).fetchone()[0]
    check(
        "identical-set pair completeness (count of jaccard=1.0 pairs)",
        "SELECT COUNT(*) FROM p WHERE jaccard = 1.0",
        expected_ones,
    )

    print(
        f"\n=== {len(failures)} failures, duckdb {time.perf_counter()-t0:.1f}s ==="
    )
    for f in failures:
        print("  " + f)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
