"""Corpus medallion pipeline (plans/corpus.py): the engine's DLT surface
applied to LLM training-data prep — bronze document ingest, silver
text-analysis columns with warn expectations, gold dedup-survivor and
mixture SQL MVs wired through LIVE. references.
"""

import re

from pyspark.sql import functions as F

from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.plans.corpus import (
    build_corpus_pipeline,
    corpus_silver_expectations,
)
from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.plans.expectations import (
    FAIL,
    WARN,
)
from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.queries import (
    SPARK_QUERIES,
)

from conftest import SF_SMALL
from conftest import formatted_plan as _formatted_plan


def test_corpus_pipeline_run_materializes_warehouse(spark):
    """Production (tables) mode: every bronze/silver/gold corpus dataset
    lands in the warehouse, survivor count equals the distinct-fingerprint
    count, and warn metrics report zero violations on the clean corpus."""
    p = build_corpus_pipeline(SF_SMALL)
    silver = p.dataframe(spark, "silver.corpus_docs")
    n_docs = silver.count()
    n_groups = silver.select("fingerprint").distinct().count()
    try:
        report = p.run(spark)
        assert report["bronze.corpus_documents"]["rows"] == n_docs
        assert report["silver.corpus_docs"]["rows"] == n_docs
        assert report["silver.corpus_docs"]["expectations"] == {
            "doc_id_not_null": 0,
            "text_nonempty": 0,
            "quality_in_unit_range": 0,
            "has_tokens": 0,
        }
        assert report["gold.corpus_survivors"]["rows"] == n_groups
        # written tables read back consistently
        surv = spark.table("`gold`.`corpus_survivors`")
        assert surv.count() == n_groups
        mix = spark.table("`gold`.`corpus_mix`").collect()
        assert abs(sum(r.token_share for r in mix) - 1.0) < 1e-4
        assert sum(r.n_docs for r in mix) == n_groups
    finally:
        for t in (
            "`gold`.`corpus_mix`",
            "`gold`.`corpus_survivors`",
            "`silver`.`corpus_docs`",
            "`bronze`.`corpus_documents`",
        ):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_corpus_survivor_is_best_quality_in_group(spark):
    """Within every fingerprint group the survivor carries the group's max
    quality_score (ties broken toward the lowest doc_id)."""
    p = build_corpus_pipeline(SF_SMALL)
    silver = p.dataframe(spark, "silver.corpus_docs")
    surv = p.dataframe(spark, "gold.corpus_survivors")
    best = silver.groupBy("fingerprint").agg(
        F.max("quality_score").alias("max_q"),
        F.count(F.lit(1)).alias("grp_n"),
    )
    joined = surv.join(best, "fingerprint")
    bad = joined.filter(
        (F.col("quality_score") != F.col("max_q")) | (F.col("n_copies") != F.col("grp_n"))
    )
    assert bad.isEmpty()
    # tie-break: among max-quality docs of each group the survivor has min id
    ties = (
        silver.join(best, "fingerprint")
        .filter(F.col("quality_score") == F.col("max_q"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("expect_id"))
    )
    mismatch = surv.join(ties, "fingerprint").filter(F.col("doc_id") != F.col("expect_id"))
    assert mismatch.isEmpty()


def test_corpus_streaming_twin_matches_batch(spark):
    """The true-streaming silver twin must produce exactly the batch
    pipeline table's rows — same projection list by construction
    (plans/corpus.corpus_silver_columns), same values by assertion."""
    batch = SPARK_QUERIES["corpus_silver_docs"](spark, SF_SMALL)
    stream = SPARK_QUERIES["corpus_streaming_ingest"](spark, SF_SMALL)
    assert batch.exceptAll(stream).isEmpty() and stream.exceptAll(batch).isEmpty()


def test_leakage_safe_split_is_group_atomic(spark):
    """The split's whole point: NO fingerprint group straddles splits (a
    val doc with a near-dup in train is structurally impossible), and the
    bucket arithmetic lands near 90/5/5."""
    df = SPARK_QUERIES["leakage_safe_split"](spark, SF_SMALL)
    straddlers = (
        df.groupBy("fingerprint")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
    )
    assert straddlers.isEmpty()
    frac = {
        r["split"]: r["n"]
        for r in df.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(frac.values())
    assert frac["train"] / total > 0.8
    assert 0 < frac.get("val", 0) < 0.15 * total
    assert 0 < frac.get("test", 0) < 0.15 * total
    # zero-shuffle plan: a pure projection over the silver corpus
    plan = _formatted_plan(df)
    nodes = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
    assert nodes.count("Exchange") == 0, nodes


def test_corpus_survivors_fail_constraint_registered(spark):
    """The survivors MV carries the parsed FAIL-level key constraint and the
    warn-level quality-range constraint (sqlmv wrapper → expectations)."""
    p = build_corpus_pipeline(SF_SMALL)
    exps = {e.name: e for e in p._defs["gold.corpus_survivors"].expectations}
    assert exps["survivor_doc_not_null"].action == FAIL
    assert exps["quality_in_unit_range"].action == WARN
    # and the silver registry expectations are what the catalog query reads
    assert [e.name for e in corpus_silver_expectations()] == [
        "doc_id_not_null",
        "text_nonempty",
        "quality_in_unit_range",
        "has_tokens",
    ]


def test_corpus_survivors_plan_single_exchange(spark):
    """Scale guard: the survivor dedup is ONE hash exchange on fingerprint —
    both window functions (rank + group count) share it; no join back, no
    second shuffle."""
    df = SPARK_QUERIES["corpus_gold_survivors"](spark, SF_SMALL)
    plan = _formatted_plan(df)
    nodes = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
    assert nodes.count("Exchange") == 1, nodes
    assert "hashpartitioning(fingerprint" in plan


def test_corpus_survivors_agg_twin_matches_and_combines_mapside(spark):
    """The skew-immune aggregation twin (`corpus_survivors_agg`) must
    return exactly the MV's rows, and its plan must show the partial
    max_by BEFORE the single exchange (map-side combine is what makes a
    50%-hot fingerprint cost combine time instead of one task's sort —
    measured 32.0s window vs 3.3s agg on 20M rows,
    tools/skew_probe.py::probe_corpus_hot_fingerprint)."""
    mv = SPARK_QUERIES["corpus_gold_survivors"](spark, SF_SMALL)
    twin = SPARK_QUERIES["corpus_survivors_agg"](spark, SF_SMALL)
    assert mv.exceptAll(twin).isEmpty() and twin.exceptAll(mv).isEmpty()
    plan = _formatted_plan(twin)
    nodes = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
    assert nodes.count("Exchange") == 1, nodes
    assert "Window" not in nodes
    assert "partial_max_by" in plan  # map-side combine before the shuffle


def test_corpus_mix_plan_prunes_count_window(spark):
    """The mixture MV only needs the rank from the survivors subplan, so
    column pruning must drop the COUNT window and re-enable the
    WindowGroupLimit top-1 pushdown; the global-share window runs over
    aggregated cells (the exchange after the hash aggregate)."""
    df = SPARK_QUERIES["corpus_gold_mix"](spark, SF_SMALL)
    plan = _formatted_plan(df)
    assert "WindowGroupLimit" in plan
    nodes = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
    # fingerprint exchange + groupBy exchange + single-partition cell window
    assert nodes.count("Exchange") == 3, nodes


def test_substring_dedup_hashed_twin_matches_string_form(spark):
    """The production (xxhash64-gram) twin of substring_dedup must produce
    BITWISE the same (doc_id, n_windows, n_dup_windows, dup_ppm) as the
    string-gram form: two distinct 8-grams mapping to one int64 is the
    only divergence mode (birthday bound ~n²/2⁶⁵), and this pins that the
    testdata corpus has zero collisions — which is also what licenses the
    twin to reuse the string form's DuckDB oracle."""
    a = SPARK_QUERIES["substring_dedup"](spark, SF_SMALL)
    b = SPARK_QUERIES["substring_dedup_hashed"](spark, SF_SMALL)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    assert b.count() > 0
