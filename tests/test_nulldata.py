"""Null-injection robustness: the queries whose Python/Arrow kernels used
to crash on missing values (round-5 `tools/null_probe.py` findings) must
run against tables where ~10% of every column is NULL.

At 100 TB missing values are routine — optional fields, failed upstream
parses, schema-evolution backfills. The full catalog is swept by
`python tools/null_probe.py`; this module pins the nine formerly-crashing
queries (len(None) on a NULL payload, NaN.astype(int64) in the stateful
accumulator and the prefix scan, list(None) in the BLAS/SRP batches) plus
the silent-garbage hazard (NULL ids casting to arbitrary int64 in numpy).
"""

import pytest

from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.queries import (
    SPARK_QUERIES,
)

FIXED = [
    "multimodal_decode",
    "multimodal_frames",
    "multimodal_resize",
    "multimodal_features",
    "multimodal_phash",
    "pack_shards",
    "ann_topk_np",
    "embedding_dup_pairs_lsh",
    "streaming_running_totals",
]


@pytest.fixture(scope="session")
def null_sf():
    """Null-injected replicas of the testdata (deterministic crc32 mask),
    built by the same code the standalone probe uses."""
    from tools.null_probe import OUT, build

    import os

    if not os.path.exists(f"{OUT}/lineitem.parquet"):
        build()
    return OUT


@pytest.mark.parametrize("name", FIXED)
def test_formerly_crashing_queries_tolerate_nulls(spark, null_sf, name):
    SPARK_QUERIES[name](spark, null_sf).count()


def test_running_totals_twins_agree_on_null_data(spark, null_sf):
    """The stateful streaming accumulator and its JVM window twin must be
    VALUE-identical even on 10%-null data: NULL values accumulate as
    skip-null SUM (NULL until the key's first non-null value — not 0, not
    NaN), and NULL ts/event_id rows order NULLS FIRST in both."""
    stream = SPARK_QUERIES["streaming_running_totals"](spark, null_sf)
    batch = SPARK_QUERIES["running_totals_window"](spark, null_sf)
    assert stream.exceptAll(batch).isEmpty() and batch.exceptAll(stream).isEmpty()


def test_similarity_drops_null_ids_not_garbage(spark, null_sf):
    """A NULL vec_id must be DROPPED, never cast to an arbitrary int64:
    every id in the top-k output must exist in the non-null input ids."""
    from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.sources.loader import (
        load_table,
    )

    out = SPARK_QUERIES["ann_topk_np"](spark, null_sf)
    emb = load_table(spark, null_sf, "embeddings")
    valid = {r[0] for r in emb.select("vec_id").dropna().collect()}
    rows = out.select("query_id", "nbr_id").collect()
    assert rows, "probe data should produce at least one neighbor"
    for r in rows:
        assert r["query_id"] in valid and r["nbr_id"] in valid
