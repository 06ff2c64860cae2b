"""Every catalog query must match its DuckDB oracle at sf0.01 — the local
mirror of the driver's CORRECTNESS gate."""

import pytest

from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.queries import (
    ORACLES,
    SPARK_QUERIES,
)

from conftest import SF_ORACLE
from oracle_utils import compare_frames


@pytest.mark.parametrize("name", sorted(SPARK_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    q = SPARK_QUERIES[name]
    spark_pdf = q(spark, SF_ORACLE).toPandas()
    assert len(spark_pdf) >= 0
    if name not in ORACLES:
        pytest.skip(f"{name}: no SQL oracle (rows-only check)")
    duck_pdf = duck.execute(ORACLES[name]).fetchdf()
    problems = compare_frames(spark_pdf, duck_pdf, name)
    assert not problems, "\n".join(problems)
