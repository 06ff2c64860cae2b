"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-schema fact build at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator catalog from
SURVEY.md §2 (see the package's ``queries`` module).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.queries import (  # noqa: E402
    ORACLES,
    SPARK_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the gold star-schema fact (fact_order_items analog,
    /root/reference/scripts/gold/fact_order_items.sql) on sf0.001."""
    return SPARK_QUERIES["gold_fact_lineitem"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each query (omitted ⇒ rows-only check)."""
    return dict(ORACLES)
