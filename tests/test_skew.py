"""Salted join / two-stage distinct: identical results to unsalted plans."""

from pyspark.sql import functions as F

from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.operators.skew import (
    salted_join,
    two_stage_distinct_count,
)
from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.sources.loader import (
    load_table,
)

from conftest import SF_SMALL


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey")
    orders = orders.withColumnRenamed("o_orderkey", "l_orderkey")

    plain = li.join(orders, ["l_orderkey"], "inner")
    salted = salted_join(li, orders, ["l_orderkey"], "inner", salt=8)

    assert salted.columns == plain.columns
    assert salted.count() == plain.count()
    key = [F.col(c).cast("string") for c in plain.columns]
    assert (
        plain.select(F.sha2(F.concat_ws("|", *key), 256).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")))
        .collect()[0][0]
        == salted.select(F.sha2(F.concat_ws("|", *key), 256).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")))
        .collect()[0][0]
    )


def test_salted_left_join_keeps_unmatched_rows(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], "k int, v string")
    right = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, w double")
    out = salted_join(left, right, ["k"], "left", salt=4).orderBy("k").collect()
    assert [r.k for r in out] == [1, 2, 99]
    assert out[2].w is None


def test_two_stage_distinct_count_matches_count_distinct(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    expected = {
        r.l_orderkey: r.n
        for r in li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_returnflag").alias("n"))
        .collect()
    }
    got = {
        r.l_orderkey: r.n_distinct
        for r in two_stage_distinct_count(li, "l_orderkey", "l_returnflag").collect()
    }
    assert got == expected


def test_salted_join_rejects_outer_preserved_exploded_side(spark):
    import pytest as _pytest

    from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.operators.skew import (
        salted_join,
    )

    l = spark.createDataFrame([(1, "a")], ["k", "v"])
    r = spark.createDataFrame([(2, "b")], ["k", "w"])
    for how in ("right", "full", "full_outer"):
        with _pytest.raises(ValueError, match="salted_join supports"):
            salted_join(l, r, ["k"], how=how)
    # left IS supported: unmatched left rows survive exactly once
    out = salted_join(l, r, ["k"], how="left").collect()
    assert len(out) == 1 and out[0]["w"] is None
