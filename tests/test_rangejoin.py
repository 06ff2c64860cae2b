"""Bucket-decomposed interval join: equivalence with the naive theta join."""

import datetime as dt

from pyspark.sql import functions as F

from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.operators.rangejoin import (
    point_in_interval_join,
)


def test_range_join_matches_theta_join(spark):
    base = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [(i % 4, i, base + dt.timedelta(minutes=i * 7)) for i in range(60)],
        "k int, pid int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (
                i % 4,
                100 + i,
                base + dt.timedelta(minutes=i * 11),
                base + dt.timedelta(minutes=i * 11 + 45),
            )
            for i in range(40)
        ],
        "k int, iid int, start timestamp, end timestamp",
    )
    bucketed = point_in_interval_join(
        points, intervals, ["k"], "ts", "start", "end", bucket_seconds=45 * 60
    )
    naive = points.join(intervals, "k").filter(
        (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end"))
    )
    got = {(r.pid, r.iid) for r in bucketed.collect()}
    want = {(r.pid, r.iid) for r in naive.collect()}
    assert got == want
    # each qualifying pair appears exactly once (points live in one bucket)
    assert bucketed.count() == len(got)


def test_range_join_boundary_inclusive(spark):
    t = dt.datetime(2024, 1, 1, 12)
    points = spark.createDataFrame([(1, 1, t)], "k int, pid int, ts timestamp")
    intervals = spark.createDataFrame(
        [(1, 10, t, t + dt.timedelta(hours=1)), (1, 11, t - dt.timedelta(hours=1), t)],
        "k int, iid int, start timestamp, end timestamp",
    )
    out = point_in_interval_join(
        points, intervals, ["k"], "ts", "start", "end", bucket_seconds=3600
    )
    assert {r.iid for r in out.collect()} == {10, 11}  # both closed ends match


def test_point_in_interval_join_rejects_outer_modes(spark):
    import pytest as _pytest

    from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    pts = spark.createDataFrame([(1, 100)], ["k", "ts"])
    ivs = spark.createDataFrame([(1, 90, 110)], ["k", "s", "e"])
    with _pytest.raises(ValueError, match="inner"):
        point_in_interval_join(pts, ivs, ["k"], "ts", "s", "e", 3600, how="left")
