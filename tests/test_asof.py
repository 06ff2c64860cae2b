"""As-of join edge cases: ties, no-match, carry-forward, key isolation."""

import datetime as dt

from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.operators.asof import (
    as_of_join,
)


def _ts(h):
    return dt.datetime(2024, 1, 1, h)


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(5), "e1"), (1, _ts(2), "e2"), (2, _ts(9), "e3")],
        "k int, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [(1, _ts(1), 10.0), (1, _ts(4), 40.0), (2, _ts(10), 99.0)],
        "k int, rts timestamp, v double",
    )
    out = {
        (r.k, r.ts): r.v
        for r in as_of_join(left, right, ["k"], "ts", "rts", ["v"]).collect()
    }
    assert out[(1, _ts(2))] == 10.0  # earlier right row
    assert out[(1, _ts(5))] == 40.0  # latest at-or-before wins
    assert out[(2, _ts(9))] is None  # right row is in the future → no match


def test_asof_equal_timestamps_included(spark):
    left = spark.createDataFrame([(1, _ts(4), "e")], "k int, ts timestamp, ev string")
    right = spark.createDataFrame([(1, _ts(4), 7.0)], "k int, rts timestamp, v double")
    [row] = as_of_join(left, right, ["k"], "ts", "rts", ["v"]).collect()
    assert row.v == 7.0  # at-or-before includes equality


def test_asof_keys_do_not_leak(spark):
    left = spark.createDataFrame([(1, _ts(5), "e")], "k int, ts timestamp, ev string")
    right = spark.createDataFrame([(2, _ts(1), 3.0)], "k int, rts timestamp, v double")
    [row] = as_of_join(left, right, ["k"], "ts", "rts", ["v"]).collect()
    assert row.v is None  # other key's rows never carry across partitions


def test_asof_preserves_left_row_count(spark):
    left = spark.createDataFrame(
        [(i % 3, _ts(i % 12), f"e{i}") for i in range(50)],
        "k int, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [(0, _ts(3), 1.0), (1, _ts(6), 2.0)], "k int, rts timestamp, v double"
    )
    out = as_of_join(left, right, ["k"], "ts", "rts", ["v"])
    assert out.count() == 50
    assert set(out.columns) == {"k", "ts", "ev", "v"}


def test_asof_carries_whole_row_not_mixed_columns(spark):
    """A NULL in the LATEST right row must stay NULL — per-column carry
    would leak the stale non-null from an older row, fabricating a row
    that never existed."""
    from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.operators.asof import (
        as_of_join,
    )

    left = spark.createDataFrame([(1, 30)], ["k", "lt"])
    right = spark.createDataFrame(
        [(1, 10, 10.0, None), (1, 20, None, 5.0)],
        "k int, rt int, price double, qty double",
    )
    out = as_of_join(left, right, ["k"], "lt", "rt").collect()[0]
    assert out["qty"] == 5.0
    assert out["price"] is None  # from the t=20 row, NOT the stale t=10 value


def test_asof_rejects_colliding_value_columns(spark):
    import pytest as _pytest

    from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.operators.asof import (
        as_of_join,
    )

    left = spark.createDataFrame([(1, 30, 1.0)], ["k", "lt", "price"])
    right = spark.createDataFrame([(1, 10, 2.0)], ["k", "rt", "price"])
    with _pytest.raises(ValueError, match="collide"):
        as_of_join(left, right, ["k"], "lt", "rt")
