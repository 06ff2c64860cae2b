"""Skew-safe sessionization (operators/sessionize.py): value equivalence to
the window form under hostile shapes — boundary straddles, NULL timestamps,
pathological split widths, empty input."""

import datetime as dt

from pyspark.sql import types as T

from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.operators.sessionize import (
    sessionize_split,
)
from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.queries import (
    q_sessionize_batch,
    q_sessionize_batch_split,
)
from conftest import SF_SMALL

_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _canon(df):
    return sorted(
        (
            r.user_id,
            r.session_seq,
            r.session_start,
            r.session_end,
            r.n_events,
            None if r.session_value is None else round(r.session_value, 6),
        )
        for r in df.collect()
    )


def _events(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_split_matches_window_form_on_testdata(spark):
    a = _canon(q_sessionize_batch(spark, SF_SMALL))
    b = _canon(q_sessionize_batch_split(spark, SF_SMALL))
    assert a == b and len(a) > 0


def test_session_straddling_many_split_boundaries(spark):
    # One continuous session (5-min steps, gap 30 min) across 6 hours of
    # 1-hour splits: every boundary must stitch back into ONE session.
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, i, t0 + dt.timedelta(minutes=5 * i), 1.0) for i in range(73)
    ]  # 6 h span
    # plus a second session 2 h after the first ends
    rows += [(1, 100 + i, t0 + dt.timedelta(hours=8, minutes=i), 2.0) for i in range(3)]
    out = sessionize_split(
        _events(spark, rows), split_micros=3_600_000_000
    ).collect()
    by_seq = {r.session_seq: r for r in out}
    assert len(by_seq) == 2
    assert by_seq[1].n_events == 73 and by_seq[1].session_value == 73.0
    assert by_seq[2].n_events == 3 and by_seq[2].session_value == 6.0
    assert by_seq[1].session_start == t0
    assert by_seq[1].session_end == t0 + dt.timedelta(minutes=360)


def test_split_width_does_not_change_values(spark):
    # Correctness must hold for ANY positive split width, including widths
    # far smaller than the session gap (every event its own local session).
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for u in range(3):
        for i in range(40):
            # gap pattern: 7 min within a session, 45 min (new session)
            # every 10th event
            rows.append(
                (
                    u,
                    u * 1000 + i,
                    t0 + dt.timedelta(minutes=sum(7 if j % 10 else 45 for j in range(1, i + 1))),
                    float(u + i),
                )
            )
    ev = _events(spark, rows)
    baseline = _canon(sessionize_split(ev, split_micros=10**15))  # one bucket
    for width in (60_000_000, 1_800_000_000, 21_600_000_000):  # 1 min .. 6 h
        assert _canon(sessionize_split(ev, split_micros=width)) == baseline


def test_null_timestamps_are_singleton_sessions_first(spark):
    # The window form makes every NULL-ts row its own session, ordered
    # before the user's real sessions (lag(ts) IS NULL after a NULL row,
    # NULLS FIRST ordering); the split form must reproduce that exactly.
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (7, 1, None, 5.0),
        (7, 2, None, None),
        (7, 3, t0, 1.0),
        (7, 4, t0 + dt.timedelta(minutes=5), 2.0),
    ]
    ev = _events(spark, rows)
    out = sorted(sessionize_split(ev).collect(), key=lambda r: r.session_seq)
    assert [r.session_seq for r in out] == [1, 2, 3]
    assert out[0].session_start is None and out[0].session_value == 5.0
    assert out[1].session_start is None and out[1].session_value is None
    assert out[2].n_events == 2 and out[2].session_value == 3.0
    # and the two forms agree wholesale on this frame
    from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.queries import (  # noqa: E501
        _q_sessionize_frame,
    )

    assert _canon(sessionize_split(ev)) == _canon(_q_sessionize_frame(ev))


def test_empty_input(spark):
    out = sessionize_split(_events(spark, []))
    assert out.count() == 0
    assert set(out.columns) == {
        "user_id",
        "session_seq",
        "session_start",
        "session_end",
        "n_events",
        "session_value",
    }
