"""Incremental streaming runner: availableNow + checkpoint exactly-once."""

import datetime as dt
import os
import shutil

from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.streaming.incremental import (
    dedup_stream,
    run_incremental,
    run_to_memory,
    stream_source,
)


def _drop(spark, rows, path, schema="id int, v double, ts timestamp"):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def test_available_now_processes_each_file_once(spark, tmp_path):
    src = str(tmp_path / "landing")
    tgt = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    _drop(spark, [(1, 1.0, t0), (2, 2.0, t0)], src)
    stream = stream_source(spark, src)
    run_incremental(stream, tgt, ckpt)
    assert spark.read.parquet(tgt).count() == 2

    # second run with one new file: only its rows are appended
    _drop(spark, [(3, 3.0, t0)], src)
    run_incremental(stream_source(spark, src), tgt, ckpt)
    out = spark.read.parquet(tgt)
    assert out.count() == 3
    assert sorted(r.id for r in out.collect()) == [1, 2, 3]

    # no new files → no new rows
    run_incremental(stream_source(spark, src), tgt, ckpt)
    assert spark.read.parquet(tgt).count() == 3


def test_sink_log_suppresses_replayed_batch_after_checkpoint_loss(spark, tmp_path):
    src = str(tmp_path / "landing")
    tgt = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    _drop(spark, [(1, 1.0, t0)], src)
    run_incremental(stream_source(spark, src), tgt, ckpt)
    shutil.rmtree(ckpt)
    # fresh checkpoint restarts at batch 0, but the file sink's own
    # _spark_metadata transaction log already has a committed batch 0 →
    # the replay is suppressed and the sink stays exactly-once.
    run_incremental(stream_source(spark, src), tgt, str(tmp_path / "ckpt2"))
    assert spark.read.parquet(tgt).count() == 1


def test_dedup_stream_drops_in_batch_duplicates(spark, tmp_path):
    src = str(tmp_path / "landing")
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    _drop(
        spark,
        [(1, 1.0, t0), (1, 99.0, t0 + dt.timedelta(minutes=5)), (2, 2.0, t0)],
        src,
    )
    deduped = dedup_stream(stream_source(spark, src), ["id"], watermark="1 hour")
    out = run_to_memory(deduped, "mem_test_dedup")
    assert sorted(r.id for r in out.collect()) == [1, 2]


def test_watermark_advances_across_microbatches_and_gates_emission(spark, tmp_path):
    """maxFilesPerTrigger=1 splits the run into one microbatch per file; the
    watermark advances batch-over-batch, and append mode emits exactly the
    windows the final watermark has passed — windows still open at end-of-
    input are withheld (why the oracle-checked queries use complete mode)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from azure_databricks_etl_pipeline_medallion_architecture_olist_e_commerce_analytics_spark.streaming.incremental import (
        run_to_memory,
        stream_source,
        windowed_event_counts,
    )

    src = tmp_path / "landing"
    src.mkdir()

    def write(name, rows, mtime):
        tbl = pa.table(
            {
                # tz-aware → Spark TimestampType (NTZ is rejected by watermarks)
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us", tz="UTC")),
                "event_type": [r[1] for r in rows],
                "value": [r[2] for r in rows],
            }
        )
        path = src / name
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    t = dt.datetime(2024, 1, 1, 10, 0)
    h = dt.timedelta
    # batch 1: two events in the 10:00 window → watermark advances to 09:40
    write("f1.parquet", [(t, "click", 1.0), (t + h(minutes=10), "click", 2.0)], 1_000_000)
    # batch 2: one late event (08:30 < watermark) + one fresh event at 12:00
    write(
        "f2.parquet",
        [(t - h(minutes=90), "click", 99.0), (t + h(hours=2), "click", 4.0)],
        1_000_100,
    )

    stream = stream_source(spark, str(src), max_files_per_trigger=1)
    agg = windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("mem_late_data")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # one microbatch per file (plus the final flush batch), watermark rising
    marks = [p["eventTime"].get("watermark") for p in q.recentProgress]
    assert len(marks) >= 3
    assert marks[1] == "2024-01-01T09:40:00.000Z"  # 10:10 − 30 min after batch 0
    assert marks[2] == "2024-01-01T11:30:00.000Z"  # 12:00 − 30 min after batch 1

    emitted = {r.window_start: (r.n_events, r.total_value) for r in spark.table("mem_late_data").collect()}
    # finalized windows: 10:00 (batch-0 rows) and the late row's 08:00 window
    # (Spark guarantees state EVICTION at the watermark, not input drop —
    # rows later than the watermark MAY still be aggregated)
    assert emitted[t] == (2, 3.0)
    # the 12:00 window is still open at end-of-input → withheld in append mode
    assert t + h(hours=2) not in emitted
