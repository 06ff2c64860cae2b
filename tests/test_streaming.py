"""Incremental streaming runner: availableNow + checkpoint exactly-once."""

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
