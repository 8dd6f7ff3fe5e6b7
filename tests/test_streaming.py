"""Streaming tests: bounded replays must match batch results, and the
foreachBatch upsert sink must apply the MERGE per micro-batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from the_movies_db_spark.streaming import events as E


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream = E.read_events_stream(spark, sf_dir)
    got = E.to_ntz(E.run_available_now(E.tumbling_agg(stream)), "window_start")
    batch = (
        E.batch_events(spark, sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).isEmpty() and batch.exceptAll(got).isEmpty()


def test_stream_dedup_removes_doubled_events(spark, sf_dir):
    doubled = E.read_events_stream(spark, sf_dir).union(
        E.read_events_stream(spark, sf_dir)
    )
    deduped = E.dedup_within_watermark(doubled)
    out = E.run_available_now(
        deduped.groupBy().agg(F.count(F.lit(1)).alias("n"))
    ).first()
    assert out.n == E.batch_events(spark, sf_dir).count()


def test_foreach_batch_upsert_sink(spark, sf_dir, tmp_path):
    target = str(tmp_path / "events_tbl")
    stream = E.read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    E.run_foreach_batch_available_now(
        stream, E.foreach_batch_upsert(target, pk="event_id")
    )
    from the_movies_db_spark.upsert import read_table

    merged = read_table(spark, target)
    n_batch = E.batch_events(spark, sf_dir).count()
    assert merged.count() == n_batch
    # idempotent: replaying the same stream upserts, never duplicates
    E.run_foreach_batch_available_now(
        E.read_events_stream(spark, sf_dir),
        E.foreach_batch_upsert(target, pk="event_id"),
    )
    assert read_table(spark, target).count() == n_batch


def test_watermark_drops_late_data(spark, tmp_path):
    """Event-time semantics: after the watermark advances past a
    window, a late row targeting that window is dropped (append mode
    emits each window once, without the late row's contribution)."""
    import os
    from pyspark.sql import functions as F, Row

    src = str(tmp_path / "src")
    os.makedirs(src)
    ts = lambda s: __import__("datetime").datetime.fromisoformat(s)  # noqa: E731
    # batch 1: two events at 10:00-11:00, max ts 13:00 → watermark 11:00
    spark.createDataFrame([
        Row(event_id=1, ts=ts("2024-01-01T10:10:00"), value=1.0),
        Row(event_id=2, ts=ts("2024-01-01T10:20:00"), value=1.0),
        Row(event_id=3, ts=ts("2024-01-01T13:00:00"), value=1.0),
    ]).coalesce(1).write.parquet(f"{src}/b1.parquet")

    schema = spark.read.parquet(f"{src}/b1.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    name = "wm_test"
    q = (
        agg.writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # wait for batch 1 to commit, then add a LATE row for the 10:00
        # window (watermark is already 11:00 > 10:00+1h close boundary)
        deadline = __import__("time").time() + 60
        while not any(p["numInputRows"] > 0 for p in q.recentProgress):
            __import__("time").sleep(0.5)
            assert __import__("time").time() < deadline, "batch 1 never processed"
        spark.createDataFrame(
            [Row(event_id=4, ts=ts("2024-01-01T10:40:00"), value=1.0)]
        ).coalesce(1).write.mode("append").parquet(f"{src}/b2.parquet")
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.ws.isoformat(): r.n for r in spark.table(name).collect()}
    # the 10:00 window was emitted with 2 rows; the late event_id=4 is NOT counted
    assert got.get("2024-01-01T10:00:00") == 2


def test_transform_with_state_requires_protobuf_or_matches_batch(spark, sf_dir):
    """Spark 4 transformWithStateInPandas operator: where protobuf is
    available the running totals must equal the batch GROUP BY (same
    contract as the applyInPandasWithState sibling); in this container
    (no protobuf) the operator must fail fast with a clear ImportError
    instead of crashing inside the streaming runtime."""
    import pytest

    from the_movies_db_spark.streaming import events as E

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="protobuf"):
            E.tws_running_totals(E.read_events_stream(spark, sf_dir))
        return
    from pyspark.sql import functions as F

    out = E.run_available_now(
        E.tws_running_totals(E.read_events_stream(spark, sf_dir)),
        output_mode="update",
        rocksdb=True,
    )
    batch = (
        E.batch_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))
