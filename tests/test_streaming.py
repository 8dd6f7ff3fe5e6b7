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
    merged = spark.read.parquet(target)
    n_batch = E.batch_events(spark, sf_dir).count()
    assert merged.count() == n_batch
    # idempotent: replaying the same stream upserts, never duplicates
    E.run_foreach_batch_available_now(
        E.read_events_stream(spark, sf_dir),
        E.foreach_batch_upsert(target, pk="event_id"),
    )
    assert spark.read.parquet(target).count() == n_batch
