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


def test_foreachbatch_upsert_restart_from_checkpoint(spark, tmp_path):
    """Kill an AvailableNow foreachBatch run mid-stream (the sink dies
    on its third micro-batch), then restart from the SAME checkpoint:
    (1) the restart resumes at the first uncommitted batch — files
    already committed to the source checkpoint are NOT redelivered;
    (2) the final table equals keep-latest over the full input — no
    loss from the crash, no duplicates from the retried batch (the
    upsert sink is idempotent, absorbing foreachBatch's at-least-once
    delivery into exactly-once table state)."""
    import datetime as dt
    import os
    import time

    import pytest

    from the_movies_db_spark.upsert import read_table, write_upsert

    SCHEMA = "id long, val string, record_loaded_at timestamp"
    src = str(tmp_path / "src")
    os.makedirs(src)
    # 4 single-row files = 4 micro-batches under maxFilesPerTrigger=1;
    # mtimes bumped so the file source delivers them in order
    rows = [
        (1, "b0", dt.datetime(2024, 1, 1)),
        (2, "b1", dt.datetime(2024, 1, 2)),
        (1, "b2", dt.datetime(2024, 1, 3)),  # overwrites pk 1
        (3, "b3", dt.datetime(2024, 1, 4)),
    ]
    now = time.time()
    for b, row in enumerate(rows):
        d = f"{src}/b{b}.parquet"
        spark.createDataFrame([row], SCHEMA).coalesce(1).write.parquet(d)
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (now + b, now + b))
        os.utime(d, (now + b, now + b))

    schema = spark.read.parquet(f"{src}/b0.parquet").schema

    def make_stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    target, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    committed = {"n": 0}

    def dying_sink(df, batch_id):
        if committed["n"] == 2:
            raise RuntimeError("injected crash on third micro-batch")
        write_upsert(
            df.sparkSession, target, df, "id",
            order_col="record_loaded_at",
        )
        committed["n"] += 1

    q = (
        make_stream().writeStream.foreachBatch(dying_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="injected crash|Terminated"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise RuntimeError(str(q.exception()))
    assert not q.isActive
    # two batches committed before the crash
    assert {r.id for r in read_table(spark, target).collect()} == {1, 2}

    run2_ids: list[set] = []

    def good_sink(df, batch_id):
        run2_ids.append({r.id for r in df.collect()})
        write_upsert(
            df.sparkSession, target, df, "id",
            order_col="record_loaded_at",
        )

    q2 = (
        make_stream().writeStream.foreachBatch(good_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert q2.exception() is None
    # resume point: only rows from the two uncommitted files are
    # redelivered — never the already-committed b0/b1 contents
    redelivered = set().union(*run2_ids) if run2_ids else set()
    assert redelivered == {1, 3}, run2_ids
    # exactly-once table state: keep-latest over the full input
    final = {r.id: r.val for r in read_table(spark, target).collect()}
    assert final == {1: "b2", 2: "b1", 3: "b3"}
