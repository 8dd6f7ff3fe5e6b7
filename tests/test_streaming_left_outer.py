"""Boundary pins for streaming_join_left_outer's NULL-emission rule.

The oracle encodes: an unmatched click emits a NULL row iff

    ceil_ms(c_ts) + 30min  <  floor_ms(min(max c_ts, max p_ts)) - 1h

(event side CEILS to ms, watermark side FLOORS, comparison STRICT).
These tests plant ms- and sub-ms-aligned rows on both sides of that
frontier and assert exactly which users emit — a Spark version change
that flips any of the three properties fails here before it can
silently diverge from the DuckDB oracle.
"""

from __future__ import annotations

import datetime as dt
import glob
import shutil

import pytest
from pyspark.sql import functions as F

from the_movies_db_spark.streaming import events as E

T = dt.datetime(2024, 3, 1, 10, 0, 0)  # ms-aligned anchor (max ts)
B = T - dt.timedelta(hours=1, minutes=30)  # eviction frontier for clicks


def _write_events(spark, work: str, rows) -> None:
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp_ntz"
    ).withColumn("value", F.lit(1.0))
    tmp = f"{work}/__w"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0], f"{work}/events.parquet")
    shutil.rmtree(tmp)


def _emitted_users(spark, work: str) -> set[int]:
    clicks = (
        E.read_events_stream(spark, work)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        E.read_events_stream(spark, work)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    )
    out = E.run_available_now(joined, output_mode="append")
    return {r.c_user for r in out.filter("p_user IS NULL").collect()}


@pytest.mark.slow
def test_event_side_ceils_to_ms_and_strict(spark, tmp_path):
    """ms-aligned 1ms-below emits; exact frontier and sub-ms below the
    next ms do NOT (ceil-ms event side + strict <)."""
    work = str(tmp_path / "loj1")
    _write_events(
        spark,
        work,
        [
            (999, 1, "purchase", T),  # watermark anchor (purchase side)
            (998, 2, "click", T),  # watermark anchor (click side)
            (10, 3, "click", B - dt.timedelta(milliseconds=1)),
            (11, 4, "click", B),  # exactly at frontier -> strict < drops it
            (12, 5, "click", B + dt.timedelta(milliseconds=1)),
            (13, 6, "click", B - dt.timedelta(microseconds=500)),  # ceil -> B
            (14, 7, "click", B - dt.timedelta(microseconds=1)),  # ceil -> B
        ],
    )
    assert _emitted_users(spark, work) == {10}


@pytest.mark.slow
def test_watermark_side_floors_to_ms(spark, tmp_path):
    """A sub-ms max ts floors: the frontier does NOT advance to the
    next ms, so the exactly-at-frontier click still doesn't emit."""
    work = str(tmp_path / "loj2")
    t2 = T + dt.timedelta(microseconds=500)  # max ts 10:00:00.000500
    _write_events(
        spark,
        work,
        [
            (999, 1, "purchase", t2),
            (998, 2, "click", t2),
            (20, 8, "click", B),  # emits only if wm side ceiled
            (21, 9, "click", B - dt.timedelta(milliseconds=1)),
        ],
    )
    assert _emitted_users(spark, work) == {21}


@pytest.mark.slow
def test_matched_rows_always_emit_and_oracle_formula(spark, tmp_path):
    """Matched pairs emit regardless of the frontier; the registered
    query's aggregate equals the oracle's integer-µs replay on the
    crafted corpus (both boundary classes present)."""
    import duckdb

    from the_movies_db_spark.queries import load_all

    work = str(tmp_path / "loj3")
    rows = [
        (999, 1, "purchase", T),
        (998, 2, "click", T),
        # matched click far in the past (way below frontier): emits as
        # a MATCH, never as NULL
        (30, 10, "click", dt.datetime(2024, 3, 1, 1, 0, 0)),
        (30, 11, "purchase", dt.datetime(2024, 3, 1, 1, 10, 0)),
        # unmatched below frontier -> NULL row
        (31, 12, "click", dt.datetime(2024, 3, 1, 1, 0, 0)),
        # unmatched at frontier -> dropped
        (32, 13, "click", B),
    ]
    _write_events(spark, work, rows)
    q = load_all()["streaming_join_left_outer"]
    got = {
        (r.user_id, r.n_matched, r.n_null)
        for r in q.spark(spark, work).collect()
    }
    assert got == {(30, 1, 0), (31, 0, 1)}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{work}/events.parquet'"
    )
    oracle = {tuple(r) for r in con.execute(q.oracle).fetchall()}
    assert oracle == got
