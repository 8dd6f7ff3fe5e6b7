"""Boundary pins for streaming_join_full_outer's NULL-emission rules.

The oracle encodes TWO eviction frontiers over the same watermark base
wm = floor_ms(min(max c_ts, max p_ts)) - 1h:

    unmatched CLICK    emits iff ceil_ms(c_ts) + 30min < wm
    unmatched PURCHASE emits iff ceil_ms(p_ts)         < wm

(event side CEILS to ms, watermark side FLOORS, comparisons STRICT —
empirically located by scripts/probe_r12_fullouter.py). These tests
plant ms- and sub-ms boundary rows on both sides of each frontier and
assert exactly which users emit, so a Spark version change that flips
any pinned property fails here before it can silently diverge from the
DuckDB oracle.
"""

from __future__ import annotations

import datetime as dt
import glob
import shutil

import pytest
from pyspark.sql import functions as F

from the_movies_db_spark.streaming import events as E

T = dt.datetime(2024, 3, 1, 10, 0, 0)  # ms-aligned anchor (max ts)
WM = T - dt.timedelta(hours=1)  # purchase frontier = watermark itself
BC = T - dt.timedelta(hours=1, minutes=30)  # click frontier (interval-shifted)


def _write_events(spark, work: str, rows) -> None:
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp_ntz"
    ).withColumn("value", F.lit(1.0))
    tmp = f"{work}/__w"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0], f"{work}/events.parquet")
    shutil.rmtree(tmp)


def _emitted(spark, work: str):
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
        "full_outer",
    )
    rows = E.run_available_now(joined, output_mode="append").collect()
    left_null = {r.c_user for r in rows if r.p_user is None}
    right_null = {r.p_user for r in rows if r.c_user is None}
    matched = {
        (r.c_user, r.p_user)
        for r in rows
        if r.c_user is not None and r.p_user is not None
    }
    return left_null, right_null, matched


@pytest.mark.slow
def test_purchase_side_ceils_to_ms_and_strict(spark, tmp_path):
    """Right frontier = the watermark itself (no interval term):
    ms-aligned 1ms-below emits; exactly at and sub-ms below do NOT."""
    work = str(tmp_path / "foj1")
    _write_events(
        spark,
        work,
        [
            (999, 1, "purchase", T),  # watermark anchors
            (998, 2, "click", T),
            (50, 10, "purchase", WM - dt.timedelta(milliseconds=1)),
            (51, 11, "purchase", WM),  # strict < drops it
            (52, 12, "purchase", WM + dt.timedelta(milliseconds=1)),
            (56, 16, "purchase", WM - dt.timedelta(microseconds=500)),  # ceil->WM
            (57, 17, "purchase", WM - dt.timedelta(microseconds=1)),  # ceil->WM
            # purchases below BC are also below WM -> emit (no interval
            # term on the right side, unlike the click frontier)
            (53, 13, "purchase", BC),
        ],
    )
    left_null, right_null, matched = _emitted(spark, work)
    assert right_null == {50, 53}
    assert left_null == set() and matched == set()


@pytest.mark.slow
def test_click_frontier_unchanged_in_full_mode(spark, tmp_path):
    """The left-outer pinned rule holds verbatim under full-outer."""
    work = str(tmp_path / "foj2")
    _write_events(
        spark,
        work,
        [
            (999, 1, "purchase", T),
            (998, 2, "click", T),
            (60, 20, "click", BC - dt.timedelta(milliseconds=1)),
            (61, 21, "click", BC),  # strict < drops it
            (62, 22, "click", BC + dt.timedelta(milliseconds=1)),
            (63, 23, "click", BC - dt.timedelta(microseconds=1)),  # ceil->BC
        ],
    )
    left_null, right_null, _ = _emitted(spark, work)
    assert left_null == {60}
    assert right_null == set()


@pytest.mark.slow
def test_watermark_side_floors_for_purchases(spark, tmp_path):
    """A sub-ms max ts floors: the purchase frontier does NOT advance
    to the next ms, so the exactly-at-WM purchase still doesn't emit."""
    work = str(tmp_path / "foj3")
    t2 = T + dt.timedelta(microseconds=500)
    _write_events(
        spark,
        work,
        [
            (999, 1, "purchase", t2),
            (998, 2, "click", t2),
            (70, 30, "purchase", WM - dt.timedelta(milliseconds=1)),
            (71, 31, "purchase", WM),  # emits only if wm side ceiled
        ],
    )
    _, right_null, _ = _emitted(spark, work)
    assert right_null == {70}


@pytest.mark.slow
def test_both_null_classes_and_oracle_formula(spark, tmp_path):
    """Matched pairs emit regardless; both NULL classes coexist; the
    registered query equals the oracle's integer-µs replay."""
    import duckdb

    from the_movies_db_spark.queries import load_all

    work = str(tmp_path / "foj4")
    _write_events(
        spark,
        work,
        [
            (999, 1, "purchase", T),
            (998, 2, "click", T),
            # matched pair far in the past: emits as a MATCH only
            (30, 10, "click", dt.datetime(2024, 3, 1, 1, 0, 0)),
            (30, 11, "purchase", dt.datetime(2024, 3, 1, 1, 10, 0)),
            # unmatched old click -> NULL-purchase row
            (31, 12, "click", dt.datetime(2024, 3, 1, 1, 0, 0)),
            # unmatched old purchase -> NULL-click row
            (32, 13, "purchase", dt.datetime(2024, 3, 1, 1, 0, 0)),
            # at-frontier rows on both sides -> dropped
            (33, 14, "click", BC),
            (34, 15, "purchase", WM),
        ],
    )
    q = load_all()["streaming_join_full_outer"]
    got = {
        (r.user_id, r.n_matched, r.n_null_click, r.n_null_purchase)
        for r in q.spark(spark, work).collect()
    }
    assert got == {
        (30, 1, 0, 0),
        (31, 0, 1, 0),
        (32, 0, 0, 1),
        # anchors: 999's purchase at T and 998's click at T are above
        # both frontiers -> not emitted at all
    }

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{work}/events.parquet'")
    oracle = {tuple(r) for r in con.execute(q.oracle).fetchall()}
    assert oracle == got
