"""Empirically locate the RIGHT-side NULL-emission frontier of a
stream-stream FULL-outer interval join on this Spark version.

Left-outer pinned rule (tests/test_streaming_left_outer.py):
unmatched LEFT (click) emits iff
    ceil_ms(c_ts) + 30min < floor_ms(min(max c_ts, max p_ts)) - 1h.

Hypothesis for unmatched RIGHT (purchase): the join condition bounds
c_ts in [p_ts - 30min, p_ts], so the purchase row is matchable until
the left watermark passes p_ts; expected frontier ~
    ceil_ms(p_ts) < floor_ms(min maxes) - 1h        (strict?)

This probe plants purchases at candidate offsets and prints which emit.
"""
from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from the_movies_db_spark.io import scratch_dir  # noqa: E402
from the_movies_db_spark.session import get_spark  # noqa: E402
from the_movies_db_spark.streaming import events as E  # noqa: E402

T = dt.datetime(2024, 3, 1, 10, 0, 0)  # ms-aligned max ts both sides
WM = T - dt.timedelta(hours=1)  # naive watermark = floor_ms(T) - 1h
BC = T - dt.timedelta(hours=1, minutes=30)  # click frontier (pinned)


def write_events(spark, work, rows):
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp_ntz"
    ).withColumn("value", F.lit(1.0))
    tmp = f"{work}/__w"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0], f"{work}/events.parquet")
    shutil.rmtree(tmp)


def run_full(spark, work):
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
    out = E.run_available_now(joined, output_mode="append")
    rows = out.collect()
    left_null = {r.c_user for r in rows if r.p_user is None}
    right_null = {r.p_user for r in rows if r.c_user is None}
    matched = {(r.c_user, r.p_user) for r in rows if r.c_user is not None and r.p_user is not None}
    return left_null, right_null, matched


def main():
    spark = get_spark()
    base = scratch_dir("probe_fullouter")

    # Coarse probe: purchases at candidate frontiers.
    ms = dt.timedelta(milliseconds=1)
    us = dt.timedelta(microseconds=1)
    rows = [
        (999, 1, "purchase", T),  # anchors
        (998, 2, "click", T),
        # candidates around WM (= T - 1h)
        (50, 10, "purchase", WM - ms),
        (51, 11, "purchase", WM),
        (52, 12, "purchase", WM + ms),
        # candidates around WM - 30min (= BC)
        (53, 13, "purchase", BC - ms),
        (54, 14, "purchase", BC),
        (55, 15, "purchase", BC + ms),
        # sub-ms ceil probes just below WM
        (56, 16, "purchase", WM - dt.timedelta(microseconds=500)),
        (57, 17, "purchase", WM - us),
        # and around clicks too (sanity: left frontier unchanged in full mode)
        (60, 20, "click", BC - ms),
        (61, 21, "click", BC),
        (62, 22, "click", BC + ms),
    ]
    work = f"{base}/coarse"
    os.makedirs(work, exist_ok=True)
    write_events(spark, work, rows)
    ln, rn, m = run_full(spark, work)
    print("COARSE left_null:", sorted(ln))
    print("COARSE right_null:", sorted(rn))
    print("COARSE matched:", sorted(m))

    # Floor probe on the watermark side: max ts sub-ms.
    t2 = T + dt.timedelta(microseconds=500)
    rows2 = [
        (999, 1, "purchase", t2),
        (998, 2, "click", t2),
        (70, 30, "purchase", WM - ms),
        (71, 31, "purchase", WM),  # emits only if wm side ceiled
    ]
    work2 = f"{base}/floor"
    os.makedirs(work2, exist_ok=True)
    write_events(spark, work2, rows2)
    ln2, rn2, m2 = run_full(spark, work2)
    print("FLOOR left_null:", sorted(ln2))
    print("FLOOR right_null:", sorted(rn2))

    # Matched + both-null coexistence sanity.
    rows3 = [
        (999, 1, "purchase", T),
        (998, 2, "click", T),
        (80, 40, "click", dt.datetime(2024, 3, 1, 1, 0, 0)),
        (80, 41, "purchase", dt.datetime(2024, 3, 1, 1, 10, 0)),
        (81, 42, "click", dt.datetime(2024, 3, 1, 1, 0, 0)),  # unmatched old click
        (82, 43, "purchase", dt.datetime(2024, 3, 1, 1, 0, 0)),  # unmatched old purchase
    ]
    work3 = f"{base}/sanity"
    os.makedirs(work3, exist_ok=True)
    write_events(spark, work3, rows3)
    ln3, rn3, m3 = run_full(spark, work3)
    print("SANITY left_null:", sorted(ln3))
    print("SANITY right_null:", sorted(rn3))
    print("SANITY matched:", sorted(m3))


if __name__ == "__main__":
    main()
