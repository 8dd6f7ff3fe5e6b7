"""Planted ground truth for detection operators (VERDICT r11 directive
7, the round-10 stride-8 lesson): a green oracle proves Spark == DuckDB
on the shared formula, but NOT that the detector detects — when both
sides share a blind spot, only a fixture with KNOWN positives and
negatives catches it. Covered here (the last detection ops without a
planted test): edit-distance verification, CUSUM + binary-segmentation
changepoints, CDC chunk resynchronization after an insertion, and
boilerplate-chunk removal.
"""

from __future__ import annotations

import datetime as dt
import glob
import shutil

import pytest
from pyspark.sql import functions as F

from the_movies_db_spark.queries import load_all


def _write_single(df, work: str, name: str) -> None:
    tmp = f"{work}/__w"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0], f"{work}/{name}.parquet")
    shutil.rmtree(tmp)


def _write_docs(spark, work: str, texts: dict[int, str]) -> None:
    rows = [
        (i, t, "en", "planted", len(t)) for i, t in sorted(texts.items())
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    _write_single(df, work, "documents")


def _write_events(spark, work: str, rows) -> None:
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp_ntz"
    ).withColumn("value", F.lit(1.0))
    _write_single(df, work, "events")


WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu anchor beacon candle dome "
    "ember flint grove harbor inlet jetty kernel lantern marble nectar"
).split()


def test_edit_distance_verify_planted_positive_and_negative(spark, tmp_path):
    work = str(tmp_path / "edv")
    base = " ".join(WORDS)  # 40 words, ~260 chars
    near = " ".join(WORDS[:20] + ["CHANGED"] + WORDS[21:])  # 1-word edit
    # The beyond-threshold candidate must share base's h0 (min word-
    # shingle hash) to form an LSH candidate pair at all. h0 location
    # depends on the md5 seed, so construct it: keep base's first 30
    # words (shared shingles) + a junk tail, iterating a deterministic
    # salt until the minhash h0 matches base's — the precondition is
    # asserted, so a seed change fails loudly instead of skipping.
    from the_movies_db_spark.operators import dedup as D

    def h0_of(text: str) -> str:
        df = spark.createDataFrame([(text,)], "text string")
        return df.select(
            D.minhash_signature(F.col("text"), num_hashes=1, shingle_n=3)[0]
            .alias("h")
        ).collect()[0].h

    base_h0 = h0_of(base)
    far = None
    for salt in range(20):
        cand = " ".join(WORDS[:30]) + " " + " ".join(
            f"zz{w}q{salt}" for w in reversed(WORDS[:25])
        )
        if h0_of(cand) == base_h0:
            far = cand
            break
    assert far is not None, "no salt produced a shared-h0 candidate"
    unrelated = " ".join(f"np{w}ow" for w in WORDS)  # no shared 3-shingles
    _write_docs(spark, work, {1: base, 2: near, 3: far, 4: unrelated})
    q = load_all()["dedup_edit_distance_verify"]
    out = {(r.doc_a, r.doc_b): (r.dist_ppm, r.verified) for r in
           q.spark(spark, work).collect()}
    # planted near-duplicate is found AND verified
    assert (1, 2) in out and out[(1, 2)][1] == 1
    assert out[(1, 2)][0] < 400_000
    # planted beyond-threshold candidate is found but REJECTED
    assert (1, 3) in out and out[(1, 3)][1] == 0
    assert out[(1, 3)][0] > 400_000
    # the unrelated doc never forms a candidate pair
    assert not any(4 in p for p in out)


def test_cusum_changepoint_planted_step(spark, tmp_path):
    """2/hour for 50 hours then 10/hour for 50: CUSUM argmax must land
    on the LAST pre-shift hour (hour index 49), where |n*cx - t*total|
    = 400*50 = 20000."""
    work = str(tmp_path / "cusum")
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows, eid = [], 0
    for h in range(100):
        rate = 2 if h < 50 else 10
        for k in range(rate):
            rows.append((k, eid, "click", t0 + dt.timedelta(hours=h, minutes=k)))
            eid += 1
    _write_events(spark, work, rows)
    q = load_all()["events_cusum_changepoint"]
    got = {r.event_type: (r.changepoint_hour, r.cusum_abs_max, r.n_hours)
           for r in q.spark(spark, work).collect()}
    assert got == {"click": ("2024-03-03 01:00:00", 20000, 100)}


def test_binseg_changepoint_planted_step(spark, tmp_path):
    """5/day for 10 days then 50/day for 10: the best single split is
    exactly the level boundary, with the planted means on each side."""
    work = str(tmp_path / "binseg")
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows, eid = [], 0
    for d in range(20):
        rate = 5 if d < 10 else 50
        for k in range(rate):
            rows.append((k, eid, "view", t0 + dt.timedelta(days=d, minutes=k)))
            eid += 1
    _write_events(spark, work, rows)
    q = load_all()["events_changepoint_binseg"]
    r = q.spark(spark, work).collect()[0]
    day0 = (t0 - dt.datetime(1970, 1, 1)).days
    assert (r.split_day, r.n_days_left, r.n_days_right) == (day0 + 9, 10, 10)
    assert (r.mean_left, r.mean_right) == (5, 50)
    assert r.gain_milli > 0


def test_cdc_chunks_resync_after_insertion(spark, tmp_path):
    """CDC's selling point: an insertion at the FRONT of a document
    only reshapes chunks near the edit — downstream chunks re-sync on
    content-defined boundaries and dedup against the original. The
    fixed-block sibling shares nothing under the same shift."""
    work = str(tmp_path / "cdc")
    base = " ".join(WORDS * 3)  # ~790 chars, well past the 400-char prefix
    shifted = "zzz " + base  # 4-byte front insertion
    _write_docs(spark, work, {1: base, 2: shifted})
    q = load_all()["dedup_cdc_chunks"]
    r = q.spark(spark, work).collect()[0]
    # boundaries resynchronize -> a substantial share of chunks dedup
    assert r.chunks_in_multiple_docs >= 3
    assert r.unique_bytes < r.total_bytes
    assert r.dedup_savings_ppm > 300_000  # > 30% byte savings


def test_boilerplate_removal_planted_template(spark, tmp_path):
    """25 docs share a 2-token boilerplate chunk (df=25 > keep-max 20);
    each doc also has unique chunks. The boilerplate chunk must be
    dropped from every doc and the unique chunks kept."""
    work = str(tmp_path / "bp")
    texts = {
        i: f"COOKIE NOTICE unique{i}a unique{i}b unique{i}c unique{i}d"
        for i in range(25)
    }
    _write_docs(spark, work, texts)
    q = load_all()["pipeline_boilerplate_removal"]
    rows = q.spark(spark, work).collect()
    assert len(rows) == 25
    for r in rows:
        # 6 tokens -> 3 chunks of 2; exactly the boilerplate one dropped
        assert (r.n_chunks, r.n_kept) == (3, 2)
