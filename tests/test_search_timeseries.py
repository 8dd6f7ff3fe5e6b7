"""Semantic checks for the search (BM25) and time-series modules —
properties the oracle hash can't express directly (rank contiguity,
grid density, conservation of revenue)."""

from __future__ import annotations

import pyspark.sql.functions as F

from the_movies_db_spark.io import load_table
from the_movies_db_spark.queries import load_all
from the_movies_db_spark.queries.search_queries import TOP_K

REGISTRY = load_all()


def test_bm25_ranks_contiguous_and_scores_monotone(spark, sf_dir):
    rows = (
        REGISTRY["search_bm25_topk"].spark(spark, sf_dir)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert rows, "bm25 returned no rows"
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1)), q
        assert len(rs) <= TOP_K
        scores = [r.score_milli for r in rs]
        assert scores == sorted(scores, reverse=True), q
        assert all(s >= 0 for s in scores), q


def test_gapfill_grid_is_dense(spark, sf_dir):
    out = REGISTRY["events_gapfill_locf"].spark(spark, sf_dir)
    n_types = out.select("event_type").distinct().count()
    n_buckets = out.select("bucket").distinct().count()
    assert out.count() == n_types * n_buckets
    # gap rows carry zero events and (after the first observation) a
    # carried-forward value identical to the previous bucket's.
    bad = out.filter((F.col("is_gap") == 1) & (F.col("n_events") != 0)).count()
    assert bad == 0


def test_ohlc_invariants(spark, sf_dir):
    out = REGISTRY["events_ohlc"].spark(spark, sf_dir)
    viol = out.filter(
        (F.col("high") < F.col("low"))
        | (F.col("open") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("close") > F.col("high"))
        | (F.col("close") < F.col("low"))
        | (F.col("n_events") <= 0)
    ).count()
    assert viol == 0
    # volume conservation: bucketed sums add up to the corpus total
    total = out.agg(F.sum("volume_cents")).collect()[0][0]
    e = load_table(spark, sf_dir, "events")
    direct = e.agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))).collect()[0][0]
    assert total == direct


def test_interpolate_labels_and_bounds(spark, sf_dir):
    out = REGISTRY["events_interpolate"].spark(spark, sf_dir)
    # value present iff the row is not outside the observed span
    assert out.filter((F.col("source") == "edge") & F.col("avg_millicents").isNotNull()).count() == 0
    assert out.filter((F.col("source") != "edge") & F.col("avg_millicents").isNull()).count() == 0
    # observed rows reproduce the rollup exactly
    e = load_table(spark, sf_dir, "events")
    n_obs_buckets = (
        e.select(
            "event_type",
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) DIV 900"
            ).alias("idx"),
        )
        .distinct()
        .count()
    )
    assert out.filter(F.col("source") == "observed").count() == n_obs_buckets


def test_attribution_conserves_revenue(spark, sf_dir):
    out = REGISTRY["events_attribution"].spark(spark, sf_dir)
    attributed = out.agg(
        F.sum("n_purchases").alias("n"), F.sum("revenue").alias("rev")
    ).collect()[0]
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    direct = e.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("value") * 100).cast("bigint")) / F.lit(100.0)).alias("rev"),
    ).collect()[0]
    assert attributed.n == direct.n
    assert abs(attributed.rev - direct.rev) < 1e-9


def test_phrase_search_crafted_corpus(spark):
    from the_movies_db_spark.queries.search_queries import phrase_counts

    docs = spark.createDataFrame(
        [
            # two non-overlapping occurrences of "a b"
            (1, "a b x a b"),
            # overlapping starts: "a a b" -> one "a b" at pos 1
            (2, "a a b"),
            # repeated-word phrase "c c": "c c c" has TWO (overlapping) hits
            (3, "c c c"),
            # words present but never adjacent
            (4, "a x b a y b"),
            # case/whitespace normalization
            (5, "  A   B  "),
        ],
        "doc_id long, text string",
    )
    phrases = ((10, "a b"), (20, "c c"))
    got = {
        (r.phrase_id, r.doc_id): r.n_matches
        for r in phrase_counts(spark, docs, phrases).collect()
    }
    assert got == {(10, 1): 2, (10, 2): 1, (10, 5): 1, (20, 3): 2}


def test_phrase_search_matches_bruteforce(spark, sf_dir):
    from the_movies_db_spark.queries.search_queries import PHRASES

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    expected: dict[tuple[int, int], int] = {}
    for pid, phrase in PHRASES:
        p = phrase.split()
        for r in docs:
            toks = r.text.lower().split()
            n = sum(1 for i in range(len(toks) - len(p) + 1) if toks[i : i + len(p)] == p)
            if n:
                expected[(pid, r.doc_id)] = n
    got = {
        (r.phrase_id, r.doc_id): r.n_matches
        for r in REGISTRY["search_phrase"].spark(spark, sf_dir).collect()
    }
    assert got == expected


def test_split_by_source_is_leakage_free(spark, sf_dir):
    out = REGISTRY["pipeline_split_by_source"].spark(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents")
    total_docs = d.count()
    total_sources = d.select("source").distinct().count()
    assert sum(r.n_docs for r in out) == total_docs
    # sources partition cleanly: per-split distinct counts sum to the
    # corpus total, i.e. no source appears in two splits
    assert sum(r.n_sources for r in out) == total_sources
    assert {r.split for r in out} <= {"train", "valid", "test"}


def test_transitions_are_row_stochastic(spark, sf_dir):
    out = REGISTRY["events_transitions"].spark(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    # every event except each user's first contributes one transition
    assert sum(r.n for r in out) == n_events - n_users
    by_prev: dict[str, list] = {}
    for r in out:
        by_prev.setdefault(r.prev_type, []).append(r)
    for prev, rs in by_prev.items():
        s = sum(r.prob_micro for r in rs)
        # floor division loses at most 1 micro per row
        assert 1_000_000 - len(rs) <= s <= 1_000_000, prev


def test_persisted_index_matches_onthefly_and_prunes_partitions(spark, sf_dir):
    """The materialized inverted index must return exactly the on-the-fly
    BM25 result, and the vocabulary filter must reach the scan as a
    PARTITION filter (the index is partitioned by term bucket — a query
    reads only its buckets' directories)."""
    onthefly = {
        tuple(r) for r in REGISTRY["search_bm25_topk"].spark(spark, sf_dir).collect()
    }
    persisted_df = REGISTRY["search_index_persisted"].spark(spark, sf_dir)
    assert {tuple(r) for r in persisted_df.collect()} == onthefly
    plan = persisted_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the pruning filter actually constrains term_bucket (not empty [])
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "term_bucket" in m.group(1)
