"""Property tests for the round-4 closers: hybrid RRF fusion,
gaps-and-islands streaks, and market-basket pair mining."""

from __future__ import annotations

from pyspark.sql import functions as F

from the_movies_db_spark.queries import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def test_hybrid_rrf_scores_are_exact_rank_contributions(spark):
    """rrf_ppm must equal the sum of 1000000 // (60 + rank) over the
    systems that surfaced the doc (rank 0 = absent, contributes 0)."""
    rows = REGISTRY["search_hybrid_rrf"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        want = 0
        if r.bm25_rank:
            want += 1_000_000 // (60 + r.bm25_rank)
        if r.ann_rank:
            want += 1_000_000 // (60 + r.ann_rank)
        assert r.rrf_ppm == want, r
        assert r.bm25_rank or r.ann_rank, "doc surfaced by neither system"


def test_hybrid_rrf_doc_in_both_systems_outranks_single(spark):
    """Within a query, any doc surfaced by BOTH systems at pool ranks
    must score strictly above a doc surfaced by one system at the same
    or worse rank — the monotonicity RRF is chosen for."""
    rows = REGISTRY["search_hybrid_rrf"].spark(spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for rs in by_q.values():
        both = [r for r in rs if r.bm25_rank and r.ann_rank]
        single = [r for r in rs if bool(r.bm25_rank) != bool(r.ann_rank)]
        for b in both:
            for s in single:
                lone = s.bm25_rank or s.ann_rank
                if b.bm25_rank <= lone and b.ann_rank <= lone:
                    assert b.rrf_ppm > s.rrf_ppm


def test_events_streaks_against_pandas_oracle(spark):
    """Mini-oracle: recompute one user's streak stats in pure Python
    from the raw events and compare."""
    rows = {r.user_id: r for r in REGISTRY["events_streaks"].spark(spark, SF).collect()}
    assert rows
    from the_movies_db_spark.io import load_table

    uid = sorted(rows)[0]
    hours = sorted(
        {
            r.h
            for r in load_table(spark, SF, "events")
            .filter(F.col("user_id") == uid)
            .select(
                F.expr(
                    "CAST(timestampdiff(HOUR,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS BIGINT)"
                ).alias("h")
            )
            .collect()
        }
    )
    streaks, cur = [], 1
    for a, b in zip(hours, hours[1:]):
        if b == a + 1:
            cur += 1
        else:
            streaks.append(cur)
            cur = 1
    streaks.append(cur)
    got = rows[uid]
    assert got.n_active_hours == len(hours)
    assert got.longest_streak == max(streaks)
    assert got.n_streaks == len(streaks)


def test_basket_pair_counts_match_manual(spark):
    """Recompute one pair's co-occurrence count and lift by hand."""
    out = {
        (r.brand_a, r.brand_b): r
        for r in REGISTRY["basket_brand_pairs"].spark(spark, SF).collect()
    }
    assert out
    from the_movies_db_spark.io import load_table

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, SF, "part").select("p_partkey", "p_brand")
    ob = {
        (r.l_orderkey, r.p_brand)
        for r in li.join(part, li.l_partkey == part.p_partkey).collect()
    }
    (ba, bb), row = sorted(out.items())[0]
    orders_a = {o for o, br in ob if br == ba}
    orders_b = {o for o, br in ob if br == bb}
    n_orders = len({o for o, _ in ob})
    pair = len(orders_a & orders_b)
    assert row.pair_count == pair
    assert row.support_ppm == pair * 1_000_000 // n_orders
    assert row.lift_ppm == (pair * n_orders * 1_000_000) // (
        len(orders_a) * len(orders_b)
    )


def test_curriculum_order_is_dense_and_bucket_monotone(spark):
    """global_rank must be a dense 1..N permutation, and every doc in a
    higher-quality bucket must rank before every doc in a lower one."""
    rows = REGISTRY["pipeline_curriculum_order"].spark(spark, SF).collect()
    ranks = sorted(r.global_rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    worst_by_bucket: dict[int, int] = {}
    best_by_bucket: dict[int, int] = {}
    for r in rows:
        worst_by_bucket[r.bucket] = max(worst_by_bucket.get(r.bucket, 0), r.global_rank)
        best_by_bucket[r.bucket] = min(
            best_by_bucket.get(r.bucket, 1 << 60), r.global_rank
        )
    buckets = sorted(worst_by_bucket, reverse=True)
    for hi, lo in zip(buckets, buckets[1:]):
        assert worst_by_bucket[hi] < best_by_bucket[lo]


def test_kmv_intersection_jaccard_bounds(spark):
    """Sketch-estimated Jaccard must stay in [0, 1e6] ppm and the
    estimated intersection within the union bound of the exacts."""
    rows = REGISTRY["agg_kmv_intersection"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.jaccard_ppm <= 1_000_000
        assert r.matches <= r.m_union
        assert r.est_intersection >= 0.0


def test_bitmap_distinct_equals_count_distinct(spark):
    """The word-bitmap popcount must equal plain count(DISTINCT) — the
    bitmap is an exact encoding, not an estimate."""
    from the_movies_db_spark.io import load_table

    got = {
        r.event_type: r.n_users_bitmap
        for r in REGISTRY["agg_bitmap_distinct"].spark(spark, SF).collect()
    }
    want = {
        r.event_type: r.n
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_median_histogram_equals_sorted_middle(spark):
    """med2 must equal the sum of the two middle elements of the fully
    sorted per-type cents series (single-partition reference)."""
    from the_movies_db_spark.io import load_table

    got = {
        r.event_type: r.med2_cents
        for r in REGISTRY["agg_median_histogram"].spark(spark, SF).collect()
    }
    e = load_table(spark, SF, "events").select(
        "event_type", F.expr("CAST(round(value * 100) AS BIGINT)").alias("c")
    )
    by_type: dict[str, list[int]] = {}
    for r in e.collect():
        by_type.setdefault(r.event_type, []).append(r.c)
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        want = vals[(n - 1) // 2] + vals[n // 2]
        assert got[t] == want, t


def test_prefix_filter_candidates_complete(spark):
    """Prefix filtering must be lossless: its pair set equals the
    df-uncapped exact-Jaccard pair set at the same threshold."""
    from the_movies_db_spark.io import load_table
    from the_movies_db_spark.operators import dedup as D

    d = load_table(spark, SF, "documents")
    got = {
        (r.id_a, r.id_b)
        for r in D.prefix_filter_pairs(d, "doc_id", "text", 500_000, 3).collect()
    }
    want = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(
            d, "doc_id", "text", threshold=0.5, shingle_n=3, max_df=None
        ).collect()
    }
    assert got == want
