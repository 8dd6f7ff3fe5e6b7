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
