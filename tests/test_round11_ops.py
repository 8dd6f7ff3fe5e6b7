"""Round-11 pins: planted ground truth and third-leg Python replays
for the new operators (BPE greedy-merge semantics, integer Viterbi,
all-pairs harmonic BFS, k-NN join exactness incl. the starved brute
path, shot-boundary signature replay), plus arithmetic invariants for
the Wilson bound / readability / range-search outputs."""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pytest

from the_movies_db_spark.queries import load_all

SF = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def _write_docs(tmp_path, texts):
    docs = pd.DataFrame(
        {
            "doc_id": list(range(1, len(texts) + 1)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    d = str(tmp_path / "corpus")
    os.makedirs(d, exist_ok=True)
    docs.to_parquet(f"{d}/documents.parquet")
    return d


# ------------------------------------------------------------ BPE merges


def test_bpe_greedy_nonoverlap_and_tiebreak(spark, registry, tmp_path):
    """'aaaa' x3 + 'bb' x2: round 1 must merge (a,a) with count 9
    (three positional pairs per word occurrence), and the GREEDY
    left-to-right merge must leave ['aa','aa','_'] — so round 2 sees
    (aa,aa)=3 tied with (aa,_)=3 and the (count DESC, pair ASC)
    tie-break picks (aa,'_') ('_' < 'aa' in ASCII)."""
    d = _write_docs(tmp_path, ["aaaa aaaa aaaa bb bb"])
    rows = {
        int(r["round"]): r
        for r in registry["text_bpe_merges"].spark(spark, d).collect()
    }
    r1 = rows[1]
    assert (r1["left_sym"], r1["right_sym"], r1["merged"]) == ("a", "a", "aa")
    assert r1["pair_count"] == 9
    r2 = rows[2]
    assert (r2["left_sym"], r2["right_sym"]) == ("aa", "_")
    assert r2["pair_count"] == 3


def test_bpe_real_corpus_counts_decrease_sensibly(spark, registry):
    rows = registry["text_bpe_merges"].spark(spark, SF).collect()
    assert len(rows) == 5
    counts = [r["pair_count"] for r in sorted(rows, key=lambda r: r["round"])]
    assert all(c >= 1 for c in counts)
    # the argmax count can only fall or stay when earlier merges don't
    # create the next best pair from scratch; allow equality chains but
    # pin that round 1 is the global argmax
    assert counts[0] == max(counts)


# ------------------------------------------------------------ Viterbi


def _viterbi(xs):
    theta = sum(xs) // len(xs)
    obs = [1 if x > theta else 0 for x in xs]
    s0 = s1 = 0
    p0, p1 = [], []
    for o in obs:
        e0 = 2 if o == 0 else -2
        e1 = 2 if o == 1 else -2
        ns0 = e0 + max(s0, s1 - 3)
        ns1 = e1 + max(s1, s0 - 3)
        np0 = (p0 if s0 >= s1 - 3 else p1) + [0]
        np1 = (p1 if s1 >= s0 - 3 else p0) + [1]
        s0, s1, p0, p1 = ns0, ns1, np0, np1
    p = p1 if s1 > s0 else p0
    switches = sum(1 for i in range(1, len(p)) if p[i] != p[i - 1])
    return sum(p), switches, max(s0, s1)


def test_viterbi_matches_python_replay(spark, registry):
    ev = pd.read_parquet(os.path.join(SF_MID, "events.parquet"))
    ts = pd.to_datetime(ev["ts"])
    d = (ts - pd.Timestamp("1970-01-01")).dt.days
    daily = (
        ev.assign(d=d).groupby(["event_type", "d"]).size().reset_index(name="x")
    )
    out = {
        r["event_type"]: r
        for r in registry["events_hmm_viterbi"].spark(spark, SF_MID).collect()
    }
    for etype, grp in daily.groupby("event_type"):
        xs = grp.sort_values("d")["x"].tolist()
        n_high, switches, score = _viterbi(xs)
        row = out[etype]
        assert row["n_days"] == len(xs)
        assert row["n_high_days"] == n_high, etype
        assert row["n_switches"] == switches, etype
        assert row["best_score"] == score, etype


# ------------------------------------------------------- harmonic BFS


def test_harmonic_matches_python_bfs(spark, registry):
    import duckdb
    from collections import deque

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    edges = con.execute(
        """SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey"""
    ).fetchall()
    names = dict(
        con.execute("SELECT n_nationkey, n_name FROM nation").fetchall()
    )
    adj: dict[int, list[int]] = {}
    nodes = set()
    for s, t in edges:
        adj.setdefault(s, []).append(t)
        nodes.update((s, t))
    harmonic: dict[int, int] = {v: 0 for v in nodes}
    nsrc: dict[int, int] = {v: 0 for v in nodes}
    for src in nodes:
        dist = {src: 0}
        dq = deque([src])
        while dq:
            u = dq.popleft()
            for v in adj.get(u, ()):  # noqa: B023
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        for v, dv in dist.items():
            if v != src:
                harmonic[v] += 1_000_000 // dv
                nsrc[v] += 1
    rows = registry["graph_harmonic_centrality"].spark(spark, SF).collect()
    got = {r["nation"]: (r["n_sources"], r["harmonic_micro"]) for r in rows}
    want = {
        names[v]: (nsrc[v], harmonic[v]) for v in nodes if nsrc[v] > 0
    }
    assert got == want


# ------------------------------------------------------- k-NN join


def test_knn_join_exact_including_starved(spark):
    """Clustered keys + an isolated far probe (forces the brute
    fallback): results must equal the quadratic definition exactly."""
    from the_movies_db_spark.operators.joins import knn_join_1d

    corpus = [(100 + i, 2 * i) for i in range(11)]  # keys 0..20
    corpus += [(999, 10_000)]  # isolated
    probes = [(1, 5), (2, 9_999), (3, 20)]
    cdf = spark.createDataFrame(corpus, "rid bigint, rk bigint")
    pdf = spark.createDataFrame(probes, "pid bigint, pk bigint")
    out = knn_join_1d(
        pdf, cdf, "pid", "pk", "rid", "rk", k=3, width=6
    ).collect()
    got = {
        (r["probe_id"], r["rank"]): (r["neighbor_id"], r["dist"])
        for r in out
    }
    # python brute force
    want = {}
    for pid, pk in probes:
        ranked = sorted(
            ((abs(pk - rk), rid) for rid, rk in corpus if rid != pid)
        )[:3]
        for i, (d, rid) in enumerate(ranked, 1):
            want[(pid, i)] = (rid, d)
    assert got == want
    # probe 2 is starved at width=6 (nearest cluster is ~9979 away)
    assert want[(2, 1)][0] == 999


# ------------------------------------------------ shot boundaries


def test_shot_boundaries_python_replay(spark, registry, tmp_path):
    texts = [
        "abcdefg hij klmnop qrstuv wxyz one two three four five six",
        "short",
        "a much longer synthetic document body with many bytes inside it",
    ]
    d = _write_docs(tmp_path, texts)
    rows = {
        r["doc_id"]: r
        for r in registry["multimodal_shot_boundaries"].spark(spark, d).collect()
    }
    for doc_id, text in enumerate(texts, 1):
        n_frames = len(text.encode()) % 8 + 1
        sigs = [
            int(hashlib.md5(f"{text}#{i}".encode()).hexdigest()[:8], 16)
            for i in range(n_frames)
        ]
        nb = sum(
            1
            for i in range(1, n_frames)
            if bin(sigs[i] ^ sigs[i - 1]).count("1") > 19
        )
        r = rows[doc_id]
        assert r["n_frames"] == n_frames
        assert r["n_boundaries"] == nb
        assert r["n_shots"] == nb + 1
        assert r["mean_shot_len_milli"] == n_frames * 1000 // (nb + 1)


# ----------------------------------------- invariants on the rest


def test_wilson_is_a_lower_bound(spark, registry):
    rows = registry["agg_wilson_lower_bound"].spark(spark, SF_MID).collect()
    assert len(rows) == 15
    for r in rows:
        assert 0 <= r["wilson_lb_micro"] <= r["rate_ppm"], r
        assert r["n_returned"] <= r["n_items"]


def test_readability_classes_partition(spark, registry):
    for r in registry["text_readability_ari"].spark(spark, SF_MID).collect():
        total = (
            r["n_elementary"] + r["n_middle"] + r["n_high"] + r["n_college"]
        )
        assert total == r["n_docs"], r


def test_range_search_recall_identity(spark, registry):
    for r in registry["sim_range_search"].spark(spark, SF_MID).collect():
        assert r["n_found"] <= r["n_true"], r
        if r["n_true"]:
            assert r["recall_ppm"] == r["n_found"] * 1_000_000 // r["n_true"]
        else:
            assert r["recall_ppm"] == 1_000_000


def test_interleaving_counts_consistent(spark, registry):
    rows = registry["search_interleaving_eval"].spark(spark, SF_MID).collect()
    assert len(rows) == 3
    for r in rows:
        assert 5 <= r["n_interleaved"] <= 10
        assert r["clicks_bm25"] + r["clicks_ql"] <= r["n_interleaved"]
        if r["clicks_bm25"] != r["clicks_ql"]:
            want = "bm25" if r["clicks_bm25"] > r["clicks_ql"] else "ql"
        elif r["rel_bm25"] != r["rel_ql"]:
            want = "bm25" if r["rel_bm25"] > r["rel_ql"] else "ql"
        else:
            want = "tie"
        assert r["winner"] == want, r


def test_harmonic_plan_is_checkpoint_flat(spark, registry):
    df = registry["graph_harmonic_centrality"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "lineitem" not in plan  # eager checkpoints collapsed the fact


# ------------------------------- second-batch ops (round-11 session 2)


def test_bpe_tokenize_compression(spark, registry):
    row = registry["text_bpe_tokenize_stats"].spark(spark, SF).collect()[0]
    assert row["n_tokens_bpe"] < row["n_tokens_char"]  # merges compress
    assert (
        row["compression_ppm"]
        == row["n_tokens_bpe"] * 1_000_000 // row["n_tokens_char"]
    )


def test_selectivity_histogram_bounds(spark, registry):
    rows = registry["dq_selectivity_histogram"].spark(spark, SF_MID).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["est_rows"] >= 0 and r["actual_rows"] >= 0
        # equi-depth interpolation on this data should land within 10%
        assert r["err_ppm"] is None or r["err_ppm"] < 100_000, r


def test_ss_policy_python_replay(spark, registry):
    import duckdb

    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    weekly = con.execute(
        """SELECT p.p_brand AS brand,
                  CAST(datediff('day', DATE '1992-01-01', l.l_shipdate) // 7
                    AS BIGINT) AS wk,
                  CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT)
                    AS d
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           GROUP BY 1, 2 ORDER BY 1, 2"""
    ).df()
    out = {
        r["brand"]: r
        for r in registry["orders_ss_policy_sim"].spark(spark, SF).collect()
    }
    for brand, grp in weekly.groupby("brand"):
        ds = grp.sort_values("wk")["d"].tolist()
        s_lo = sum(ds) // len(ds)
        s_hi = 2 * s_lo
        inv, n_orders, tot, n_so, mi = s_hi, 0, 0, 0, s_hi
        for d in ds:
            inv -= d
            if inv < 0:
                n_so += 1
            mi = min(mi, inv)
            if inv < s_lo:
                n_orders += 1
                tot += s_hi - inv
                inv = s_hi
        r = out[brand]
        assert (
            r["n_orders"], r["total_ordered"], r["n_stockouts"],
            r["min_inv"], r["end_inventory"],
        ) == (n_orders, tot, n_so, mi, inv), brand


def test_interrupted_ts_python_replay(spark, registry):
    ev = pd.read_parquet(os.path.join(SF_MID, "events.parquet"))
    d = (pd.to_datetime(ev["ts"]) - pd.Timestamp("1970-01-01")).dt.days
    daily = (
        ev.assign(d=d).groupby(["event_type", "d"]).size().reset_index(name="y")
    )
    out = {
        r["event_type"]: r
        for r in registry["events_interrupted_ts"].spark(spark, SF_MID).collect()
    }

    def fit(ts_ys):
        n = len(ts_ys)
        st = sum(t for t, _ in ts_ys)
        sy = sum(y for _, y in ts_ys)
        stt = sum(t * t for t, _ in ts_ys)
        sty = sum(t * y for t, y in ts_ys)
        num, den = n * sty - st * sy, n * stt - st * st
        q, r = int(num // den), num % den
        # python // floors; engines truncate toward zero — all these
        # quotients are exercised positive and negative, so replicate
        # truncation explicitly
        def tdiv(a, b):
            return -((-a) // b) if (a < 0) != (b < 0) else a // b
        b = tdiv(num, den) * 1000 + tdiv((num - tdiv(num, den) * den) * 1000, den)
        a = tdiv(sy * 1000 - b * st, n)
        return b, a

    for etype, grp in daily.groupby("event_type"):
        g = grp.sort_values("d")
        d0 = g["d"].min()
        t0 = (g["d"].max() - d0 + 1) // 2
        pre = [(t - d0, y) for t, y in zip(g["d"], g["y"]) if t - d0 < t0]
        post = [(t - d0 - t0, y) for t, y in zip(g["d"], g["y"]) if t - d0 >= t0]
        b1, a1 = fit(pre)
        b2, a2 = fit(post)
        r = out[etype]
        assert r["b_pre_milli"] == b1 and r["b_post_milli"] == b2, etype
        assert r["a_pre_milli"] == a1 and r["a_post_milli"] == a2, etype
        assert r["level_shift_milli"] == a2 - (a1 + b1 * t0), etype


def test_merkle_root_consistency(spark, registry):
    rows = registry["dq_checksum_merkle_partitions"].spark(spark, SF_MID).collect()
    by_level = {}
    for r in rows:
        by_level.setdefault(r["level"], []).append(r)
    months = sorted(by_level["month"], key=lambda r: r["part"])
    years = sorted(by_level["year"], key=lambda r: r["part"])
    root = by_level["root"][0]
    assert sum(r["n_rows"] for r in months) == root["n_rows"]
    assert sum(r["n_rows"] for r in years) == root["n_rows"]
    # recompute the year digests from month digests
    for y in years:
        kids = [m for m in months if m["part"].startswith(y["part"])]
        digest = hashlib.md5(
            ",".join(m["digest"] for m in kids).encode()
        ).hexdigest()
        assert digest == y["digest"], y["part"]
    rd = hashlib.md5(
        ",".join(y["digest"] for y in years).encode()
    ).hexdigest()
    assert rd == root["digest"]


def test_time_decay_mass_conservation(spark, registry):
    rows = registry["events_attribution_time_decay"].spark(spark, SF_MID).collect()
    ev = pd.read_parquet(os.path.join(SF_MID, "events.parquet"))
    n_purch = int((ev["event_type"] == "purchase").sum())
    total = sum(r["attributed_milli"] for r in rows)
    # floor rounding loses < 1 milli per credit
    n_credits = sum(r["n_credits"] for r in rows)
    assert n_purch * 1000 - n_credits <= total <= n_purch * 1000


def test_reach_sketch_exact_when_small(spark, registry):
    rows = registry["graph_reach_sketch"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["exact_reach"] >= 1
        # estimator is within 4/sqrt(k) of truth on this data (k=64)
        assert abs(r["est_reach"] - r["exact_reach"]) <= max(
            0.5 * r["exact_reach"], 2
        ), r


# ------------------------------- third-batch ops (round-11 session 3)


def test_merge_preview_conserves_rows_and_matches_real_merge(spark, registry):
    """The preview's class counts must reconcile with the REAL
    conditional merge: rows after merge = keep_target + noop + update
    + insert (deletes drop, previews never write)."""
    import pyspark.sql.functions as F

    from the_movies_db_spark.io import load_table
    from the_movies_db_spark.upsert import conditional_merge, merge_preview

    o = load_table(spark, SF_MID, "orders")
    t = o.filter(F.expr("o_orderkey % 3 != 0")).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    b = o.filter(F.expr("o_orderkey % 2 = 0")).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.expr(
            "CAST(round(o_totalprice * 100) AS BIGINT)"
            " + CASE WHEN o_orderkey % 5 = 0 THEN 500 ELSE 0 END"
        ).alias("cents"),
    )
    dele = F.col("b.status") == "F"
    upd = F.col("b.cents") > F.col("t.cents")
    prev = {
        r["action"]: r["n"]
        for r in merge_preview(t, b, "o_orderkey", dele, upd)
        .groupBy("action")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    real_n = conditional_merge(t, b, "o_orderkey", dele, upd).count()
    expected = (
        prev.get("keep_target", 0)
        + prev.get("noop_matched", 0)
        + prev.get("update", 0)
        + prev.get("insert", 0)
    )
    assert real_n == expected, (real_n, prev)
    assert prev.get("delete", 0) > 0 and prev.get("update", 0) > 0


def test_vad_python_replay(spark, registry, tmp_path):
    texts = [
        "aaaaaaaaaaaaaaaazzzzzzzzzzzzzzzzaaaaaaaaaaaaaaaa",  # 3 windows
        "the quick brown fox jumps over a lazy dog and then some more",
    ]
    d = _write_docs(tmp_path, texts)
    rows = {
        r["doc_id"]: r
        for r in registry["multimodal_audio_vad_segments"].spark(spark, d).collect()
    }
    for doc_id, text in enumerate(texts, 1):
        n_win = min(len(text), 256) // 16
        es = [
            sum(ord(c) for c in text[w * 16 : w * 16 + 16])
            for w in range(n_win)
        ]
        tot = sum(es)
        sp = [1 if e * n_win > tot else 0 for e in es]
        n_seg = sum(
            1 for i, v in enumerate(sp) if v == 1 and (i == 0 or sp[i - 1] == 0)
        )
        r = rows[doc_id]
        assert r["n_windows"] == n_win
        assert r["n_active"] == sum(sp)
        assert r["n_segments"] == n_seg
    # planted: doc 1's middle z-window ('z' 122 > 'a' 97) is the
    # sole active window
    assert rows[1]["n_active"] == 1 and rows[1]["n_segments"] == 1


def test_difficulty_prediction_ranks_are_permutations(spark, registry):
    rows = registry["search_difficulty_prediction"].spark(spark, SF_MID).collect()
    assert len(rows) == 3
    assert sorted(r["predicted_rank"] for r in rows) == [1, 2, 3]
    assert sorted(r["actual_rank"] for r in rows) == [1, 2, 3]
    for r in rows:
        assert r["rank_agrees"] == int(r["predicted_rank"] == r["actual_rank"])
        assert r["n_terms"] == 3 and r["sum_df"] <= r["sum_cf"]


def test_four_cycles_brute_force(spark, registry):
    import duckdb
    import itertools

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    edges = con.execute(
        """SELECT DISTINCT least(s.s_nationkey, c.c_nationkey),
                  greatest(s.s_nationkey, c.c_nationkey)
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           WHERE s.s_nationkey <> c.c_nationkey"""
    ).fetchall()
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n4 = sum(
        len(adj[u] & adj[w]) * (len(adj[u] & adj[w]) - 1) // 2
        for u, w in itertools.combinations(sorted(adj), 2)
    ) // 2
    row = registry["graph_four_cycles"].spark(spark, SF).collect()[0]
    assert row["n_four_cycles"] == n4
    assert row["n_edges"] == len(edges)


def test_chain_ladder_invariants(spark, registry):
    rows = sorted(
        registry["orders_chain_ladder"].spark(spark, SF_MID).collect(),
        key=lambda r: r["cohort_year"],
    )
    assert rows
    # oldest cohort is fully developed: no remaining factors
    assert rows[0]["reserve_cents"] == 0
    for r in rows:
        assert r["ultimate_cents"] >= r["cum_latest_cents"], r
        assert (
            r["reserve_cents"]
            == r["ultimate_cents"] - r["cum_latest_cents"]
        )
    # ages form the triangle hypotenuse: strictly decreasing
    ages = [r["latest_age"] for r in rows]
    assert ages == sorted(ages, reverse=True)


def test_slo_alerts_exceed_baseline(spark, registry):
    rows = registry["events_slo_burn_alerts"].spark(spark, SF_MID).collect()
    assert rows  # non-degenerate at sf0.01 by construction
    for r in rows:
        assert r["share_6h_ppm"] >= r["baseline_ppm"] * 115 // 100
        assert r["share_24h_ppm"] >= r["baseline_ppm"] * 105 // 100
        assert r["share_6h_ppm"] == r["e6"] * 1_000_000 // r["n6"]


def test_event_study_baseline_normalized(spark, registry):
    rows = {
        r["rel_year"]: r
        for r in registry["orders_promo_event_study"].spark(spark, SF_MID).collect()
    }
    assert -1 in rows and rows[-1]["coef_milli"] == 0  # normalization
    for r in rows.values():
        assert r["coef_milli"] == r["gap_milli"] - rows[-1]["gap_milli"]
        assert r["n_tr"] > 0 and r["n_ct"] > 0
