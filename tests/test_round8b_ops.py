"""Third-leg references + plan pins for the round-8 wave D/E operators.

Engine-parity (the oracle sweep) proves Spark == DuckDB; these tests
prove both equal an INDEPENDENT Python implementation of the math,
and pin the scale-critical plan shapes (collapsed checkpoint scans,
limit-then-rank top-k) so refactors can't silently reintroduce
per-branch fact re-reads.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from the_movies_db_spark.queries import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _li() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/lineitem.parquet")


def _orders() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/orders.parquet")


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet")


def _edges_cs() -> pd.DataFrame:
    """Distinct (customer, supplier) trade edges."""
    m = _li().merge(
        _orders(), left_on="l_orderkey", right_on="o_orderkey"
    )[["o_custkey", "l_suppkey"]].drop_duplicates()
    return m


# ------------------------------------------------------------- plan pins


def test_round8b_fact_scan_counts(spark, registry):
    """Checkpoint discipline: the bitmap word table, LPA edge list and
    HITS edge list each feed several branches from ONE materialized
    artifact (0 fact scans in the returned plan); single-pass queries
    scan each fact exactly once."""
    for name, tbl, want in [
        ("events_retention_bitmap", "events", 0),
        ("graph_label_propagation", "lineitem", 0),
        ("graph_hits_bipartite", "lineitem", 0),
        ("pipeline_gopher_rules", "documents", 1),
        ("agg_gini_split_stump", "lineitem", 1),
        ("text_lm_heldout_eval", "documents", 1),
        ("orders_rank_volatility", "lineitem", 1),
    ]:
        txt = plan_of(registry[name].spark(spark, SF))
        assert txt.count(f"{tbl}.parquet") == want, name


def test_preference_pairs_has_no_rank_window(spark, registry):
    """The rn=1 endpoints are combining aggregates + broadcast
    join-backs — a rank window partitioned by ~20 groups would cap
    parallelism at the group count at corpus scale."""
    txt = plan_of(registry["pipeline_preference_pairs"].spark(spark, SF))
    assert "windowspecdefinition" not in txt
    assert "BroadcastHashJoin" in txt


def test_round8b_topk_is_take_ordered(spark, registry):
    """Every round-8b top-k ranks AFTER orderBy().limit() — the plan
    must contain TakeOrderedAndProject, never a global rank over the
    unlimited candidate set."""
    for name in (
        "graph_label_propagation",
        "graph_hits_bipartite",
        "orders_rank_volatility",
    ):
        txt = plan_of(registry[name].spark(spark, SF))
        assert "TakeOrderedAndProject" in txt, name


# ------------------------------------------------ third-leg references


def test_gopher_rules_match_python(spark, registry):
    got = {
        r["rule"]: r
        for r in registry["pipeline_gopher_rules"].spark(spark, SF).collect()
    }
    stop = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
    n_docs = 0
    passes: Counter = Counter()
    for _, d in _docs().iterrows():
        tk = re.split(r"\s+", d["text"])
        n_tok = len(tk)
        sum_len = sum(len(t) for t in tk)
        n_dist = len(set(tk))
        n_alpha = sum(1 for t in tk if re.fullmatch(r"[a-zA-Z]+", t))
        n_stop = sum(1 for w in stop if w in tk)
        flags = {
            "min_words": n_tok >= 20,
            "max_words": n_tok <= 80,
            "mean_word_len": 3 * n_tok <= sum_len <= 8 * n_tok,
            "distinct_fraction": 2 * n_dist >= n_tok,
            "alpha_fraction": 5 * n_alpha >= 4 * n_tok,
            "stopword_count": n_stop >= 2,
        }
        flags["all_rules"] = all(flags.values())
        n_docs += 1
        passes.update(k for k, v in flags.items() if v)
    assert set(got) == set(passes) | {"all_rules"}
    for rule, row in got.items():
        assert row["n_docs"] == n_docs
        assert row["n_pass"] == passes[rule], rule
        assert row["pass_ppm"] == passes[rule] * 1000000 // n_docs
    # non-degenerate: at least one rule rejects and one accepts docs
    rates = {r: got[r]["n_pass"] for r in got}
    assert 0 < rates["all_rules"] < n_docs


def test_retention_bitmap_matches_python_sets(spark, registry):
    got = {
        (r["day_idx"], r["lag_days"]): r
        for r in registry["events_retention_bitmap"].spark(spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    epoch = pd.Timestamp("1970-01-01")
    by_day: dict[int, set] = defaultdict(set)
    for _, r in ev.iterrows():
        by_day[(r["ts"].normalize() - epoch).days].add(int(r["user_id"]))
    want = {}
    for d, users in by_day.items():
        for lag in (1, 7):
            if d + lag in by_day:
                want[(d, lag)] = (len(users), len(users & by_day[d + lag]))
    assert set(got) == set(want)
    for key, (n_active, n_both) in want.items():
        row = got[key]
        assert row["n_active"] == n_active, key
        assert row["n_both"] == n_both, key
        assert row["retention_ppm"] == n_both * 1000000 // n_active


def test_gini_stump_matches_python(spark, registry):
    got = {
        r["threshold"]: r
        for r in registry["agg_gini_split_stump"].spark(spark, SF).collect()
    }
    cells: dict[int, list] = defaultdict(lambda: [0, 0])
    for _, r in _li().iterrows():
        q = int(r["l_quantity"])
        cells[q][0] += 1
        cells[q][1] += int(r["l_returnflag"] == "R")
    qs = sorted(cells)
    n_tot = sum(c[0] for c in cells.values())
    pos_tot = sum(c[1] for c in cells.values())

    def side(p, n):
        pp = p * 1000000 // n
        qq = (n - p) * 1000000 // n
        return 1000000 - (pp * pp + qq * qq) // 1000000

    n_l = pos_l = 0
    best = None
    for q in qs:
        n_l += cells[q][0]
        pos_l += cells[q][1]
        n_r, pos_r = n_tot - n_l, pos_tot - pos_l
        if n_r == 0:
            continue
        g = (n_l * side(pos_l, n_l) + n_r * side(pos_r, n_r)) // (n_l + n_r)
        row = got[q]
        assert (row["n_l"], row["pos_l"], row["n_r"], row["pos_r"]) == (
            n_l, pos_l, n_r, pos_r
        ), q
        assert row["gini_split_ppm"] == g, q
        best = min(best or (g, q), (g, q))
    assert got[best[1]]["split_rank"] == 1


def test_cramers_v_matches_python(spark, registry):
    rows = {
        r["pair"]: r
        for r in registry["agg_cramers_v"].spark(spark, SF).collect()
    }
    li = _li()
    cells = Counter(zip(li["l_returnflag"], li["l_linestatus"]))
    n = sum(cells.values())
    rt = Counter()
    ct = Counter()
    for (a, b), c in cells.items():
        rt[a] += c
        ct[b] += c
    chi2 = 0
    for (a, b), c in cells.items():
        e = float(rt[a]) * float(ct[b]) / float(n)
        chi2 += math.floor((float(c) - e) * (float(c) - e) / e * 1000000)
    r_, c_ = len(rt), len(ct)
    k = min(r_ - 1, c_ - 1)
    q = (chi2 // (n * k)) * 1000000 + (chi2 % (n * k)) * 1000000 // (n * k)
    row = rows["returnflag_x_linestatus"]
    assert row["n"] == n
    assert (row["n_rows_cat"], row["n_cols_cat"]) == (r_, c_)
    assert row["df"] == (r_ - 1) * (c_ - 1)
    assert row["chi2_milli"] == chi2 // 1000
    assert row["v_micro"] == math.floor(math.sqrt(float(q)))


# the sf0.001 co-preference graph is EMPTY (no customer has two
# same-nation suppliers at that scale), so the LPA/modularity third
# legs run at sf0.01 to be non-vacuous.
SF_GRAPH = "/root/testdata/sf0.01"


def _lpa_python(rounds=3, sf=SF_GRAPH):
    li = pd.read_parquet(f"{sf}/lineitem.parquet").merge(
        pd.read_parquet(f"{sf}/orders.parquet"),
        left_on="l_orderkey", right_on="o_orderkey",
    )
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    supp = pd.read_parquet(f"{sf}/supplier.parquet")
    li = li.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        supp, left_on="l_suppkey", right_on="s_suppkey"
    )
    li = li[li["c_nationkey"] == li["s_nationkey"]]
    spend: dict = defaultdict(int)
    for _, r in li.iterrows():
        spend[(int(r["o_custkey"]), int(r["l_suppkey"]))] += round(
            r["l_extendedprice"] * 100
        )
    per_c: dict[int, list] = defaultdict(list)
    for (c, s), sp in spend.items():
        per_c[c].append((-sp, s))
    edges = set()
    for c, lst in per_c.items():
        lst.sort()
        if len(lst) >= 2:
            s1, s2 = lst[0][1], lst[1][1]
            edges.add((min(s1, s2), max(s1, s2)))
    nbrs: dict[int, list] = defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    labels = {v: v for v in nbrs}
    for _ in range(rounds):
        new = {}
        for v, ns in nbrs.items():
            cnt = Counter(labels[u] for u in ns)
            best = max((c, -l) for l, c in cnt.items())
            new[v] = -best[1]
        labels = new
    return Counter(labels.values())


def test_label_propagation_matches_python(spark, registry):
    got = [
        (r["community"], r["n_members"], r["rank"])
        for r in registry["graph_label_propagation"]
        .spark(spark, SF_GRAPH)
        .collect()
    ]
    sizes = _lpa_python()
    assert sizes, "graph must be non-empty at sf0.01"
    want = sorted(((lbl, n) for lbl, n in sizes.items()),
                  key=lambda t: (-t[1], t[0]))[:20]
    assert got == [(lbl, n, i + 1) for i, (lbl, n) in enumerate(want)]


def _hits_norm_py(x, d):
    return (
        (x // d) * 1000000
        + (x % d) * 100 // d * 10000
        + ((x % d) * 100 % d) * 100 // d * 100
        + (((x % d) * 100 % d) * 100 % d) * 100 // d
    )


def test_hits_matches_python(spark, registry):
    got = [
        (r["supplier"], r["authority_ppm"], r["rank"])
        for r in registry["graph_hits_bipartite"].spark(spark, SF).collect()
    ]
    e = [
        (int(r["o_custkey"]), int(r["l_suppkey"]))
        for _, r in _edges_cs().iterrows()
    ]
    h = {c: 1000000 for c, _ in e}
    a: dict[int, int] = {}
    for _ in range(2):
        a_raw: dict[int, int] = defaultdict(int)
        for c, s in e:
            a_raw[s] += h[c]
        tot = sum(a_raw.values())
        a = {s: _hits_norm_py(x, tot) for s, x in a_raw.items()}
        h_raw: dict[int, int] = defaultdict(int)
        for c, s in e:
            h_raw[c] += a[s]
        tot = sum(h_raw.values())
        h = {c: _hits_norm_py(x, tot) for c, x in h_raw.items()}
    want = sorted(((s, v) for s, v in a.items()),
                  key=lambda t: (-t[1], t[0]))[:20]
    assert got == [(s, v, i + 1) for i, (s, v) in enumerate(want)]


def test_lm_heldout_matches_python(spark, registry):
    got = {
        r["lang"]: r
        for r in registry["text_lm_heldout_eval"].spark(spark, SF).collect()
    }
    cb: Counter = Counter()
    cu: Counter = Counter()
    ev: dict = defaultdict(Counter)  # lang -> (bigram, w1) -> cnt
    for _, d in _docs().iterrows():
        t = [x for x in re.split(r"\s+", d["text"].lower()) if x]
        bigrams = list(zip(t[:-1], t[1:]))
        if d["doc_id"] % 2 == 0:
            cu.update(t)
            cb.update(bigrams)
        else:
            ev[d["lang"]].update(bigrams)
    v = len(cu)
    for lang, row in got.items():
        n = n_unseen = n_oov = s = 0
        for (w1, w2), cnt in ev[lang].items():
            c_bi = cb.get((w1, w2), 0)
            c_w1 = cu.get(w1, 0)
            w = math.floor(
                math.log((float(c_bi) + 1.0) / (float(c_w1) + float(v)))
                * 1000000
            )
            n += cnt
            s += cnt * w
            n_unseen += cnt * ((w1, w2) not in cb)
            n_oov += cnt * (w1 not in cu)
        assert row["n_bigrams"] == n, lang
        assert row["n_unseen"] == n_unseen, lang
        assert row["oov_ppm"] == n_oov * 1000000 // n, lang
        assert row["xent_micro"] == (-s) // n, lang


def test_rank_volatility_matches_python(spark, registry):
    got = [
        (r["supplier"], r["n_transitions"], r["avg_abs_shift_milli"],
         r["max_shift"], r["rank"])
        for r in registry["orders_rank_volatility"].spark(spark, SF).collect()
    ]
    li = _li().merge(_orders(), left_on="l_orderkey", right_on="o_orderkey")
    rev: dict = defaultdict(int)
    for _, r in li.iterrows():
        m = (r["o_orderdate"].year - 1990) * 12 + r["o_orderdate"].month
        rev[(int(r["l_suppkey"]), m)] += round(r["l_extendedprice"] * 100)
    by_m: dict[int, list] = defaultdict(list)
    for (s, m), cents in rev.items():
        by_m[m].append((-cents, s))
    rank: dict = {}
    for m, lst in by_m.items():
        lst.sort()
        for i, (negc, s) in enumerate(lst):
            # rank() semantics: ties share the lowest position; the
            # (cents, supplier) sort key is unique so rank == position
            rank[(s, m)] = i + 1
    trans: dict[int, list] = defaultdict(list)
    for (s, m) in sorted(rank):
        if (s, m - 1) in rank:
            trans[s].append(abs(rank[(s, m)] - rank[(s, m - 1)]))
    vol = [
        (sum(d) * 1000 // len(d), s, len(d), max(d))
        for s, d in trans.items()
    ]
    vol.sort(key=lambda t: (-t[0], t[1]))
    want = [
        (s, n, avg, mx, i + 1)
        for i, (avg, s, n, mx) in enumerate(vol[:20])
    ]
    assert got == want


def test_vacuum_versions_counts(spark, registry):
    row = registry["upsert_vacuum_versions"].spark(spark, SF).collect()[0]
    assert row["n_versions_before"] == 3
    assert row["n_versions_after"] == 1
    assert row["n_removed"] == 2
    assert row["n_current"] > 0


def test_hubness_edge_shares_sum(spark, registry):
    rows = registry["sim_hubness_audit"].spark(spark, SF).collect()
    # every edge accounted for exactly once: sum(k_occ * n_points) ==
    # |panel| * k, and the histogram is over positive occurrence counts
    assert sum(r["n_edges"] for r in rows) == 128 * 5
    assert all(r["k_occ"] >= 1 for r in rows)
    for r in rows:
        assert r["n_edges"] == r["k_occ"] * r["n_points"]
        assert r["edge_share_ppm"] == r["n_edges"] * 1000000 // 640


# ------------------------------------------------ wave F third legs


def test_moments_merge_audit_matches_python(spark, registry):
    rows = {
        r["stat"]: r
        for r in registry["agg_moments_merge_audit"].spark(spark, SF).collect()
    }
    shards: dict[int, list] = defaultdict(lambda: [0, 0, 0, 0, 0])
    for _, r in _li().iterrows():
        q = int(r["l_quantity"])
        a = shards[int(r["l_orderkey"]) % 8]
        a[0] += 1
        for i, p in enumerate((q, q * q, q ** 3, q ** 4), start=1):
            a[i] += p

    def skew_kurt(n, s1, s2, s3, s4):
        mu = s1 / n
        m2 = s2 / n - mu * mu
        m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu
        m4 = (
            s4 / n
            - 4.0 * mu * (s3 / n)
            + 6.0 * mu * mu * (s2 / n)
            - 3.0 * mu * mu * mu * mu
        )
        return (
            math.floor(m3 / (m2 * math.sqrt(m2)) * 1000000),
            math.floor((m4 / (m2 * m2) - 3.0) * 1000000),
        )

    per = [skew_kurt(*a) for a in shards.values()]
    pooled = skew_kurt(*[sum(a[i] for a in shards.values()) for i in range(5)])
    k = len(shards)

    def int_div(a, b):  # both engines truncate toward zero
        q, r = divmod(a, b)
        return q + 1 if q < 0 and r else q

    naive = (
        int_div(sum(p[0] for p in per), k),
        int_div(sum(p[1] for p in per), k),
    )
    sk, ku = rows["skewness"], rows["kurtosis_excess"]
    assert (sk["pooled_micro"], sk["shard_mean_micro"]) == (pooled[0], naive[0])
    assert (ku["pooled_micro"], ku["shard_mean_micro"]) == (pooled[1], naive[1])
    assert sk["bias_micro"] == pooled[0] - naive[0]
    # the audit is non-vacuous: averaging shard skewness is biased here
    assert sk["bias_micro"] != 0 or ku["bias_micro"] != 0


def test_ivf_cost_model_invariants(spark, registry):
    rows = {
        r["planes"]: r
        for r in registry["sim_ivf_cost_model"].spark(spark, SF).collect()
    }
    assert set(rows) == {4, 6, 8, 10}
    n = rows[4]["n_vectors"]
    prev_cells = None
    for m in (4, 6, 8, 10):
        r = rows[m]
        nlist = 1 << m
        nprobe = max(1, nlist // 64)
        assert r["n_vectors"] == n
        assert r["nlist"] == nlist and r["nprobe"] == nprobe
        assert r["scan_ppm"] == nprobe * 1000000 // nlist
        assert r["centroid_bytes"] == nlist * 64 * 8
        assert 1 <= r["n_cells_occupied"] <= min(nlist, n)
        assert r["balanced_candidates"] == nprobe * (n // nlist)
        assert r["worst_candidates"] == nprobe * r["max_cell_rows"]
        assert r["worst_candidates"] >= r["balanced_candidates"]
        if prev_cells is not None:  # coarser prefix can only merge cells
            assert r["n_cells_occupied"] >= prev_cells
        prev_cells = r["n_cells_occupied"]


def test_span_corruption_matches_python(spark, registry):
    import hashlib

    got = {
        r["lang"]: r
        for r in registry["pipeline_span_corruption"].spark(spark, SF).collect()
    }
    agg: dict = defaultdict(lambda: [0, 0, 0, 0, 0])  # docs, tok, spans, masked, start
    for _, d in _docs().iterrows():
        n_tok = len(re.split(r"\s+", d["text"]))
        a = agg[d["lang"]]
        a[0] += 0 if n_tok >= 4 else 0
        if n_tok < 4:
            a[1] += 0
            continue
        n_spans = max(1, n_tok // 20)
        sl = n_tok // n_spans
        span_len = min(3, sl)
        slots = sl - span_len + 1
        a[0] += 1
        a[1] += n_tok
        a[2] += n_spans
        a[3] += n_spans * min(3, n_tok // n_spans)
        for k in range(1, n_spans + 1):
            h = int(
                hashlib.md5(f"{int(d['doc_id'])}:{k}".encode()).hexdigest()[:8],
                16,
            )
            a[4] += h % slots
    # docs with n_tok < 4 contribute nothing, including to n_tokens
    for lang, row in got.items():
        docs, tok, spans, masked, start = agg[lang]
        assert row["n_docs"] == docs, lang
        assert row["n_tokens"] == tok, lang
        assert row["n_spans"] == spans, lang
        assert row["masked_tokens"] == masked, lang
        assert row["mask_ratio_ppm"] == masked * 1000000 // tok, lang
        assert row["start_checksum"] == start, lang
        # corruption rate lands near the 15% design target
        assert 80000 <= row["mask_ratio_ppm"] <= 200000, lang


def test_rolling_wau_bitmap_matches_python_sets(spark, registry):
    got = {
        r["day_idx"]: r
        for r in registry["events_rolling_wau_bitmap"].spark(spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    epoch = pd.Timestamp("1970-01-01")
    by_day: dict[int, set] = defaultdict(set)
    for _, r in ev.iterrows():
        by_day[(r["ts"].normalize() - epoch).days].add(int(r["user_id"]))
    assert set(got) == set(by_day)
    for d, users in by_day.items():
        wau = set().union(
            *(by_day.get(x, set()) for x in range(d - 6, d + 1))
        )
        assert got[d]["dau"] == len(users), d
        assert got[d]["wau7"] == len(wau), d
        assert got[d]["stickiness_ppm"] == len(users) * 1000000 // len(wau)


def test_filter_lm_impact_matches_python(spark, registry):
    got = {
        r["lang"]: r
        for r in registry["pipeline_filter_lm_impact"].spark(spark, SF).collect()
    }
    models = {"raw": [Counter(), Counter()], "flt": [Counter(), Counter()]}
    ev: dict = defaultdict(Counter)
    n_train = n_kept = 0
    for _, d in _docs().iterrows():
        t = [x for x in re.split(r"\s+", d["text"].lower()) if x]
        n_tok, sum_len, n_dist = len(t), sum(len(x) for x in t), len(set(t))
        keep = (
            20 <= n_tok <= 80
            and 3 * n_tok <= sum_len <= 8 * n_tok
            and 2 * n_dist >= n_tok
        )
        bigrams = list(zip(t[:-1], t[1:]))
        if d["doc_id"] % 2 == 0:
            n_train += 1
            n_kept += keep
            for name in ("raw",) + (("flt",) if keep else ()):
                models[name][0].update(bigrams)
                models[name][1].update(t)
        else:
            ev[d["lang"]].update(bigrams)

    def xent(lang, cb, cu):
        v = len(cu)
        n = s = 0
        for (w1, w2), cnt in ev[lang].items():
            w = math.floor(
                math.log(
                    (float(cb.get((w1, w2), 0)) + 1.0)
                    / (float(cu.get(w1, 0)) + float(v))
                )
                * 1000000
            )
            n += cnt
            s += cnt * w
        return n, (-s) // n

    for lang, row in got.items():
        n, raw = xent(lang, *models["raw"])
        _, flt = xent(lang, *models["flt"])
        assert row["n_bigrams"] == n, lang
        assert row["xent_raw_micro"] == raw, lang
        assert row["xent_filtered_micro"] == flt, lang
        assert row["delta_micro"] == flt - raw, lang
        assert row["n_train_docs"] == n_train
        assert row["n_kept_docs"] == n_kept


def test_wave_f_plan_shapes(spark, registry):
    for name, tbl, want in [
        # shard sums are checkpointed -> the returned plan reads the
        # materialized 8-row artifact, not the fact
        ("agg_moments_merge_audit", "lineitem", 0),
        ("sim_ivf_cost_model", "embeddings", 1),
        ("pipeline_span_corruption", "documents", 1),
        ("events_rolling_wau_bitmap", "events", 1),
    ]:
        txt = plan_of(registry[name].spark(spark, SF))
        assert txt.count(f"{tbl}.parquet") == want, name


# ------------------------------------------------ wave G third legs


def test_streaming_bitmap_dau_matches_sets(spark, registry):
    got = {
        r["day_idx"]: r
        for r in registry["streaming_bitmap_dau"].spark(spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    epoch = pd.Timestamp("1970-01-01")
    by_day: dict[int, set] = defaultdict(set)
    for _, r in ev.iterrows():
        by_day[(r["ts"].normalize() - epoch).days].add(int(r["user_id"]))
    assert set(got) == set(by_day)
    for d, users in by_day.items():
        assert got[d]["dau"] == len(users), d
        assert got[d]["n_words"] == len({u // 32 for u in users}), d


def test_preference_pairs_match_python(spark, registry):
    got = {
        (r["lang"], r["len_bucket"]): r
        for r in registry["pipeline_preference_pairs"].spark(spark, SF).collect()
    }
    groups: dict = defaultdict(list)
    for _, d in _docs().iterrows():
        t = [x for x in re.split(r"\s+", d["text"].lower()) if x]
        score = len(set(t)) * 1000000 // len(t)
        groups[(d["lang"], len(t) // 25)].append((score, int(d["doc_id"])))
    want = {}
    for key, docs in groups.items():
        if len(docs) < 2:
            continue
        hi = max(docs, key=lambda p: (p[0], -p[1]))
        lo = min(docs, key=lambda p: (p[0], p[1]))
        if hi[0] - lo[0] >= 100000:
            want[key] = (hi, lo, len(docs))
    assert set(got) == set(want)
    for key, (hi, lo, n) in want.items():
        row = got[key]
        assert (row["chosen_doc"], row["chosen_score_ppm"]) == (hi[1], hi[0])
        assert (row["rejected_doc"], row["rejected_score_ppm"]) == (
            lo[1], lo[0]
        )
        assert row["n_docs"] == n
        assert row["gap_ppm"] == hi[0] - lo[0]


def test_rolling_regression_matches_python(spark, registry):
    got = {
        (r["event_type"], r["day_idx"]): r
        for r in registry["window_rolling_regression"].spark(spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    epoch = pd.Timestamp("1970-01-01")
    daily: dict = defaultdict(int)
    for _, r in ev.iterrows():
        d = (r["ts"].normalize() - epoch).days
        daily[(r["event_type"], d)] += round(r["value"] * 100)
    d0 = min(d for _, d in daily)
    by_type: dict = defaultdict(dict)
    for (t, d), cents in daily.items():
        by_type[t][d - d0] = cents
    want = {}
    for t, series in by_type.items():
        for d, _ in series.items():
            pts = [(x, series[x]) for x in range(d - 6, d + 1) if x in series]
            n = len(pts)
            sx = sum(x for x, _ in pts)
            sy = sum(y for _, y in pts)
            sxy = sum(x * y for x, y in pts)
            sxx = sum(x * x for x, _ in pts)
            den = n * sxx - sx * sx
            if n >= 3 and den > 0:
                num = (n * sxy - sx * sy) * 1000
                q, r_ = divmod(num, den)
                if q < 0 and r_:  # both engines truncate toward zero
                    q += 1
                want[(t, d + d0)] = q
    assert set(got) == set(want)
    for key, slope in want.items():
        assert got[key]["slope_milli"] == slope, key


# ------------------------------------------------ wave H third legs


def test_shapley_matches_python(spark, registry):
    got = {
        r["channel"]: r
        for r in registry["events_attribution_shapley"].spark(spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
    j: dict = defaultdict(lambda: [0, 0])  # (user, day) -> [mask, conv]
    for _, r in ev.iterrows():
        key = (int(r["user_id"]), r["ts"].normalize())
        if r["event_type"] == "purchase":
            j[key][1] = 1
        else:
            j[key][0] |= bits[r["event_type"]]
    conv = Counter()
    for mask, c in j.values():
        conv[mask] += c

    def v(s):
        return sum(c for m, c in conv.items() if (m & s) == m)

    w = {0: 6, 1: 2, 2: 2, 3: 6}
    phi = {}
    for ch, bit in bits.items():
        phi[ch] = sum(
            w[bin(s).count("1")] * (v(s | bit) - v(s))
            for s in range(16)
            if not s & bit
        )
    tot = sum(phi.values())
    # efficiency: phi sums to 24 * (v(full) - v(empty))
    assert tot == 24 * (v(15) - v(0))
    for ch, row in got.items():
        assert row["phi_x24"] == phi[ch], ch
        assert row["share_ppm"] == phi[ch] * 1000000 // tot
        assert row["attributed_conversions"] == tot // 24


def test_modularity_matches_python(spark, registry):
    rows = registry["graph_modularity_score"].spark(spark, SF_GRAPH).collect()
    total = [r for r in rows if r["community"] == -1][0]
    top = {r["community"]: r for r in rows if r["community"] != -1}
    sizes = _lpa_python()  # same labels construction, 3 rounds
    # reconstruct edges + labels exactly as _lpa_python does
    labels, edges = _lpa_python_labels_edges()
    nbr_deg = Counter()
    for a, b in edges:
        nbr_deg[a] += 1
        nbr_deg[b] += 1
    m = len(edges)
    comm: dict = defaultdict(lambda: [0, 0, 0])  # nodes, degree, intra
    for v_, lbl in labels.items():
        comm[lbl][0] += 1
        comm[lbl][1] += nbr_deg[v_]
    for a, b in edges:
        if labels[a] == labels[b]:
            comm[labels[a]][2] += 1
    contribs = {}
    for lbl, (nn, ds, ec) in comm.items():
        t = ds * 1000 // (2 * m)
        contribs[lbl] = ec * 1000000 // m - t * t
    assert total["contribution_ppm"] == sum(contribs.values())
    assert total["n_nodes"] == sum(c[0] for c in comm.values())
    for lbl, row in top.items():
        assert row["contribution_ppm"] == contribs[lbl], lbl
        assert row["n_nodes"] == comm[lbl][0]
        assert row["intra_edges"] == comm[lbl][2]
        assert row["degree_sum"] == comm[lbl][1]
    # LPA community sizes agree with the sibling query's reference
    assert {lbl: c[0] for lbl, c in comm.items()} == dict(sizes)


def _lpa_python_labels_edges(sf=SF_GRAPH):
    li = pd.read_parquet(f"{sf}/lineitem.parquet").merge(
        pd.read_parquet(f"{sf}/orders.parquet"),
        left_on="l_orderkey", right_on="o_orderkey",
    )
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    supp = pd.read_parquet(f"{sf}/supplier.parquet")
    li = li.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        supp, left_on="l_suppkey", right_on="s_suppkey"
    )
    li = li[li["c_nationkey"] == li["s_nationkey"]]
    spend: dict = defaultdict(int)
    for _, r in li.iterrows():
        spend[(int(r["o_custkey"]), int(r["l_suppkey"]))] += round(
            r["l_extendedprice"] * 100
        )
    per_c: dict = defaultdict(list)
    for (c, s), sp in spend.items():
        per_c[c].append((-sp, s))
    edges = set()
    for c, lst in per_c.items():
        lst.sort()
        if len(lst) >= 2:
            s1, s2 = lst[0][1], lst[1][1]
            edges.add((min(s1, s2), max(s1, s2)))
    nbrs: dict = defaultdict(list)
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    labels = {v: v for v in nbrs}
    for _ in range(3):
        new = {}
        for v_, ns in nbrs.items():
            cnt = Counter(labels[u] for u in ns)
            best = max((c, -l) for l, c in cnt.items())
            new[v_] = -best[1]
        labels = new
    return labels, edges


def test_candidate_keys_match_python(spark, registry):
    got = {
        r["combo"]: r
        for r in registry["dq_candidate_keys"].spark(spark, SF).collect()
    }
    o = _orders()
    cols = sorted(
        ["o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
         "o_orderstatus", "o_totalprice"]
    )
    n = len(o)
    singles = {c: o[c].nunique() for c in cols}
    non_keys = [c for c in cols if singles[c] < n]
    want = {c: (1, singles[c]) for c in cols}
    for i, a in enumerate(non_keys):
        for b in non_keys[i + 1:]:
            want[f"{a}+{b}"] = (2, len(o[[a, b]].drop_duplicates()))
    assert set(got) == set(want)
    for combo, (nc, nd) in want.items():
        row = got[combo]
        assert (row["n_cols"], row["n_distinct"], row["n_rows"]) == (nc, nd, n)
        assert row["is_key"] == int(nd == n)
        assert row["uniqueness_ppm"] == nd * 1000000 // n
    # the seed PK must always be discovered
    assert got["o_orderkey"]["is_key"] == 1


def test_srp_bit_balance_invariants(spark, registry):
    rows = {
        r["plane"]: r
        for r in registry["sim_srp_bit_balance"].spark(spark, SF).collect()
    }
    assert set(rows) == set(range(1, 17))
    n = rows[1]["n_vectors"]
    for p, r in rows.items():
        assert 0 <= r["ones"] <= n
        assert r["balance_ppm"] == r["ones"] * 1000000 // n
        assert 1 <= r["worst_partner"] <= 16 and r["worst_partner"] != p
        assert 0 <= r["worst_corr_ppm"] <= 1000000
    # a healthy md5-derived family: every plane reasonably balanced
    assert all(
        300000 <= r["balance_ppm"] <= 700000 for r in rows.values()
    )
    # correlation is symmetric: the worst pair appears from both sides
    worst_global = max(r["worst_corr_ppm"] for r in rows.values())
    ends = [p for p, r in rows.items() if r["worst_corr_ppm"] == worst_global]
    assert len(ends) >= 2
