"""Third-leg references + plan pins for the round-8 operators.

Engine-parity (the oracle sweep) proves Spark == DuckDB; these tests
prove both equal an INDEPENDENT Python implementation of the math,
and pin the scale-critical plan shapes (scan counts, limit-then-rank)
so refactors can't silently reintroduce per-branch fact re-reads or
unbounded-domain windows.
"""

from __future__ import annotations

import math
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


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet")


# ------------------------------------------------------------- plan pins


def test_round8_fact_scan_counts(spark, registry):
    """Single-pass discipline: margin waterfall and completeness rules
    are ONE scan each (conditional sums, never per-rule/per-component
    re-reads); Adamic-Adar feeds every branch from the checkpointed
    edge list (0 fact reads in the returned plan, the link_jaccard
    shape); basket sizes read lineitem once."""
    for name, tbl, want in [
        ("orders_margin_waterfall", "lineitem", 1),
        ("orders_basket_size_dist", "lineitem", 1),
        ("dq_completeness_rules", "orders", 1),
        ("graph_adamic_adar", "lineitem", 0),
        ("events_session_gap_dist", "events", 1),
    ]:
        txt = plan_of(registry[name].spark(spark, SF))
        assert txt.count(f"{tbl}.parquet") == want, name


def test_idf_drift_topk_is_take_ordered(spark, registry):
    """search_idf_drift's top movers must come from orderBy().limit()
    (TakeOrderedAndProject), never a global rank window."""
    txt = plan_of(registry["search_idf_drift"].spark(spark, SF))
    assert "TakeOrderedAndProject" in txt
    assert "windowspecdefinition" not in txt


def test_session_gap_windows_are_user_keyed_or_bounded(spark, registry):
    """The only corpus-grain window in events_session_gap_dist is the
    user-keyed lag; share/cum windows run over the capped hour domain
    (post-aggregation)."""
    txt = plan_of(registry["events_session_gap_dist"].spark(spark, SF))
    lag_wins = [
        ln for ln in txt.splitlines()
        if "windowspecdefinition(user_id#" in ln
    ]
    assert lag_wins, "user-keyed lag window missing"


# ------------------------------------------------ third-leg references


def test_margin_waterfall_matches_python(spark, registry):
    rows = {
        r["order_year"]: r
        for r in registry["orders_margin_waterfall"]
        .spark(spark, SF)
        .collect()
    }
    acc = defaultdict(lambda: [0, 0, 0])
    for _, r in _li().iterrows():
        y = r["l_shipdate"].year
        cents = round(r["l_extendedprice"] * 100)
        disc = cents * round(r["l_discount"] * 100) // 100
        tax = (cents - disc) * round(r["l_tax"] * 100) // 100
        a = acc[y]
        a[0] += cents
        a[1] += disc
        a[2] += tax
    assert set(acc) == set(rows)
    for y, (g, d, t) in acc.items():
        r = rows[y]
        assert (r["gross_cents"], r["discount_cents"], r["tax_cents"]) == (
            g, d, t
        ), y
        assert r["net_cents"] == g - d + t
        assert r["discount_ppm"] == d * 1000000 // g


def test_basket_size_dist_matches_python(spark, registry):
    got = {
        r["basket_size"]: r
        for r in registry["orders_basket_size_dist"].spark(spark, SF).collect()
    }
    sizes = Counter(_li().groupby("l_orderkey").size())
    total = sum(sizes.values())
    assert set(got) == set(sizes)
    cum = 0
    for k in sorted(sizes):
        cum += sizes[k]
        assert got[k]["n_orders"] == sizes[k]
        assert got[k]["n_lines"] == sizes[k] * k
        assert got[k]["share_ppm"] == sizes[k] * 1000000 // total
        assert got[k]["cum_ppm"] == cum * 1000000 // total


def test_simpson_matches_python(spark, registry):
    got = {
        r["source"]: r
        for r in registry["text_simpson_diversity"].spark(spark, SF).collect()
    }
    per_src: dict[str, Counter] = defaultdict(Counter)
    for _, r in _docs().iterrows():
        per_src[r["source"]].update(
            t for t in r["text"].lower().split() if t
        )
    assert set(got) == set(per_src)
    for src, c in per_src.items():
        n = sum(c.values())
        s = sum(v * (v - 1) for v in c.values())
        r = got[src]
        assert r["n_tokens"] == n and r["vocab_size"] == len(c)
        assert r["simpson_micro"] == math.floor(
            float(s) * 1000000.0 / (float(n) * float(n - 1))
        )


def test_hourly_entropy_matches_python(spark, registry):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ts = pd.to_datetime(ev["ts"])
    cells: dict[tuple[int, str], int] = Counter(
        zip(ts.dt.hour.astype(int), ev["event_type"])
    )
    by_hr: dict[int, list[int]] = defaultdict(list)
    for (hr, _), c in cells.items():
        by_hr[hr].append(c)
    got = {
        r["hr"]: r
        for r in registry["events_hourly_entropy"].spark(spark, SF).collect()
    }
    assert set(got) == set(range(24))
    for hr, cs in by_hr.items():
        ch = sum(cs)
        term = sum(c * math.floor(math.log(ch / c) * 1000000) for c in cs)
        assert got[hr]["entropy_micro"] == term // ch, hr
        assert got[hr]["n_events"] == ch and got[hr]["n_types"] == len(cs)


def test_winsorized_corr_matches_python(spark, registry):
    r = registry["agg_winsorized_corr"].spark(spark, SF).collect()[0]
    li = _li()
    q = li["l_quantity"].astype("int64").tolist()
    d = [round(x * 100) for x in li["l_discount"]]

    def cut(vals, mult):
        n = len(vals)
        cum = 0
        for v, c in sorted(Counter(vals).items()):
            cum += c
            if cum * 10 >= n * mult:
                return v

    lox, hix = cut(q, 1), cut(q, 9)
    loy, hiy = cut(d, 1), cut(d, 9)
    assert (r["lo_x"], r["hi_x"], r["lo_y"], r["hi_y"]) == (
        lox, hix, loy, hiy
    )

    def corr_micro(xs, ys):
        n = float(len(xs))
        sx, sy = float(sum(xs)), float(sum(ys))
        sxx = float(sum(x * x for x in xs))
        syy = float(sum(y * y for y in ys))
        sxy = float(sum(x * y for x, y in zip(xs, ys)))
        return math.floor(
            (n * sxy - sx * sy)
            / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
            * 1000000
        )

    wq = [min(max(v, lox), hix) for v in q]
    wd = [min(max(v, loy), hiy) for v in d]
    assert r["corr_raw_micro"] == corr_micro(q, d)
    assert r["corr_winsor_micro"] == corr_micro(wq, wd)


def test_idf_drift_matches_python(spark, registry):
    rows = registry["search_idf_drift"].spark(spark, SF).collect()
    docs = _docs()
    dfa: Counter = Counter()
    dfb: Counter = Counter()
    na = nb = 0
    for _, r in docs.iterrows():
        terms = {t for t in r["text"].lower().split() if t}
        if r["doc_id"] % 2 == 0:
            na += 1
            dfa.update(terms)
        else:
            nb += 1
            dfb.update(terms)

    def idf(n, df):
        return math.floor(math.log((n - df + 0.5) / (df + 0.5)) * 1000000)

    scored = [
        (t, dfa[t], dfb[t], idf(na, dfa[t]), idf(nb, dfb[t]))
        for t in set(dfa) & set(dfb)
        if dfa[t] >= 3 and dfb[t] >= 3
    ]
    scored.sort(key=lambda s: (-abs(s[4] - s[3]), s[0]))
    want = scored[:20]
    assert [
        (r["term"], r["df_a"], r["df_b"], r["idf_a_micro"], r["idf_b_micro"])
        for r in rows
    ] == want
    for r in rows:
        assert r["drift_micro"] == r["idf_b_micro"] - r["idf_a_micro"]


def test_adamic_adar_matches_python(spark, registry):
    rows = registry["graph_adamic_adar"].spark(spark, SF).collect()
    li = _li()[["l_orderkey", "l_suppkey"]]
    od = pd.read_parquet(f"{SF}/orders.parquet")[["o_orderkey", "o_custkey"]]
    e = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    edges = set(zip(e["o_custkey"], e["l_suppkey"]))
    by_c: dict[int, set] = defaultdict(set)
    for c, s in edges:
        by_c[c].add(s)
    mean_d = len(edges) // len(by_c)
    cap = max(64, 8 * mean_d)
    scores: Counter = Counter()
    common: Counter = Counter()
    for c, supps in by_c.items():
        d = len(supps)
        if d < 2 or d > cap:
            continue
        w = math.floor(1000000 / math.log(d))
        ss = sorted(supps)
        for i, a in enumerate(ss):
            for b in ss[i + 1:]:
                scores[(a, b)] += w
                common[(a, b)] += 1
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [((r["supp_a"], r["supp_b"]), r["score_micro"]) for r in rows]
    assert got == want
    for r in rows:
        assert r["common"] == common[(r["supp_a"], r["supp_b"])]


def test_lsh_cost_model_invariants(spark, registry):
    rows = registry["dedup_lsh_cost_model"].spark(spark, SF).collect()
    bands = [r for r in rows if r["band_id"] >= 0]
    total = [r for r in rows if r["band_id"] == -1][0]
    assert len(bands) == 4
    assert total["gen_pairs"] == sum(r["gen_pairs"] for r in bands)
    assert total["uniq_pairs"] <= total["gen_pairs"]
    assert total["max_bucket_size"] == max(r["max_bucket_size"] for r in bands)
    if total["gen_pairs"]:
        assert total["overhead_ppm"] == (
            (total["gen_pairs"] - total["uniq_pairs"])
            * 1000000
            // total["gen_pairs"]
        )


def test_capacity_plan_consistency(spark, registry):
    rows = registry["events_capacity_plan"].spark(spark, SF).collect()
    assert len(rows) == 14
    assert len({r["model"] for r in rows}) == 1
    assert rows[0]["model"] in {"holt", "naive_last", "seasonal_naive"}
    bt = {
        r["model"]: r["mape_ppm"]
        for r in registry["events_forecast_backtest"].spark(spark, SF).collect()
    }
    # the chosen model is a backtest MAPE minimizer
    assert bt[rows[0]["model"]] == min(bt.values())
    for r in rows:
        assert r["forecast"] >= 0 and r["mae"] >= 0
        assert r["capacity"] == r["forecast"] + 2 * r["mae"]


def test_benford2_matches_python(spark, registry):
    got = {
        r["digit"]: r
        for r in registry["dq_benford_digits2"].spark(spark, SF).collect()
    }
    od = pd.read_parquet(f"{SF}/orders.parquet")
    digits = Counter()
    for p in od["o_totalprice"]:
        if p > 0:
            s = str(round(p * 100))
            if len(s) >= 2:
                digits[int(s[1])] += 1
    tot = sum(digits.values())
    assert set(got) == set(range(10))
    for dgt in range(10):
        assert got[dgt]["n"] == digits.get(dgt, 0)
        assert got[dgt]["observed_milli"] == digits.get(dgt, 0) * 1000 // tot
