"""Round-9 directives: per-round scan evidence for the iterative graph
family, and structure (non-degeneracy) assertions at sf0.01.

Value-hash equality cannot see DEGENERACY (the LPA lesson: a 1-row
collapsed output still matched its oracle), so these tests pin BOTH
the plan budget — each iteration round must consume the checkpointed
edge artifact exactly once per join, never the fact — and the output
structure (row counts + nontrivial value spread) so a future data
regeneration or refactor can't silently collapse the graphs.
"""

from __future__ import annotations

import re

import pytest

from the_movies_db_spark.queries import load_all
from the_movies_db_spark.queries.graph_queries import (
    _HITS_ROUNDS,
    _LPA_ROUNDS,
)

SF = "/root/testdata/sf0.001"
# the sf0.001 co-preference graph is empty (see test_round8b_ops);
# structure assertions run where the graphs are non-trivial.
SF_GRAPH = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rdd_scans(txt: str) -> int:
    """Count checkpoint-artifact scans (localCheckpoint materializes to
    an ExistingRDD leaf) in an executed-plan string."""
    return len(re.findall(r"Scan ExistingRDD", txt))


# -------------------------------------------------- per-round scan budget


def test_lpa_per_round_scan_budget(spark, registry):
    """graph_label_propagation: zero fact scans; the returned plan is
    the community-size aggregate over the checkpointed final labels
    (the per-round joins run inside that checkpoint's materialization,
    each consuming the und artifact exactly once — the chain is built
    once, so a regression that re-derives edges per round would
    surface as extra ExistingRDD scans here)."""
    txt = plan_of(registry["graph_label_propagation"].spark(spark, SF))
    for tbl in ("lineitem", "orders", "customer", "supplier"):
        assert txt.count(f"{tbl}.parquet") == 0, tbl
    assert _rdd_scans(txt) == 1, txt[:2000]


def test_hits_per_round_scan_budget(spark, registry):
    """graph_hits_bipartite: zero fact scans; the returned plan is the
    top-k + ppm normalization over the final authority raw-score
    checkpoint, referenced exactly twice (score projection + its
    1-row total). Before round 9 the normalization crossJoin branch
    DOUBLED the un-checkpointed raw lineage per half-round — 22 edge
    scans at 2 rounds, exponential in rounds."""
    txt = plan_of(registry["graph_hits_bipartite"].spark(spark, SF))
    for tbl in ("lineitem", "orders"):
        assert txt.count(f"{tbl}.parquet") == 0, tbl
    assert _rdd_scans(txt) == 2, txt[:2000]


def test_modularity_scan_budget(spark, registry):
    """graph_modularity_score consumes THREE checkpoint artifacts —
    edges (m-count + intra join = 2 scans), und (degrees = 1), final
    labels (community sizes + both intra endpoints = 3) — inside the
    |communities|-bounded contrib frame, whose own lazy checkpoint
    collapses in plan text (it is aggregate-derived), so the returned
    plan is exactly top-10 + total over that one artifact, scanned
    twice, with zero fact scans. Before round 9 the un-checkpointed
    edges frame re-executed the whole 4-table fact subtree from two
    branches and each labels reference re-ran the full LPA chain."""
    txt = plan_of(registry["graph_modularity_score"].spark(spark, SF))
    for tbl in ("lineitem", "orders", "customer", "supplier"):
        assert txt.count(f"{tbl}.parquet") == 0, tbl
    assert _rdd_scans(txt) == 2, txt[:2000]


# -------------------------------------------------- structure assertions


def test_modularity_structure_sf001(spark, registry):
    rows = registry["graph_modularity_score"].spark(spark, SF_GRAPH).collect()
    total = [r for r in rows if r["community"] == -1]
    top = [r for r in rows if r["community"] != -1]
    assert len(total) == 1
    # a healthy partition of the co-preference graph: several
    # communities, positive modularity, non-constant contributions
    assert len(top) >= 3
    assert total[0]["n_nodes"] >= 10
    assert total[0]["contribution_ppm"] > 0, "modularity Q must be positive"
    assert len({r["contribution_ppm"] for r in top}) > 1
    assert len({r["n_nodes"] for r in top}) > 1


def test_hits_structure_sf001(spark, registry):
    rows = registry["graph_hits_bipartite"].spark(spark, SF_GRAPH).collect()
    assert len(rows) == 20
    scores = [r["authority_ppm"] for r in rows]
    # authority mass must be SPREAD, not collapsed onto one supplier
    # (ppm scores: top supplier holding >50% of total mass would mean
    # a degenerate star graph)
    assert scores == sorted(scores, reverse=True)
    assert len(set(scores)) > 10
    assert scores[0] < 500_000
    assert scores[-1] > 0


def test_adamic_adar_structure_sf001(spark, registry):
    rows = registry["graph_adamic_adar"].spark(spark, SF_GRAPH).collect()
    assert len(rows) == 20
    assert len({r["score_micro"] for r in rows}) > 1
    assert len({r["common"] for r in rows}) >= 1
    # candidate pairs must span distinct suppliers on both ends
    assert len({r["supp_a"] for r in rows}) > 1
    assert len({r["supp_b"] for r in rows}) > 1


# ---------------------------------------------- third-leg math replays
#
# Engine parity (oracle sweep) proves Spark == DuckDB; these replays
# prove both equal an INDEPENDENT Python implementation of the math,
# at sf0.001 unless the structure needs sf0.01.

import math
from collections import Counter, defaultdict
from fractions import Fraction

import pandas as pd


def _pq(tbl: str, sf: str = SF) -> pd.DataFrame:
    return pd.read_parquet(f"{sf}/{tbl}.parquet")


def test_quantile_sketch_matches_python(spark, registry):
    got = {
        r["q_permille"]: r
        for r in registry["agg_quantile_sketch_merge"].spark(spark, SF).collect()
    }
    o = _pq("orders")
    vals = sorted(
        (int(round(p * 100)), int(k))
        for p, k in zip(o["o_totalprice"], o["o_orderkey"])
    )
    n = len(vals)
    # per-shard equi-depth summaries
    shards: dict[int, list] = defaultdict(list)
    for v, k in vals:
        shards[k % 32].append((v, k))
    pts = []
    for sh, rows in shards.items():
        rows.sort()
        ns = len(rows)
        step = (ns + 63) // 64
        for i in range(0, ns, step):
            v, k = rows[i]
            pts.append((v, k, min(step, ns - i)))
    pts.sort()
    cum = 0
    cums = []
    for v, k, w in pts:
        cum += w
        cums.append((cum, v, k))
    for q in (10, 250, 500, 750, 990):
        r = (q * n + 999) // 1000
        est = next((v, k) for c, v, k in cums if c >= r)
        exact = vals[r - 1][0]
        est_rank = sum(
            1 for v, k in vals if v < est[0] or (v == est[0] and k <= est[1])
        )
        row = got[q]
        assert row["sketch_cents"] == est[0], q
        assert row["exact_cents"] == exact, q
        assert row["rank_err"] == abs(est_rank - r), q
        # the audit's own contract: rank error bounded by the max step
        max_step = max((len(v) + 63) // 64 for v in shards.values())
        assert row["rank_err"] <= 32 * max_step


def test_seasonal_decompose_matches_python(spark, registry):
    got = {
        r["month"]: r
        for r in registry["orders_seasonal_decompose"].spark(spark, SF).collect()
    }
    o = _pq("orders")
    rev: dict[int, int] = defaultdict(int)
    for p, d in zip(o["o_totalprice"], o["o_orderdate"]):
        mi = (d.year - 1995) * 12 + d.month - 1
        rev[mi] += int(round(p * 100))
    det = {}
    for mi in rev:
        if all(mi + k in rev for k in range(-6, 7)):
            tr = rev[mi - 6] + rev[mi + 6] + 2 * sum(
                rev[mi + k] for k in range(-5, 6)
            )
            det[mi] = (rev[mi] * 24 - tr, tr)
    seas: dict[int, list] = defaultdict(list)
    for mi, (d_, _) in det.items():
        seas[mi % 12].append(d_)
    assert len(got) == len(det) > 0
    for mi, (d_, tr) in det.items():
        m = f"{1995 + mi // 12}-{mi % 12 + 1:02d}"
        s_sum, s_n = sum(seas[mi % 12]), len(seas[mi % 12])
        # Spark/DuckDB integer division truncates toward zero
        s = abs(s_sum) // s_n * (1 if s_sum >= 0 else -1)
        row = got[m]
        assert row["rev_cents"] == rev[mi], m
        assert row["trend_x24"] == tr, m
        assert row["seasonal_x24"] == s, m
        assert row["residual_x24"] == d_ - s, m


def test_uplift_matches_python(spark, registry):
    got = {
        r["exposure"]: r
        for r in registry["events_counterfactual_uplift"].spark(spark, SF).collect()
    }
    ev = _pq("events")
    j: dict = defaultdict(lambda: defaultdict(int))
    for _, r in ev.iterrows():
        key = (int(r["user_id"]), r["ts"].date())
        j[key][r["event_type"]] = 1
    for t in ("click", "view", "signup", "error"):
        ne = sum(1 for f in j.values() if f.get(t))
        ce = sum(1 for f in j.values() if f.get(t) and f.get("purchase"))
        nu = sum(1 for f in j.values() if not f.get(t))
        cu = sum(1 for f in j.values() if not f.get(t) and f.get("purchase"))
        row = got[t]
        assert (row["n_exposed"], row["conv_exposed"]) == (ne, ce), t
        assert (row["n_unexposed"], row["conv_unexposed"]) == (nu, cu), t
        re_, ru = ce * 10**6 // ne, cu * 10**6 // nu
        assert row["uplift_ppm"] == re_ - ru, t
        assert row["lift_milli"] == (re_ * 1000 // ru if ru else None), t


def test_cfd_matches_python(spark, registry):
    got = {
        r["rule"]: r
        for r in registry["dq_rule_mining_cfd"].spark(spark, SF).collect()
    }
    o = _pq("orders").merge(
        _pq("customer"), left_on="o_custkey", right_on="c_custkey"
    )
    rules = {
        "mktsegment->priority": ("c_mktsegment", "o_orderpriority"),
        "nation->mktsegment": ("c_nationkey", "c_mktsegment"),
        "priority->status": ("o_orderpriority", "o_orderstatus"),
        "nation->status": ("c_nationkey", "o_orderstatus"),
        "status->priority": ("o_orderstatus", "o_orderpriority"),
    }
    for name, (a, b) in rules.items():
        cells = Counter(zip(o[a].astype(str), o[b].astype(str)))
        per_lhs: dict = defaultdict(dict)
        for (x, y), c in cells.items():
            per_lhs[x][y] = c
        kept = sum(max(d.values()) for d in per_lhs.values())
        n = len(o)
        row = got[name]
        assert row["n_lhs_values"] == len(per_lhs), name
        assert row["n_rows"] == n, name
        assert row["n_violations"] == n - kept, name
        assert row["confidence_ppm"] == kept * 10**6 // n, name
        assert row["max_rhs_per_lhs"] == max(
            len(d) for d in per_lhs.values()
        ), name


def test_holt_damped_matches_python(spark, registry):
    row = registry["events_forecast_holt_damped"].spark(spark, SF).collect()[0]
    ev = _pq("events")
    days = [d.toordinal() for d in ev["ts"].dt.date]
    d0, d1 = min(days), max(days)
    cnt = Counter(days)
    xs = [cnt.get(d, 0) for d in range(d0, d1 + 1)]
    l, b = xs[0] * 1000, (xs[1] - xs[0]) * 1000

    def tz(a, d):  # truncate-toward-zero division
        return abs(a) // d * (1 if a >= 0 else -1)

    for x in xs[1:]:
        db = tz(900 * b, 1000)
        nl = tz(200 * x * 1000 + 800 * (l + db), 1000)
        b = tz(100 * (nl - l) + 900 * db, 1000)
        l = nl
    assert row["n_days"] == len(xs)
    assert row["level_milli"] == l
    assert row["trend_milli"] == b
    for h, cum in ((1, 900000), (7, 4695327), (30, 8618479)):
        assert int(cum) == int(
            (Fraction(9, 10) * (1 - Fraction(9, 10) ** h))
            / (1 - Fraction(9, 10)) * 10**6
        )
        assert row[f"forecast_{h}d"] == tz(l * 10**6 + cum * b, 10**9)


def test_survivor_stats_matches_python(spark, registry):
    import re as _re

    got = {
        r["source"]: r
        for r in registry["pipeline_dedup_survivor_stats"].spark(spark, SF).collect()
    }
    d = _pq("documents")
    import hashlib

    def h(t):
        return hashlib.md5(
            _re.sub(r"\s+", " ", t.strip().lower()).encode()
        ).hexdigest()

    d = d.assign(ch=[h(t) for t in d["text"]])
    canon = d.groupby("ch")["doc_id"].min().to_dict()
    per: dict = defaultdict(lambda: [0, 0, 0])
    for _, r in d.iterrows():
        s = per[r["source"]]
        s[0] += 1
        if r["doc_id"] != canon[r["ch"]]:
            s[1] += 1
            s[2] += int(r["n_chars"])
    for src, (nd, dr, by) in per.items():
        row = got[src]
        assert (row["n_docs"], row["n_dropped"], row["bytes_saved"]) == (
            nd, dr, by
        ), src
    tot = got["TOTAL"]
    assert tot["n_docs"] == sum(v[0] for v in per.values())
    assert tot["n_dropped"] == sum(v[1] for v in per.values())


def test_connected_components_structure(spark, registry):
    rows = registry["graph_connected_components"].spark(spark, SF_GRAPH).collect()
    assert 1 <= len(rows) <= 20
    # replay min-label propagation over the same edge construction
    labels, edges = __import__("tests.test_round8b_ops", fromlist=["x"])._lpa_python_labels_edges()
    nbrs: dict = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    lbl = {v: v for v in nbrs}
    for _ in range(6):
        prev = dict(lbl)
        lbl = {
            v: min(min(prev[u] for u in ns), prev[v]) for v, ns in nbrs.items()
        }
    changed = sum(1 for v in lbl if lbl[v] != prev[v])
    sizes = Counter(lbl.values())
    want = sorted(sizes.items(), key=lambda t: (-t[1], t[0]))[:20]
    got = [(r["component"], r["n_nodes"]) for r in rows]
    assert got == want
    assert all(r["n_components"] == len(sizes) for r in rows)
    assert all(r["n_changed_last"] == changed for r in rows)
    # structure: the graph must have several components with spread
    assert len(sizes) >= 3
    assert len({n for _, n in want}) > 1


def test_bridge_edges_matches_python(spark, registry):
    rows = registry["graph_bridge_edges"].spark(spark, SF_GRAPH).collect()
    labels, edges = __import__("tests.test_round8b_ops", fromlist=["x"])._lpa_python_labels_edges()
    nbrs: dict = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    bridges = [
        (a, b) for a, b in edges if not (nbrs[a] & nbrs[b] - {a, b})
    ]
    deg = {v: len(ns) for v, ns in nbrs.items()}
    want = sorted(
        ((deg[a] + deg[b], a, b) for a, b in bridges),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    got = [(r["deg_a"] + r["deg_b"], r["sa"], r["sb"]) for r in rows]
    assert got == want
    assert all(r["n_bridges"] == len(bridges) for r in rows)
    assert len(rows) >= 2, "bridge set must be non-degenerate at sf0.01"


def test_minhash_calibration_prediction_exact():
    """The integer prediction equals the textbook 1-(1-s^2)^4 at s=k/8
    for every agreement level, via exact Fraction arithmetic. The
    query's form 1e6 - floor(miss*1e6) is the CEILING of p*1e6 (the
    miss probability is floored, so the hit probability rounds up) —
    assert that identity exactly, and that it never strays more than
    one ppm from the real value."""
    for k in range(0, 9):
        s = Fraction(k, 8)
        p = 1 - (1 - s**2) ** 4
        want_ceil = -((-p * 10**6).__floor__())
        got = 10**6 - (64 - k * k) ** 4 * 10**6 // 16777216
        assert got == want_ceil, k
        assert abs(Fraction(got) - p * 10**6) < 1, k


# ------------------------------------------------- round-9 plan pins


def test_round9_scan_budgets(spark, registry):
    """Scan budgets for the round-9 registrations:
    - quantile sketch: ONE orders scan in the returned plan (the
      sharded summary and the two-level exact rank both collapse into
      checkpoints; the remaining scan is the broadcast rank-err probe)
      and the only windows are global_row_number's bucket-partitioned
      pair — never an unpartitioned window over the fact;
    - query-likelihood: ONE documents scan (corpus-stats branch); the
      vocab-pruned tf table feeds cf/candidates/grid from its
      checkpoint;
    - bridges/CC: ZERO fact scans — everything runs over the
      checkpointed edge artifacts; bridges' triangle probe is
      checkpointed so the count and top-k branches share it."""
    qsk = plan_of(registry["agg_quantile_sketch_merge"].spark(spark, SF))
    assert qsk.count("orders.parquet") == 1
    wins = [
        ln for ln in qsk.splitlines() if "windowspecdefinition" in ln
    ]
    assert len(wins) == 2 and all("__rb#" in w for w in wins), wins

    ql = plan_of(registry["search_query_likelihood_lm"].spark(spark, SF))
    assert ql.count("documents.parquet") == 1

    for name in ("graph_bridge_edges", "graph_connected_components"):
        txt = plan_of(registry[name].spark(spark, SF))
        for tbl in ("lineitem", "orders", "customer", "supplier"):
            assert txt.count(f"{tbl}.parquet") == 0, (name, tbl)
    assert _rdd_scans(plan_of(
        registry["graph_bridge_edges"].spark(spark, SF)
    )) == 4


def test_census_fixed_scan_budgets(spark, registry):
    """Round-9 plan census fixes: the multi-branch fan-out queries
    found re-running fact subtrees per branch (pagerank 22 lineitem
    scans — the HITS normalization class; the shingle-dedup family 8
    documents scans each; KMV 8 events scans; triangles 9) now consume
    checkpointed artifacts: ZERO fact scans in every returned plan."""
    for name, tbls in [
        ("graph_pagerank", ("lineitem", "orders", "customer", "supplier")),
        ("graph_triangles", ("lineitem", "orders")),
        ("dedup_ngram_jaccard", ("documents",)),
        ("dedup_containment", ("documents",)),
        ("dedup_prefix_filter", ("documents",)),
        ("dedup_threshold_histogram", ("documents",)),
        ("dedup_recall_eval", ("documents",)),
        ("multimodal_block_dedup", ("documents",)),
        ("agg_kmv_intersection", ("events",)),
    ]:
        txt = plan_of(registry[name].spark(spark, SF))
        for tbl in tbls:
            assert txt.count(f"{tbl}.parquet") == 0, (name, tbl)


def test_threshold_sensitivity_matches_python(spark, registry):
    """Replay: pair counts and affected docs per threshold from an
    independent pandas n-gram Jaccard (df-capped like the query)."""
    got = {
        r["t_ppm"]: (r["n_pairs"], r["n_docs_affected"])
        for r in registry["pipeline_dedup_threshold_sensitivity"]
        .spark(spark, SF).collect()
    }
    d = _pq("documents")
    import re as _re

    def shingles(t):
        w = _re.split(r"\s+", t)
        if len(w) < 3:
            return {" ".join(w)}
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    sh = {int(r["doc_id"]): shingles(r["text"]) for _, r in d.iterrows()}
    # df-cap at 25 docs
    from collections import Counter as _C
    dfc = _C(s for v in sh.values() for s in v)
    sh = {k: {s for s in v if dfc[s] <= 25} for k, v in sh.items()}
    ids = sorted(sh)
    pairs = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            j = round(inter / (len(sh[a]) + len(sh[b]) - inter), 6)
            if j >= 0.2:
                pairs.append((a, b, round(j * 10**6)))
    for t in range(200_000, 1_000_001, 100_000):
        hit = [(a, b) for a, b, ppm in pairs if ppm >= t]
        if not hit:
            assert t not in got
            continue
        docs = {x for p_ in hit for x in p_}
        assert got[t] == (len(hit), len(docs)), t


def test_cluster_purity_consistency(spark, registry):
    """Structure + internal consistency at sf0.01: purity is the
    majority share, sources bounded by members, and the cluster sizes
    reconcile with pipeline_dedup_survivorship's n_members."""
    rows = registry["pipeline_cluster_purity"].spark(spark, SF_GRAPH).collect()
    assert len(rows) >= 5
    for r in rows:
        assert 1 <= r["n_sources"] <= r["n_members"]
        assert 0 < r["purity_ppm"] <= 10**6
        if r["n_sources"] == 1:
            assert r["purity_ppm"] == 10**6
    surv = {
        r["cluster_id"]: r["n_members"]
        for r in registry["pipeline_dedup_survivorship"]
        .spark(spark, SF_GRAPH).collect()
    }
    assert {r["cluster_id"]: r["n_members"] for r in rows} == surv


def test_percentile_bands_matches_python(spark, registry):
    got = {
        r["day_idx"]: r
        for r in registry["events_percentile_bands_daily"]
        .spark(spark, SF).collect()
    }
    ev = _pq("events")
    per_day: dict = defaultdict(list)
    for _, r in ev.iterrows():
        d = (r["ts"].date() - __import__("datetime").date(1970, 1, 1)).days
        per_day[d].append((int(round(r["value"] * 100)), int(r["event_id"])))
    assert len(got) == len(per_day)
    for d, vals in per_day.items():
        vals.sort()
        n = len(vals)
        row = got[d]
        assert row["n_events"] == n
        for q, col in ((500, "p50_cents"), (900, "p90_cents"),
                       (990, "p99_cents")):
            assert row[col] == vals[(n * q + 999) // 1000 - 1][0], (d, q)


def test_ivf_filtered_consistency(spark, registry):
    """Filtered-ANN invariants at sf0.001: every neighbor satisfies
    the metadata predicate, ranks are contiguous from 1 per query,
    and the published post-filter cell population bounds the result
    count (the starved-probe signal is real, not decorative)."""
    rows = registry["sim_topk_ivf_filtered"].spark(spark, SF).collect()
    assert rows
    en = set(
        int(x["doc_id"])
        for _, x in _pq("documents").iterrows()
        if x["lang"] == "en"
    )
    per_q: dict = defaultdict(list)
    for r in rows:
        assert r["neighbor_id"] in en
        per_q[r["query_id"]].append(r)
    for qid, rs in per_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(ranks) + 1)), qid
        n = {r["n_filtered_candidates"] for r in rs}
        assert len(n) == 1 and n.pop() >= len(rs), qid


def test_degree_powerlaw_matches_python(spark, registry):
    row = registry["graph_degree_powerlaw_fit"].spark(spark, SF).collect()[0]
    e = pd.read_parquet(f"{SF}/lineitem.parquet").merge(
        pd.read_parquet(f"{SF}/orders.parquet"),
        left_on="l_orderkey", right_on="o_orderkey",
    )[["o_custkey", "l_suppkey"]].drop_duplicates()
    deg = Counter(e["o_custkey"])
    hist = sorted(Counter(deg.values()).items())
    n = len(hist)
    sx = sy = sxy = sxx = 0.0
    for k, nk in hist:
        lx, ly = math.log(k), math.log(nk)
        sx += lx
        sy += ly
        sxy += lx * ly
        sxx += lx * lx
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert row["n_degree_values"] == n
    assert row["n_nodes"] == sum(nk for _, nk in hist)
    assert row["sum_degrees"] == sum(k * nk for k, nk in hist)
    assert abs(row["slope_micro"] - math.floor(slope * 1e6)) <= 1
    intercept = (sy - slope * sx) / n
    assert abs(row["intercept_micro"] - math.floor(intercept * 1e6)) <= 1
