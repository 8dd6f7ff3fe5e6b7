"""Planted-ground-truth pins for the round-11 session-2 operators.

A green oracle can share a blind spot with the engine (the round-10
stride-8 lesson), so every detection/algorithmic op here is checked
against an INDEPENDENT reference: brute-force Python replays on the
real sf0.01 data, or crafted corpora with known answers.
"""

from __future__ import annotations

import collections
import heapq

import pytest
from pyspark.sql import functions as F

from the_movies_db_spark.io import load_table
from the_movies_db_spark.queries import load_all

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def reg():
    return load_all()


# --- io_compaction_plan: FFD replay + packing invariants -------------------


def test_ffd_matches_python_replay(spark, reg):
    rows = reg["io_compaction_plan"].spark(spark, SF).collect()
    inv = sorted(((r.bytes, r.shard) for r in rows), key=lambda t: (-t[0], t[1]))
    cap = 2 * max(b for b, _ in inv)
    loads: list[int] = []
    expect = {}
    for b, s in inv:
        k = next((i for i, ld in enumerate(loads) if ld + b <= cap), None)
        if k is None:
            loads.append(b)
            expect[s] = len(loads)
        else:
            loads[k] += b
            expect[s] = k + 1
    got = {r.shard: r.bin for r in rows}
    assert got == expect
    # packing invariant: no bin exceeds capacity
    fill = collections.Counter()
    for r in rows:
        fill[r.bin] += r.bytes
    assert max(fill.values()) <= cap


# --- events_pattern_regex: crafted journeys --------------------------------


def test_pattern_regex_on_crafted_journeys():
    import re

    cases = {
        "cp": [("cvpcp", 1), ("cpcp", 2), ("ccpp", 1), ("pc", 0)],
        "c[ve]*p": [("cvvep", 1), ("cp", 1), ("csp", 0), ("cvpcvp", 2)],
        "e{2,}": [("eee", 1), ("ee_ee", 2), ("e", 0)],
    }
    for pat, pairs in cases.items():
        for s, want in pairs:
            assert len(re.findall(pat, s)) == want, (pat, s)


def test_pattern_regex_totals_match_python(spark, reg):
    import re

    ev = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    rows = ev.collect()
    j = collections.defaultdict(list)
    for r in rows:
        j[(r.user_id, r.ts.date())].append((r.ts, r.event_id, r.event_type[0]))
    journeys = ["".join(c for _, _, c in sorted(v)) for v in j.values()]
    got = {
        r.motif: (r.n_journeys_matched, r.n_occurrences)
        for r in reg["events_pattern_regex"].spark(spark, SF).collect()
    }
    for pat, motif in [
        ("cp", "click_then_purchase_adjacent"),
        ("c[ve]*p", "click_to_purchase_browsing"),
        ("e{2,}", "error_burst"),
    ]:
        occ = [len(re.findall(pat, s)) for s in journeys]
        assert got[motif] == (sum(1 for n in occ if n), sum(occ)), motif


# --- graph helpers: shared edge extraction ---------------------------------


def _wedges(spark):
    """(sa, sb) -> shared-customer count, replayed in Python from the
    same top-2 spend construction."""
    l = load_table(spark, SF, "lineitem")  # noqa: E741
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    s = load_table(spark, SF, "supplier")
    spend = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c.select("c_custkey", "c_nationkey"), o.o_custkey == F.col("c_custkey"))
        .join(s.select("s_suppkey", "s_nationkey"), l.l_suppkey == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).alias("sp"))
        .collect()
    )
    per_c = collections.defaultdict(list)
    for r in spend:
        per_c[r.c].append((-r.sp, r.s))
    w = collections.Counter()
    for c_key, lst in per_c.items():
        if len(lst) < 2:
            continue
        top = heapq.nsmallest(2, lst)
        s1, s2 = top[0][1], top[1][1]
        w[(min(s1, s2), max(s1, s2))] += 1
    return w


def test_boruvka_against_python_replay(spark, reg):
    w = _wedges(spark)
    rows = {r.round: r for r in reg["graph_boruvka_msf"].spark(spark, SF).collect()}
    lab = {v: v for e in w for v in e}
    for rnd in (1, 2):
        pick = {}
        for (sa, sb), wt in w.items():
            ca, cb = lab[sa], lab[sb]
            if ca == cb:
                continue
            for comp in (ca, cb):
                k = (wt, sa, sb)
                if comp not in pick or k < pick[comp][0]:
                    pick[comp] = (k, ca, cb)
        edges = {(k[1], k[2], k[0], ca, cb) for (k, ca, cb) in pick.values()}
        # merge-graph contraction: full transitive min (python exact)
        adj = collections.defaultdict(set)
        for (_, _, _, ca, cb) in edges:
            adj[ca].add(cb)
            adj[cb].add(ca)
        new = {}
        for comp in {lab[v] for v in lab}:
            seen = {comp}
            stack = [comp]
            while stack:
                x = stack.pop()
                for y in adj.get(x, ()):
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
            new[comp] = min(seen)
        lab = {v: new[lab[v]] for v in lab}
        r = rows[rnd]
        assert r.n_edges_added == len(edges), rnd
        assert r.total_weight == sum(e[2] for e in edges), rnd
        assert r.n_components == len(set(lab.values())), rnd


def test_betweenness_sigma_against_python_bfs(spark, reg):
    w = _wedges(spark)
    adj = collections.defaultdict(set)
    for sa, sb in w:
        adj[sa].add(sb)
        adj[sb].add(sa)
    nodes = sorted(adj)
    seeds = nodes[:3]
    # python truncated Brandes with the SAME milli-integer formula
    bc = collections.Counter()
    for s in seeds:
        dist = {s: 0}
        sigma = {s: 1}
        layers = [[s]]
        for d in range(3):
            nxt = collections.defaultdict(int)
            for v in layers[d]:
                for u in adj[v]:
                    if u not in dist or dist[u] == d + 1:
                        nxt[u] += sigma[v]
            layer = sorted(u for u in nxt if u not in dist)
            for u in layer:
                dist[u] = d + 1
                sigma[u] = nxt[u]
            layers.append(layer)
        delta = collections.Counter()
        for d in (2, 1):
            for v in layers[d]:
                acc = 0
                for u in adj[v]:
                    if dist.get(u) == d + 1:
                        acc += sigma[v] * (1000 + delta[u]) // sigma[u]
                delta[v] = acc
                bc[v] += acc
    want = sorted(
        ((n, b) for n, b in bc.items()), key=lambda t: (-t[1], t[0])
    )[:15]
    got = [
        (r.node, r.bc_milli)
        for r in reg["graph_betweenness_seeds"].spark(spark, SF).collect()
    ]
    assert got == want


# --- sim_nsw_greedy_search: descent invariants ------------------------------


def test_nsw_descent_invariants(spark, reg):
    rows = reg["sim_nsw_greedy_search"].spark(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.hops <= 4
        assert r.dist_micro >= 0
        assert r.final_id >= 5  # graph excludes the query panel


# --- multimodal_wht_hash: kernel vs direct numpy recompute -----------------


def test_wht_hash_kernel_matches_direct(spark, reg):
    import numpy as np

    d = (
        load_table(spark, SF, "documents")
        .filter("doc_id < 40")
        .select("doc_id", "text")
        .collect()
    )
    want = {}
    for r in d:
        raw = r.text.ljust(128)[:128].encode("utf-8")[:128]
        v = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
        v = v.reshape(-1, 2).sum(axis=1)
        h_mat = np.array(
            [[1 - 2 * (bin(i & j).count("1") & 1) for j in range(64)]
             for i in range(64)], dtype=np.int64)
        c = v @ h_mat
        hsh = sum(1 << (j - 1) for j in range(1, 64) if c[j] > 0)
        want[r.doc_id] = (int(c[0]), int(hsh))
    got = {
        r.doc_id: (r.dc, r.wht_hash)
        for r in reg["multimodal_wht_hash"].spark(spark, SF).collect()
    }
    assert got == want


def test_wht_hash_identical_images_collide():
    """Two identical pixel buffers must hash identically; flipping one
    high-contrast pixel must change at least one AC coefficient sign
    for a non-constant image."""
    import numpy as np

    h_mat = np.array(
        [[1 - 2 * (bin(i & j).count("1") & 1) for j in range(64)]
         for i in range(64)], dtype=np.int64)

    def hsh(v):
        c = v @ h_mat
        return sum(1 << (j - 1) for j in range(1, 64) if c[j] > 0)

    rng = np.random.RandomState(7)
    v = rng.randint(60, 200, size=64).astype(np.int64)
    assert hsh(v) == hsh(v.copy())
    v2 = v.copy()
    v2[13] = 255 * 2
    assert hsh(v2) != hsh(v)


# --- plan scan budgets (the round-9 exponential-lineage guard) --------------

_BUDGETS = {
    # name: (max parquet scans of any one table, max ExistingRDD scans)
    "sim_nsw_greedy_search": (1, 2),
    "multimodal_wht_hash": (1, 1),
    "io_compaction_plan": (1, 1),
    "events_pattern_regex": (1, 1),
    "graph_betweenness_seeds": (1, 3),
    "graph_boruvka_msf": (1, 5),
    "dq_pii_luhn_audit": (1, 1),
    "sim_mllib_lsh_audit": (1, 5),
    "sim_ivf_kmeans_audit": (2, 3),
    "sim_vectorized_audit": (5, 1),  # adjudicated: bounded-panel audit
    "dq_bloom_fpr_audit": (3, 4),
    "dq_drift_wasserstein": (1, 6),  # fixed r11: was 6 orders scans
    "join_lateral_topn": (1, 0),  # decorrelated lateral = single scans
    "graph_bfs_recursive_cte": (1, 1),  # loop body prints separately
    "udf_arrow_scalar": (1, 0),
    "fn_sql_pipe_syntax": (1, 0),
    "udtf_table_argument": (1, 0),
    "graph_scc_directed": (1, 5),
}


@pytest.mark.slow
def test_scan_budgets_round11(spark, reg):
    import re

    tables = (
        "lineitem", "orders", "customer", "supplier", "part",
        "nation", "region", "events", "documents", "embeddings",
    )
    sf = "/root/testdata/sf0.001"
    for name, (max_scan, max_rdd) in _BUDGETS.items():
        txt = (
            reg[name].spark(spark, sf)
            ._jdf.queryExecution().executedPlan().toString()
        )
        worst = max(txt.count(f"{t}.parquet") for t in tables)
        rdd = len(re.findall("Scan ExistingRDD", txt))
        assert worst <= max_scan, (name, "parquet", worst)
        assert rdd <= max_rdd, (name, "rdd", rdd)
