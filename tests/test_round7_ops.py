"""Third-leg references + plan pins for the round-7 operators.

Engine-parity (the oracle sweep) proves Spark == DuckDB; these tests
prove both equal an INDEPENDENT Python implementation of the math,
and pin the scale-critical plan shapes (scan counts) so refactors
can't silently reintroduce per-branch fact re-reads.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from the_movies_db_spark.queries import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------- plan pins


def test_round7_fact_scan_counts(spark, registry):
    """Single-pass discipline: the covariance matrix reads lineitem
    ONCE (all 6 cells from one aggregate row); Mahalanobis is the
    documented two-pass (exactly 2); Theil-Sen feeds every branch from
    the checkpointed month aggregate (0 fact reads in the plan); the
    kNN-graph audit re-reads embeddings only for the label join (the
    scoring subtree is checkpointed)."""
    for name, tbl, want in [
        ("agg_covariance_matrix", "lineitem", 1),
        ("dq_mahalanobis_diag", "lineitem", 2),
        ("orders_theilsen_trend", "orders", 0),
        ("orders_survival_km", "orders", 2),
        ("graph_degree_assortativity", "lineitem", 1),
    ]:
        txt = plan_of(registry[name].spark(spark, SF))
        assert txt.count(f"{tbl}.parquet") == want, name


def test_knn_graph_scans_are_panel_pruned(spark, registry):
    """The kNN-graph audit's lazy edge checkpoint does not collapse in
    pre-action plan text, so embeddings appears once per branch — the
    scale guarantee is that EVERY one of those scans carries the
    pushed panel filter (vec_id < 128), i.e. each re-read is
    panel-bounded, never corpus-grain."""
    txt = plan_of(registry["sim_knn_graph_stats"].spark(spark, SF))
    scans = [
        line
        for line in txt.splitlines()
        if "FileScan parquet" in line and "embeddings.parquet" in line
        or ("FileScan parquet" in line and "vec_id" in line)
    ]
    assert len(scans) == 4
    for line in scans:
        assert "vec_id" in line and "< 128" in line, line


# ------------------------------------------------- covariance / Mahalanobis


def _measures():
    return duckdb.sql(
        f"""
        SELECT CAST(l_quantity AS BIGINT),
               CAST(round(l_extendedprice * 100) AS BIGINT) // 100,
               CAST(round(l_discount * 100) AS BIGINT),
               CAST(round(l_tax * 100) AS BIGINT),
               l_returnflag
        FROM '{SF}/lineitem.parquet'
        """
    ).fetchall()


def test_covariance_matrix_matches_python(spark, registry):
    rows = {
        (r["x_col"], r["y_col"]): r
        for r in registry["agg_covariance_matrix"].spark(spark, SF).collect()
    }
    data = _measures()
    cols = {"q": 0, "pd": 1, "dp": 2, "tx": 3}
    n = len(data)
    s = {x: sum(r[i] for r in data) for x, i in cols.items()}
    sp = {
        (a, b): sum(r[cols[a]] * r[cols[b]] for r in data)
        for a in cols
        for b in cols
    }

    def mu(x):
        return s[x] / n

    def cov(x, y):
        return sp[(x, y)] / n - mu(x) * mu(y)

    for (x, y), r in rows.items():
        assert r["n_rows"] == n
        assert r["cov_micro"] == math.floor(cov(x, y) * 1e6), (x, y)
        corr = cov(x, y) / math.sqrt(cov(x, x) * cov(y, y))
        assert r["corr_micro"] == math.floor(corr * 1e6), (x, y)


def test_mahalanobis_outliers_match_python(spark, registry):
    got = {
        r["l_returnflag"]: r
        for r in registry["dq_mahalanobis_diag"].spark(spark, SF).collect()
    }
    data = _measures()
    n = len(data)
    idx = {"q": 0, "pd": 1, "dp": 2}
    s = {x: sum(r[i] for r in data) for x, i in idx.items()}
    s2 = {x: sum(r[i] * r[i] for r in data) for x, i in idx.items()}
    mu = {x: s[x] / n for x in idx}
    var = {x: s2[x] / n - mu[x] * mu[x] for x in idx}
    per: dict[str, list[int]] = {}
    for r in data:
        z2 = sum((r[idx[x]] - mu[x]) ** 2 / var[x] for x in idx)
        per.setdefault(r[4], []).append(1 if z2 > 16.266 else 0)
    for flag, marks in per.items():
        assert got[flag]["n_rows"] == len(marks)
        assert got[flag]["n_outliers"] == sum(marks), flag


# ------------------------------------------------------------- Theil-Sen


def test_theilsen_matches_python(spark, registry):
    got = {
        r["nation"]: r
        for r in registry["orders_theilsen_trend"].spark(spark, SF).collect()
    }
    raw = duckdb.sql(
        f"""
        SELECT n.n_name,
               CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT),
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{SF}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
        """
    ).fetchall()
    per: dict[str, list[tuple[int, int]]] = {}
    for nat, m, cents in raw:
        per.setdefault(nat, []).append((m, cents))

    def tdiv(a: int, b: int) -> int:  # truncation toward zero, like div
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    for nat, pts in per.items():
        pts.sort()
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                (m1, c1), (m2, c2) = pts[i], pts[j]
                dm, dc = m2 - m1, c2 - c1
                s = tdiv(dc, dm) * 1_000_000 + tdiv((dc % dm if dc >= 0 else -((-dc) % dm)) * 1_000_000, dm)
                slopes.append((s, m1, m2))
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1][0]
        assert got[nat]["n_months"] == len(pts), nat
        assert got[nat]["n_pairs"] == len(slopes), nat
        assert got[nat]["slope_med_micro"] == med, nat


# ------------------------------------------------------- burst state machine


def test_burst_detect_matches_python_replay(spark, registry):
    got = registry["events_burst_detect"].spark(spark, SF).collect()[0]
    raw = duckdb.sql(
        f"""
        SELECT datediff('day', TIMESTAMP '1970-01-01 00:00:00', ts),
               CAST(count(*) AS BIGINT)
        FROM '{SF}/events.parquet' GROUP BY 1
        """
    ).fetchall()
    cnt = dict(raw)
    d0, d1 = min(cnt), max(cnt)
    xs = [cnt.get(d, 0) for d in range(d0, d1 + 1)]
    mean_milli = sum(xs) * 1000 // len(xs)
    inb = nb = cur = mx = bd = 0
    for x in xs:
        enter = inb == 0 and x * 1000 >= 2 * mean_milli
        cont = inb == 1 and x * 1000 >= mean_milli
        if enter:
            nb, cur = nb + 1, 1
        elif cont:
            cur += 1
        else:
            cur = 0
        inb = 1 if (enter or cont) else 0
        mx = max(mx, cur)
        bd += inb
    assert got["n_days"] == len(xs)
    assert got["mean_milli"] == mean_milli
    assert (got["n_bursts"], got["burst_days"], got["max_burst_len"]) == (
        nb,
        bd,
        mx,
    )


# --------------------------------------------------------- KM survival


def test_km_survival_matches_python(spark, registry):
    got = {
        r["horizon_days"]: r
        for r in registry["orders_survival_km"].spark(spark, SF).collect()
    }
    raw = duckdb.sql(
        f"""
        SELECT o_custkey, CAST(o_orderdate AS DATE), o_orderkey
        FROM '{SF}/orders.parquet' ORDER BY o_custkey, 2, 3
        """
    ).fetchall()
    per: dict[int, list] = {}
    dmax = None
    for ck, d, _ in raw:
        per.setdefault(ck, []).append(d)
        dmax = d if dmax is None or d > dmax else dmax
    tt = []
    for ds in per.values():
        if len(ds) >= 2:
            tt.append(((ds[1] - ds[0]).days, 1))
        else:
            tt.append(((dmax - ds[0]).days, 0))
    days: dict[int, list[int]] = {}
    for t, ev in tt:
        dn, cn = days.setdefault(t, [0, 0])
        days[t] = [dn + ev, cn + (1 - ev)]
    total = len(tt)
    seen = 0
    facts = []  # (day, d_n, c_n, lnf_micro, absorbed)
    for day in sorted(days):
        d_n, c_n = days[day]
        n_risk = total - seen
        lnf = (
            math.floor(math.log((n_risk - d_n) / n_risk) * 1e6)
            if 0 < d_n < n_risk
            else 0
        )
        facts.append((day, d_n, c_n, lnf, 1 if d_n > 0 and d_n >= n_risk else 0))
        seen += d_n + c_n
    for h in (30, 90, 180, 365):
        rows = [f for f in facts if f[0] <= h]
        exp_ev = sum(f[1] for f in rows)
        exp_cn = sum(f[2] for f in rows)
        exp_ln = None if any(f[4] for f in rows) else sum(f[3] for f in rows)
        assert got[h]["n_reordered"] == exp_ev, h
        assert got[h]["n_censored"] == exp_cn, h
        assert got[h]["km_logsurv_micro"] == exp_ln, h


# ------------------------------------------------- entropy rate replay


def test_entropy_rate_matches_python(spark, registry):
    rows = registry["events_markov_entropy_rate"].spark(spark, SF).collect()
    raw = duckdb.sql(
        f"""
        WITH s AS (
          SELECT event_type AS nt,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS pt
          FROM '{SF}/events.parquet'
        )
        SELECT pt, nt, CAST(count(*) AS BIGINT) FROM s
        WHERE pt IS NOT NULL GROUP BY 1, 2
        """
    ).fetchall()
    cells: dict[str, dict[str, int]] = {}
    for pt, nt, c in raw:
        cells.setdefault(pt, {})[nt] = c
    tot = sum(sum(d.values()) for d in cells.values())
    rate_num = 0
    expect = {}
    for pt, d in cells.items():
        ci = sum(d.values())
        h = math.floor(math.log(ci) * 1e6) - sum(
            c * math.floor(math.log(c) * 1e6) for c in d.values()
        ) // ci
        expect[pt] = (ci, len(d), h)
        rate_num += ci * h
    rate = rate_num // tot
    for r in rows:
        ci, k, h = expect[r["prev_type"]]
        assert (r["n_transitions"], r["n_next_states"], r["h_cond_micro"]) == (
            ci,
            k,
            h,
        ), r["prev_type"]
        assert r["entropy_rate_micro"] == rate


# --------------------------------------------------------- event disorder


def test_event_disorder_matches_python(spark, registry):
    got = registry["dq_event_disorder"].spark(spark, SF).collect()[0]
    raw = duckdb.sql(
        f"SELECT user_id, event_id, epoch_us(ts) FROM '{SF}/events.parquet'"
        " ORDER BY user_id, event_id"
    ).fetchall()
    runmax: dict[int, int] = {}
    n = late = 0
    max_late = 0
    late_sum = 0
    for uid, _, us in raw:
        n += 1
        rm = runmax.get(uid)
        rm = us if rm is None or us > rm else rm
        if us < rm:
            late += 1
            late_sum += rm - us
            max_late = max(max_late, (rm - us) // 1_000_000)
        runmax[uid] = rm
    assert got["n_events"] == n
    assert got["n_late"] == late
    assert got["late_ppm"] == late * 1_000_000 // n
    assert got["max_late_sec"] == max_late
    assert got["avg_late_milli"] == (
        0 if late == 0 else late_sum // (1000 * late)
    )


# --------------------------------------------------------- delete_keys


def test_delete_keys_lifecycle(spark, tmp_path):
    """delete_keys removes exactly the doomed keys, commits a NEW
    version (pre-delete state stays time-travelable inside the
    retention window), and returns the removed-row count."""
    from the_movies_db_spark.upsert import (
        delete_keys,
        list_versions,
        read_table,
        write_upsert,
    )

    tbl = str(tmp_path / "t")
    base = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v")
    write_upsert(spark, tbl, base, "k", order_col=None, keep_versions=2)
    doomed = spark.range(0, 100).selectExpr("id AS k").filter("k % 10 = 3")
    removed = delete_keys(spark, tbl, doomed, "k", keep_versions=2)
    assert removed == 10
    cur = read_table(spark, tbl)
    assert cur.count() == 90
    assert cur.filter("k % 10 = 3").count() == 0
    pre = read_table(spark, tbl, version=list_versions(tbl)[0])
    assert pre.count() == 100
    # deleting absent keys is a no-op version with 0 removed
    removed2 = delete_keys(
        spark, tbl, spark.range(1000, 1010).selectExpr("id AS k"), "k",
        keep_versions=2,
    )
    assert removed2 == 0
    assert read_table(spark, tbl).count() == 90


# ------------------------------------------------- later-wave references


def test_price_volume_mix_bridge_closes(spark, registry):
    """The revenue bridge must close exactly by construction:
    delta = volume + price + new + exited, per nation."""
    for r in registry["orders_price_volume_mix"].spark(spark, SF).collect():
        assert r["delta_cents"] == r["cents_y1"] - r["cents_y0"]
        assert r["delta_cents"] == (
            r["volume_effect_cents"]
            + r["price_effect_cents"]
            + r["new_product_cents"]
            + r["exited_product_cents"]
        ), r["nation"]


def test_rollup_shares_sum_to_parent(spark, registry):
    """Children's shares of each parent must sum to ~1e6 ppm (floor
    truncation loses at most |children| ppm), and the grand-total row
    carries exactly 1e6."""
    rows = registry["agg_rollup_share_of_parent"].spark(spark, SF).collect()
    grand = [r for r in rows if r["lvl"] == 3]
    assert len(grand) == 1 and grand[0]["share_of_parent_ppm"] == 1_000_000
    regions = [r for r in rows if r["lvl"] == 1]
    s = sum(r["share_of_parent_ppm"] for r in regions)
    assert 1_000_000 - len(regions) <= s <= 1_000_000
    for reg in regions:
        kids = [
            r
            for r in rows
            if r["lvl"] == 0 and r["region"] == reg["region"]
        ]
        ks = sum(r["share_of_parent_ppm"] for r in kids)
        assert 1_000_000 - len(kids) <= ks <= 1_000_000, reg["region"]


def test_croston_matches_python_replay(spark, registry):
    got = {
        r["partkey"]: r
        for r in registry["orders_croston_intermittent"].spark(spark, SF).collect()
    }
    raw = duckdb.sql(
        f"""
        SELECT l_partkey,
               datediff('day', TIMESTAMP '1970-01-01 00:00:00', l_shipdate)
                 // 7,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        FROM '{SF}/lineitem.parquet' WHERE l_partkey < 20
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    per: dict[int, list[tuple[int, int]]] = {}
    for pk, w, x in raw:
        per.setdefault(pk, []).append((w, x))
    for pk, pts in per.items():
        z, p, prev = pts[0][1] * 1000, 1000, pts[0][0]
        for w, x in pts[1:]:
            z = (200 * x * 1000 + 800 * z) // 1000
            p = (200 * (w - prev) * 1000 + 800 * p) // 1000
            prev = w
        r = got[pk]
        assert r["n_demand_weeks"] == len(pts), pk
        assert r["size_milli"] == z and r["interval_milli"] == p, pk
        assert r["forecast_per_week_milli"] == z * 1000 // p, pk


def test_holt_winters_matches_python_replay(spark, registry):
    got = registry["events_forecast_holt_winters"].spark(spark, SF).collect()[0]
    raw = dict(
        duckdb.sql(
            f"""
            SELECT datediff('day', TIMESTAMP '1970-01-01 00:00:00', ts),
                   CAST(count(*) AS BIGINT)
            FROM '{SF}/events.parquet' GROUP BY 1
            """
        ).fetchall()
    )
    d0, d1 = min(raw), max(raw)
    xs = [raw.get(d, 0) for d in range(d0, d1 + 1)]

    def tdiv(a: int, b: int) -> int:
        # both engines truncate integer division toward zero; Python //
        # floors — they differ on the negative seasonal intermediates
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    l0 = sum(xs[:7]) * 1000 // 7
    sv = [x * 1000 - l0 for x in xs[:7]]
    l, b = l0, 0
    for i in range(7, len(xs)):
        j = i % 7
        lnew = tdiv(200 * (xs[i] * 1000 - sv[j]) + 800 * (l + b), 1000)
        bnew = tdiv(100 * (lnew - l) + 900 * b, 1000)
        sv[j] = tdiv(300 * (xs[i] * 1000 - lnew) + 700 * sv[j], 1000)
        l, b = lnew, bnew
    assert got["n_days"] == len(xs)
    assert got["level_milli"] == l and got["trend_milli"] == b
    for k in range(7):
        assert got[f"s{k}_milli"] == sv[k], k
    assert got["forecast_1d_milli"] == l + b + sv[len(xs) % 7]


def test_cuped_matches_python(spark, registry):
    got = {
        r["arm"]: r
        for r in registry["events_ab_cuped"].spark(spark, SF).collect()
    }
    raw = duckdb.sql(
        f"""
        WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS m
                   FROM '{SF}/events.parquet')
        SELECT user_id % 2,
               CAST(sum(CASE WHEN epoch_us(ts) < m
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN epoch_us(ts) >= m
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT)
        FROM '{SF}/events.parquet' CROSS JOIN b
        GROUP BY user_id, 1
        """
    ).fetchall()
    n = len(raw)
    sx = sum(r[1] for r in raw)
    sy = sum(r[2] for r in raw)
    sxx = sum(r[1] * r[1] for r in raw)
    sxy = sum(r[1] * r[2] for r in raw)
    cov = sxy / n - (sx / n) * (sy / n)
    varx = sxx / n - (sx / n) * (sx / n)
    theta = cov / varx
    for arm in (0, 1):
        a = [r for r in raw if r[0] == arm]
        an, asx, asy = len(a), sum(r[1] for r in a), sum(r[2] for r in a)
        adj = (asy / an) - theta * ((asx / an) - (sx / n))
        assert got[arm]["n_users"] == an
        assert got[arm]["mean_adjusted_micro"] == math.floor(adj * 1e6), arm
        assert got[arm]["theta_micro"] == math.floor(theta * 1e6)
