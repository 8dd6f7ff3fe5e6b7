"""Independent references for the session-4 numeric machinery.

Engine-parity (the oracle sweep) proves Spark == DuckDB; these tests
prove both equal an INDEPENDENT Python implementation of the math —
the third leg that catches a formula that is consistently wrong in
both engines.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from the_movies_db_spark.queries import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all()


# --------------------------------------------------------------- _ppm_div


@given(
    a=st.integers(min_value=0, max_value=10**18),
    b=st.integers(min_value=1, max_value=10**18),
)
@settings(max_examples=300, deadline=None)
def test_ppm_div_chain_matches_bigint_formula(a: int, b: int) -> None:
    """The overflow-free quotient + two-stage remainder chain must equal
    floor(a*1e6/b) computed with unbounded Python integers, and every
    intermediate must fit int64 whenever b*1000 does."""
    q = (a // b) * 1_000_000
    r = a % b
    s1 = (r * 1000) // b
    r1 = (r * 1000) % b
    chain = q + s1 * 1000 + (r1 * 1000) // b
    assert chain == (a * 1_000_000) // b
    if b <= 9_223_372_036_854_775_807 // 1000:
        assert r * 1000 <= 9_223_372_036_854_775_807
        assert r1 * 1000 <= 9_223_372_036_854_775_807


# ------------------------------------------------- moments skew/kurtosis


def test_moments_match_python_reference(spark, registry):
    """agg_moments_skew_kurt vs a from-scratch float reference over the
    raw rows (same IEEE op order as the registered expression)."""
    import duckdb

    rows = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in registry["agg_moments_skew_kurt"].spark(spark, SF).collect()
    }
    raw = duckdb.sql(
        f"SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) q"
        f" FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    groups: dict[tuple, list[int]] = {}
    for rf, ls, q in raw:
        groups.setdefault((rf, ls), []).append(q)
    for key, xs in groups.items():
        n = len(xs)
        s1, s2 = sum(xs), sum(x * x for x in xs)
        s3, s4 = sum(x**3 for x in xs), sum(x**4 for x in xs)
        mu = s1 / n
        m2 = s2 / n - mu * mu
        m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu
        m4 = (
            s4 / n
            - 4.0 * mu * (s3 / n)
            + 6.0 * mu * mu * (s2 / n)
            - 3.0 * mu * mu * mu * mu
        )
        skew = math.floor(m3 / (m2 * math.sqrt(m2)) * 1e6)
        kurt = math.floor((m4 / (m2 * m2) - 3.0) * 1e6)
        got = rows[key]
        assert got["n_rows"] == n
        assert got["mean_micro"] == s1 * 1_000_000 // n
        assert got["skew_micro"] == skew, key
        assert got["kurt_excess_micro"] == kurt, key


# --------------------------------------------- fulfillment-lag quantiles


def test_fulfillment_lag_order_stats_reference(spark, registry):
    """Exact p50/p90 from the histogram must equal the order statistic
    cum*k >= n*q selects on the fully sorted per-nation lag list."""
    import duckdb

    got = {
        r["nation"]: r
        for r in registry["orders_fulfillment_lag"].spark(spark, SF).collect()
    }
    raw = duckdb.sql(f"""
        SELECT n.n_name, CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
                              AS BIGINT) AS lag
        FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        JOIN '{SF}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
        JOIN '{SF}/nation.parquet' n ON s.s_nationkey = n.n_nationkey
    """).fetchall()
    per: dict[str, list[int]] = {}
    for nat, lag in raw:
        per.setdefault(nat, []).append(lag)
    for nat, lags in per.items():
        lags.sort()
        n = len(lags)
        p50 = lags[math.ceil(n * 0.5) - 1]
        p90 = lags[math.ceil(n * 0.9) - 1]
        assert got[nat]["n_lineitems"] == n
        assert got[nat]["p50_lag_days"] == p50, nat
        assert got[nat]["p90_lag_days"] == p90, nat
        assert got[nat]["p50_lag_days"] <= got[nat]["p90_lag_days"]


# ------------------------------------------------------------ periodogram


def test_periodogram_matches_python_dft(spark, registry):
    """events_periodogram vs an independent integer DFT over the hourly
    counts (same literal trig tables, pure Python bigints)."""
    import duckdb

    from the_movies_db_spark.queries.timeseries_queries import (
        _COS_T,
        _PERIOD_KS,
        _SIN_T,
    )

    counts = dict(
        duckdb.sql(
            f"SELECT CAST(hour(ts) AS INT), CAST(count(*) AS BIGINT)"
            f" FROM '{SF}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    n = sum(counts.values())
    d = {h: 24 * counts.get(h, 0) - n for h in counts}
    expect = {}
    for i, k in enumerate(_PERIOD_KS):
        a = sum(dv * _COS_T[i][h] for h, dv in d.items())
        b = sum(dv * _SIN_T[i][h] for h, dv in d.items())

        def tz(x):  # div truncates toward zero only for positives; Spark
            q = abs(x) // 1_000_000  # div on negatives truncates toward 0
            return q if x >= 0 else -q

        expect[k] = tz(a) * tz(a) + tz(b) * tz(b)
    got = {
        r["harmonic_k"]: r["power"]
        for r in registry["events_periodogram"].spark(spark, SF).collect()
    }
    assert got == expect


# ----------------------------------------------------- k-core invariants


def test_kcore_census_is_monotone(spark, registry):
    rows = sorted(
        (r["round"], r["n_edges"], r["n_suppliers"], r["n_customers"])
        for r in registry["graph_kcore_peel"].spark(spark, SF).collect()
    )
    for (r0, e0, s0, c0), (r1, e1, s1, c1) in zip(rows, rows[1:]):
        assert r1 == r0 + 1
        assert e1 <= e0 and s1 <= s0 and c1 <= c0


# ------------------------------------------------- SRP signature parity


def test_srp_signature_matches_python(spark, registry):
    """Spark's conv-packed SRP signature vs signatures recomputed in
    Python from the same md5 plane family and the raw vectors."""
    import duckdb

    from the_movies_db_spark.operators.similarity import _plane_signs

    vecs = dict(
        duckdb.sql(
            f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
            " WHERE vec_id < 8"
        ).fetchall()
    )
    from pyspark.sql import functions as F

    from the_movies_db_spark.io import load_table
    from the_movies_db_spark.operators import similarity as S

    e = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 8)
    sigs = e.select(
        "vec_id", S.hyperplane_signature("embedding", 16, 64).alias("sigstr")
    ).select(
        "vec_id", F.expr("CAST(conv(sigstr, 2, 10) AS BIGINT)").alias("sig")
    )
    got = {r["vec_id"]: r["sig"] for r in sigs.collect()}
    for vid, emb in vecs.items():
        sig = 0
        for p in range(16):
            planes = _plane_signs(p, 64)
            acc = 0.0
            for x, s in zip(emb, planes):
                acc += float(x) * s
            bit = 1 if round(acc, 6) >= 0 else 0
            sig = (sig << 1) | bit
        assert got[vid] == sig, vid


# --------------------------------------------- scratch purge liveness


def test_scratch_purge_spares_live_processes(tmp_path):
    """unique=True scratch dirs embed the creating pid; another
    process's eager purge must delete dead-process leftovers but never
    a dir owned by a LIVE process (the concurrent-sweep race that
    silently truncated an upsert table)."""
    import os
    import subprocess
    import sys
    import textwrap

    from the_movies_db_spark.io import _SCRATCH_ROOT, scratch_dir

    mine = scratch_dir("racecheck_t")
    marker = os.path.join(mine, "data")
    open(marker, "w").write("x")
    # A guaranteed-dead pid: spawn a trivial child and reap it (a
    # hardcoded large pid can be a LIVE process when kernel.pid_max
    # exceeds it — ADVICE r6).
    reaped = subprocess.Popen([sys.executable, "-c", "pass"])
    reaped.wait()
    dead_pid = reaped.pid
    # dead leftovers in BOTH naming formats must be purged:
    # new format (pid is the final segment) and legacy (pid embedded
    # before mkdtemp's random suffix).
    dead_new = os.path.join(_SCRATCH_ROOT, f"racecheck_t_x1y2z3_p{dead_pid}")
    dead_legacy = os.path.join(_SCRATCH_ROOT, f"racecheck_t_p{dead_pid}_dead")
    # a caller prefix containing `_p<digits>_` must not shadow the
    # owner pid at the END of the name (the regex-anchor fix).
    tricky_live = os.path.join(
        _SCRATCH_ROOT, f"racecheck_t_p{dead_pid}_x_p{os.getpid()}"
    )
    for d in (dead_new, dead_legacy, tricky_live):
        os.makedirs(d, exist_ok=True)
    code = textwrap.dedent(
        """
        import sys; sys.path.insert(0, %r)
        from the_movies_db_spark.io import scratch_dir
        scratch_dir("racecheck_t")
        """
        % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    subprocess.run([sys.executable, "-c", code], check=True)
    try:
        assert os.path.exists(marker), "live dir was purged by another process"
        assert not os.path.exists(dead_new), "dead leftover (new fmt) not purged"
        assert not os.path.exists(dead_legacy), "dead leftover (legacy) not purged"
        assert os.path.exists(tricky_live), (
            "live dir purged: prefix-embedded _p<digits>_ shadowed the owner pid"
        )
    finally:
        import shutil

        for d in (dead_new, dead_legacy, tricky_live):
            shutil.rmtree(d, ignore_errors=True)


def test_build_once_semantics(tmp_path):
    """build_once runs the build exactly once per stamp value, re-runs
    on a stamp change, and never runs when the on-disk stamp matches."""
    from the_movies_db_spark.io import build_once

    work = str(tmp_path / "layout")
    calls = []

    def build():
        calls.append(1)

    assert build_once(work, {"v": 1}, build) is True
    assert build_once(work, {"v": 1}, build) is False  # fresh → skipped
    assert build_once(work, {"v": 2}, build) is True  # stamp changed
    assert calls == [1, 1]


def test_build_once_serializes_concurrent_builders(tmp_path):
    """Two processes racing a stale stamp: exactly ONE build runs; the
    loser serializes behind the writer lease, re-checks the stamp and
    skips (the ADVICE-r6 overwrite race on fixed scratch layouts)."""
    import os
    import subprocess
    import sys
    import textwrap
    import time

    from the_movies_db_spark.io import build_once

    work = str(tmp_path / "layout")
    artifact = os.path.join(work, "artifact")
    code = textwrap.dedent(
        """
        import os, sys, time
        sys.path.insert(0, %r)
        from the_movies_db_spark.io import build_once
        work = %r
        def build():
            time.sleep(1.0)  # hold the lease while the parent races
            with open(os.path.join(work, "artifact"), "w") as fh:
                fh.write("child")
        build_once(work, {"v": 1}, build)
        """
        % (
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            work,
        )
    )
    child = subprocess.Popen([sys.executable, "-c", code])
    # wait until the child holds the lease (lock file appears)
    lock = os.path.join(work, "_WRITER_LOCK")
    deadline = time.monotonic() + 10
    while not os.path.exists(lock) and time.monotonic() < deadline:
        time.sleep(0.02)
    assert os.path.exists(lock), "child never acquired the lease"

    def parent_build():
        with open(artifact, "w") as fh:
            fh.write("parent")

    ran = build_once(work, {"v": 1}, parent_build)
    assert child.wait() == 0
    assert ran is False, "parent rebuilt over the child's fresh layout"
    assert open(artifact).read() == "child"
