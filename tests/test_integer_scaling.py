"""Property tests for the round-8 integer-arithmetic primitives,
checked in DuckDB (the oracle engine) against exact Python integers —
no Spark session needed, so these run in milliseconds.

- the 3-stage *100 divmod chain (`graph_queries._hits_norm`) is
  EXACTLY floor(x * 1e6 / d) while never exceeding x*100 in any
  intermediate — the overflow-free ppm scaler;
- the packed-integer argmax (`graph_queries._lpa_round_sql`'s
  max(cnt * M + (M-1-label)) % M) decodes to most-frequent-label with
  min-label tie-break.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from the_movies_db_spark.queries.graph_queries import _LPA_M, _hits_norm


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=200, deadline=None)
@given(
    d=st.integers(min_value=1, max_value=9 * 10**16),
    frac=st.integers(min_value=0, max_value=10**6),
    data=st.data(),
)
def test_hits_norm_is_exact_ppm(con, d, frac, data):
    # contract: the RESULT x*1e6/d must fit int64, i.e. x/d <= ~9.2e12
    # (in the HITS normalization x <= d always). Sample x across the
    # full [0, d] range plus a same-magnitude overshoot.
    x = data.draw(
        st.integers(min_value=0, max_value=min(9 * 10**16, 2 * d))
    )
    # inline literals are INT32 in DuckDB (checked arithmetic) —
    # real oracles feed BIGINT columns, so mirror that here
    expr = _hits_norm(f"CAST({x} AS BIGINT)", f"CAST({d} AS BIGINT)", "//")
    got = con.execute(f"SELECT {expr}").fetchone()[0]
    assert got == x * 1000000 // d


def test_hits_norm_intermediates_bounded():
    """No stage multiplies by more than 100 — the reason the chain
    cannot overflow BIGINT for any x below ~9.2e16 (int64/100)."""
    sql = _hits_norm("x", "d", "//")
    assert "1000000" in sql  # only as a final scale-up multiplier
    # every multiplication applied to a remainder is exactly * 100
    assert "* 1000 " not in sql.replace("* 10000", "").replace(
        "* 1000000", ""
    )


@settings(max_examples=100, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),  # label
            st.integers(min_value=1, max_value=10**5),  # count
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_packed_argmax_decodes_mode_with_min_tie(con, pairs):
    rows = ", ".join(f"({lbl}, {cnt})" for lbl, cnt in pairs)
    got = con.execute(
        f"""
        SELECT CAST({_LPA_M} - 1 - (max(cnt * {_LPA_M}
               + ({_LPA_M} - 1 - lbl)) % {_LPA_M}) AS BIGINT)
        FROM (SELECT CAST(lbl AS BIGINT) AS lbl, CAST(cnt AS BIGINT) AS cnt
              FROM (VALUES {rows}) v(lbl, cnt)) t
        """
    ).fetchone()[0]
    best_cnt = max(c for _, c in pairs)
    want = min(lbl for lbl, c in pairs if c == best_cnt)
    assert got == want
