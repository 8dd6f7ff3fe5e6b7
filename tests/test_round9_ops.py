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
