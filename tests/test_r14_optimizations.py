"""Round-14 optimization equivalence pins.

1. spread() gate: no-op on provably multi-file inputs, still
   repartitions the single-file local layout, explicit ``n`` bypasses.
2. IVF single seed collect: passing precollected ``cents=`` into
   ivf_assign / ivf_probe_cells yields byte-identical plans to the
   collect-inside form (the round-14 fix collects once per operator
   and threads the list through — values must be unchanged).
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from the_movies_db_spark.io import load_table, spread
from the_movies_db_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"


def test_spread_still_spreads_single_file_input(spark):
    d = load_table(spark, SF, "documents")
    assert len(d.inputFiles()) == 1
    out = spread(d)
    assert out is not d
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_spread_noop_on_multifile_input(spark, tmp_path):
    p = str(tmp_path / "multi.parquet")
    spark.range(0, 256, 1, 16).write.parquet(p)
    multi = spark.read.parquet(p)
    assert len(multi.inputFiles()) == 16
    out = spread(multi)
    assert out is multi  # no round-robin Exchange inserted
    # explicit n bypasses the gate (the skewed-input escape hatch)
    forced = spread(multi, 8)
    assert forced is not multi
    assert forced.rdd.getNumPartitions() == 8


def test_spread_gate_env_tunable():
    assert S is not None  # placeholder import guard
    from the_movies_db_spark import io as io_mod

    assert io_mod.SPREAD_SKIP_MIN >= 2


def _plan(df) -> str:
    import re

    txt = df._jdf.queryExecution().executedPlan().toString()
    # session-global expression-ID counters differ between two builds
    # of the same plan; normalize them so only structure is compared
    txt = re.sub(r"#\d+", "#N", txt)
    return re.sub(r"lambda ([a-z]+)_\d+", r"lambda \1_N", txt)


@pytest.mark.parametrize("nprobe", [1, 2])
def test_ivf_precollected_cents_identical_plans(spark, nprobe):
    e = load_table(spark, SF, "embeddings")
    cents = S.collect_seed_centroids(e, "vec_id", "embedding", 8)
    assert len(cents) == 8 and cents == sorted(cents)

    a_inline = S.ivf_assign(e, "vec_id", "embedding", 8, dim=64)
    a_passed = S.ivf_assign(e, "vec_id", "embedding", 8, dim=64, cents=cents)
    assert _plan(a_inline) == _plan(a_passed)

    q = e.filter(F.col("vec_id") < 5)
    p_inline = S.ivf_probe_cells(
        q, "vec_id", "embedding", 8, nprobe, dim=64, centroid_source=e
    )
    p_passed = S.ivf_probe_cells(
        q, "vec_id", "embedding", 8, nprobe, dim=64,
        centroid_source=e, cents=cents,
    )
    assert _plan(p_inline) == _plan(p_passed)
    # and the values really are the assignment when nprobe=1
    if nprobe == 1:
        got = sorted(
            (r["vec_id"], r["cell"]) for r in p_passed.collect()
        )
        want = sorted(
            (r["vec_id"], r["cell"])
            for r in a_passed.filter(F.col("vec_id") < 5).collect()
        )
        assert got == want
