"""Focused tests for round-13 OPTIMIZATION changes that touch operator
internals. Each optimization must leave the operator's VALUES identical —
these tests pin that equivalence directly (no Spark needed where the
kernel is pure Python/pandas)."""

import random

import pandas as pd

from the_movies_db_spark.functions.udfs import (
    token_bucket_kernel,
    token_bucket_shard_kernel,
)


def test_token_bucket_shard_kernel_matches_per_user_kernel():
    """The sharded kernel (one Python call per shard, users replayed
    inside) must produce exactly the per-user kernel's rows for every
    user — same admission counts under the same (ts_us, event_id)
    order, regardless of how rows are interleaved in the input frame."""
    rng = random.Random(13)
    rows = []
    for uid in range(17):
        t = rng.randrange(0, 10**9)
        for eid in range(rng.randrange(1, 40)):
            # mix sub-refill and multi-refill gaps, plus ts ties that
            # force the event_id tie-break
            t += rng.choice([0, 1, 50_000_000, 120_000_000, 500_000_000])
            rows.append({"user_id": uid, "event_id": eid, "ts_us": t})
    rng.shuffle(rows)
    pdf = pd.DataFrame(rows)

    got = (
        token_bucket_shard_kernel(pdf)
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        pd.concat(
            [
                token_bucket_kernel(g)
                for _, g in pdf.groupby("user_id", sort=True)
            ],
            ignore_index=True,
        )
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # sanity: the machine actually rejected something somewhere
    assert got["n_rejected"].sum() > 0


def test_probe_cells_nprobe1_equals_assign_cells(spark):
    """The batch-2 IVF query-side rewrite relies on: ivf_probe_cells
    at nprobe=1 assigns the IDENTICAL cell ivf_assign does (array_sort
    first element == array_min, same rounded distance, same (d, cid)
    tie-break) — including on ties and on the seed vectors themselves."""
    from pyspark.sql import functions as F

    from the_movies_db_spark.operators import similarity as S

    rows = [
        (i, [float(((i * 7 + d * 3) % 11) - 5) / 4.0 for d in range(8)])
        for i in range(40)
    ]
    # duplicate a seed vector at a non-seed id to force a distance tie
    rows.append((40, rows[2][1]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = {
        r["vec_id"]: r["cell"]
        for r in S.ivf_assign(df, "vec_id", "embedding", 4, dim=8).collect()
    }
    p = {
        r["vec_id"]: r["cell"]
        for r in S.ivf_probe_cells(
            df, "vec_id", "embedding", 4, 1, dim=8, centroid_source=df
        ).collect()
    }
    assert a == p and len(a) == 41


def test_kmeans_train_apply_split_matches_joined_form(spark):
    """kmeans_integer_train + kmeans_integer_cells over a query SUBSET
    must reproduce exactly the cells the corpus-wide assignment gives
    those ids (the old assigned.join(queries) form)."""
    from the_movies_db_spark.operators import similarity as S

    rows = [
        (i, [float(((i * 13 + d * 5) % 9) - 4) / 8.0 for d in range(8)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    full = {
        r["vec_id"]: r["cell"]
        for r in S.kmeans_integer_assign(
            df, "vec_id", "embedding", k=4, iters=2, dim=8
        ).collect()
    }
    cents = S.kmeans_integer_train(df, "vec_id", "embedding", 4, 2, 8)
    sub = df.filter(df.vec_id < 10)
    got = {
        r["vec_id"]: r["cell"]
        for r in S.kmeans_integer_cells(sub, "vec_id", "embedding", cents)
        .select("vec_id", "cell")
        .collect()
    }
    assert got == {k: v for k, v in full.items() if k < 10}


def test_connected_components_chain_convergence(spark):
    """The batch-3 convergence fold (change flag carried with the new
    label, so the stop check scans the just-checkpointed RDD instead of
    joining new vs old labels) must converge to the same min-label
    components on a long chain — label 0 takes one hop per iteration,
    so this exercises many changed/unchanged iterations plus the final
    all-unchanged one."""
    from the_movies_db_spark.operators import dedup as D

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)] + [(100, 101), (200, 200)],
        "id_a long, id_b long",
    )
    got = {r.id: r.cluster_id for r in D.connected_components(pairs).collect()}
    want = {i: 0 for i in range(13)}
    want.update({100: 100, 101: 100, 200: 200})
    assert got == want
    # the returned frame exposes exactly (id, cluster_id)
    assert set(D.connected_components(pairs).columns) == {"id", "cluster_id"}


def test_candidate_keys3_fused_census_matches_python(spark):
    """The fused level-1/2 census (one multi-distinct aggregate instead
    of two sequential passes) must leave the pruned arity-3 output
    identical: a pandas reference recomputes the full lattice, applies
    the same subset pruning, and compares every reported value."""
    from the_movies_db_spark.queries import load_all

    sf = "/root/testdata/sf0.001"
    o = pd.read_parquet(f"{sf}/orders.parquet")
    cols = [
        "o_custkey", "o_orderdate", "o_orderkey",
        "o_orderpriority", "o_orderstatus", "o_totalprice",
    ]
    n = len(o)
    singles = {c: o[c].nunique() for c in cols}
    non_keys = [c for c in cols if singles[c] < n]
    pair_nd = {
        (a, b): len(o[[a, b]].drop_duplicates())
        for i, a in enumerate(cols)
        for b in cols[i + 1:]
    }
    nk_pairs = {
        (a, b)
        for (a, b), nd in pair_nd.items()
        if a in non_keys and b in non_keys and nd < n
    }
    want = {}
    for i, a in enumerate(non_keys):
        for j, b in enumerate(non_keys[i + 1:], i + 1):
            for c in non_keys[j + 1:]:
                if (
                    (a, b) in nk_pairs
                    and (a, c) in nk_pairs
                    and (b, c) in nk_pairs
                ):
                    want[f"{a}+{b}+{c}"] = len(
                        o[[a, b, c]].drop_duplicates()
                    )
    got = {
        r["combo"]: r
        for r in load_all()["dq_candidate_keys3"].spark(spark, sf).collect()
    }
    assert set(got) == set(want)
    for combo, nd in want.items():
        row = got[combo]
        assert (row["n_cols"], row["n_distinct"], row["n_rows"]) == (3, nd, n)
        assert row["is_key"] == int(nd == n)
        assert row["uniqueness_ppm"] == nd * 1000000 // n
