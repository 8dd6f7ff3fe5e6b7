"""Independent references/invariants for the round-6 session queries.

The oracle sweep already value-pins each query against DuckDB; these
tests add a THIRD, pure-Python reference for the greedy MMR operator
(the only new sequential algorithm) and arithmetic self-consistency
checks for the rest — the SURVEY §5 strategy of pinning non-standard
semantics independently of both engines.
"""

from __future__ import annotations

import math

import pyarrow.parquet as pq

from the_movies_db_spark.queries import load_all

REGISTRY = load_all()


def _dot(a, b):
    acc = 0.0  # matches the engines' CAST(0.0 AS DOUBLE) + x1*y1 + ... chain
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _cos_micro(a, b):
    return math.floor(
        _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b))) * 1000000
    )


def _tdiv(a, b):
    """Truncate-toward-zero integer division (Spark div / DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_mmr_matches_python_greedy(spark, sf_dir):
    """sim_mmr_diversify == a from-scratch float64 greedy reference
    (same left-associated dot chains, same integer scoring)."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    vecs = {
        int(vid): [float(x) for x in v]
        for vid, v in zip(t["vec_id"], t["embedding"])
    }
    q = vecs[0]
    qsim = {i: _cos_micro(q, v) for i, v in vecs.items() if i != 0}
    pool = sorted(qsim, key=lambda i: (-qsim[i], i))[:12]
    selected: list[int] = []
    expect = []
    for k in range(1, 6):
        best = None
        for i in pool:
            if i in selected:
                continue
            mp = (
                max(_cos_micro(vecs[i], vecs[s]) for s in selected)
                if selected
                else 0
            )
            score = 700 * qsim[i] - 300 * mp
            key = (-score, i)
            if best is None or key < best[0]:
                best = (key, i, mp, score)
        _, i, mp, score = best
        selected.append(i)
        expect.append((k, i, qsim[i], mp, score))

    got = [
        (
            int(r["rank"]),
            int(r["vec_id"]),
            int(r["qsim_micro"]),
            int(r["maxpair_micro"]),
            int(r["mmr_nano"]),
        )
        for r in REGISTRY["sim_mmr_diversify"].spark(spark, sf_dir).collect()
    ]
    assert sorted(got) == expect


def test_seasonal_anomaly_self_consistent(spark, sf_dir):
    rows = REGISTRY["events_seasonal_anomaly"].spark(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    zs = []
    for r in rows:
        res2 = 2 * int(r["cnt"]) - int(r["med_x2"])
        assert int(r["mad_x4"]) > 0
        assert int(r["z_milli"]) == _tdiv(2000 * res2, int(r["mad_x4"]))
        zs.append(abs(int(r["z_milli"])))
    assert zs == sorted(zs, reverse=True)


def test_ndcg_bounded(spark, sf_dir):
    rows = REGISTRY["search_ndcg_eval"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < int(r["ndcg_ppm"]) <= 1000000
        assert 0 < int(r["dcg_micro"]) <= int(r["idcg_micro"])


def test_embedding_drift_shape(spark, sf_dir):
    rows = REGISTRY["sim_embedding_drift"].spark(spark, sf_dir).collect()
    assert len(rows) == 8
    deltas = []
    for r in rows:
        assert int(r["delta_nano"]) == int(r["mean0_nano"]) - int(
            r["mean1_nano"]
        )
        deltas.append(abs(int(r["delta_nano"])))
    assert deltas == sorted(deltas, reverse=True)


def test_elasticity_deterministic(spark, sf_dir):
    q = REGISTRY["orders_price_elasticity"].spark
    a = [tuple(r) for r in q(spark, sf_dir).collect()]
    b = [tuple(r) for r in q(spark, sf_dir).collect()]
    assert a == b
    assert 0 < len(a) <= 25
    for brand, n_months, el in a:
        assert n_months >= 1


def test_shuffle_skew_bounds(spark, sf_dir):
    rows = {
        r["key_name"]: r
        for r in REGISTRY["dq_shuffle_skew"].spark(spark, sf_dir).collect()
    }
    assert set(rows) == {"orderkey", "partkey", "user_id", "lang"}
    for r in rows.values():
        # hottest bucket is at least the uniform share, at most everything
        assert 1000 <= int(r["skew_milli"]) <= 32000
        assert int(r["n_buckets"]) <= 32
        assert int(r["max_bucket_rows"]) <= int(r["total_rows"])
    # a 5-value key cannot use more than 5 of 32 buckets
    assert int(rows["lang"]["n_buckets"]) <= 5
    assert int(rows["lang"]["skew_milli"]) > int(
        rows["orderkey"]["skew_milli"]
    )


def test_trimmed_mean_matches_numpy_reference(spark, sf_dir):
    import math

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()
    by_type: dict[str, list[tuple[int, int]]] = {}
    for et, eid, v in zip(t["event_type"], t["event_id"], t["value"]):
        by_type.setdefault(et, []).append(
            (math.floor(float(v) * 100), int(eid))
        )
    rows = {
        r["event_type"]: r
        for r in REGISTRY["agg_trimmed_mean"].spark(spark, sf_dir).collect()
    }
    assert set(rows) == set(by_type)
    for et, pairs in by_type.items():
        pairs.sort()
        n = len(pairs)
        k = n // 10
        kept = [c for c, _ in pairs[k : n - k]]
        assert int(rows[et]["n"]) == n and int(rows[et]["k"]) == k
        assert int(rows[et]["trimmed_milli"]) == _tdiv(
            sum(kept) * 1000, n - 2 * k
        )


def test_seasonality_strength_bounded(spark, sf_dir):
    (r,) = REGISTRY["events_seasonality_strength"].spark(
        spark, sf_dir
    ).collect()
    assert int(r["strength_ppm"]) <= 1000000
    assert int(r["var_total_num"]) > 0


def test_heaps_growth_monotone(spark, sf_dir):
    rows = sorted(
        REGISTRY["text_vocab_growth_heaps"].spark(spark, sf_dir).collect(),
        key=lambda r: int(r["k"]),
    )
    assert len(rows) == 8
    toks = [int(r["n_tokens"]) for r in rows]
    vocab = [int(r["vocab"]) for r in rows]
    assert toks == sorted(toks) and vocab == sorted(vocab)
    betas = {int(r["beta_micro"]) for r in rows}
    assert len(betas) == 1  # one fitted exponent, broadcast to all rows
    # sublinear growth; 0 is legitimate at the smoke SF (the tiny
    # synthetic vocabulary saturates within the first prefix)
    assert 0 <= betas.pop() < 1000000


def test_mapinarrow_norm_matches_expression(spark, sf_dir):
    """The Arrow kernel must equal the pure-expression computation of
    the same integer norm (batch boundaries can't matter)."""
    from pyspark.sql import functions as F

    from the_movies_db_spark.io import load_table

    got = {
        int(r["label"]): (
            int(r["n_vecs"]),
            int(r["min_qnorm2"]),
            int(r["max_qnorm2"]),
            int(r["sum_qnorm2"]),
        )
        for r in REGISTRY["udf_mapinarrow_norm"].spark(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "embeddings")
    q = "CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)"
    ref = {
        int(r["label"]): (
            int(r["n"]),
            int(r["mn"]),
            int(r["mx"]),
            int(r["s"]),
        )
        for r in e.select(
            "label",
            F.expr(
                f"aggregate(transform(embedding, v -> {q} * {q}),"
                " 0L, (a, b) -> a + b)"
            ).alias("qn"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("qn").alias("mn"),
            F.max("qn").alias("mx"),
            F.sum("qn").alias("s"),
        )
        .collect()
    }
    assert got == ref
