"""Round-10 pins: crafted-corpus ground truth for the new dedup
modality, dial-consistency for adaptive ANN, arithmetic invariants for
the new integer operators, and scan budgets for every new multi-branch
or iterative plan (the round-9 census class must not regress through
new code)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
import pytest

from the_movies_db_spark.queries import load_all

SF = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rdd_scans(txt: str) -> int:
    return len(re.findall(r"Scan ExistingRDD", txt))


# ------------------------------------------------ substring-exact dedup


def test_substring_exact_planted_corpus(spark, registry, tmp_path):
    """Plant a 72-char block shared VERBATIM by docs 1 and 2 (and absent
    from doc 3); the detector must attribute a duplicated run covering
    the block to both docs and nothing to doc 3."""
    block = "the quick brown fox jumps over the lazy dog again and again and again xx"[:72]
    filler1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    filler2 = "one two three four five six seven eight nine ten eleven twelve thirteen"
    filler3 = "unique text that shares nothing with the planted block at all whatsoever"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                filler1 + " " + block,
                block + " " + filler2,
                filler3 + " " + filler3[::-1],
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [0, 0, 0],
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    d = str(tmp_path / "corpus")
    import os

    os.makedirs(d)
    docs.to_parquet(f"{d}/documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in registry["dedup_substring_exact"].spark(spark, d).collect()
    }
    assert 1 in rows and 2 in rows, rows
    assert 3 not in rows
    # stride-8 grams of length 32: the planted 72-char block must yield
    # a run covering most of it in BOTH docs (alignment differs by doc,
    # so require >= block_len - stride - gram_len slack)
    for doc in (1, 2):
        assert rows[doc]["max_run_chars"] >= 72 - 8 - 32, rows[doc]
    assert rows[1]["n_docs_with_dups"] == 2


def test_substring_exact_sf001_structure(spark, registry):
    out = registry["dedup_substring_exact"].spark(spark, SF_MID).collect()
    assert len(out) == 20
    ranks = [r["rank"] for r in out]
    assert ranks == list(range(1, 21))
    assert all(r["max_run_chars"] >= 32 for r in out)
    assert all(r["dup_chars_ub"] >= r["max_run_chars"] for r in out)


# ------------------------------------------------ adaptive-nprobe ANN


def test_adaptive_dial_consistency(spark, registry):
    """nprobe_used must be 1 exactly when the first probed cell held >=
    the floor of post-filter candidates; both dial positions must occur
    at sf0.01 (query 4 starves on the zh filter)."""
    rows = registry["sim_topk_ivf_adaptive"].spark(spark, SF_MID).collect()
    dials = {r["query_id"]: r["nprobe_used"] for r in rows}
    assert set(dials.values()) == {1, 3}, dials
    for r in rows:
        if r["nprobe_used"] == 1:
            # candidates all came from one cell and met the floor
            assert r["n_candidates"] >= 8, r
    # recall eval agrees on the dial and stays within [0, 1e6]
    ev = {r["query_id"]: r for r in
          registry["sim_recall_adaptive"].spark(spark, SF_MID).collect()}
    for qid, r in ev.items():
        assert r["nprobe_used"] == dials[qid]
        assert 0 <= r["recall_ppm"] <= 1_000_000
        assert r["n_hits"] <= r["n_truth"]


# ------------------------------------------------ Markov attribution


def test_markov_attribution_invariants(spark, registry):
    rows = registry["events_attribution_markov"].spark(spark, SF_MID).collect()
    assert len(rows) == 4
    total_att = sum(r["attribution_ppm"] for r in rows)
    # three-stage divmod truncation loses < 1 ppm per stage per channel
    assert 1_000_000 - 12 <= total_att <= 1_000_000
    for r in rows:
        assert r["removal_effect_ppm"] >= 0
        assert r["pconv_removed_ppm"] <= r["pconv_full_ppm"]
        assert r["n_touches"] > 0


# ------------------------------------------------ decayed engagement


def test_decayed_engagement_matches_python(spark, registry):
    rows = registry["events_decayed_engagement"].spark(spark, SF).collect()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    anchor = (ev["ts"].max().normalize() - pd.Timestamp("1970-01-01")).days
    ev = ev.assign(
        age=(anchor - (ev["ts"].dt.normalize()
                       - pd.Timestamp("1970-01-01")).dt.days).clip(upper=62)
    )
    exp = Counter()
    for uid, age in zip(ev["user_id"], ev["age"]):
        exp[uid] += 1_000_000 // (1 << int(age))
    got = {r["user_id"]: r["decayed_count_micro"] for r in rows}
    for uid, v in got.items():
        assert exp[uid] == v, (uid, exp[uid], v)


# ------------------------------------------------ newsvendor / EOQ / XYZ


def test_newsvendor_quantile_matches_python(spark, registry):
    rows = registry["orders_newsvendor_quantile"].spark(spark, SF).collect()
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["d"] = (o["o_orderdate"].dt.normalize()
              - pd.Timestamp("1970-01-01")).dt.days
    daily = o.groupby(["o_orderpriority", "d"]).size()
    for r in rows:
        ds = sorted(daily[r["priority"]].values)
        n = len(ds)
        # smallest demand with cum*10 >= n*9
        cum = 0
        stock = None
        for v in ds:
            cum += 1
            if cum * 10 >= n * 9:
                stock = v
                break
        assert r["stock_level"] == stock, (r, stock)
        assert r["n_days"] == n


def test_eoq_radicand_and_floor_sqrt(spark, registry):
    rows = registry["orders_eoq_policy"].spark(spark, SF).collect()
    for r in rows:
        if r["hold_cents"]:
            x = (2 * r["demand"] * 10_000) // r["hold_cents"]
            assert r["eoq_units"] == math.isqrt(x), r
            if r["eoq_units"]:
                assert r["cycles_per_horizon"] == r["demand"] // r["eoq_units"]


def test_xyz_classes_partition(spark, registry):
    rows = registry["orders_xyz_variability"].spark(spark, SF).collect()
    for r in rows:
        cls = ("X" if r["cv_micro"] < 200_000
               else "Y" if r["cv_micro"] < 400_000 else "Z")
        assert r["xyz_class"] == cls, r
        assert r["cv_micro"] >= 0


# ------------------------------------------------ bitmap hierarchy


def test_bitmap_hierarchy_total_is_exact(spark, registry):
    rows = {r["grain"]: r for r in
            registry["agg_bitmap_hierarchy"].spark(spark, SF).collect()}
    assert rows["total"]["sum_active"] == rows["total"]["exact_total"]
    # OR-merge can only lose multiplicity, never users: every grain's
    # per-period max is bounded by the total distinct count
    for g in ("day", "week"):
        assert rows[g]["max_active"] <= rows["total"]["exact_total"]
        assert rows[g]["sum_active"] >= rows["total"]["exact_total"]


# ------------------------------------------------ log-histogram sketch


def test_log_histogram_error_bounds(spark, registry):
    rows = registry["agg_log_histogram_quantiles"].spark(spark, SF).collect()
    assert [r["q"] for r in rows] == [50, 90, 99]
    for r in rows:
        assert r["approx_cents"] >= r["exact_cents"], r
        # bucket upper bound is < 2x the smallest member of the bucket
        assert r["approx_cents"] < 2 * r["exact_cents"], r
        assert r["rel_err_ppm"] < 1_000_000


# ------------------------------------------------ aHash re-encode pairs


def test_ahash_reencode_pairs_hamming_zero(spark, registry):
    """Docs with >= 64 chars: the appended trailer lies beyond the hash
    window, so the (doc, doc+2M) pair must appear with hamming 0."""
    d = pd.read_parquet(f"{SF_MID}/documents.parquet")
    eligible = set(
        d[(d["doc_id"] % 3 == 0) & (d["text"].str.len() >= 64)]["doc_id"]
    )
    rows = registry["multimodal_ahash_dedup"].spark(spark, SF_MID).collect()
    zero_pairs = {
        (r["doc_a"], r["doc_b"]) for r in rows if r["hamming"] == 0
    }
    hits = [d0 for d0 in eligible if (d0, d0 + 2_000_000) in zero_pairs]
    # top-30 truncation: at least the lowest-id eligible docs must show
    assert len(hits) >= min(10, len(eligible)), (len(hits), len(eligible))
    assert rows[0]["n_near_dups"] >= len(eligible)


# ------------------------------------------------ conditional merge


def test_conditional_merge_replay(spark, registry):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    t = o[o["o_orderkey"] % 3 != 0][["o_orderkey", "o_orderstatus", "cents"]]
    b = o[o["o_orderkey"] % 2 == 0][["o_orderkey", "o_orderstatus", "cents"]]
    b = b.assign(cents=b["cents"] + 500)
    tk, bk = set(t["o_orderkey"]), set(b["o_orderkey"])
    out = {}
    for _, r in t.iterrows():
        out[r["o_orderkey"]] = (r["o_orderstatus"], r["cents"])
    for _, r in b.iterrows():
        k = r["o_orderkey"]
        if k in tk:
            if r["o_orderstatus"] == "F":
                out.pop(k, None)          # matched-delete
            elif r["cents"] > out[k][1]:
                out[k] = (r["o_orderstatus"], r["cents"])  # matched-update
        else:
            out[k] = (r["o_orderstatus"], r["cents"])      # insert
    exp = Counter(v[0] for v in out.values())
    rows = registry["upsert_conditional_merge"].spark(spark, SF).collect()
    got = {r["status"]: r["n_rows"] for r in rows}
    assert got == dict(exp), (got, dict(exp))


# ------------------------------------------------ scan budgets (census)


def test_textrank_scan_budget(spark, registry):
    txt = plan_of(registry["text_textrank_keywords"].spark(spark, SF_MID))
    assert txt.count("documents.parquet") == 0, txt[:1500]
    assert _rdd_scans(txt) <= 4, txt[:1500]


def test_ppr_scan_budget(spark, registry):
    txt = plan_of(
        registry["graph_personalized_pagerank"].spark(spark, SF_MID)
    )
    for tbl in ("lineitem", "orders", "customer", "supplier"):
        assert txt.count(f"{tbl}.parquet") == 0, tbl
    # 3 iterations x (edges + deg + base) + final base join, all
    # checkpoint artifacts — bounded, never fact scans
    assert _rdd_scans(txt) <= 14, _rdd_scans(txt)


def test_diameter_scan_budget(spark, registry):
    txt = plan_of(registry["graph_diameter_estimate"].spark(spark, SF_MID))
    for tbl in ("lineitem", "orders", "customer", "supplier"):
        assert txt.count(f"{tbl}.parquet") == 0, tbl
    assert _rdd_scans(txt) <= 2, _rdd_scans(txt)


def test_triangle_sample_scan_budget(spark, registry):
    txt = plan_of(
        registry["graph_triangle_sample_estimate"].spark(spark, SF_MID)
    )
    for tbl in ("lineitem", "orders", "customer", "supplier"):
        assert txt.count(f"{tbl}.parquet") == 0, tbl
    # 3-way self-join of each artifact (edges, samp) + two count
    # branches: bounded RDD re-reads of node-grain artifacts
    assert _rdd_scans(txt) <= 8, _rdd_scans(txt)


def test_quality_rrf_scan_budget(spark, registry):
    txt = plan_of(registry["pipeline_quality_rrf"].spark(spark, SF_MID))
    assert txt.count("documents.parquet") == 0, txt[:1500]


def test_triangle_sample_estimator_identity(spark, registry):
    r = registry["graph_triangle_sample_estimate"].spark(
        spark, SF_MID
    ).collect()[0]
    assert r["estimate_triangles"] == r["sampled_triangles"] * 8
    assert r["n_sampled_edges"] <= r["n_edges"]
    assert r["sampled_triangles"] <= r["exact_triangles"]


# ------------------------------------------------ RAW1 numpy decode


def test_raw1_numpy_decoder_roundtrip(spark, registry):
    """The REAL numpy decode path: kernel-level check (header parse +
    reshape + integer features against a pure-Python replay) and the
    registered query's panel at sf0.001."""
    from the_movies_db_spark.operators.multimodal import (
        RAW1_H,
        RAW1_W,
        numpy_raw1_decoder,
    )

    text = "hello world this is a raw1 grayscale thumbnail payload for tests"
    padded = text.ljust(RAW1_W * RAW1_H)[: RAW1_W * RAW1_H]
    blob = (
        b"RAW1" + RAW1_W.to_bytes(2, "little") + RAW1_H.to_bytes(2, "little")
        + padded.encode()
    )
    w, h, mean_milli, w0, w1 = numpy_raw1_decoder(blob)
    assert (w, h) == (RAW1_W, RAW1_H)
    vals = [ord(c) for c in padded]
    total = sum(vals)
    assert mean_milli == total * 1000 // 128
    thresh = 2 * (total // 128)
    bits = []
    for r in range(8):
        for c in range(8):
            s2 = vals[r * 16 + 2 * c] + vals[r * 16 + 2 * c + 1]
            bits.append(1 if s2 > thresh else 0)
    assert w0 == sum(b << i for i, b in enumerate(bits[:32]))
    assert w1 == sum(b << i for i, b in enumerate(bits[32:]))

    rows = registry["multimodal_numpy_decode"].spark(spark, SF).collect()
    assert len(rows) == 30
    assert all(r["width"] == 16 and r["height"] == 8 for r in rows)
    assert all(0 <= r["w0"] < (1 << 32) for r in rows)


def test_ahash_bucket_cap_semantics(spark, registry, tmp_path):
    """The LSH max-df cap: a 100-doc identical-text clique saturates
    every band bucket (> 64 members) and must yield ZERO candidate
    pairs; a 10-doc clique stays under the cap and must yield all
    C(10+4,2)-ish pairs (10 originals + 4 re-encodes of doc_id%3==0)."""
    import os

    base = "x" * 80  # > 64 chars so re-encode trailers are invisible
    for n, expect_pairs in ((100, 0), (10, 1)):
        docs = pd.DataFrame(
            {
                "doc_id": range(n),
                "text": [base] * n,
                "lang": ["en"] * n,
                "source": ["s"] * n,
                "n_chars": [80] * n,
            }
        )
        d = str(tmp_path / f"c{n}")
        os.makedirs(d)
        docs.to_parquet(f"{d}/documents.parquet")
        rows = registry["multimodal_ahash_dedup"].spark(spark, d).collect()
        if expect_pairs == 0:
            assert rows == [], len(rows)
        else:
            # 10 docs + 4 re-encodes = clique of 14 -> C(14,2) = 91
            assert rows and rows[0]["n_candidates"] == 91, rows[:2]
