"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Each query is timed end-to-end (plan build + execution + collect of
the final small result) — ``collect()``, never ``count()``: Catalyst
prunes the aggregate expressions under a bare count, so pure-agg
queries would be under-measured (CLAUDE.md trap list). Each query runs
``_RUNS`` times and the MEDIAN is recorded, so one neighbor-load spike
doesn't read as a regression (round-3's 1.91x false alarm). A warmup
query first touches every input file so JVM/codegen startup is not
attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from the_movies_db_spark.io import TABLES, load_table
from the_movies_db_spark.queries import load_all
from the_movies_db_spark.session import get_spark

HEADLINE = [
    # relational core (q06/q13/agg_rollup/window_topk retired round 6;
    # q01/join_interval_overlap/text_entropy/pipeline_gate_ablation/
    # events_path_topk retired round-6 session 4: sub-0.62 s and flat
    # across recorded rounds — the stdout JSON line must stay under the
    # driver's 2000-char tail window, so slots go to queries whose perf
    # story is still open; retired queries remain oracle-gated)
    "q07_volume_shipping",
    "q21_latest_shipper",
    "agg_percentiles",
    # reference-parity pipeline ops
    "upsert_merge",
    # LLM-pipeline operators (dedup_exact/text_stats retired round 6,
    # same rationale)
    "dedup_minhash_lsh",
    "sim_topk_lsh",
    "text_tfidf_topk",
    # corpus-curation operators (round 2; pack_sequences/chunk_overlap
    # retired round 6)
    "pipeline_decontaminate",
    "dedup_semantic",
    # search + time-series (round 2, late; events_ohlc retired round 6)
    # round-4 additions: composed ANN, sub-quadratic semantic dedup,
    # persisted index, chunking, sketch analytics
    "sim_topk_ivfpq",
    "dedup_semantic_lsh",
    # round-4 closers: hybrid retrieval, MRL ANN, basket mining, streaks
    "search_hybrid_rrf",
    "basket_brand_pairs",
    # round-4 continuation: binned interval join, distributed-rank RFM
    # (pipeline_shard_shuffle retired round 6)
    "orders_rfm_segments",
    # round-5: the 10 most expensive round-4 continuation queries at
    # sf0.1 (measured, single-run ranking in round 5) so BENCH carries
    # medians for the continuation surface (padding_waste retired r6)
    "sim_recall_ivfpq",
    # round-6 continuation: greedy MMR re-rank, retrieval eval + hard
    # negatives, DSIR + bigram-LM scoring, dim-correlation audit
    # (text_langid/multimodal_resize/pipeline_pii_redact/
    # pipeline_chunk_overlap/events_streaks/dq_benford_digits retired —
    # flat sub-0.45 s honest medians, still oracle-gated every round)
    "search_ndcg_eval",
    "search_hard_negatives",
    "text_bigram_logprob",
    # round-6: the 10 most expensive round-5 additions (probe-measured
    # ranking in the round-5 verdict) so BENCH carries their medians
    "sim_recall_nprobe_curve",
    "pipeline_curation_funnel",
    "udf_token_bucket",
    "sim_topk_ivfpq_residual",
    "upsert_partitioned",
    "sim_topk_kmeans_int",
    # round-6 session 4: the 5 most expensive of the 11 new additions
    # (x16-probe-measured 1x ranking in scripts/probe_r6g_16x.out)
    "graph_link_jaccard",
    # round-7: the most expensive new additions (x16-probe 1x ranking
    # in scripts/probe_r7_16x.out). Retired this round as flat with
    # closed perf stories (plan-pinned or multi-round-flat medians,
    # all still oracle-gated): q18_large_orders, pipeline_quality_filter,
    # search_phrase_proximity, orders_pareto_gini, sim_mmr_diversify,
    # sim_dim_correlation, agg_mutual_information, io_bucketed_join_scan.
    # round-8: the two heaviest round-7 queries landed AFTER BENCH_r07
    # was recorded (verdict item 5) — sketch mergeability audit was the
    # round's slowest new query (5.7 s single-shot). Retired as flat
    # with closed perf stories (one-pass plan-pinned aggregates, still
    # oracle-gated): text_hapax_share, agg_covariance_matrix,
    # orders_theilsen_trend.
    "dedup_sketch_merge_audit",
    # round-8: the heaviest new additions (x16-probe 1x ranking in
    # scripts/probe_r8*_16x.out). Retired as flat with closed perf
    # stories (multi-round-flat honest medians, plan-pinned, all still
    # oracle-gated every round): q10_returned_items, events_sessionize,
    # sim_topk_bruteforce, search_index_persisted, dq_mahalanobis_diag,
    # text_postings_compress, pipeline_importance_dsir.
    "graph_adamic_adar",
    "pipeline_filter_lm_impact",
    "sim_hubness_audit",
    "graph_hits_bipartite",
    # round-9: the heaviest new additions (x16-probe 1x ranking in
    # scripts/probe_r9_16x.out). Retired as flat with closed perf
    # stories (multi-round-flat honest medians, plan-pinned, all still
    # oracle-gated every round): events_forecast_backtest,
    # orders_survival_km, sim_knn_graph_stats, sim_ivf_cost_model,
    # dedup_lsh_cost_model, graph_label_propagation (scan-budget pin
    # landed r9), events_anomaly_mad, upsert_scd2_asof.
    "dq_candidate_keys3",
    "dedup_minhash_calibration",
    "agg_quantile_sketch_merge",
    "graph_connected_components",
    "graph_bridge_edges",
    # round-10: the heaviest new additions (sf0.1 warm ranking in
    # scripts/r10_new_ops_sf01_timing.json, after the spread()/
    # checkpoint fixes). Retired as flat with closed perf stories
    # (multi-round-flat honest medians, still oracle-gated every
    # round): q03_shipping_priority, window_running_total,
    # dedup_simhash, streaming_tumbling, pipeline_curate_e2e,
    # sim_topk_matryoshka, dedup_incremental, q05_local_supplier,
    # sim_bucket_purity, search_bm25_topk (its
    # plan now also runs inside search_ltr_blend).
    # round-11 trim (VERDICT r10 directive 3): 58 members x 3
    # collect-medians was ~4 min/sweep and drowning its own signal
    # in host-epoch noise. Retired 16 flat/closed-story members
    # (upsert_keep_latest, sim_topk_pq, dedup_source_overlap,
    # sim_topk_lsh_multiprobe, dedup_threshold_histogram,
    # agg_weighted_median, search_mrr_eval, sim_topk_srp_hamming,
    # basket_rules_confidence, graph_kcore_peel,
    # graph_degree_assortativity, search_rank_agreement,
    # sim_recall_kmeans, pipeline_dedup_survivorship,
    # search_query_likelihood_lm, dedup_edit_distance_verify) --
    # every family keeps >=1 representative and all stay
    # oracle-gated every round. Added the heaviest open-story
    # round-11 op (BPE merge training).
    "text_bpe_merges",
    "dedup_substring_exact",
    "streaming_topk_incremental",
    "pipeline_dedup_reweight",
    "search_ltr_blend",
    "pipeline_quality_rrf",
    "sim_topk_ivf_adaptive",
    "events_attribution_markov",
    # round-12: the heaviest new additions (3-run solo medians at sf0.1:
    # full-outer stream join 5.6 s, update-mode emissions 5.4 s, capped
    # edit-distance verify 4.3 s, skyline sweep 3.6 s). Lighter r12 ops
    # (tar shards 1.4 s, tar datasource 1.3 s, delta-encoding 1.3 s,
    # MOR 1.9 s) stay oracle-gated only.
    "streaming_join_full_outer",
    "streaming_update_mode_emissions",
    "dedup_edit_distance_verify",
    "orders_skyline_pareto",
]

# Runs per query; the recorded time is the median. 3 keeps one
# neighbor-load spike from reading as a regression while bounding the
# sweep at ~3x a single pass.
_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # warmup: force-read every table once (file listing, footer parse,
    # codegen warm paths) without doing any query's actual work
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    # absorb two one-time process costs so they are not attributed to
    # whichever query hits them first: janino/JIT warmup of whole-stage
    # codegen on a wide unrolled expression (~2-3 s on the first heavy
    # compile), and Python/Arrow worker spawn for the pandas-UDF queries
    from pyspark.sql import functions as F

    from the_movies_db_spark.operators.similarity import cosine_from_parts, norm

    e1 = (
        load_table(spark, sf_dir, "embeddings")
        .limit(1)
        .select(F.col("embedding").alias("__a"), F.col("embedding").alias("__b"))
        .select(
            "__a", "__b", norm("__a", 64).alias("__na"), norm("__b", 64).alias("__nb")
        )
    )
    e1.select(cosine_from_parts("__a", "__b", "__na", "__nb", dim=64)).collect()

    def _identity(batches):
        yield from batches

    spark.range(2).mapInPandas(_identity, "id long").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = registry[name]
        runs: list[float] = []
        n = 0
        for _ in range(_RUNS):
            t0 = time.perf_counter()
            df = q.spark(spark, sf_dir)
            n = len(df.collect())
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)
        print(
            f"# {name}: median {timings[name]:.3f}s of "
            f"{[round(r, 3) for r in runs]} ({n} rows)",
            file=sys.stderr,
        )

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else sf_dir,
    }
    vs_prev = _vs_prev(timings, out["value"])
    if vs_prev:
        # per-query ratios go to stderr; the stdout JSON line carries
        # only the compact summary — the driver keeps just the LAST
        # 2000 chars of stdout, and round-3's full-ratio line overflowed
        # that window, so the driver recorded parsed=None
        print(f"# vs_prev detail: {json.dumps(vs_prev)}", file=sys.stderr)
        out["vs_prev"] = {
            k: vs_prev[k] for k in ("baseline", "total") if k in vs_prev
        }
    # compact separators: the driver keeps only the LAST 2000 chars of
    # stdout, and the default ", "/": " spacing costs ~2 chars per query
    line = json.dumps(out, separators=(",", ":"))
    assert len(line) < 1900, f"driver tail window is 2000 chars ({len(line)})"
    print(line)


def _vs_prev(timings: dict[str, float], total: float) -> dict | None:
    """Per-query and total ratios vs the newest recorded BENCH_r{N}.json
    (this_run / prev_run; >1 = regression), so regressions are visible
    round over round. Timings are ~20% noisy — read ratios accordingly."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    benches = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    # newest bench whose JSON line the driver actually parsed (a
    # too-long stdout line records parsed=None — skip those)
    prev, baseline = None, None
    for path in reversed(benches):
        try:
            with open(path) as fh:
                cand = json.load(fh).get("parsed")
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(cand, dict) and cand.get("queries"):
            prev, baseline = cand, path
            break
    if prev is None:
        return None
    prev_q = prev.get("queries") or {}
    ratios = {
        name: round(t / prev_q[name], 2)
        for name, t in timings.items()
        if prev_q.get(name)
    }
    out = {"baseline": os.path.basename(baseline), "queries": ratios}
    # total ratio over the intersection only, so queries ADDED to the
    # headline set since the baseline don't read as a regression
    shared_now = sum(t for n, t in timings.items() if prev_q.get(n))
    shared_prev = sum(v for n, v in prev_q.items() if n in timings)
    if shared_prev:
        out["total"] = round(shared_now / shared_prev, 2)
    return out


if __name__ == "__main__":
    main()
