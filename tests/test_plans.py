"""Physical-plan regression tests: the scale-critical plan properties
asserted as invariants, so a future refactor can't silently reintroduce
a full-table scan, lose a broadcast, or add a needless shuffle."""

from __future__ import annotations

import pytest

from the_movies_db_spark.queries import load_all


@pytest.fixture(scope="module")
def registry():
    return load_all()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q01_filter_pushed_to_scan(spark, sf_dir, registry):
    txt = formatted(registry["q01_pricing_summary"].spark(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in txt


def test_q01_column_pruning(spark, sf_dir, registry):
    txt = formatted(registry["q01_pricing_summary"].spark(spark, sf_dir))
    # ReadSchema must include only the 7 needed columns, never l_partkey etc.
    read = [line for line in txt.splitlines() if "ReadSchema" in line][0]
    assert "l_partkey" not in read and "l_suppkey" not in read


def test_q05_star_join_broadcasts_all_dims(spark, sf_dir, registry):
    txt = plan_of(registry["q05_local_supplier"].spark(spark, sf_dir))
    assert txt.count("BroadcastHashJoin") == 5  # orders,customer,supplier,nation,region
    assert "SortMergeJoin" not in txt


def test_q18_topk_is_take_ordered(spark, sf_dir, registry):
    txt = plan_of(registry["q18_large_orders"].spark(spark, sf_dir))
    assert "TakeOrderedAndProject" in txt  # never a global Sort + Limit


def test_upsert_is_single_full_outer_join(spark, sf_dir, registry):
    txt = plan_of(registry["upsert_merge"].spark(spark, sf_dir))
    assert txt.count("FullOuter") == 1


def test_minhash_signature_not_reinlined(spark, sf_dir, registry):
    # the signature fold must appear ONCE per join side (2 total), not
    # once per band (which would be 8 = 2 sides × 4 bands)
    txt = plan_of(registry["dedup_minhash_lsh"].spark(spark, sf_dir))
    assert txt.count("aggregate(") <= 4


def test_events_scan_prunes_props(spark, sf_dir, registry):
    # tumbling agg needs ts/event_type/value — the wide props column
    # must not be read
    txt = formatted(registry["events_tumbling"].spark(spark, sf_dir))
    read = [line for line in txt.splitlines() if "ReadSchema" in line]
    assert read and all("props" not in line for line in read)


def test_ivfpq_adc_shortlist_carries_no_raw_vectors(spark, sf_dir, registry):
    """The IVF x PQ ADC scan + shortlist ranking must operate on
    (id, cell, codes) only — the raw embedding column enters the plan
    again ONLY in the re-rank join. Pin: the Window computing the
    shortlist rank (partitioned by query_id, ordered by adc_micro)
    never has `embedding` in its schema."""
    txt = plan_of(registry["sim_topk_ivfpq"].spark(spark, sf_dir))
    win_lines = [
        ln for ln in txt.splitlines()
        if "Window" in ln and "adc_micro" in ln
    ]
    assert win_lines, "shortlist window not found in plan"
    assert all("embedding" not in ln for ln in win_lines), win_lines[0]


def test_text_repetition_has_no_shuffle(spark, sf_dir, registry):
    """Repetition metrics are per-row array arithmetic; the only
    Exchange allowed is the input spread() round-robin — no keyed
    (hashpartitioning) shuffle may reappear."""
    txt = plan_of(registry["text_repetition"].spark(spark, sf_dir))
    assert "hashpartitioning" not in txt, txt


def test_pipeline_chunk_overlap_has_no_shuffle(spark, sf_dir, registry):
    """Chunking is a pure projection + explode: zero Exchanges of any
    kind (chunk ids and boundaries are integer arithmetic per row)."""
    txt = plan_of(registry["pipeline_chunk_overlap"].spark(spark, sf_dir))
    assert "Exchange" not in txt, txt


def test_agg_percentiles_single_aggregate_buffer(spark, sf_dir, registry):
    """All four percentile ranks must come from ONE percentile
    aggregate expression (a single sorted buffer per group), not four."""
    txt = plan_of(registry["agg_percentiles"].spark(spark, sf_dir))
    assert txt.count("percentile(") <= 2, txt  # partial + final only


def test_partition_pruning_static_and_dynamic(spark, tmp_path):
    """Partitioned-table pruning, both flavors, pinned on a real
    partitioned parquet table:

    - a LITERAL dim filter on the join key propagates through the join
      (InferFiltersFromConstraints) and lands as a STATIC
      PartitionFilter on the fact scan — only matching partition dirs
      are listed;
    - a dim filter on a NON-join column can't be inferred statically,
      so Dynamic Partition Pruning must insert a
      dynamicpruningexpression into the fact scan's PartitionFilters
      (the subquery/broadcast result prunes partitions at runtime).

    This is the mechanism the 100 TB layout docs rely on: facts
    written partitioned by a join/filter column turn dim filters into
    partition-directory skips.
    """
    import re

    from pyspark.sql import functions as F

    from the_movies_db_spark.io import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    fact_path = str(tmp_path / "events_by_type")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(fact_path)
    dim_path = str(tmp_path / "type_dim")
    (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "category",
            F.when(
                F.col("event_type").isin("click", "view"), "engagement"
            ).otherwise("other"),
        )
        .write.mode("overwrite")
        .parquet(dim_path)
    )
    fact = spark.read.parquet(fact_path).withColumn("v2", F.col("value") * 2)

    def fact_partition_filters(df) -> str:
        txt = df._jdf.queryExecution().executedPlan().toString()
        filters = re.findall(r"PartitionFilters: \[[^\]]*\]", txt)
        assert filters, txt
        return filters[0]  # fact scan is the first/probe side

    # static: literal join-key filter on the dim propagates to the scan
    dim_lit = spark.read.parquet(dim_path).filter(F.col("event_type") == "click")
    static = fact_partition_filters(
        fact.join(dim_lit, "event_type").agg(F.sum("v2").alias("s"))
    )
    assert "event_type" in static and "click" in static, static

    # dynamic: non-join-column filter → dynamicpruningexpression
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try:
        dim_cat = spark.read.parquet(dim_path).filter(
            F.col("category") == "engagement"
        )
        dyn = fact_partition_filters(
            fact.join(dim_cat, "event_type").agg(F.sum("v2").alias("s"))
        )
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.useStats", prev
        )
    assert "dynamicpruning" in dyn.lower(), dyn


def test_basket_single_pass_reads_lineitem_once(spark, sf_dir, registry):
    """The single-pass rewrite's whole point: orders, brand counts, and
    pair counts all derive from ONE fact scan + ONE basket aggregation.
    The naive branch-per-count formulation scanned lineitem 4-5x."""
    txt = plan_of(registry["basket_brand_pairs"].spark(spark, sf_dir))
    assert txt.count("lineitem.parquet") == 1, txt


def test_curriculum_rank_window_is_partitioned_by_bucket(spark, sf_dir, registry):
    """The heavy row_number must run per-bucket (distributed), never as
    a global single-partition window over the documents."""
    txt = plan_of(registry["pipeline_curriculum_order"].spark(spark, sf_dir))
    import re

    wins = re.findall(r"Window \[row_number\(\).*?\]", txt)
    assert wins, txt
    heavy = [w for w in wins if "doc_id" in w]
    assert all("partition" not in w or "bucket" in w for w in heavy), wins
    # and the per-doc window must partition by bucket specifically
    assert any("bucket" in w for w in heavy), wins


def test_hybrid_rrf_fuses_with_full_outer_join(spark, sf_dir, registry):
    """Fusion must keep docs surfaced by only one system (FullOuter),
    and the ANN query side must be broadcast."""
    txt = plan_of(registry["search_hybrid_rrf"].spark(spark, sf_dir))
    assert "FullOuter" in txt
    assert "BroadcastNestedLoopJoin" in txt or "BroadcastHashJoin" in txt


def test_matryoshka_rerank_joins_by_id(spark, sf_dir, registry):
    """The prefix scan must carry only the 16-dim slice; full vectors
    re-enter via the re-rank join keyed on neighbor_id (two broadcast
    joins after the shortlist window)."""
    txt = plan_of(registry["sim_topk_matryoshka"].spark(spark, sf_dir))
    # shortlist filter happens before the rerank joins: the plan has a
    # window (prefix rank) feeding broadcast joins back to embeddings
    assert txt.count("embeddings.parquet") >= 3  # prefix + corpus + query sides
    assert "BroadcastHashJoin" in txt


def test_persisted_ann_index_scan_is_partition_pruned(spark, sf_dir, registry):
    """The materialized IVFxPQ index must be read with a STATIC literal
    partition filter on the probe cells, and the code scan must never
    carry raw embedding vectors."""
    df = registry["sim_index_persisted"].spark(spark, sf_dir)
    txt = plan_of(df)
    code_scans = [
        line
        for line in txt.splitlines()
        if "FileScan" in line and "/codes" in line
    ]
    assert code_scans, txt
    assert any("PartitionFilters: [cell" in line and " IN (" in line
               for line in code_scans), code_scans
    assert all("embedding" not in line.split("ReadSchema")[-1]
               for line in code_scans), code_scans


def test_bloom_prefilter_prunes_before_join(spark, sf_dir, registry):
    df = registry["join_bloom_prefilter"].spark(spark, sf_dir)
    txt = plan_of(df)
    # The bitmask probe (element_at & shiftleft over xxhash64 positions)
    # must sit in a Filter on the fact side, not after the join.
    assert "xxhash64" in txt and "shiftleft" in txt
    # And it must actually prune: the bloom admits far fewer fact rows
    # than the table holds (302/1500 customers are BUILDING).
    from the_movies_db_spark.io import load_table
    from the_movies_db_spark.operators.joins import bloom_prefilter_join
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    total = o.count()
    plain = o.join(c, "c_custkey").count()
    admitted = bloom_prefilter_join(o, c, on="c_custkey").count()
    assert plain == admitted  # exact join removes every false positive
    # prefilter selectivity must approach the true selectivity
    assert admitted < total * 0.5


def test_rollup_cascade_three_aggregate_levels(spark, sf_dir, registry):
    txt = plan_of(registry["events_rollup_cascade"].spark(spark, sf_dir))
    # minute -> hour -> day: three distinct hash-aggregate levels
    # (each with partial+final), but only ONE scan of events.
    assert txt.count("events.parquet") == 1


def test_interval_overlap_join_is_equi_keyed(spark, sf_dir, registry):
    txt = plan_of(registry["join_interval_overlap"].spark(spark, sf_dir))
    # The binned rewrite must give Catalyst a real equi-key: without it
    # the overlap predicate plans as BroadcastNestedLoopJoin (a cross
    # product, quadratic at scale). Hash/sort-merge on __bucket only.
    assert "NestedLoop" not in txt and "CartesianProduct" not in txt
    assert "__bucket" in txt

    # And the rewrite is lossless: bucket join == plain non-equi join.
    from pyspark.sql import functions as F

    from the_movies_db_spark.io import load_table
    from the_movies_db_spark.operators.joins import interval_overlap_join

    epoch = "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("a_id"),
        F.expr(epoch).alias("a_start"),
        F.expr(f"{epoch} + 600 + (event_id % 10) * 60").alias("a_end"),
    )
    b = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("b_id"),
        F.expr(epoch).alias("b_start"),
        F.expr(f"{epoch} + 300 + (event_id % 20) * 30").alias("b_end"),
    )
    binned = interval_overlap_join(
        a, b, "a_start", "a_end", "b_start", "b_end", 3600
    )
    plain = a.join(
        b,
        (F.col("a_start") <= F.col("b_end"))
        & (F.col("b_start") <= F.col("a_end")),
    )
    assert binned.count() == plain.count()
    # spot-check pair identity, not just cardinality
    lhs = {(r.a_id, r.b_id) for r in binned.select("a_id", "b_id").collect()}
    rhs = {(r.a_id, r.b_id) for r in plain.select("a_id", "b_id").collect()}
    assert lhs == rhs


def test_spatial_radius_join_is_equi_keyed(spark, sf_dir, registry):
    txt = plan_of(registry["join_spatial_radius"].spark(spark, sf_dir))
    # the 3x3 grid probe must plan as a hash/sort-merge join on the
    # cell struct, never a nested-loop cross product
    assert "NestedLoop" not in txt and "CartesianProduct" not in txt
    assert "__cell" in txt


def test_shard_shuffle_window_is_shard_partitioned(spark, sf_dir, registry):
    df = registry["pipeline_shard_shuffle"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the intra-shard position must come from a window PARTITIONED BY
    # the shard key — a partitionless row_number would single-thread
    # the whole corpus
    assert "windowspecdefinition(shard" in plan


def test_path_topk_is_take_ordered(spark, sf_dir, registry):
    txt = plan_of(registry["events_path_topk"].spark(spark, sf_dir))
    assert "TakeOrderedAndProject" in txt


def test_weighted_median_window_is_group_partitioned(spark, sf_dir, registry):
    df = registry["agg_weighted_median"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # cumulative weights run per flag over the bounded cents domain —
    # never a global single-partition sort of the fact table
    assert "windowspecdefinition(flag" in plan


def test_interval_overlap_reads_events_twice_only(spark, sf_dir, registry):
    txt = plan_of(registry["join_interval_overlap"].spark(spark, sf_dir))
    # one scan per join side; a regression that re-derives either side
    # per probe would multiply fact scans
    assert txt.count("events.parquet") == 2


def test_filtered_ann_pushes_lang_filter(spark, sf_dir, registry):
    txt = formatted(registry["sim_topk_filtered"].spark(spark, sf_dir))
    # the metadata predicate must reach the documents scan, not run as
    # a post-similarity filter
    assert "PushedFilters" in txt and "lang" in txt


def test_ivf_assign_auto_switch_bounds_plan_size(spark):
    """Above IVF_COLLECT_MAX_CELLS, ivf_assign must NOT collect + inline
    a centroid literal: auto-sized cell counts (semantic_cells = n/64)
    grow with the corpus, and the literal would grow the plan — and the
    driver-side build time — linearly with corpus size. The join form's
    plan is O(1) regardless of n_cells."""
    from pyspark.sql import functions as F

    from the_movies_db_spark.operators import similarity as S

    n = S.IVF_COLLECT_MAX_CELLS + 64
    corpus = spark.range(0, n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "array(CAST(id % 97 AS DOUBLE), CAST(id % 89 AS DOUBLE),"
            " CAST(id % 83 AS DOUBLE), CAST(id % 79 AS DOUBLE))"
        ).alias("embedding"),
    )
    big = S.ivf_assign(
        corpus, "vec_id", "embedding",
        n_cells=S.IVF_COLLECT_MAX_CELLS + 1, dim=4,
    )
    txt = plan_of(big)
    # no collected centroid literal in the plan, bounded plan text
    assert "named_struct" not in txt
    assert len(txt) < 50_000, f"plan unexpectedly large: {len(txt)} chars"
    # the distributed form: centroids broadcast against the corpus
    assert "Broadcast" in txt


def test_phrase_proximity_is_broadcast_pruned(spark, sf_dir, registry):
    """Postings must be pruned by the broadcast query vocabulary (one
    BroadcastHashJoin), never a positional self-join or nested loop."""
    txt = plan_of(registry["search_phrase_proximity"].spark(spark, sf_dir))
    assert "NestedLoop" not in txt and "CartesianProduct" not in txt
    assert txt.count("BroadcastHashJoin") == 1


def test_referential_integrity_single_scan_per_fact(spark, sf_dir, registry):
    """All three lineitem FK checks ride ONE lineitem scan via
    broadcast key-set joins; no shuffle joins of fact rows."""
    txt = plan_of(registry["dq_referential_integrity"].spark(spark, sf_dir))
    assert txt.count("lineitem.parquet") == 1
    assert "SortMergeJoin" not in txt
    assert txt.count("BroadcastHashJoin") == 5


def test_pareto_gini_rank_is_bucket_partitioned(spark, sf_dir, registry):
    """The ascending revenue rank must come from the two-level bucketed
    rewrite — no partitionless row-level sort window over customers."""
    df = registry["orders_pareto_gini"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(__rb" in plan  # per-bucket row_number
    # the ONLY unpartitioned window is the bucket-offset prefix (over
    # n/bucket_count rows), recognizable by its __rb ordering
    import re

    unpart = [
        w for w in re.findall(r"windowspecdefinition\([^#]*#", plan)
        if "__rb" not in w
    ]
    assert not unpart, unpart


def _assert_only_bucket_windows(df):
    """Every window in the optimized plan must either partition by the
    two-level rank bucket (__rb) or BE the tiny bucket-offset prefix
    (recognizable by its __rb ordering) — no corpus/part-grain
    single-partition window survives."""
    import re

    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(__rb" in plan
    unpart = [
        w for w in re.findall(r"windowspecdefinition\([^#]*#", plan)
        if "__rb" not in w
    ]
    assert not unpart, unpart


def test_ccnet_tercile_is_bucket_partitioned(spark, sf_dir, registry):
    """text_ccnet_buckets' tercile must come from the two-level rank —
    the round-5 verdict's #1 scale-killer (single-partition ntile at
    corpus grain) must not reappear."""
    _assert_only_bucket_windows(
        registry["text_ccnet_buckets"].spark(spark, sf_dir)
    )


def test_abc_cumulative_is_bucket_partitioned(spark, sf_dir, registry):
    """orders_abc_analysis' running revenue must come from global_cumsum
    — no unpartitioned part-grain cumulative window."""
    _assert_only_bucket_windows(
        registry["orders_abc_analysis"].spark(spark, sf_dir)
    )


def test_peak_concurrency_single_delta_scan(spark, sf_dir, registry):
    """Bucket carry-ins are a collected plan parameter, so the FINAL
    plan reads events once per delta side (2 scans of the union), has
    no nested loop, and its only window partitions by bucket."""
    txt = plan_of(registry["events_peak_concurrency"].spark(spark, sf_dir))
    assert "NestedLoop" not in txt and "CartesianProduct" not in txt
    assert txt.count("events.parquet") == 2  # one per union branch
    df = registry["events_peak_concurrency"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(bucket" in plan


def test_survivorship_no_cartesian(spark, sf_dir, registry):
    txt = plan_of(registry["pipeline_dedup_survivorship"].spark(spark, sf_dir))
    assert "CartesianProduct" not in txt and "NestedLoop" not in txt


def test_static_partition_pruning(spark, sf_dir, registry):
    """The filtered read of the partitioned-by-type layout must carry
    the literal filter in PartitionFilters — one directory scanned."""
    txt = plan_of(registry["io_partition_pruned_scan"].spark(spark, sf_dir))
    import re

    pf = re.search(r"PartitionFilters: \[[^\]]*\]", txt)
    assert pf and "event_type" in pf.group(0) and "purchase" in pf.group(0)


def test_dynamic_partition_pruning(spark, sf_dir, registry):
    """The dim-side filter must become a runtime partition filter on
    the fact scan (dynamicpruningexpression) — the star-join pruning
    path, not a full scan + join."""
    txt = plan_of(
        registry["join_dynamic_partition_pruning"].spark(spark, sf_dir)
    )
    assert "dynamicpruning" in txt.lower()


def test_curation_funnel_single_tokenize_pass(spark, sf_dir, registry):
    """The funnel's four stage yields come from ONE conditional
    aggregate over a single tokenize/gate pass — the final plan reads
    documents exactly twice (tokenize pass + the n_chars canon
    ranking; the LSH subtree is behind a localCheckpoint), never once
    per stage branch."""
    txt = plan_of(registry["pipeline_curation_funnel"].spark(spark, sf_dir))
    assert txt.count("documents.parquet") == 2, txt.count("documents.parquet")
    assert "CartesianProduct" not in txt and "NestedLoop" not in txt


def test_ndcg_rel_checkpoint_bounds_doc_scans(spark, sf_dir, registry):
    """search_ndcg_eval reads documents exactly twice in-plan (the BM25
    token stream + its corpus-stats branch); the relevance table feeds
    both the system-DCG and ideal-DCG branches through ONE lazily
    checkpointed subtree, not a re-tokenization per branch."""
    txt = plan_of(registry["search_ndcg_eval"].spark(spark, sf_dir))
    assert txt.count("documents.parquet") == 2, txt.count("documents.parquet")
    assert "CartesianProduct" not in txt


def test_dsir_single_inplan_scan(spark, sf_dir, registry):
    """pipeline_importance_dsir's weight table (vocab-bounded) is
    checkpointed: the returned plan carries ONE corpus scan (scoring);
    the counting scan runs exactly once at checkpoint materialization
    instead of once per downstream branch."""
    txt = plan_of(registry["pipeline_importance_dsir"].spark(spark, sf_dir))
    assert txt.count("documents.parquet") == 1, txt.count("documents.parquet")


def test_bigram_count_tables_checkpointed(spark, sf_dir, registry):
    txt = plan_of(registry["text_bigram_logprob"].spark(spark, sf_dir))
    assert txt.count("documents.parquet") == 1, txt.count("documents.parquet")


def test_mmr_greedy_is_single_scan_fold(spark, sf_dir, registry):
    """sim_mmr_diversify: ONE corpus scan into TakeOrdered, then the
    whole greedy iteration is a single fold expression over the
    collected pool — no joins at all in the plan (the chained-join
    first version spent seconds compiling 15 tiny operators)."""
    txt = plan_of(registry["sim_mmr_diversify"].spark(spark, sf_dir))
    # 2 scans: the 1-row query-vector branch (broadcast to the
    # candidate scan — the standard ANN shape) + the candidate scan
    assert txt.count("embeddings.parquet") == 2
    assert "CartesianProduct" not in txt and "SortMergeJoin" not in txt
    # the only join is the benign 1-row broadcast of the query vector
    assert txt.count("BroadcastNestedLoopJoin") <= 1


def test_elasticity_broadcasts_dims(spark, sf_dir, registry):
    """orders_price_elasticity: one lineitem scan, part broadcast —
    no shuffle join of fact rows against the part dim."""
    txt = plan_of(registry["orders_price_elasticity"].spark(spark, sf_dir))
    assert txt.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in txt


def test_profile_single_scan_with_expand(spark, sf_dir, registry):
    """dq_table_profile computes all 24 aggregates in one scan; the
    exact multi-distinct compiles to the Expand plan (the documented
    trade — swap to approx_count_distinct to drop it at scale)."""
    txt = plan_of(registry["dq_table_profile"].spark(spark, sf_dir))
    assert txt.count("orders.parquet") == 1
    assert "Expand" in txt


def test_embedding_drift_is_one_aggregation(spark, sf_dir, registry):
    """sim_embedding_drift: one embeddings scan into a 64-group
    aggregation — no joins at all."""
    txt = plan_of(registry["sim_embedding_drift"].spark(spark, sf_dir))
    assert txt.count("embeddings.parquet") == 1
    assert "Join" not in txt


def test_rules_confidence_checkpoint_bounds_fact_scans(spark, sf_dir, registry):
    """basket_rules_confidence: the direction-flip union references the
    brand-pair aggregate from two branches — the lazy checkpoint of the
    |brands|²-bounded frame must collapse the fact lineage so the
    returned plan re-reads lineitem zero times (one scan happens inside
    the checkpoint materialization)."""
    txt = plan_of(registry["basket_rules_confidence"].spark(spark, sf_dir))
    assert txt.count("lineitem.parquet") == 0


def test_markov_stationary_iterates_at_matrix_grain(spark, sf_dir, registry):
    """events_markov_stationary: the transition matrix is checkpointed,
    so the four power-iteration joins run over the bounded matrix with
    no events re-scan in the returned plan."""
    txt = plan_of(registry["events_markov_stationary"].spark(spark, sf_dir))
    assert txt.count("events.parquet") == 0


def test_bucketed_join_scan_is_shuffle_free(spark, sf_dir, registry):
    """io_bucketed_join_scan: the fact-fact join itself must read
    co-located buckets — no Exchange below the join (the final
    aggregation's exchange is allowed and appears ABOVE it)."""
    from the_movies_db_spark.operators.joins import has_shuffle
    from the_movies_db_spark.queries.surface_extra import _bucketed_join

    j = _bucketed_join(spark, sf_dir)
    assert not has_shuffle(j)
    txt = plan_of(j)
    assert "SortMergeJoin" in txt


def test_session4_checkpoints_bound_fact_scans(spark, sf_dir, registry):
    """Session-4 multi-consumer aggregates are lazily checkpointed, so
    each returned plan re-reads its fact zero times (KN's two token
    streams both collapse; spell's vocab, Theil's customer frame, and
    the link-prediction edge list feed all their branches from the
    checkpoint)."""
    for name, tbl, want in [
        ("search_spell_symspell", "documents", 0),
        ("text_kneser_ney_continuation", "documents", 0),
        ("agg_theil_index", "orders", 0),
        ("graph_link_jaccard", "lineitem", 0),
    ]:
        txt = plan_of(registry[name].spark(spark, sf_dir))
        assert txt.count(f"{tbl}.parquet") == want, name


def test_aqe_splits_skewed_join(spark, tmp_path):
    """AQE skew-join handling, pinned end to end: a join keyed 90% on
    one hot value must show skew=true in the FINAL adaptive plan —
    i.e. the runtime actually split the hot partition instead of
    letting one task carry 90% of the shuffle. This is the automatic
    complement to the manual salted join (operators/joins.py): AQE
    handles skew discovered at runtime, salting handles skew you know
    about at plan time."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    left_p = str(tmp_path / "skew_left")
    right_p = str(tmp_path / "skew_right")
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("payload"),
        ).write.mode("overwrite").parquet(left_p)
        # right side unique-keyed: the skew lives entirely in the
        # LEFT shuffle partition (hot key 0), and the join output
        # stays linear in the left size.
        spark.range(0, 200_001).select(
            F.col("id").alias("k"), F.col("id").alias("r")
        ).write.mode("overwrite").parquet(right_p)
        j = spark.read.parquet(left_p).join(
            spark.read.parquet(right_p), "k"
        )
        n = j.count()
        assert n > 0
        # trigger + inspect the FINAL (post-execution) adaptive plan
        j.collect()
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, (
            "AQE did not split the skewed partition:\n" + final[:2000]
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_coverage_curve_ranks_only_post_limit(spark, sf_dir, registry):
    """text_coverage_curve (round-7 weak item): the head cut must be
    orderBy().limit() -> TakeOrderedAndProject, with the lone rank
    window consuming the <=30-row limited stream — never a
    single-partition row_number over the whole vocabulary, and never a
    sum() OVER () total (the total is a 1-row aggregate)."""
    txt = plan_of(registry["text_coverage_curve"].spark(spark, sf_dir))
    assert "TakeOrderedAndProject" in txt
    wins = [
        ln for ln in txt.splitlines() if "windowspecdefinition" in ln
    ]
    assert len(wins) == 1, wins
    # parents print above children: the window sits ON TOP of the
    # TakeOrdered limit, i.e. it ranks the post-limit rows only
    assert txt.index("Window") < txt.index("TakeOrderedAndProject")


def test_spell_panel_is_take_ordered(spark, sf_dir, registry):
    """search_spell_symspell (round-7 weak item): the query panel must
    come from orderBy().limit() -> TakeOrderedAndProject; the only
    remaining window is the final suggestion rank, partitioned by
    query_term (bounded groups), never an unpartitioned full-vocab
    rank."""
    txt = plan_of(registry["search_spell_symspell"].spark(spark, sf_dir))
    assert "TakeOrderedAndProject" in txt
    wins = [
        ln for ln in txt.splitlines() if "windowspecdefinition" in ln
    ]
    assert len(wins) == 1, wins
    assert "query_term#" in wins[0]
