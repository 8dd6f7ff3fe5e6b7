"""Semantics and invariants for the training-data curation queries
(llm_pipeline.py). The oracle sweep verifies values against DuckDB;
these tests pin the *semantics* on hand-built corpora with known
answers, plus scale-relevant invariants on the smoke SF."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from the_movies_db_spark.queries import llm_pipeline as P

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tiny_docs(spark, monkeypatch):
    """Corpus where doc 0 (the benchmark slice: 0 % 97 == 0) shares a
    4-gram with doc 1 but not doc 2; doc 97 is also benchmark."""
    rows = [
        (0, "alpha beta gamma delta epsilon", "en", "src0"),
        (1, "zz alpha beta gamma delta yy", "en", "src0"),  # shares 4-gram
        (2, "one two three four five six", "en", "src1"),  # disjoint
        (97, "seven eight nine ten eleven", "en", "src1"),  # benchmark, no dup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    monkeypatch.setattr(P, "load_table", lambda s, d, t: df)
    monkeypatch.setattr(P, "spread", lambda df_: df_)
    return df


def test_decontaminate_flags_only_overlapping_nonbenchmark(spark, tiny_docs):
    out = {r.doc_id: r.n_contaminated_grams
           for r in P.pipeline_decontaminate(spark, SF).collect()}
    assert out == {1: 1}  # only "alpha beta gamma delta" is shared


def test_pii_redact_counts_and_placeholders(spark, tiny_docs):
    rows = {r.doc_id: r for r in P.pipeline_pii_redact(spark, SF).collect()}
    assert all(r.n_emails == 1 and r.n_ips == 1 for r in rows.values())
    # placeholder text is shorter than the seeded PII it replaces
    assert all(len(r.redacted_md5) == 32 for r in rows.values())


def test_stratified_sampling_deterministic_and_bounded(spark, tiny_docs):
    a = {r.lang: r for r in P.pipeline_sample_stratified(spark, SF).collect()}
    b = {r.lang: r for r in P.pipeline_sample_stratified(spark, SF).collect()}
    for lang, r in a.items():
        assert 0 <= r.n_sampled <= r.n_total
        # deterministic: identical across runs (hash-based, no RNG)
        assert b[lang].n_sampled == r.n_sampled


def test_pack_sequences_conserves_tokens_and_starts_at_zero(spark):
    out = P.pipeline_pack_sequences(spark, SF).collect()
    assert out, "packing produced no packs"
    assert min(r.pack_id for r in out) == 0
    total_packed = sum(r.pack_tokens for r in out)
    from the_movies_db_spark.io import load_table
    from the_movies_db_spark.operators import text as T
    d = load_table(spark, SF, "documents")
    total = d.select(F.sum(T.regex_token_count("text")).alias("s")).collect()[0].s
    assert total_packed == total  # concat-and-chunk loses no tokens
    # per-shard pack ids are contiguous 0..max (no empty packs)
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pack_id)
    for ids in by_shard.values():
        assert sorted(ids) == list(range(max(ids) + 1))


def test_domain_mix_shares_sum_to_one_and_weights_capped(spark):
    out = P.pipeline_domain_mix(spark, SF).collect()
    assert abs(sum(r.share for r in out) - 1.0) < 1e-3
    assert all(0 < r.sample_weight <= 1.0 for r in out)
    # under-represented domains (share below uniform) keep weight 1.0
    uniform = 1.0 / len(out)
    for r in out:
        if r.share <= uniform * 0.99:
            assert r.sample_weight == 1.0
