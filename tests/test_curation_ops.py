"""Semantics for the round-2 curation additions: SemDeDup-shaped
semantic dedup, Gopher-style repetition metrics, and the composite
quality gate. The oracle sweep pins cross-engine values; these pin
known answers on hand-built inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from the_movies_db_spark.operators import similarity as S
from the_movies_db_spark.queries import llm_pipeline as P
from the_movies_db_spark.queries import text_queries as TQ

SF = "/root/testdata/sf0.001"


def test_semantic_dedup_drops_near_duplicate_within_cell(spark):
    # centroid seeds are ids 0 and 1 (n_cells=2); vec 2 == vec 0 scaled
    # (cosine 1.0, same cell), vec 3 is orthogonal to everything.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0, 0.0]),  # duplicate of 0, cell 0
        (3, [0.0, 0.0, 1.0, 0.0]),  # no neighbor above tau
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.vec_id: r
        for r in S.semantic_dedup(
            df, "vec_id", "embedding", n_cells=2, threshold=0.9, dim=4
        ).collect()
    }
    assert set(out) == {2}
    assert out[2].keeper == 0
    assert out[2].max_sim == pytest.approx(1.0)


def test_semantic_dedup_keeper_is_always_lower_id(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = S.semantic_dedup(emb, "vec_id", "embedding", n_cells=8,
                           threshold=0.3, dim=64).collect()
    assert out, "expected some semantic duplicates at sf0.001"
    assert all(r.keeper < r.vec_id for r in out)
    # dropped set and keeper set are disjoint only per-pair, but a keeper
    # must never be reported as dropped with ITSELF as keeper
    assert all(r.keeper != r.vec_id for r in out)


def test_text_repetition_known_answers(spark, monkeypatch):
    rows = [
        (0, "a b a b a b", "en", "s"),          # fully repetitive
        (1, "one two three four five six", "en", "s"),  # no repetition
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    monkeypatch.setattr(TQ, "load_table", lambda s, d, t: df)
    out = {r.doc_id: r for r in TQ.text_repetition(spark, SF).collect()}
    # doc 0: bigrams = [ab, ba, ab, ba, ab] -> top 3 of 6 tokens covered
    assert out[0].top_bigram_frac == pytest.approx(1.0)
    # trigrams = [aba, bab, aba, bab] -> 2 of 4 duplicated
    assert out[0].dup_trigram_frac == pytest.approx(0.5)
    assert out[1].dup_trigram_frac == 0.0
    assert out[1].top_bigram_frac == pytest.approx(round(2.0 / 6, 4))


def test_quality_filter_verdicts_first_failing_rule(spark, monkeypatch):
    rows = [
        (0, "tiny doc", "en", "s"),  # 2 tokens -> too_short
        (1, "qqq www eee rrr ttt yyy uuu iii ooo ppp",
         "en", "s"),  # 10 tokens, no stopwords, awl 3 -> quality 0.5 -> kept? see below
        (2, "the the the the the the the the the the the the",
         "en", "s"),  # quality fine, dup_tri 0.9 -> repetitive
        (3, "the quick brown fox jumps over the lazy sleeping dog today",
         "en", "s"),  # clean -> ok
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    monkeypatch.setattr(P, "load_table", lambda s, d, t: df)
    out = {r.doc_id: r for r in P.pipeline_quality_filter(spark, SF).collect()}
    assert out[0].verdict == "too_short" and not out[0].keep
    # doc 1 scores 0.75 (length band + word-shape + punctuation; no
    # stopwords) -> passes the gate
    assert out[1].quality == pytest.approx(0.75) and out[1].keep
    assert out[2].verdict == "repetitive" and not out[2].keep
    assert out[3].verdict == "ok" and out[3].keep
    # keep is true iff verdict is 'ok'
    assert all((r.verdict == "ok") == r.keep for r in out.values())


def test_incremental_pairs_match_full_pipeline_cross_pairs(spark):
    from pyspark.sql import functions as F

    from the_movies_db_spark.io import load_table
    from the_movies_db_spark.operators import dedup as D

    d = load_table(spark, SF, "documents")
    batch = d.filter(F.col("doc_id") % 10 == 7)
    corpus = d.filter(F.col("doc_id") % 10 != 7)
    inc = D.minhash_lsh_incremental_pairs(
        batch, corpus, "doc_id", "text", threshold=0.2,
        num_hashes=8, num_bands=4, shingle_n=3,
    ).collect()
    assert all(r.new_id % 10 == 7 and r.corpus_id % 10 != 7 for r in inc)
    full = D.minhash_lsh_dedup_pairs(
        d, "doc_id", "text", threshold=0.2,
        num_hashes=8, num_bands=4, shingle_n=3,
    ).collect()
    cross = {
        (r.id_a, r.id_b)
        for r in full
        if (r.id_a % 10 == 7) != (r.id_b % 10 == 7)
    }
    got = {tuple(sorted((r.new_id, r.corpus_id))) for r in inc}
    assert got == cross
