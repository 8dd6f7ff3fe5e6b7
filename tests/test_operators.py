"""Unit tests for dedup / text / similarity / multimodal operators on
hand-built inputs with known answers (oracle queries cover the full
pipelines; these pin the operator semantics themselves)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from the_movies_db_spark.operators import dedup as D
from the_movies_db_spark.operators import multimodal as M
from the_movies_db_spark.operators import similarity as S
from the_movies_db_spark.operators import text as T

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
    (3, "completely different words appear in this one here"),
    (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_and_content_hash(spark, docs):
    assert D.exact_dedup(docs.select("text")).count() == 3
    groups = {r.canonical_id: r.n_copies for r in
              D.content_hash_groups(docs, "doc_id", "text").collect()}
    assert groups[1] == 2  # docs 1 and 4 collapse; canonical = min id
    assert groups[2] == 1 and groups[3] == 1


def test_minhash_lsh_finds_near_dup(spark, docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             D.minhash_lsh_dedup_pairs(docs, "doc_id", "text", threshold=0.2).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in pairs and 0.5 < pairs[(1, 2)] < 1.0  # near dup
    assert not any(3 in p for p in pairs)  # unrelated doc never pairs


def test_ngram_jaccard_matches_minhash_verification(spark, docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             D.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.2).collect()}
    assert pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs


def test_simhash_identical_for_dup_and_close_for_near_dup(spark, docs):
    sigs = {r.doc_id: r.sig for r in
            docs.select("doc_id", D.simhash32("text").alias("sig")).collect()}
    assert sigs[1] == sigs[4]
    assert 0 <= sigs[1] < 2**32
    ham12 = bin(sigs[1] ^ sigs[2]).count("1")
    ham13 = bin(sigs[1] ^ sigs[3]).count("1")
    assert ham12 < ham13  # near-dup closer than unrelated


def test_language_id_and_quality(spark):
    rows = [
        (1, "the cat sat on the mat and looked to the dog for a while"),
        (2, "der hund und die katze sind auf der straße zu hause für immer"),
        (3, "xyzzy plugh qwop zzz"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r for r in df.select(
        "id", T.language_id("text").alias("lang"),
        F.round(T.quality_score("text"), 2).alias("q")).collect()}
    assert out[1].lang == "en"
    assert out[2].lang == "de"
    assert out[3].lang == "und"
    assert out[1].q == 1.0
    assert out[3].q < 1.0  # no stopwords → loses that component


def test_shingles_and_fingerprints(spark):
    df = spark.createDataFrame([(1, "a b c d")], "id long, text string")
    sh = df.select(T.word_shingles(T.tokens("text"), 3).alias("s")).first().s
    assert sh == ["a b c", "b c d"]
    fp = df.select(T.fingerprint_md5("text").alias("f"),
                   T.minhash_fingerprint("text").alias("m")).first()
    assert len(fp.f) == 32 and len(fp.m) == 32


def test_cosine_topk_exact(spark):
    vecs = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [1.0, 0.01])]
    df = spark.createDataFrame(vecs, "vec_id long, v array<double>")
    out = S.cosine_topk(df, df.filter("vec_id = 0"), "vec_id", "v", k=2).collect()
    ranked = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert ranked == [3, 1]  # by cosine to (1,0): vec3 > vec1 > vec2


def test_lsh_bucket_deterministic_and_self_consistent(spark):
    vecs = [(i, [float((i * 7 + d) % 5 - 2) for d in range(8)]) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, v array<double>")
    sig = S.hyperplane_signature(F.col("v"), 4, 8)
    a = df.select("vec_id", sig.alias("s")).collect()
    b = df.select("vec_id", sig.alias("s")).collect()
    assert {r.vec_id: r.s for r in a} == {r.vec_id: r.s for r in b}
    assert all(len(r.s) == 4 and set(r.s) <= {"0", "1"} for r in a)


def test_multimodal_plumbing(spark, docs):
    blobs = M.text_as_binary(docs, "text")
    meta = M.attach_media(blobs, "content", "text/plain")
    r = meta.select("media.*").first()
    assert r.mime == "text/plain" and r.n_bytes > 0 and len(r.checksum) == 32
    feats = M.decode_image_batch(blobs, "doc_id", "content", fake=True)
    rows = feats.collect()
    assert len(rows) == 4
    assert all(r.width >= 64 and 0 <= r.mean_intensity <= 1 for r in rows)
    with pytest.raises(NotImplementedError):
        M.decode_image_batch(blobs, "doc_id", "content").collect()
    frames = M.sample_frames(blobs, "doc_id", "content", max_frames=4)
    per_doc = frames.groupBy("id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in per_doc)


def test_ivf_assign_cells(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assigned = S.ivf_assign(df, "vec_id", "embedding", n_cells=4).collect()
    assert len(assigned) == 40
    cells = {r.vec_id: r.cell for r in assigned}
    assert set(cells.values()) <= {0, 1, 2, 3}
    # a centroid's own vector is distance 0 from itself -> its own cell
    for cid in range(4):
        assert cells[cid] == cid


def test_ivf_topk_self_cell(spark):
    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 2)
    out = S.cosine_topk_ivf(df, q, "vec_id", "embedding", k=3, n_cells=4).collect()
    assert {r.query_id for r in out} <= {0, 1}
    for r in out:
        assert r.query_id != r.neighbor_id and 1 <= r.rank <= 3


def test_resize_checksum_matches_fake_resizer(spark, docs):
    import hashlib

    d = M.text_as_binary(docs, "text")
    out = {r.id: r for r in
           M.resize_image_batch(d, "doc_id", "content", 32, 32).collect()}
    blob = DOCS[0][1].encode()
    assert out[1].orig_bytes == len(blob)
    assert out[1].resized_checksum == hashlib.md5(blob + b"@32x32").hexdigest()


def test_audio_features_fake(spark, docs):
    d = M.text_as_binary(docs, "text")
    out = M.audio_features_batch(d, "doc_id", "content", fake=True).collect()
    assert len(out) == 4
    for r in out:
        assert r.sample_rate in (16000, 44100)
        assert r.duration_s == round(r.n_samples / r.sample_rate, 6)


def test_connected_components(spark):
    # two components {1,2,3,7} (chain + branch) and {5,6}; 9-9 self-free
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 7), (5, 6)], "id_a long, id_b long"
    )
    got = {r.id: r.cluster_id for r in D.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 5: 5, 6: 5}


def test_embedding_lsh_pairs_subset_of_bruteforce(spark):
    """Banded-LSH near-dup pairs must be a subset of the brute-force
    baseline with identical cosines, and its physical plan must be a
    hash join on band buckets, never an all-pairs join."""
    from the_movies_db_spark.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    brute = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in D.embedding_near_dup_pairs(
            e, "vec_id", "embedding", threshold=0.3
        ).collect()
    }
    lsh_df = D.embedding_near_dup_pairs_lsh(
        e, "vec_id", "embedding", threshold=0.3, num_bands=4, planes_per_band=4
    )
    lsh = {(r.id_a, r.id_b): r.cosine_sim for r in lsh_df.collect()}
    assert set(lsh) <= set(brute)
    assert all(brute[p] == c for p, c in lsh.items())
    assert len(lsh) > 0  # recall sanity: some collisions at this threshold
    plan = lsh_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_multiblock_recall_exact_for_hamming_le_3(spark):
    """Pigeonhole guarantee: with 4 disjoint 8-bit blocks, every pair at
    Hamming distance ≤ 3 collides in ≥1 block — compare against the
    brute-force all-pairs distance on a real corpus."""
    from the_movies_db_spark.io import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    sigs = D.with_simhash32(d.select("doc_id", "text"), "text").select("doc_id", "simhash")
    a, b = sigs.alias("a"), sigs.alias("b")
    brute = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    blocked = {
        (r.id_a, r.id_b)
        for r in D.simhash_pairs(d, "doc_id", "text", max_hamming=3, num_blocks=4).collect()
    }
    assert brute  # corpus has close pairs, so the assertion is non-vacuous
    assert blocked == brute


def test_ngram_jaccard_df_cap_drops_hot_shingles(spark):
    """A shingle present in every document must not contribute to the
    posting-list join when max_df caps it; rare-shingle pairs survive."""
    rows = [
        (1, "aaa bbb ccc hot hot hot"),
        (2, "aaa bbb ccc hot hot hot"),  # near-dup of 1 via 'aaa bbb ccc'
        (3, "xxx yyy zzz hot hot hot"),
        (4, "ppp qqq rrr hot hot hot"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # uncapped: the 'hot hot hot' shingle links every pair
    uncapped = D.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.01)
    assert uncapped.count() == 6
    # capped at df<=2: only the genuinely shared rare shingles remain
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.01, max_df=2
        ).collect()
    }
    assert set(capped) == {(1, 2)}
    assert capped[(1, 2)] == 1.0  # identical rare-shingle sets


def test_quantized_topk_matches_bruteforce_closely(spark):
    """int8 quantize-then-rerank: re-ranked cosines are EXACT (same
    rounded float as brute force) and recall vs exact top-k is high —
    quantization only perturbs the shortlist, not the final scores."""
    from the_movies_db_spark.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in S.cosine_topk(e, q, "vec_id", "embedding", k=5).collect()
    }
    quant = {
        (r.query_id, r.neighbor_id): r.cosine_sim
        for r in S.cosine_topk_quantized(
            e, q, "vec_id", "embedding", k=5, shortlist_factor=4
        ).collect()
    }
    common = set(exact) & set(quant)
    assert len(common) >= 0.6 * len(exact)  # recall floor
    assert all(exact[p] == quant[p] for p in common)  # re-rank is exact


def test_winnowing_guarantee_shared_substring_shares_fingerprint(spark):
    """Winnowing guarantee: documents sharing a token run of length
    >= w + k - 1 (here 8) must share at least one fingerprint."""
    from the_movies_db_spark.queries import load_all  # registry import side effect

    from the_movies_db_spark.queries.pipeline_extra import text_winnow  # noqa: F401

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"{shared} unique tail one two"),
        (2, f"totally different head words {shared}"),
        (3, "no overlap with anything here at all whatsoever"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # run the same expression pipeline as the registered query, but on
    # a hand-built corpus, returning the raw fingerprint sets
    import the_movies_db_spark.queries.pipeline_extra as P
    from pyspark.sql import functions as F

    t = F.split(F.col("text"), r"\s+")
    n_grams = F.greatest(F.size(t) - F.lit(P._K - 1), F.lit(1))
    gram = lambda i: F.concat_ws(" ", F.slice(t, i, P._K))  # noqa: E731
    hs = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.conv(F.substring(F.md5(gram(i)), 1, 8), 16, 10).cast("bigint"),
    )
    staged = docs.select("doc_id", hs.alias("hs"))
    n_wins = F.greatest(F.size("hs") - F.lit(P._W - 1), F.lit(1))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_wins), lambda i: F.array_min(F.slice("hs", i, P._W))
        )
    )
    sets = {r.doc_id: set(r.fps) for r in staged.select("doc_id", fps.alias("fps")).collect()}
    assert sets[1] & sets[2]          # shared run ⇒ shared fingerprint
    assert not (sets[1] & sets[3])    # disjoint text ⇒ disjoint prints


# ---------------------------------------------------------------- bloom

def test_bloom_anti_join_exact(spark):
    from the_movies_db_spark.operators import bloom as B

    corpus = spark.createDataFrame(
        [(i, f"key-{i % 40}") for i in range(400)], "row_id long, k string"
    )
    contam = spark.createDataFrame(
        [(f"key-{i}",) for i in (3, 7, 11, 39)] + [("never-seen",)], "k string"
    )
    got = B.bloom_anti_join(corpus, contam, "k")
    want = corpus.join(contam.select("k").distinct(), "k", "left_anti")
    assert sorted(r.row_id for r in got.collect()) == sorted(
        r.row_id for r in want.collect()
    )
    # tiny m forces false positives through the verify join: still exact
    got_fp = B.bloom_anti_join(corpus, contam, "k", num_bits=64, num_hashes=2)
    assert sorted(r.row_id for r in got_fp.collect()) == sorted(
        r.row_id for r in want.collect()
    )


def test_bloom_empty_contamination(spark):
    from the_movies_db_spark.operators import bloom as B

    corpus = spark.createDataFrame([(1, "a"), (2, "b")], "row_id long, k string")
    contam = corpus.filter("row_id < 0").select("k")
    assert B.bloom_anti_join(corpus, contam, "k").count() == 2


def test_bloom_final_join_is_broadcast(spark):
    from the_movies_db_spark.operators import bloom as B

    corpus = spark.createDataFrame(
        [(i, f"key-{i}") for i in range(100)], "row_id long, k string"
    )
    contam = spark.createDataFrame([("key-5",), ("key-6",)], "k string")
    plan = B.bloom_anti_join(corpus, contam, "k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_pq_topk_full_shortlist_equals_bruteforce(spark):
    """PQ ADC only selects the shortlist; with a shortlist wide enough
    to cover the whole corpus the re-ranked result must EQUAL brute
    force exactly — pins that quantization perturbs candidate choice,
    never the final scores, and that codes/LUT lookups are consistent."""
    from the_movies_db_spark.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    n = e.count()
    exact = {
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
        for r in S.cosine_topk(e, q, "vec_id", "embedding", k=5).collect()
    }
    pq_full = {
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
        for r in S.cosine_topk_pq(
            e, q, "vec_id", "embedding", k=5, shortlist_factor=n, dim=64
        ).collect()
    }
    assert pq_full == exact


def test_pq_codes_identify_seed_centroids(spark):
    """Every seed vector (id < n_cent) must encode to its own centroid
    id in every subspace — distance 0 beats all other centroids."""
    from the_movies_db_spark.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 2)
    out = S.cosine_topk_pq(e, q, "vec_id", "embedding", k=3, dim=64)
    # self-exclusion: a query never returns itself even though its ADC
    # distance to its own codes is 0
    assert all(r.query_id != r.neighbor_id for r in out.collect())


def test_pq_lut_is_keyed_by_centroid_id_not_position(spark):
    """Corpus whose ids start at 10: the seed rule (id < n_cent) yields
    centroids with ids 10..15 — gappy, non-zero-based. A positional LUT
    (element_at(array, code+1)) would silently mis-index here; the
    cid-keyed map must still reproduce brute force exactly under a full
    shortlist."""
    from the_movies_db_spark.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings").filter(
        F.col("vec_id") >= 10
    )
    q = e.filter(F.col("vec_id") < 13)
    n = e.count()
    exact = {
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
        for r in S.cosine_topk(e, q, "vec_id", "embedding", k=5).collect()
    }
    pq_full = {
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
        for r in S.cosine_topk_pq(
            e, q, "vec_id", "embedding", k=5, shortlist_factor=n, dim=64
        ).collect()
    }
    assert pq_full == exact


def test_ivfpq_single_cell_full_shortlist_equals_bruteforce(spark):
    """With one IVF cell (no pruning) and a corpus-wide shortlist the
    composed IVF×PQ index must degrade to exact brute force — pins that
    the composition only PRUNES candidates, never alters scores."""
    from the_movies_db_spark.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    n = e.count()
    exact = {
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
        for r in S.cosine_topk(e, q, "vec_id", "embedding", k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
        for r in S.cosine_topk_ivfpq(
            e, q, "vec_id", "embedding",
            k=5, shortlist_factor=n, n_cells=1, dim=64,
        ).collect()
    }
    assert got == exact


def test_ivfpq_candidates_restricted_to_query_cell(spark):
    """Every neighbor an IVF×PQ query returns must share the query's
    coarse cell — the scan never crosses cell boundaries (nprobe=1)."""
    from the_movies_db_spark.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    cells = {
        r.vec_id: r.cell
        for r in S.ivf_assign(e, "vec_id", "embedding", 8, dim=64).collect()
    }
    out = S.cosine_topk_ivfpq(
        e, q, "vec_id", "embedding", k=5, n_cells=8, dim=64
    ).collect()
    assert out, "expected at least one neighbor"
    assert all(cells[r.query_id] == cells[r.neighbor_id] for r in out)


def test_containment_catches_doc_in_doc_where_jaccard_misses(spark):
    """A short doc quoted inside a much longer one: containment = 1.0
    (every shingle of the short doc appears in the long one) while
    Jaccard is diluted below any useful threshold by the long doc's
    extra shingles."""
    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"word{i} word{i+1} pad{i}" for i in range(0, 60, 2))
    df = spark.createDataFrame(
        [(1, short), (2, short + " " + filler)], "doc_id long, text string"
    )
    cont = D.containment_pairs(df, "doc_id", "text", threshold_ppm=900000).collect()
    assert len(cont) == 1 and cont[0].containment_ppm == 1000000
    jac = D.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    assert jac == []


def test_multiprobe_lsh_recall_at_least_single_bucket(spark):
    """Hamming-1 probing can only ADD candidates: multiprobe recall vs
    exact brute force must be >= the single-bucket LSH recall, and the
    probe set must contain the original signature plus num_planes
    distinct 1-bit variants."""
    from the_movies_db_spark.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(e, q, "vec_id", "embedding", k=5, dim=64).collect()
    }
    single = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk_lsh(
            e, q, "vec_id", "embedding", k=5, num_planes=8, dim=64
        ).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk_lsh_multiprobe(
            e, q, "vec_id", "embedding", k=5, num_planes=8, dim=64
        ).collect()
    }
    assert len(multi & exact) >= len(single & exact)

    probes = e.limit(1).select(
        S.hamming1_probes(
            S.hyperplane_signature("embedding", 8, 64), 8
        ).alias("p")
    ).collect()[0].p
    assert len(probes) == 9 and len(set(probes)) == 9
    orig = probes[0]
    assert all(
        sum(a != b for a, b in zip(orig, v)) == 1 for v in probes[1:]
    )


def test_ivfpq_all_cells_probed_full_shortlist_equals_bruteforce(spark):
    """nprobe = n_cells probes every cell — with a corpus-wide
    shortlist the composed index must again equal exact brute force
    (the recall dial reaches 1.0 at full probe width)."""
    from the_movies_db_spark.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    n = e.count()
    exact = {
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
        for r in S.cosine_topk(e, q, "vec_id", "embedding", k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
        for r in S.cosine_topk_ivfpq(
            e, q, "vec_id", "embedding",
            k=5, shortlist_factor=n, n_cells=4, nprobe=4, dim=64,
        ).collect()
    }
    assert got == exact


def test_ivf_kmeans_deterministic_and_cell_consistent(spark):
    """Seeded KMeans IVF: two runs return the same result set, every
    neighbor shares the query's trained cell, and each query yields at
    most k ranked neighbors."""
    from the_movies_db_spark.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    run = lambda: {  # noqa: E731
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
        for r in S.cosine_topk_ivf_kmeans(
            e, q, "vec_id", "embedding", k=5, n_cells=4, dim=64
        ).collect()
    }
    a, b = run(), run()
    assert a == b and a
    per_q = {}
    for qid, nid, _, rank in a:
        per_q.setdefault(qid, []).append(rank)
    assert all(sorted(rs) == list(range(1, len(rs) + 1)) and len(rs) <= 5
               for rs in per_q.values())


def test_matryoshka_full_shortlist_equals_bruteforce(spark):
    """The prefix pass only selects the shortlist; with shortlist >=
    corpus the full-dim re-rank must EQUAL brute force exactly — pins
    that dimension truncation perturbs candidate choice, never final
    scores, and that the re-rank-by-id join is lossless."""
    from the_movies_db_spark.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    n = e.count()
    exact = {
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
        for r in S.cosine_topk(e, q, "vec_id", "embedding", k=5, dim=64).collect()
    }
    mat_full = {
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
        for r in S.cosine_topk_matryoshka(
            e, q, "vec_id", "embedding", k=5, prefix_dim=16, shortlist=n, dim=64
        ).collect()
    }
    assert mat_full == exact


def test_matryoshka_prefix_recall_reasonable(spark):
    """With a 50-deep shortlist over 500 vectors the prefix pass must
    recover a meaningful fraction of the true top-5. The synthetic
    embeddings are iid (NOT Matryoshka-trained), so a 16/64 prefix
    carries only ~1/4 of the signal — measured recall is 5/15 here,
    and 10/15 at prefix 32; the floor guards the plumbing. Real MRL
    embeddings concentrate signal in leading dims and do far better."""
    from the_movies_db_spark.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(e, q, "vec_id", "embedding", k=5, dim=64).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk_matryoshka(
            e, q, "vec_id", "embedding", k=5, prefix_dim=16, shortlist=50, dim=64
        ).collect()
    }
    assert len(approx & exact) >= int(0.3 * len(exact))


def test_ivf_assign_join_form_matches_collected_form(spark):
    """The broadcast-join assignment (auto above IVF_COLLECT_MAX_CELLS)
    must produce cell-for-cell identical output to the collected-literal
    form — same rounded distance, same (d, cid) tie-break."""
    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lit_form = {
        r.vec_id: r.cell
        for r in S.ivf_assign(
            df, "vec_id", "embedding", n_cells=8, collect_centroids=True
        ).collect()
    }
    join_form = {
        r.vec_id: r.cell
        for r in S.ivf_assign(
            df, "vec_id", "embedding", n_cells=8, dim=8,
            collect_centroids=False,
        ).collect()
    }
    assert lit_form == join_form


def test_ivf_probe_cells_join_form_matches_collected_form(spark):
    """Both probe-cell paths must emit the same (id, cell) probe sets in
    the same distance order semantics (set equality — explode order is
    not part of the contract)."""
    import random

    rng = random.Random(13)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    lit_form = {
        (r.vec_id, r.cell)
        for r in S.ivf_probe_cells(
            df, "vec_id", "embedding", n_cells=8, nprobe=3,
            collect_centroids=True,
        ).collect()
    }
    join_form = {
        (r.vec_id, r.cell)
        for r in S.ivf_probe_cells(
            df, "vec_id", "embedding", n_cells=8, nprobe=3, dim=8,
            collect_centroids=False,
        ).collect()
    }
    assert lit_form == join_form


def test_ivf_kmeans_cells_track_corpus(spark):
    """cosine_topk_ivf_kmeans with n_cells=None must size cells from the
    corpus (semantic_cells) and still return valid per-query top-k."""
    import random

    rng = random.Random(17)
    n = 400
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 5")
    out = S.cosine_topk_ivf_kmeans(
        df, q, "vec_id", "embedding", k=3, dim=8
    ).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
        assert r.query_id != r.neighbor_id
    assert set(per_q) <= set(range(5)) and len(per_q) >= 1
    assert all(len(v) <= 3 for v in per_q.values())
    assert S.semantic_cells(n) == max(32, n // 64)


def test_kmeans_integer_is_partitioning_invariant(spark):
    """The whole point of integer means: assignments must be
    bit-identical no matter how the corpus is partitioned (float
    accumulation order would diverge here)."""
    import random

    rng = random.Random(23)
    rows = [
        (i, [rng.uniform(-0.6, 0.6) for _ in range(8)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    one = {
        r.vec_id: r.cell
        for r in S.kmeans_integer_assign(
            df.coalesce(1), "vec_id", "embedding", k=4, iters=2, dim=8
        ).collect()
    }
    many = {
        r.vec_id: r.cell
        for r in S.kmeans_integer_assign(
            df.repartition(13), "vec_id", "embedding", k=4, iters=2, dim=8
        ).collect()
    }
    assert one == many
    assert set(one.values()) <= {0, 1, 2, 3}


def test_kmeans_integer_iterations_refine_seed_assignment(spark):
    """2 Lloyd iterations must actually train: with seeds drawn from a
    single region, iteration moves centroids toward the true cluster
    structure and changes some assignments vs the pure seed index."""
    import random

    rng = random.Random(29)
    # two well-separated blobs; seeds (ids 0..3) all in blob A
    rows = []
    for i in range(100):
        center = 0.4 if i % 2 == 0 and i >= 8 else -0.4
        rows.append(
            (i, [center + rng.uniform(-0.05, 0.05) for _ in range(8)])
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    seed_only = {
        r.vec_id: r.cell
        for r in S.kmeans_integer_assign(
            df, "vec_id", "embedding", k=4, iters=1, dim=8
        ).collect()
    }
    trained = {
        r.vec_id: r.cell
        for r in S.kmeans_integer_assign(
            df, "vec_id", "embedding", k=4, iters=3, dim=8
        ).collect()
    }
    assert seed_only != trained
