"""Deduplication operators: exact → fuzzy → semantic.

Design for 100 TB (the whole point of each shape chosen here):

- **Exact / content-hash dedup** — hash-groupBy on a 128-bit digest,
  never a full-row comparison: one shuffle keyed by digest, map-side
  partial aggregation, AQE handles hot hashes.
- **MinHash-LSH** — signatures are computed *per row as a pure
  expression* (no explode, no shuffle), then only (band, hash) pairs
  are exploded for the bucket join. Candidate generation is an
  equi-join on band hashes — O(candidates), not O(n²) — and exact
  Jaccard verification runs only on bucket collisions.
- **SimHash** — 32-bit signature per row as an expression; Hamming
  distance via xor+bit_count on collided prefixes.
- **Embedding cosine near-dup** — brute-force pairing is provided for
  verification; the scale path is the LSH bucketing in
  ``operators.similarity`` (hyperplane signatures → bucket join).

Hash choice: md5 (not xxhash64/murmur) so signatures are identical in
any engine — the DuckDB oracle replicates every pipeline here bit-for-
bit. md5 costs more CPU than xxhash64; at scale swap `_seeded_hash`
for ``F.xxhash64`` (one-line change) if cross-engine reproducibility
is not required.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from the_movies_db_spark.operators.text import tokens, word_shingles

# --- exact -----------------------------------------------------------------


def exact_dedup(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Reference P4 (`drop_duplicates`, etl.py:50,76,118,143) — full-row
    or keyed distinct. Prefer a keyed subset at scale."""
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def content_hash_groups(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Group rows by normalized-content digest; keep the minimum id as
    the canonical representative. Returns (content_hash, canonical_id,
    n_copies)."""
    from the_movies_db_spark.operators.text import fingerprint_md5

    return (
        df.select(F.col(id_col), fingerprint_md5(text_col).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --- MinHash + LSH ---------------------------------------------------------


def _seeded_hash(value: Column, seed: int) -> Column:
    """Deterministic, engine-portable seeded hash: md5 hex of
    '{seed}:{value}'. Lexicographic min over hex strings is a valid
    min-wise hash."""
    return F.md5(F.concat(F.lit(f"{seed}:"), value))


def minhash_signature_from_shingles(sh: Column, num_hashes: int = 8) -> Column:
    """Array of ``num_hashes`` min-hashes from a distinct-shingle array.

    Single pass over the shingles: one transform emits all seeded
    hashes per shingle, then an elementwise-min fold collapses them —
    each shingle is hashed exactly ``num_hashes`` times and the shingle
    array is evaluated exactly once (the naive per-seed ``array_min``
    form re-evaluates the shingle expression per seed, a num_hashes×
    work amplification in the interpreted higher-order-function path).
    """
    per_shingle = F.transform(
        sh, lambda s: F.array(*[_seeded_hash(s, i) for i in range(num_hashes)])
    )
    # 'g' sorts after every md5 hex char, so it is an identity for min.
    return F.aggregate(
        per_shingle,
        F.array_repeat(F.lit("g"), num_hashes),
        lambda acc, hs: F.zip_with(acc, hs, lambda a, b: F.least(a, b)),
    )


def minhash_signature(text: Column | str, num_hashes: int = 8, shingle_n: int = 3) -> Column:
    """Array of ``num_hashes`` min-hashes over word shingles — one
    expression, no shuffle, no UDF."""
    sh = F.array_distinct(word_shingles(tokens(text), shingle_n))
    return minhash_signature_from_shingles(sh, num_hashes)


def lsh_bands(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """Band the signature: band_j = md5(sig[j*r+1 .. j*r+r] joined).
    Returns array<string> of band hashes."""
    return F.array(
        *[
            F.md5(F.array_join(F.slice(signature, j * rows_per_band + 1, rows_per_band), "|"))
            for j in range(num_bands)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    num_bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH: signature →
    bands → explode (band_idx, band_hash) → self-equi-join. Returns
    distinct (id_a, id_b) with id_a < id_b.

    The signature is staged as its own projection so the banding
    slices reference a computed column instead of re-inlining the
    signature expression num_bands× (Catalyst's CollapseProject keeps
    multi-referenced expensive aliases in their own stage)."""
    rows = num_hashes // num_bands
    sig_df = df.select(
        F.col(id_col).alias("__id"),
        minhash_signature(text_col, num_hashes, shingle_n).alias("__sig"),
    )
    banded = sig_df.select(
        "__id",
        F.posexplode(lsh_bands(F.col("__sig"), num_bands, rows)).alias(
            "band_idx", "band_hash"
        ),
    ).localCheckpoint(eager=False)  # both self-join sides share one
    # materialization of the signature computation (the md5 fold is
    # the expensive part — it ran twice before round 9)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


def jaccard(shingles_a: Column, shingles_b: Column) -> Column:
    """Exact Jaccard over two distinct-shingle arrays."""
    inter = F.size(F.array_intersect(shingles_a, shingles_b))
    union = F.size(F.array_union(shingles_a, shingles_b))
    return inter / union


def banded_minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    num_bands: int = 4,
    shingle_n: int = 3,
    keep_sig: bool = False,
) -> DataFrame:
    """(__id, __sh, band_idx, band_hash) rows — one per (document,
    band): the banded-LSH index representation. Signatures are built by
    exploding shingles into num_hashes codegen ``min`` aggregates, not
    a per-row expression fold: higher-order functions evaluate
    interpreted, and the explode+agg shape measured ~5× faster at
    sf0.1 (one extra shuffle keyed by document id, which AQE sizes).
    min over the exploded multiset equals min over the distinct set, so
    signatures are identical; ``collect_set`` rebuilds the
    distinct-shingle payload for the exact-Jaccard verify in the same
    aggregation. At 100 TB this is the table you MATERIALIZE (written
    bucketed by band_hash) — batch dedup and incremental admission both
    join against it without recomputation."""
    from the_movies_db_spark.operators.text import shingle_explode

    rows = num_hashes // num_bands
    toks_df = df.select(
        F.col(id_col).alias("__id"), tokens(text_col).alias("__toks")
    )
    ex = shingle_explode(toks_df, "__toks", shingle_n, out_col="__s")
    sig = (
        ex.groupBy("__id")
        .agg(
            F.collect_set("__s").alias("__sh"),
            *[
                F.min(_seeded_hash(F.col("__s"), i)).alias(f"__h{i}")
                for i in range(num_hashes)
            ],
        )
        .select(
            "__id",
            "__sh",
            F.array(*[f"__h{i}" for i in range(num_hashes)]).alias("__sig"),
        )
    )
    carry = ["__id", "__sh"] + (["__sig"] if keep_sig else [])
    return sig.select(
        *carry,
        F.posexplode(lsh_bands(F.col("__sig"), num_bands, rows)).alias(
            "band_idx", "band_hash"
        ),
    )


def minhash_lsh_incremental_pairs(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 8,
    num_bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental near-dup admission: pairs between a NEW batch and
    the existing corpus only — the daily-ingest shape, where re-pairing
    the whole corpus against itself would redo O(corpus) work for an
    O(batch) question. Candidates come from the same banded equi-join
    as the batch pipeline, but the batch side is broadcast: at scale
    the corpus side is the materialized signature index
    (:func:`banded_minhash_signatures`) scanned in place, the daily
    batch's bands ship to it, and no corpus shuffle happens at all.
    Output (new_id, corpus_id, jaccard ≥ threshold)."""
    nb = banded_minhash_signatures(
        batch, id_col, text_col, num_hashes, num_bands, shingle_n
    ).select(
        F.col("__id").alias("new_id"),
        F.col("__sh").alias("__shn"),
        F.col("band_idx").alias("__bi_n"),
        F.col("band_hash").alias("__bh_n"),
    )
    cb = banded_minhash_signatures(
        corpus, id_col, text_col, num_hashes, num_bands, shingle_n
    ).select(
        F.col("__id").alias("corpus_id"),
        F.col("__sh").alias("__shc"),
        "band_idx",
        "band_hash",
    )
    pairs = F.broadcast(nb).join(
        cb,
        (F.col("__bi_n") == F.col("band_idx"))
        & (F.col("__bh_n") == F.col("band_hash")),
    ).dropDuplicates(["new_id", "corpus_id"])
    sized = pairs.select(
        "new_id",
        "corpus_id",
        F.size(F.array_intersect("__shn", "__shc")).alias("__ni"),
        (F.size("__shn") + F.size("__shc")).alias("__ntot"),
    )
    return sized.select(
        "new_id",
        "corpus_id",
        F.round(F.col("__ni") / (F.col("__ntot") - F.col("__ni")), 6).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 8,
    num_bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Full near-dup pipeline: signature → bands → bucket self-join →
    exact-Jaccard verify → pairs with jaccard ≥ threshold. Output
    (id_a, id_b, jaccard).

    The shingle arrays ride THROUGH the band explode, so the bucket
    join alone yields both sides' shingles — one self-join total,
    versus candidates + two corpus join-backs (measured 2.7× faster at
    sf0.1). Tradeoff at scale: the band shuffle carries num_bands×
    the shingle payload; if documents are huge or buckets skew hot,
    switch to ``minhash_lsh_candidates`` + join-backs, which shuffles
    ids only. Signature construction: see
    :func:`banded_minhash_signatures`."""
    banded = banded_minhash_signatures(
        df, id_col, text_col, num_hashes, num_bands, shingle_n
    )
    a = banded.select(
        F.col("__id").alias("id_a"),
        F.col("__sh").alias("__sha"),
        F.col("band_idx").alias("__bi_a"),
        F.col("band_hash").alias("__bh_a"),
    )
    b = banded.select(
        F.col("__id").alias("id_b"),
        F.col("__sh").alias("__shb"),
        "band_idx",
        "band_hash",
    )
    pairs = a.join(
        b,
        (F.col("__bi_a") == F.col("band_idx"))
        & (F.col("__bh_a") == F.col("band_hash"))
        & (F.col("id_a") < F.col("id_b")),
    ).dropDuplicates(["id_a", "id_b"])
    sized = pairs.select(
        "id_a",
        "id_b",
        F.size(F.array_intersect("__sha", "__shb")).alias("__ni"),
        (F.size("__sha") + F.size("__shb")).alias("__ntot"),
    )
    return sized.select(
        "id_a",
        "id_b",
        F.round(F.col("__ni") / (F.col("__ntot") - F.col("__ni")), 6).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def connected_components(
    pairs: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Cluster near-dup pairs into components: (id, cluster_id) where
    cluster_id is the minimum id reachable through the pair graph —
    the canonical-representative assignment that turns pairwise dedup
    output into per-document keep/drop decisions.

    Iterative min-label propagation: each round every node adopts the
    smallest label among itself and its neighbors; converges in
    O(graph diameter) rounds (near-dup clusters are shallow). Each
    round is one shuffled join + aggregate; ``localCheckpoint``
    truncates lineage so plans stay flat. At extreme scale swap in
    GraphFrames/Pregel or alternating large/small-star (the
    Kiveris et al. map-reduce CC algorithm) — same output contract.

    ``pairs`` needs columns (id_a, id_b). Output covers only ids that
    appear in at least one pair (singletons are trivially their own
    cluster)."""
    und = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    und = und.localCheckpoint(eager=True)
    labels = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nb_min = (
            und.join(labels, und.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("__nb"))
        )
        # carry the change flag WITH the new label: the convergence
        # check then scans the just-checkpointed RDD instead of
        # shuffle-joining new vs old labels (one join + exchange fewer
        # per iteration; the flag column costs nothing)
        stepped = (
            labels.join(nb_min, labels.id == nb_min.src, "left_outer")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("__nb"), F.col("cluster_id"))
                ).alias("__new"),
                (
                    F.least(
                        F.col("cluster_id"),
                        F.coalesce(F.col("__nb"), F.col("cluster_id")),
                    )
                    != F.col("cluster_id")
                ).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = stepped.filter(F.col("__chg")).limit(1).count()
        labels = stepped.select("id", F.col("__new").alias("cluster_id"))
        if changed == 0:
            break
    return labels


# --- n-gram Jaccard (explode-based exact variant) --------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via posting-list self-join: explode →
    self-join on shingle → count shared → |A∪B| from per-doc sizes.

    The self-join is O(Σ postings²) per shingle, which explodes on
    stopword-like hot shingles. ``max_df`` is the standard fix: drop
    shingles appearing in more than ``max_df`` documents BEFORE the
    join (hot shingles carry no near-dup signal — they match
    everything). Jaccard is then exact over the rare-shingle space:
    per-doc sizes are computed from the same filtered postings, so the
    measure stays internally consistent. With ``max_df`` set, the
    worst per-shingle join cost is bounded at max_df², independent of
    corpus size."""
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array_distinct(word_shingles(tokens(text_col), shingle_n))).alias(
            "shingle"
        ),
    )
    if max_df is not None:
        # anti-join against the HOT shingles (df > max_df): that set is
        # the heavy tail — orders of magnitude smaller than the rare
        # dictionary — so AQE turns this into a broadcast anti-join;
        # never broadcast the rare side, which is ~the whole dictionary.
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    # three consumers (sizes + both self-join sides) would otherwise
    # each re-run the shingle explosion — 8 documents scans in the
    # pre-round-9 plans. One lazy materialization of the (df-capped)
    # postings beats three recomputes of the regex explosion (the
    # round-8 bitmap word-table precedent for >1-branch fact tables).
    sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        shared.join(sa, F.col("id_a") == F.col("sa.__id"))
        .join(sb, F.col("id_b") == F.col("sb.__id"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_shared")
                / (F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- SimHash ---------------------------------------------------------------


def simhash_votes(text: Column | str) -> Column:
    """Per-bit ±1 vote sums over distinct whitespace tokens, as ONE
    pass: each token is md5-hashed once and contributes a 32-element
    ±1 vector folded into an array accumulator (the naive per-bit
    ``aggregate`` form re-hashes every token 32×). Returns
    array<bigint>[32].

    Bit extraction uses integer DIV/%2 arithmetic (not shifts) so the
    identical formula runs on any SQL engine for verification."""
    toks = F.array_distinct(tokens(text))
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
    )
    return F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("bigint"), 32),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    (F.floor(h / F.lit(2**b)).cast("bigint") % 2 * 2 - 1)
                    for b in range(32)
                ]
            ),
            lambda a, v: a + v,
        ),
    )


def signature_from_votes(votes: Column) -> Column:
    """Collapse the 32 vote sums to the signature integer: bit b set
    iff vote b is positive. Call on a *staged* votes column (one
    projection computing votes, the next reading it 32×) so the vote
    fold is evaluated once per row."""
    return sum(
        (
            F.when(F.element_at(votes, b + 1) > 0, F.lit(2**b)).otherwise(F.lit(0))
            for b in range(32)
        ),
        start=F.lit(0),
    ).cast("bigint")


def with_simhash32(df: DataFrame, text_col: str, out_col: str = "simhash") -> DataFrame:
    """Append a 32-bit SimHash column: votes staged in their own
    projection, signature derived from the staged column."""
    staged = df.withColumn("__simhash_votes", simhash_votes(text_col))
    return staged.withColumn(
        out_col, signature_from_votes(F.col("__simhash_votes"))
    ).drop("__simhash_votes")


def simhash32(text: Column | str) -> Column:
    """32-bit SimHash as a single Column expression. Prefer
    ``with_simhash32`` in plans — as one inline expression the vote
    fold is re-evaluated per bit; the staged DataFrame form computes
    it once."""
    return signature_from_votes(simhash_votes(text)).alias("simhash")


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    num_blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, multi-block
    blocked (Manku et al., WWW'07 shape): the 32-bit signature splits
    into ``num_blocks`` disjoint bit ranges; candidates are pairs that
    agree on ≥1 whole block, deduplicated across blocks before the
    distance check.

    Pigeonhole guarantee: any pair at Hamming distance < num_blocks
    has some block with zero differing bits, so recall is EXACT for
    distance ≤ num_blocks - 1 (with the default 4 blocks: every ≤3
    pair is found; 4..max_hamming pairs are best-effort). At scale,
    widen signatures and keep block width ≈ log2(corpus) so block
    buckets stay small."""
    width = 32 // num_blocks
    # the signature table feeds BOTH self-join sides: without a
    # checkpoint the tokenize + per-token md5 + 32-wide vote fold
    # (interpreted HOF) re-executes once per side — checkpoint the
    # doc-bounded (id, sig) table so the corpus pass runs once
    sigs = with_simhash32(
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t")),
        "__t",
        "sig",
    ).drop("__t").localCheckpoint(eager=False)
    blocks = F.array(
        *[
            (F.floor(F.col("sig") / F.lit(2 ** (b * width))).cast("bigint")
             % F.lit(2**width))
            for b in range(num_blocks)
        ]
    )
    exploded = sigs.select(
        "__id", "sig", F.posexplode(blocks).alias("__blk", "__val")
    )
    a = exploded.select(
        F.col("__id").alias("id_a"),
        F.col("sig").alias("__sa"),
        F.col("__blk").alias("__blk_a"),
        F.col("__val").alias("__val_a"),
    )
    b = exploded.select(
        F.col("__id").alias("id_b"),
        F.col("sig").alias("__sb"),
        F.col("__blk").alias("__blk_b"),
        F.col("__val").alias("__val_b"),
    )
    ham = F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
    return (
        a.join(
            b,
            (F.col("__blk_a") == F.col("__blk_b"))
            & (F.col("__val_a") == F.col("__val_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# --- embedding near-dup ----------------------------------------------------


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-order double-precision dot product (expression-only,
    deterministic across engines). Interpreted (higher-order functions
    skip codegen) — for fixed-dim embedding columns prefer
    :func:`dot_product_static`, which is bit-identical and runs inside
    whole-stage codegen."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def _dot_sql(a: str, b: str, dim: int) -> str:
    """SQL text of the unrolled left-associated dot-product chain —
    `(0.0 + x1*y1) + x2*y2 + …`, the exact summation sequence of the
    :func:`dot_product` fold."""
    terms = " + ".join(
        f"CAST(element_at({a}, {i}) AS DOUBLE) * CAST(element_at({b}, {i}) AS DOUBLE)"
        for i in range(1, dim + 1)
    )
    return f"CAST(0.0 AS DOUBLE) + {terms}"


def dot_product_static(a: str, b: str, dim: int) -> Column:
    """Codegen dot product for a known dimension: the fold unrolled to
    a left-associated addition chain. The summation sequence
    (0.0 + x1*y1 + x2*y2 + …) is exactly the fold's, so results are
    bit-identical to :func:`dot_product` — but the whole expression
    compiles into whole-stage codegen (the fold evaluates interpreted,
    measured ~3× slower per pair at dim=64).

    Takes column NAMES, not Columns: the chain is generated as one SQL
    string and parsed JVM-side in a single ``F.expr`` call — building
    it per-operator through the Column API costs thousands of py4j
    round trips (measured 5-8 s of driver time per query at dim=64)."""
    return F.expr(_dot_sql(a, b, dim))


def norm(vec: Column | str, dim: int | None = None) -> Column:
    """``sqrt(dot(v, v))``. Compute this in each side's projection
    BEFORE a pair join: the norm depends on one vector only, so
    evaluating it per-pair (as a fused ``cosine`` does) repeats an
    O(dim) chain |pairs|/|rows| times over — and three fused 64-term
    chains inlined into a join stage blow janino's 64 KB method limit,
    dropping the whole stage out of codegen. With ``dim``, ``vec`` must
    be a column name (the chain is generated as SQL text)."""
    if dim:
        return F.expr(f"SQRT({_dot_sql(vec, vec, dim)})")
    return F.sqrt(dot_product(vec, vec))


def cosine_from_parts(
    a: Column | str,
    b: Column | str,
    na: Column | str,
    nb: Column | str,
    dim: int | None = None,
) -> Column:
    """Cosine given precomputed side norms: ``dot(a,b) / (na * nb)`` —
    the same double-operation sequence as :func:`cosine`, so results
    are bit-identical, but the join stage carries a single dot-product
    chain (fits whole-stage codegen at dim=64). With ``dim``, all four
    arguments must be column names (SQL-text chain, one py4j call)."""
    if dim:
        return F.expr(f"({_dot_sql(a, b, dim)}) / ({na} * {nb})")
    na = F.col(na) if isinstance(na, str) else na
    nb = F.col(nb) if isinstance(nb, str) else nb
    return dot_product(a, b) / (na * nb)


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity over Column args (interpreted HOF fold —
    fine off the hot path). Inside pair joins prefer
    :func:`cosine_from_parts` with per-side norms staged before the
    join and name-based ``dim`` chains for codegen."""
    dp = dot_product
    return dp(a, b) / (F.sqrt(dp(a, a)) * F.sqrt(dp(b, b)))


def embedding_near_dup_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    num_bands: int = 4,
    planes_per_band: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Multi-band hyperplane-LSH cosine near-dup pairs — the 100 TB
    primary path (the brute-force sibling below is the pytest-only
    verification baseline).

    Shape: per row, ``num_bands`` independent sign-projection
    signatures (band b uses plane family ``b*planes_per_band ..``) are
    computed as pure expressions; (band, signature) pairs explode and
    self-equi-join, so candidate generation is a hash join on band
    buckets — O(Σ bucket²), never O(n²) — and exact cosine verifies
    only collided pairs. Pairs colliding in several bands are
    deduplicated before the cosine so each pair is scored once.

    Scale knobs: ``planes_per_band`` sets bucket granularity
    (2^planes buckets per band — raise it as the corpus grows so
    bucket occupancy stays bounded); ``num_bands`` sets recall
    (P[found] = 1-(1-p^planes)^bands for per-plane agreement p).
    Recall < 1 by construction: a pair is emitted iff it collides in
    ≥1 band, and the SQL oracle replicates exactly that semantics.
    """
    from the_movies_db_spark.operators.similarity import (
        _UNROLL_BUDGET,
        hyperplane_signature,
    )

    # all bands land in ONE projection, so the unroll budget is shared:
    # force the compact HOF fold when the combined chain would blow
    # janino's 64 KB method limit (bit-identical either way)
    unroll = num_bands * planes_per_band * dim <= _UNROLL_BUDGET
    sigs = F.array(
        *[
            hyperplane_signature(
                vec_col,
                planes_per_band,
                dim,
                plane_offset=b * planes_per_band,
                unroll=unroll,
            )
            for b in range(num_bands)
        ]
    )
    # stage the signature array in its own projection: HOF expressions
    # re-inline per reference otherwise (see CLAUDE.md perf notes).
    # Checkpoint: v feeds BOTH self-join sides — without it the
    # num_bands×planes sign projections + the norm chain execute once
    # per side; the (id, vec, norm, sigs) table is row-bounded
    v = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        norm(vec_col, dim).alias("__n"),
        sigs.alias("__sigs"),
    ).localCheckpoint(eager=False)
    # pair rows carry the vectors through the band join (an ids-only
    # candidate stream + join-back-by-id was A/B'd 2.7x SLOWER at
    # sf0.1: with |collisions| ≈ |distinct pairs| here, dedup saves
    # almost no cosine work and the two extra joins dominate)
    exploded = v.select(
        "__id", "__v", "__n", F.posexplode("__sigs").alias("__band", "__sig")
    )
    a = exploded.select(
        F.col("__id").alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
        F.col("__band").alias("__band_a"),
        F.col("__sig").alias("__sig_a"),
    )
    b = exploded.select(
        F.col("__id").alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
        F.col("__band").alias("__band_b"),
        F.col("__sig").alias("__sig_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("__band_a") == F.col("__band_b"))
            & (F.col("__sig_a") == F.col("__sig_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        # same pair ⇒ same vectors, so keeping any collided copy is exact
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = F.round(
        cosine_from_parts("__va", "__vb", "__na", "__nb", dim=dim), 4
    )
    return (
        cand.select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def embedding_near_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Brute-force cosine near-dup pairs (verification baseline; used
    only in tests to bound ``embedding_near_dup_pairs_lsh`` recall —
    the registered query runs the banded-LSH form)."""
    v = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    a, b = v.alias("a"), v.alias("b")
    sim = F.round(cosine(F.col("a.__v"), F.col("b.__v")), 4)
    return (
        a.join(b, F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_ppm: int,
    shingle_n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT pairs — |S(A) ∩ S(B)| / min(|S(A)|,
    |S(B)|) — the doc-in-doc detector (Broder's containment; catches a
    short document quoted inside a long one, which Jaccard misses
    because the union is dominated by the long side).

    Same inverted-index skeleton and df-cap bound as
    :func:`ngram_jaccard_pairs`; the measure is reported in exact ppm
    (floor of an integer ratio) so the value-hash is engine-stable."""
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array_distinct(word_shingles(tokens(text_col), shingle_n))).alias(
            "shingle"
        ),
    )
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    # three consumers (sizes + both self-join sides) would otherwise
    # each re-run the shingle explosion — 8 documents scans in the
    # pre-round-9 plans. One lazy materialization of the (df-capped)
    # postings beats three recomputes of the regex explosion (the
    # round-8 bitmap word-table precedent for >1-branch fact tables).
    sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    # integer div (not floor of a double quotient): exact by
    # construction at any magnitude, same as the oracle's `//`
    cont = F.expr(
        "(CAST(n_shared AS BIGINT) * 1000000)"
        " div least(sa.n_shingles, sb.n_shingles)"
    )
    return (
        shared.join(sa, F.col("id_a") == F.col("sa.__id"))
        .join(sb, F.col("id_b") == F.col("sb.__id"))
        .select("id_a", "id_b", F.col("n_shared").cast("bigint").alias("n_shared"),
                cont.alias("containment_ppm"))
        .filter(F.col("containment_ppm") >= threshold_ppm)
    )


def prefix_filter_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_ppm: int = 500_000,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact Jaccard pairs >= t via PPJoin-style PREFIX FILTERING
    (Xiao et al., WWW'08) — the lossless alternative to the df-cap:
    instead of dropping hot shingles, sort each document's shingle set
    by GLOBAL rarity (df asc, shingle asc) and index only its PREFIX
    of length |x| - ceil(t*|x|) + 1. Any pair with J >= t must share a
    prefix element (pigeonhole on the common total order), so candidate
    generation is complete; the exact intersection then verifies.

    Why it scales: hot (stopword-like) shingles sort LAST, so they
    almost never enter a prefix — posting lists of prefix tokens are
    the rare tail, and the self-join cost collapses without the recall
    caveat a df-cap carries. Higher thresholds shorten prefixes:
    at t=0.9 only ~10% of each set is indexed.

    Verification joins candidates back to the per-doc sorted arrays BY
    ID (two hash joins) and intersects in-memory — never a second
    posting-list join."""
    t_num, t_den = threshold_ppm, 1_000_000
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.array_distinct(word_shingles(tokens(text_col), shingle_n))
        ).alias("shingle"),
    )
    # per-shingle document frequency as a COUNT WINDOW over the one
    # exploded stream: the groupBy+join-back form re-executed the
    # corpus shingling once per consumer (aggregate side + probe side
    # of the join) and added a third shuffle; the window shuffles the
    # stream by shingle exactly once and the count is the identical
    # BIGINT (one occurrence per (doc, shingle) by array_distinct)
    keyed = sh.select(
        "__id",
        F.expr(
            "concat(lpad(CAST(count(*) OVER (PARTITION BY shingle)"
            " AS STRING), 10, '0'), '|', shingle)"
        ).alias("k"),
    )
    # three consumers (prefix explode + both verification sides) —
    # checkpoint the doc-grain sorted-set table once instead of
    # re-running the explosion + collect_list per branch
    sets = keyed.groupBy("__id").agg(
        F.array_sort(F.collect_list("k")).alias("arr"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).localCheckpoint(eager=False)
    # prefix length |x| - ceil(t|x|) + 1, ceil in exact integers
    plen = f"n - ((n * {t_num} + {t_den - 1}) div {t_den}) + 1"
    prefix = sets.select(
        "__id", F.explode(F.expr(f"slice(arr, 1, CAST({plen} AS INT))")).alias("k")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.__id") < F.col("b.__id")))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    sa = sets.select(F.col("__id").alias("id_a"), F.col("arr").alias("arr_a"),
                     F.col("n").alias("n_a"))
    sb = sets.select(F.col("__id").alias("id_b"), F.col("arr").alias("arr_b"),
                     F.col("n").alias("n_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.expr(
                "CAST(size(array_intersect(arr_a, arr_b)) AS BIGINT)"
            ).alias("__inter"),
            "n_a",
            "n_b",
        )
        .select(
            "id_a",
            "id_b",
            F.expr(
                f"CAST(__inter * {t_den} div (n_a + n_b - __inter) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .filter(F.col("jaccard_ppm") >= t_num)
    )
