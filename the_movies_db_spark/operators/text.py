"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure Spark SQL *expressions* (Column → Column): they
run inside whole-stage codegen, never leave the JVM, and compose with
any DataFrame plan. No Python UDFs anywhere in this module — at 100 TB
the difference between an expression and a row-at-a-time UDF is the
difference between hours and weeks.

Capabilities (north star: language-ID, quality scoring, token
counting, fingerprinting — BASELINE.json):
- tokenization (whitespace + BPE-ish regex piece split)
- token/char statistics and a composite quality score
- stopword-overlap language heuristic
- exact and shingle-based document fingerprints (md5-min, i.e. a
  1-permutation MinHash)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword lists for the language heuristic. The
# heuristic is deterministic and self-contained — lists are part of the
# operator's definition, not tuned to any dataset.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "auf", "für", "mit"],
    "es": ["el", "la", "de", "y", "a", "en", "es", "por", "para", "con"],
    "fr": ["le", "la", "de", "et", "à", "en", "est", "sur", "pour", "avec"],
}

# BPE-ish piece pattern: word-like runs, digits, or single punctuation.
TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string>."""
    return F.split(F.col(text) if isinstance(text, str) else text, r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def regex_token_count(text: Column | str) -> Column:
    """BPE-ish token count: number of word/digit/punct pieces — a cheap,
    deterministic proxy for subword token counts."""
    col = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), 0))


def avg_token_length(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return total / F.size(toks)


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    toks = tokens(text)
    hits = F.aggregate(
        F.transform(
            toks,
            lambda t: F.when(F.lower(t).isin(*STOPWORDS[lang]), 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return hits / F.size(toks)


def punct_ratio(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(F.regexp_replace(col, r"[a-zA-Z0-9\s]", ""))
    return n_punct / F.length(col)


def quality_score(text: Column | str, lang: str = "en") -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence
    + sane average word length + low punctuation density. Deterministic
    arithmetic only (safe for cross-engine verification)."""
    col = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(col)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), 0.25).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(col, lang) >= 0.02, 0.25).otherwise(0.0)
    awl = avg_token_length(col)
    awl_ok = F.when((awl >= 2.0) & (awl <= 12.0), 0.25).otherwise(0.0)
    punct_ok = F.when(punct_ratio(col) <= 0.2, 0.25).otherwise(0.0)
    return len_ok + stop_ok + awl_ok + punct_ok


def language_scores(text: Column | str) -> dict[str, Column]:
    return {lang: stopword_ratio(text, lang) for lang in STOPWORDS}


def language_id(text: Column | str, threshold: float = 0.02) -> Column:
    """Argmax stopword-overlap language guess ('und' if nothing clears
    the threshold). Ties break by language-code order, deterministically."""
    scores = language_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(float(threshold))
    for lang in sorted(STOPWORDS):  # later langs must BEAT, not tie
        s = scores[lang]
        cond = s > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    return best_lang


def fingerprint_md5(text: Column | str) -> Column:
    """Exact-content fingerprint: md5 of lowercased, trimmed,
    whitespace-collapsed text (reference F1-F3 are the JSON analogs)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Array of n-word shingles (space-joined) from a token array —
    expression-only, preserves document order."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )


def shingle_explode(df, toks_col: str, n: int, out_col: str = "shingle"):
    """Explode a token-array column into one row per n-word shingle —
    the codegen-friendly sibling of :func:`word_shingles`.

    ``word_shingles`` builds the shingle array with a lambda over
    ``slice``; higher-order functions run *interpreted* (outside
    whole-stage codegen), which measures ~2× slower than this shape at
    sf0.1. Here the only array ops are ``n`` row-level ``slice`` calls
    feeding one ``arrays_zip``; after the explode, ``concat_ws`` and
    everything downstream is codegen. Matches word_shingles exactly,
    including the single short shingle for documents with < n tokens
    (``concat_ws`` skips the nulls arrays_zip pads with; the pos-0 row
    is kept unconditionally, later padded rows are dropped).
    """
    t = F.col(toks_col)
    shifted = [F.slice(t, i + 1, F.size(t)).alias(f"w{i}") for i in range(1, n)]
    z = F.arrays_zip(t.alias("w0"), *shifted)
    other = [c for c in df.columns if c != toks_col]
    ex = df.select(*other, F.posexplode(z).alias("pos", "s")).filter(
        (F.col("pos") == 0) | F.col(f"s.w{n - 1}").isNotNull()
    )
    gram = F.concat_ws(" ", *[F.col(f"s.w{i}") for i in range(n)])
    return ex.select(*other, gram.alias(out_col))


def minhash_fingerprint(text: Column | str, n: int = 3) -> Column:
    """1-permutation MinHash over word shingles: min md5 hex string.
    Two documents sharing most shingles collide with high probability —
    the cheap near-dup fingerprint (full MinHash-LSH in operators.dedup)."""
    sh = word_shingles(tokens(text), n)
    return F.array_min(F.transform(sh, F.md5))
