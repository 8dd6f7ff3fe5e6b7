"""Bloom-filter semi/anti joins — the scale pattern for exact-match
decontamination of a huge corpus against a small "contaminated" key set
(benchmark documents, blocklists, eval sets).

Reference parity: the reference pipeline dedups/filters rows during
load (`/root/reference/utilities/etl.py:32` drop_duplicates); this
module is the 100 TB generalization the brief's training-data-pipeline
section asks for.

Shape (why this survives 100 TB):

- The contamination set is SMALL (benchmarks are millions of rows at
  most) — the corpus is the 100 TB side. A plain anti-join would
  shuffle or at best broadcast-probe EVERY corpus row through a join.
- Instead we build an m-bit Bloom bitmap from the contamination keys
  as ``num_bits/64`` bigint words — a distributed ``bit_or`` aggregate,
  one tiny shuffle — and collect it to the driver (bounded:
  16M bits = 2 MiB, sized to the contamination set, NEVER to the
  corpus).
- The bitmap rides into the corpus scan as a literal array in a pure
  column expression: k masked bit-tests per row, no join, no shuffle,
  whole-stage codegen. Definite negatives (the overwhelming majority)
  are resolved in the scan itself.
- Only Bloom-positive rows (true matches + ~0.1% false positives) meet
  the exact anti-join that restores EXACT semantics. The expensive
  operator now touches a sliver of the corpus, and Catalyst broadcasts
  the small contamination side.

The final result is exactly the plain anti-join's, so the DuckDB
oracle is ordinary SQL — the Bloom layer is a physical optimization,
invisible to semantics (false positives are re-checked, and a Bloom
filter has no false negatives).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _position_sql(key: str, seed: int, num_bits: int) -> str:
    """SQL text of bit position j for ``key``: xxhash64 with the seed
    mixed in as an extra hashed column, pmod m. xxhash64 is
    Spark-native (codegen, no UDF); the oracle never needs to
    replicate it because Bloom membership is only a prefilter."""
    return f"pmod(xxhash64({key}, {seed}), {num_bits})"


def build_bloom(
    keys: DataFrame, key_col: str, num_bits: int, num_hashes: int = 3
) -> list[int]:
    """Distributed Bloom build: explode each key's k positions, set
    bits with a ``bit_or`` aggregate grouped by 64-bit word index, and
    collect the (num_bits/64)-row result. Returns the dense word list
    (index = position // 64). The collect is bounded by ``num_bits``
    — a driver-side array sized to the CONTAMINATION set, independent
    of corpus size."""
    positions = ", ".join(
        _position_sql(key_col, seed, num_bits) for seed in range(num_hashes)
    )
    words = (
        keys.select(F.explode(F.expr(f"array({positions})")).alias("pos"))
        .select(
            F.expr("CAST(pos / 64 AS BIGINT)").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    dense = [0] * ((num_bits + 63) // 64)
    for r in words:
        dense[int(r["w"])] = int(r["bits"])
    return dense


def bloom_might_contain(
    words: list[int], key: str, num_bits: int, num_hashes: int = 3
) -> Column:
    """Membership test as a pure expression over column NAME ``key``:
    the bitmap is a literal bigint array in the plan (shipped with the
    task binary, no broadcast join), probed with k masked bit-tests.
    False positives possible, false negatives impossible."""
    arr = "array(" + ", ".join(f"{w}L" for w in words) + ")"
    tests = []
    for seed in range(num_hashes):
        p = _position_sql(key, seed, num_bits)
        tests.append(
            f"(element_at({arr}, CAST(({p}) / 64 AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST(({p}) % 64 AS INT))) != 0"
        )
    return F.expr(" AND ".join(tests))


def bloom_anti_join(
    corpus: DataFrame,
    contaminated: DataFrame,
    key_col: str,
    num_bits: int = 1 << 13,
    num_hashes: int = 3,
) -> DataFrame:
    """EXACT anti-join accelerated by a Bloom prefilter, two-phase:

    1. *Find the hits cheaply*: a column-PRUNED scan of the corpus key
       column only (a sliver of the bytes at rest), Bloom-filtered in
       the scan, then a semi-join against the contamination keys drops
       false positives. Output: the tiny set of corpus keys that are
       actually contaminated.
    2. *One full-width pass*: the corpus is scanned once at full width
       with a broadcast anti-join against that hit set.

    This works whether or not the contamination set fits in executor
    memory (phase 1's semi-join may shuffle, but only Bloom survivors
    reach it), and the 100 TB side is never shuffled and never scanned
    at full width more than once. Result ≡ ``corpus ANTI JOIN
    contaminated`` — oracle-verifiable with plain SQL."""
    words = build_bloom(contaminated, key_col, num_bits, num_hashes)
    maybe = bloom_might_contain(words, key_col, num_bits, num_hashes)
    hit_keys = (
        corpus.select(key_col)
        .filter(maybe)
        .join(contaminated.select(key_col), key_col, "left_semi")
        .distinct()
    )
    return corpus.join(F.broadcast(hit_keys), key_col, "left_anti")
