"""32-bit word bitmap operators — exact distributed cardinality.

The mechanism behind the retention / rolling-WAU / streaming-DAU
queries: ids are packed into (word index = id div 32, bit = id % 32)
words built with one ``bit_or`` aggregate. The three algebraic
properties the queries lean on, each pinned by a property test:

- intersection cardinality = sum of popcounts of word-aligned ANDs
  (retention joins on (key, word) — never an id-grain self-join);
- union is a plain ``bit_or`` — associative AND idempotent, so it
  decomposes over window frames (rolling distinct without explode)
  and tolerates replayed micro-batches (streaming merge needs no
  audit column);
- cardinality = sum of popcounts.

32-bit words keep every shift off the sign bit (``1::BIGINT << 63``
is checked-arithmetic death in DuckDB and UB-adjacent everywhere):
the round-4 ``agg_bitmap_distinct`` rule, applied as a helper so new
call sites can't get it wrong.

Scale notes (100 TB): the word table is a 32x reduction of the
distinct (key, id) table and shards on (key, wid) — co-partitioned
for any word-aligned combine. At sparse-id extremes a roaring-style
container split beats flat words; the call-site contract (word table
in, popcount sums out) is unchanged by that swap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per word — see module docstring for why not 64.
WORD_BITS = 32


def word_expr(id_col: str) -> str:
    """SQL text for the word index of ``id_col`` (BIGINT)."""
    return f"{id_col} div {WORD_BITS}"


def bit_expr(id_col: str) -> str:
    """SQL text for this id's single-bit BIGINT mask."""
    return f"shiftleft(1L, CAST({id_col} % {WORD_BITS} AS INT))"


def word_table(
    df: DataFrame, id_col: str, *group_cols: str | Column
) -> DataFrame:
    """Collapse ``df`` to (group_cols..., wid, bits): one bit per
    distinct id within each group, one ``bit_or`` aggregate — the
    combining (map-side partial) reduction every bitmap query starts
    from."""
    return df.groupBy(
        *group_cols, F.expr(word_expr(id_col)).alias("wid")
    ).agg(
        F.expr(f"CAST(bit_or({bit_expr(id_col)}) AS BIGINT)").alias("bits")
    )


def popcount_sum(bits_expr: str) -> Column:
    """Cardinality of a set of word rows: sum of per-word popcounts."""
    return F.expr(f"CAST(sum(bit_count({bits_expr})) AS BIGINT)")


def and_cardinality(a_bits: str, b_bits: str) -> Column:
    """Intersection cardinality from two word-aligned bit columns."""
    return popcount_sum(f"{a_bits} & {b_bits}")


def or_merge(a_bits: str, b_bits: str) -> Column:
    """Union of two (possibly NULL) word columns — the idempotent
    merge used by the streaming foreachBatch maintainer."""
    return F.expr(f"coalesce({a_bits}, 0L) | coalesce({b_bits}, 0L)")
