"""Property tests for the 32-bit word bitmap operators: the three
algebraic facts the retention / rolling-WAU / streaming-DAU queries
stand on, checked against Python set semantics on random inputs.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from the_movies_db_spark.operators import bitmap as B

ids = st.sets(st.integers(min_value=0, max_value=500), max_size=60)


def _word_rows(spark, users, key):
    df = spark.createDataFrame(
        [(key, u) for u in users] or [(key, 0)], "k int, user_id long"
    )
    if not users:
        df = df.filter("false")
    return B.word_table(df, "user_id", "k")


@settings(max_examples=6, deadline=None)
@given(a=ids, b=ids)
def test_bitmap_matches_set_semantics(spark, a, b):
    """popcount sums reproduce |A|, |A & B| and |A | B| exactly, and
    the OR-merge is idempotent (merging B twice changes nothing)."""
    wa = _word_rows(spark, a, 0).select("wid", "bits")
    wb = _word_rows(spark, b, 0).select("wid", "bits").withColumnRenamed(
        "bits", "b_bits"
    )

    card = wa.agg(B.popcount_sum("bits").alias("n")).collect()[0]["n"]
    assert (card or 0) == len(a)

    j = wa.join(wb, "wid")
    inter = j.agg(B.and_cardinality("bits", "b_bits").alias("n")).collect()[0][
        "n"
    ]
    assert (inter or 0) == len(a & b)

    merged = (
        wa.join(wb, "wid", "full_outer")
        .select("wid", B.or_merge("bits", "b_bits").alias("bits"))
    )
    union = merged.agg(B.popcount_sum("bits").alias("n")).collect()[0]["n"]
    assert (union or 0) == len(a | b)

    # idempotent merge: OR-ing b's words in again is a no-op
    again = (
        merged.join(wb, "wid", "full_outer")
        .select("wid", B.or_merge("bits", "b_bits").alias("bits"))
    )
    union2 = again.agg(B.popcount_sum("bits").alias("n")).collect()[0]["n"]
    assert union2 == union


def test_word_expr_never_touches_sign_bit(spark):
    """Every bit index stays in [0, 31] — the checked-arithmetic rule."""
    df = spark.range(0, 4096).selectExpr("id AS user_id")
    row = (
        B.word_table(df, "user_id")
        .agg(
            B.popcount_sum("bits").alias("n"),
            # a sign-bit escape would produce a negative word
            # (shiftleft(1L, 63)) — assert all words non-negative
            # and exactly 32 bits ever set per word
            # (4096 ids / 32 = 128 full words)
        )
        .collect()[0]
    )
    assert row["n"] == 4096
    words = B.word_table(df, "user_id").collect()
    assert len(words) == 128
    assert all(w["bits"] == (1 << 32) - 1 for w in words)
