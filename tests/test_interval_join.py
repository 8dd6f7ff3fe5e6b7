"""Property test: the binned interval-overlap rewrite must equal the
plain non-equi join for ANY interval set — touching endpoints,
zero-length and bucket-spanning intervals, negative coordinates."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from the_movies_db_spark.operators.joins import interval_overlap_join

_SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

interval = st.tuples(st.integers(-50, 50), st.integers(0, 40))


@given(
    a=st.lists(interval, min_size=0, max_size=25),
    b=st.lists(interval, min_size=0, max_size=25),
    width=st.sampled_from([1, 7, 64]),
)
@_SET
def test_binned_equals_plain(spark, a, b, width):
    adf = spark.createDataFrame(
        [(i, s, s + l) for i, (s, l) in enumerate(a)],
        "a_id bigint, a_start bigint, a_end bigint",
    )
    bdf = spark.createDataFrame(
        [(i, s, s + l) for i, (s, l) in enumerate(b)],
        "b_id bigint, b_start bigint, b_end bigint",
    )
    got = {
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            adf, bdf, "a_start", "a_end", "b_start", "b_end", width
        )
        .select("a_id", "b_id")
        .collect()
    }
    want = {
        (r.a_id, r.b_id)
        for r in adf.join(
            bdf,
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end")),
        )
        .select("a_id", "b_id")
        .collect()
    }
    assert got == want


# -- 2D grid radius join --------------------------------------------------

from the_movies_db_spark.operators.joins import grid_radius_join  # noqa: E402

point = st.tuples(st.integers(-60, 60), st.integers(-60, 60))


@given(
    a=st.lists(point, min_size=0, max_size=20),
    b=st.lists(point, min_size=0, max_size=20),
    radius=st.sampled_from([1, 9, 40]),
)
@_SET
def test_grid_radius_equals_plain(spark, a, b, radius):
    adf = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(a)],
        "a_id bigint, ax bigint, ay bigint",
    )
    bdf = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(b)],
        "b_id bigint, bx bigint, by bigint",
    )
    got = sorted(
        (r.a_id, r.b_id)
        for r in grid_radius_join(adf, bdf, "ax", "ay", "bx", "by", radius)
        .select("a_id", "b_id")
        .collect()
    )
    want = sorted(
        (r.a_id, r.b_id)
        for r in adf.join(
            bdf,
            (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
            + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
            <= radius * radius,
        )
        .select("a_id", "b_id")
        .collect()
    )
    # sorted lists, not sets: a duplicate-producing rewrite must fail
    assert got == want
