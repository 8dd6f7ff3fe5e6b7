"""Paginated REST source tests with an injected fixture transport
(SURVEY §5: bounded pagination, error paths, retry, fan-out, clean)."""

from __future__ import annotations

import pytest

from the_movies_db_spark.sources import rest_api as R


def _movie(i: int) -> dict:
    return {
        "id": i,
        "title": f"Movie {i}",
        "original_title": f"Movie {i}",
        "original_language": "en",
        "overview": "o",
        "release_date": "2024-01-15" if i % 3 else "",
        "genre_ids": [1, 2] if i % 2 else [],
        "popularity": float(i),
        "vote_average": 7.5,
        "vote_count": i * 10,
        "adult": False,
        "video": False,
        "poster_path": None if i % 5 == 0 else f"/p{i}.jpg",
        "backdrop_path": None,
    }


def fixture_transport(n_pages: int = 3, per_page: int = 4, fail_first: int = 0):
    calls = {"n": 0, "failures": 0}

    def call(url: str, params: dict) -> dict:
        calls["n"] += 1
        if calls["failures"] < fail_first:
            calls["failures"] += 1
            raise R.ApiError("transient")
        page = params["page"]
        base = (page - 1) * per_page
        return {
            "page": page,
            "total_pages": n_pages,
            "results": [_movie(base + j) for j in range(per_page)],
        }

    call.calls = calls
    return call


def test_bounded_pagination_honors_total_pages():
    rows = list(fetch := R.fetch_pages(fixture_transport(3, 4), "u"))
    assert len(rows) == 12


def test_max_pages_caps_before_total():
    rows = list(R.fetch_pages(fixture_transport(500, 2), "u", max_pages=5))
    assert len(rows) == 10


def test_retry_then_success():
    t = fixture_transport(1, 2, fail_first=1)
    rows = list(R.fetch_pages(t, "u", retries=1, retry_delay_s=0))
    assert len(rows) == 2


def test_retry_exhaustion_raises():
    t = fixture_transport(1, 2, fail_first=5)
    with pytest.raises(R.ApiError):
        list(R.fetch_pages(t, "u", retries=2, retry_delay_s=0))


def test_fetch_endpoint_df_typed(spark):
    df = R.fetch_endpoint_df(spark, fixture_transport(2, 3), "popular")
    assert df.count() == 6
    assert dict(df.dtypes)["genre_ids"] == "array<int>"
    assert dict(df.dtypes)["id"] == "bigint"


def test_empty_endpoint_raises(spark):
    def empty(url, params):
        return {"page": 1, "total_pages": 1, "results": []}

    with pytest.raises(ValueError):
        R.fetch_endpoint_df(spark, empty, "popular")


def test_fan_out_union_tags_endpoint(spark):
    df = R.fetch_all_endpoints(
        spark, fixture_transport(1, 2), endpoints=("popular", "upcoming")
    )
    assert df.count() == 4
    assert {r.endpoint for r in df.select("endpoint").distinct().collect()} == {
        "popular",
        "upcoming",
    }


def test_clean_movies_semantics(spark):
    df = R.fetch_endpoint_df(spark, fixture_transport(1, 4), "popular")
    out = R.clean_movies(df)
    rows = {r.id: r for r in out.collect()}
    assert rows[0].release_date is None  # "" → NULL, not 1970-01-01
    assert rows[1].release_date is not None
    assert all(r.record_loaded_at is not None for r in rows.values())
    assert dict(out.dtypes)["release_date"] == "date"
    assert dict(out.dtypes)["genre_ids"] == "array<int>"  # stays native


def test_distributed_page_fetch(spark):
    def make_transport():
        return fixture_transport(4, 3)

    df = R.fetch_pages_distributed(spark, make_transport, "u", num_pages=4)
    assert df.count() == 12
    assert dict(df.dtypes)["id"] == "bigint"


def test_end_to_end_pipeline_parity(spark, tmp_path):
    """The reference's whole DAG (extract → transform → load/merge,
    themovies.py:133-150) as one lazy plan + upsert."""
    from the_movies_db_spark.upsert import write_upsert

    target = str(tmp_path / "movies")
    for _ in range(2):  # daily re-pull + MERGE, idempotent
        df = R.clean_movies(
            R.fetch_all_endpoints(spark, fixture_transport(2, 3))
        )
        write_upsert(spark, target, df.drop("endpoint"), pk="id")
    from the_movies_db_spark.upsert import read_table

    final = read_table(spark, target)
    assert final.count() == 6  # ids 0..5, once each


def test_token_bucket_enforces_rate():
    """A bucket at r tokens/sec with capacity 1 admits n requests in no
    less than (n-1)/r seconds."""
    import time as _t

    bucket = R.TokenBucket(rate=50.0, capacity=1.0)
    t0 = _t.monotonic()
    for _ in range(11):
        bucket.acquire()
    elapsed = _t.monotonic() - t0
    assert elapsed >= 10 / 50.0  # 11 requests, 10 refill intervals
    assert elapsed < 2.0  # and it doesn't over-throttle


def test_distributed_fetch_respects_global_rate(spark):
    """With requests_per_sec set, the wall-clock for the whole fetch is
    bounded below by pages / global_rate (counting transport: every
    page is one request)."""
    import time as _t

    def make_transport():
        return fixture_transport(8, 2)

    t0 = _t.monotonic()
    df = R.fetch_pages_distributed(
        spark,
        make_transport,
        "u",
        num_pages=8,
        partitions=2,
        requests_per_sec=10.0,
    )
    n = df.count()
    elapsed = _t.monotonic() - t0
    assert n == 16
    # 8 requests over 2 tasks at 5 req/s/task → ≥ (4-1)/5 = 0.6 s
    assert elapsed >= 0.6
