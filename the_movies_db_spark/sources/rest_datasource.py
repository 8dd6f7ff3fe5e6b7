"""Spark 4 Python DataSource for paginated REST APIs (SURVEY §2.1 S1).

``rest_api.py`` provides the driver-side and ``mapInPandas`` fetch
shapes; this module is the fully idiomatic integration: a custom
``DataSource`` registered under the format name ``paginated_rest``,
so the reference's extract (/root/reference/dags/flows/themovies.py:16-49)
becomes

    spark.dataSource.register(PaginatedRestDataSource)
    df = (spark.read.format("paginated_rest")
          .option("url", ".../movie/popular")
          .option("num_pages", 50)
          .option("pages_per_partition", 10)
          .load())

Why this shape at scale:

- **Partition planning** happens in ``partitions()``: page ranges are
  split into input partitions, so a 1000-executor cluster fetches
  disjoint page ranges concurrently — the Spark-native version of the
  reference's Airflow dynamic task mapping (D1, themovies.py:133-148).
- **Pure-iterator reads**: each partition yields tuples; Spark handles
  Arrow batching, so no driver-side accumulation (the reference held
  every page in one list, themovies.py:41).
- **Streaming variant**: ``simpleStreamReader`` treats the page number
  as the stream offset — each micro-batch reads the next page window,
  giving incremental ingestion with exactly-once bookkeeping from the
  checkpoint log (the reference faked incrementality with daily full
  re-pulls + MERGE).

Transport selection is by name (executors can only receive string
options): ``transport="synthetic"`` is the deterministic offline
fixture generator; ``transport="requests"`` is the real HTTP client;
``transport="module:path.to.factory"`` imports a zero-arg factory —
tests and production both inject through the same seam.
"""

from __future__ import annotations

import importlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from the_movies_db_spark.sources.rest_api import (
    MOVIE_SCHEMA,
    Transport,
    fetch_pages,
    requests_transport,
)

SYNTHETIC_TOTAL_PAGES = 5
SYNTHETIC_PAGE_SIZE = 4


def synthetic_transport() -> Transport:
    """Offline fixture transport: deterministic movie pages (page-keyed
    ids/titles), ``total_pages``-bounded like the real API."""

    def call(url: str, params: dict) -> dict:
        page = int(params.get("page", 1))
        if page > SYNTHETIC_TOTAL_PAGES:
            return {"results": [], "total_pages": SYNTHETIC_TOTAL_PAGES}
        base = (page - 1) * SYNTHETIC_PAGE_SIZE
        return {
            "page": page,
            "total_pages": SYNTHETIC_TOTAL_PAGES,
            "results": [
                {
                    "id": base + i,
                    "title": f"Movie {base + i}",
                    "original_title": f"Movie {base + i}",
                    "original_language": "en",
                    "overview": f"Synthetic movie {base + i} from {url}",
                    "release_date": "2024-01-01",
                    "genre_ids": [base % 7, (base + i) % 11],
                    "popularity": round(1.0 + (base + i) * 0.5, 2),
                    "vote_average": round(((base + i) % 10) + 0.5, 1),
                    "vote_count": 100 + base + i,
                    "adult": False,
                    "video": False,
                    "poster_path": f"/p{base + i}.jpg",
                    "backdrop_path": f"/b{base + i}.jpg",
                }
                for i in range(SYNTHETIC_PAGE_SIZE)
            ],
        }

    return call


def resolve_transport(name: str) -> Transport:
    if name == "synthetic":
        return synthetic_transport()
    if name == "requests":
        return requests_transport()
    if name.startswith("module:"):
        mod_path, _, attr = name[len("module:") :].rpartition(".")
        factory = getattr(importlib.import_module(mod_path), attr)
        return factory()
    raise ValueError(f"unknown transport {name!r}")


class PageRange(InputPartition):
    def __init__(self, start: int, end: int):  # [start, end] inclusive
        self.start = start
        self.end = end


def _rows_for_pages(
    transport: Transport, url: str, first: int, last: int, schema: StructType
) -> Iterator[tuple]:
    names = [f.name for f in schema.fields]
    page = first
    while page <= last:
        payload = transport(url, {"page": page})
        for r in payload.get("results", []):
            yield tuple(r.get(n) for n in names)
        total = payload.get("total_pages")
        if total is not None and page >= int(total):
            return
        page += 1


class PaginatedRestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.url = options["url"]
        self.transport_name = options.get("transport", "requests")
        self.num_pages = int(options.get("num_pages", 500))
        self.pages_per_partition = int(options.get("pages_per_partition", 25))

    def partitions(self) -> Sequence[InputPartition]:
        step = self.pages_per_partition
        return [
            PageRange(first, min(first + step - 1, self.num_pages))
            for first in range(1, self.num_pages + 1, step)
        ]

    def read(self, partition: PageRange) -> Iterator[tuple]:
        transport = resolve_transport(self.transport_name)
        yield from _rows_for_pages(
            transport, self.url, partition.start, partition.end, self.schema_
        )


class PaginatedRestStreamReader(DataSourceStreamReader):
    """Page number as stream offset: micro-batch N reads pages
    [offset, offset + pages_per_batch). Offsets are checkpointed by the
    engine, so restarts resume from the last committed page."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.url = options["url"]
        self.transport_name = options.get("transport", "requests")
        self.num_pages = int(options.get("num_pages", 500))
        self.pages_per_batch = int(options.get("pages_per_batch", 1))

    def initialOffset(self) -> dict:
        return {"next_page": 1}

    def latestOffset(self) -> dict:
        # advance one batch window per trigger, never past the bound
        current = getattr(self, "_latest", 1)
        self._latest = min(current + self.pages_per_batch, self.num_pages + 1)
        return {"next_page": self._latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        if start["next_page"] >= end["next_page"]:
            return []
        return [PageRange(start["next_page"], end["next_page"] - 1)]

    def read(self, partition: PageRange) -> Iterator[tuple]:
        transport = resolve_transport(self.transport_name)
        yield from _rows_for_pages(
            transport, self.url, partition.start, partition.end, self.schema_
        )

    def commit(self, end: dict) -> None:
        pass


class PaginatedRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paginated_rest"

    def schema(self) -> StructType:
        return MOVIE_SCHEMA

    def reader(self, schema: StructType) -> PaginatedRestReader:
        return PaginatedRestReader(schema, self.options)

    def streamReader(self, schema: StructType) -> PaginatedRestStreamReader:
        return PaginatedRestStreamReader(schema, self.options)
