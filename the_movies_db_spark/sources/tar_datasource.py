"""Spark 4 Python DataSource over WebDataset-style tar shards.

``operators/multimodal.py`` provides the pack/parse column operators;
this module is the at-rest integration: a custom ``DataSource``
registered under the format name ``tar_shards`` that turns a directory
of ``*.tar`` files into a table of members —

    spark.dataSource.register(TarShardDataSource)
    df = (spark.read.format("tar_shards")
          .option("path", "/data/corpus-shards")
          .load())
    # -> shard_id | member_name | n_bytes | payload | cksum_ok

Why this shape at scale (100 TB):

- **Partition planning** happens in ``partitions()``: ONE input
  partition per shard file, so a 1000-executor cluster streams
  disjoint shards concurrently — the WebDataset training-reader
  layout, where shard count (not corpus size) sets the read grain.
- **Pure-iterator reads**: each partition walks its shard with the
  manual 512-byte ustar header walk (`_walk_ustar` — octal size field,
  header-checksum verification, 512-aligned payload slicing) and
  yields member tuples; Spark handles Arrow batching, so a shard is
  never materialized whole beyond its own bytes.
- **Self-describing placement**: shard_id is parsed from the file name
  (``shard-<id>.tar``), so no sidecar manifest is needed.
"""

from __future__ import annotations

import glob
import os
import re
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from the_movies_db_spark.operators.multimodal import _walk_ustar

TAR_MEMBER_SCHEMA = StructType(
    [
        StructField("shard_id", LongType()),
        StructField("member_name", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload", BinaryType()),
        StructField("cksum_ok", BooleanType()),
    ]
)

_SHARD_RE = re.compile(r"shard-(\d+)\.tar$")


class ShardFile(InputPartition):
    def __init__(self, shard_id: int, path: str):
        self.shard_id = shard_id
        self.path = path


class TarShardReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self) -> Sequence[InputPartition]:
        parts = []
        for p in sorted(glob.glob(os.path.join(self.path, "*.tar"))):
            m = _SHARD_RE.search(p)
            sid = int(m.group(1)) if m else -1
            parts.append(ShardFile(sid, p))
        if not parts:
            raise FileNotFoundError(f"no *.tar shards under {self.path}")
        return parts

    def read(self, partition: ShardFile) -> Iterator[tuple]:
        with open(partition.path, "rb") as fh:
            blob = fh.read()
        yield from _walk_ustar(partition.shard_id, blob)


class TarShardDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tar_shards"

    def schema(self) -> StructType:
        return TAR_MEMBER_SCHEMA

    def reader(self, schema: StructType) -> TarShardReader:
        return TarShardReader(self.options)
