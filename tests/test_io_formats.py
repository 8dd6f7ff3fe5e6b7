"""Round-trip and corrupt-record semantics for the format-agnostic
source/sink (io.read_any / io.write_any): CSV, JSON-lines, ORC."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from the_movies_db_spark import io

SF = "/root/testdata/sf0.001"

NATION_DDL = "n_nationkey int, n_name string, n_regionkey int"


@pytest.fixture()
def nation(spark):
    return io.load_table(spark, SF, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@pytest.mark.parametrize("fmt", ["csv", "json", "orc", "parquet"])
def test_roundtrip_preserves_rows(spark, tmp_path, nation, fmt):
    path = str(tmp_path / f"nation_{fmt}")
    io.write_any(nation, path, fmt=fmt)
    schema = NATION_DDL if fmt in ("csv", "json") else None
    back = io.read_any(spark, path, fmt=fmt, schema=schema)
    assert sorted(back.collect()) == sorted(nation.collect())
    assert dict(back.dtypes) == dict(nation.dtypes)


def test_csv_inference_without_schema(spark, tmp_path, nation):
    path = str(tmp_path / "nation_csv")
    io.write_any(nation, path, fmt="csv")
    back = io.read_any(spark, path, fmt="csv")
    assert back.count() == nation.count()
    # inference lands on integer types for the key columns
    assert dict(back.dtypes)["n_nationkey"] in ("int", "bigint")


def test_json_corrupt_records_are_quarantined_not_dropped(spark, tmp_path):
    path = tmp_path / "events_jsonl"
    path.mkdir()
    good = '{"event_id": 1, "kind": "click"}'
    bad = '{"event_id": 2, "kind": '  # truncated object
    (path / "part-000.json").write_text(good + "\n" + bad + "\n")
    df = io.read_any(
        spark,
        str(path),
        fmt="json",
        schema="event_id bigint, kind string",
        keep_corrupt=True,
    )
    rows = df.collect()
    assert len(rows) == 2
    quarantined = [r for r in rows if r._corrupt_record is not None]
    assert len(quarantined) == 1
    assert quarantined[0]._corrupt_record.startswith('{"event_id": 2')
    parsed = [r for r in rows if r._corrupt_record is None]
    assert parsed[0].event_id == 1 and parsed[0].kind == "click"


def test_partitioned_write_prunes_directories(spark, tmp_path, nation):
    path = str(tmp_path / "nation_part")
    io.write_any(nation, path, fmt="parquet", partition_by=["n_regionkey"])
    one = io.read_any(spark, path, fmt="parquet").filter(F.col("n_regionkey") == 0)
    # partition pruning: only the n_regionkey=0 directory's files are read
    scan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() > 0
    assert "n_regionkey=0" in scan or one.count() < nation.count()


def test_unknown_format_rejected(spark, nation):
    with pytest.raises(ValueError, match="unsupported format"):
        io.read_any(spark, "/tmp/x", fmt="avro")
    with pytest.raises(ValueError, match="keep_corrupt requires"):
        io.read_any(spark, "/tmp/x", fmt="json", keep_corrupt=True)
