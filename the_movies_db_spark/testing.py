"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet inputs, canonicalizes both results (columns sorted by
name, rows sorted, order-insensitive), and compares cell values
EXACTLY (NaN-safe). If this harness passes, any reasonable value-hash
the driver computes will match too.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from the_movies_db_spark.io import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # IEEE -0.0 == 0.0 but repr-sorts differently → normalize
        return 0.0 if v == 0.0 else v
    # numpy scalars → python
    if hasattr(v, "item") and not isinstance(v, (list, tuple, dict)):
        try:
            import numpy as np

            if isinstance(v, np.ndarray):
                return tuple(_canon_cell(x) for x in v.tolist())
            if isinstance(v, np.generic):
                return _canon_cell(v.item())
        except Exception:
            pass
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=repr)
    return rows


def _cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    # The driver's value-hash is type-sensitive: int64 99111 != float64 99111.0.
    # Python's `==` hides that (5 == 5.0), so fail the mixed case explicitly.
    if isinstance(a, float) != isinstance(b, float):
        return False
    return a == b


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""
    max_float_diff: float = 0.0
    mismatches: list = field(default_factory=list)


def compare_query(
    spark, sf_dir: str, name: str, con: duckdb.DuckDBPyConnection | None = None
) -> CompareResult:
    from the_movies_db_spark.queries import load_all

    q = load_all()[name]
    owns_con = con is None
    if owns_con:
        con = duckdb_connection(sf_dir)
    try:
        spark_pdf = q.spark(spark, sf_dir).toPandas()
        if q.oracle is None:
            return CompareResult(
                name, True, len(spark_pdf), -1, detail="rows-only (no oracle)"
            )
        oracle_pdf = con.execute(q.oracle).fetchdf()
        s_rows = canonicalize(spark_pdf)
        o_rows = canonicalize(oracle_pdf)
        if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
            return CompareResult(
                name,
                False,
                len(s_rows),
                len(o_rows),
                detail=f"column mismatch: spark={sorted(spark_pdf.columns)} "
                f"oracle={sorted(oracle_pdf.columns)}",
            )
        if len(s_rows) != len(o_rows):
            return CompareResult(
                name, False, len(s_rows), len(o_rows), detail="row count mismatch"
            )
        mismatches = []
        max_diff = 0.0
        for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
            if not _cells_equal(sr, orow):
                for a, b in zip(sr, orow):
                    if isinstance(a, float) and isinstance(b, float):
                        max_diff = max(max_diff, abs(a - b))
                if len(mismatches) < 5:
                    mismatches.append((i, sr, orow))
        return CompareResult(
            name,
            not mismatches,
            len(s_rows),
            len(o_rows),
            detail="" if not mismatches else f"{len(mismatches)}+ row mismatches",
            max_float_diff=max_diff,
            mismatches=mismatches,
        )
    finally:
        if owns_con:
            con.close()


def compare_all(spark, sf_dir: str, names=None) -> list[CompareResult]:
    from the_movies_db_spark.queries import load_all

    registry = load_all()
    names = list(names or registry)
    con = duckdb_connection(sf_dir)
    out = []
    try:
        for n in names:
            try:
                out.append(compare_query(spark, sf_dir, n, con))
            except Exception as e:  # noqa: BLE001 — harness reports, not raises
                out.append(CompareResult(n, False, -1, -1, detail=f"ERROR: {e}"))
    finally:
        con.close()
    return out
