"""User-defined function surface (SURVEY §2.11): the three UDF shapes
Spark supports beyond plain expressions, each in its Arrow-batched
form (row-at-a-time Python UDFs are deliberately absent — at 100 TB
they are 10–100× slower than these and never the right call):

- **scalar pandas UDF** — vectorized column→column kernel;
- **grouped-aggregate pandas UDF** — a custom UDAF over each group's
  values as one pandas Series;
- **Python UDTF** (Spark 4) — table function: one input row → N output
  rows with a declared schema, usable in ``LATERAL`` position.

Every kernel here uses integer/exact arithmetic so the DuckDB oracle
reproduces results bit-for-bit (the UDFs are value-hash-verified, not
just smoke-tested). The reference's only UDF was a row-wise
``json.dumps`` lambda (/root/reference/dags/flows/themovies.py:72).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import LongType


@pandas_udf(LongType())
def price_bucket(price: pd.Series) -> pd.Series:
    """Scalar pandas UDF: integer price band (width 1000). Arrow moves
    the column once per batch; the kernel is a vectorized numpy op."""
    return (price // 1000).astype("int64")


@pandas_udf(LongType())
def distinct_count_agg(values: pd.Series) -> int:
    """Grouped-aggregate pandas UDF (custom UDAF): exact distinct count
    of the group's values — each group arrives as one Series."""
    return int(values.nunique(dropna=True))


@udtf(returnType="piece_idx int, piece string, piece_len int")
class SplitWords:
    """Python UDTF: explode a text value into (index, word, length)
    rows — the table-function shape (one row in, N rows out) with a
    declared output schema; compose via ``lateral join`` / ``F.udtf``
    application."""

    def eval(self, text: str):
        if text is None:
            return
        for i, w in enumerate(text.split()):
            yield i, w, len(w)
