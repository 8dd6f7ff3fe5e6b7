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


@udtf
class ExtractJsonProps:
    """POLYMORPHIC Python UDTF (Spark 4): the output schema is computed
    at plan time by ``analyze`` from a CONSTANT list of JSON keys —
    one BIGINT column per requested key. The declared-schema sibling
    is ``SplitWords``; this one demonstrates analyze-time schema
    resolution (catalyst sees real named columns, so pruning and
    downstream resolution work as if the schema were static)."""

    @staticmethod
    def analyze(props, keys):
        from pyspark.sql.types import LongType, StructField, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if not keys.isConstantExpression or keys.value is None:
            raise ValueError("keys must be a constant array of strings")
        return AnalyzeResult(
            StructType(
                [StructField(str(k), LongType()) for k in keys.value]
            )
        )

    def eval(self, props: str, keys):
        import json

        if props is None:
            return
        try:
            d = json.loads(props)
        except ValueError:
            d = {}
        vals = []
        for k in keys:
            v = d.get(k)
            vals.append(int(v) if isinstance(v, (int, float)) else None)
        yield tuple(vals)


# token-bucket rate-limit simulation (exact integer state machine) -----------

TB_CAP = 3  # bucket capacity, tokens
TB_REFILL_US = 120_000_000  # one token per 2 minutes of inter-arrival gap


def token_bucket_shard_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Token-bucket admission for EVERY user in one shard, one Python
    call per shard instead of one per user (the round-2 cogroup
    lesson: a grouped-map kernel keyed on a unique-ish key pays Arrow
    + interpreter startup per key — 1,500 users was 1,500 calls).
    Values are identical to :func:`token_bucket_kernel` run per user:
    the state machine is replayed per user over the same
    (ts_us, event_id) order, all-integer state."""
    pdf = pdf.sort_values(["user_id", "ts_us", "event_id"])
    users = []
    n_clicks = []
    n_admitted = []
    for uid, g in pdf.groupby("user_id", sort=False):
        tokens = TB_CAP
        prev_us = None
        admitted = 0
        for ts_us in g["ts_us"].to_numpy():
            if prev_us is not None:
                tokens = min(
                    TB_CAP, tokens + (int(ts_us) - prev_us) // TB_REFILL_US
                )
            prev_us = int(ts_us)
            if tokens >= 1:
                tokens -= 1
                admitted += 1
        users.append(int(uid))
        n_clicks.append(len(g))
        n_admitted.append(admitted)
    return pd.DataFrame(
        {
            "user_id": users,
            "n_clicks": n_clicks,
            "n_admitted": n_admitted,
            "n_rejected": [c - a for c, a in zip(n_clicks, n_admitted)],
        }
    )


def token_bucket_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user token-bucket admission over (ts_us, event_id)-ordered
    clicks: start full (CAP); each event refills ``gap_us // REFILL_US``
    tokens (clamped at CAP, remainder microseconds discarded — the
    discrete-refill convention the SQL oracle mirrors), admits iff a
    token is available, consumes one on admit. All-integer state, so
    the simulation is engine- and partitioning-exact."""
    pdf = pdf.sort_values(["ts_us", "event_id"])
    tokens = TB_CAP
    prev_us = None
    admitted = 0
    for ts_us in pdf["ts_us"].to_numpy():
        if prev_us is not None:
            tokens = min(TB_CAP, tokens + (int(ts_us) - prev_us) // TB_REFILL_US)
        prev_us = int(ts_us)
        if tokens >= 1:
            tokens -= 1
            admitted += 1
    n = len(pdf)
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_clicks": [n],
            "n_admitted": [admitted],
            "n_rejected": [n - admitted],
        }
    )


@udtf(returnType="gram_idx int, gram string")
class CharTrigrams:
    """Declared-schema Python UDTF: emit (index, char-trigram) rows for
    a text value — the n-gram tokenizer as a table function, composing
    with lateral joins exactly like SplitWords."""

    def eval(self, text: str):
        if text is None:
            return
        for i in range(len(text) - 2):
            yield i, text[i:i + 3]
