"""Focused tests for round-13 OPTIMIZATION changes that touch operator
internals. Each optimization must leave the operator's VALUES identical —
these tests pin that equivalence directly (no Spark needed where the
kernel is pure Python/pandas)."""

import random

import pandas as pd

from the_movies_db_spark.functions.udfs import (
    token_bucket_kernel,
    token_bucket_shard_kernel,
)


def test_token_bucket_shard_kernel_matches_per_user_kernel():
    """The sharded kernel (one Python call per shard, users replayed
    inside) must produce exactly the per-user kernel's rows for every
    user — same admission counts under the same (ts_us, event_id)
    order, regardless of how rows are interleaved in the input frame."""
    rng = random.Random(13)
    rows = []
    for uid in range(17):
        t = rng.randrange(0, 10**9)
        for eid in range(rng.randrange(1, 40)):
            # mix sub-refill and multi-refill gaps, plus ts ties that
            # force the event_id tie-break
            t += rng.choice([0, 1, 50_000_000, 120_000_000, 500_000_000])
            rows.append({"user_id": uid, "event_id": eid, "ts_us": t})
    rng.shuffle(rows)
    pdf = pd.DataFrame(rows)

    got = (
        token_bucket_shard_kernel(pdf)
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        pd.concat(
            [
                token_bucket_kernel(g)
                for _, g in pdf.groupby("user_id", sort=True)
            ],
            ignore_index=True,
        )
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # sanity: the machine actually rejected something somewhere
    assert got["n_rejected"].sum() > 0
