"""Solo adjudication of the four BENCH_r10 outliers (VERDICT r10
directive 2): sim_topk_ivfpq, text_tfidf_topk, search_hybrid_rrf,
orders_rfm_segments. Fresh session, bench.py methodology (warmup
touches every table, 3-run collect median per query)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from the_movies_db_spark.io import TABLES, load_table
from the_movies_db_spark.queries import load_all
from the_movies_db_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = [
    "sim_topk_ivfpq",
    "text_tfidf_topk",
    "search_hybrid_rrf",
    "orders_rfm_segments",
]

spark = get_spark()
reg = load_all()
# warmup: touch every table + one unrolled expression (bench.py recipe)
for t in TABLES:
    load_table(spark, SF_DIR, t).limit(1).collect()
reg["agg_percentiles"].spark(spark, SF_DIR).collect()

out = {}
for name in NAMES:
    times = []
    for _ in range(3):
        t0 = time.monotonic()
        reg[name].spark(spark, SF_DIR).collect()
        times.append(round(time.monotonic() - t0, 3))
    times.sort()
    out[name] = {"median": times[1], "runs": times}
    print(f"# {name}: median {times[1]}s of {times}", file=sys.stderr)

print(json.dumps(out, separators=(",", ":")))
