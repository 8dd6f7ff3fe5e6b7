"""One-shot collect() timing of EVERY registered query at sf0.1.

Round-13 optimization coverage check: the bench times the 47-member
headline set; this sweep surfaces pathological outliers among the
~516 non-headline registrations (single run each — only order-of-
magnitude signals are meaningful on this host, per CLAUDE.md; anything
slow gets a solo 3-run median before any conclusion).

Usage: python scripts/time_all_r13opt.py [start_idx [end_idx]]
Writes one "name<TAB>seconds" line per query to stdout (flushed).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from the_movies_db_spark.session import get_spark  # noqa: E402
from the_movies_db_spark.queries import load_all  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    registry = load_all()
    names = list(registry)
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else len(names)
    spark = get_spark("time_all_r13opt")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names[lo:hi]:
        spark.sparkContext.setJobDescription(f"time:{name}")
        t0 = time.monotonic()
        try:
            registry[name].spark(spark, sf_dir).collect()
            dt = time.monotonic() - t0
            print(f"{name}\t{dt:.2f}", flush=True)
        except Exception as exc:  # noqa: BLE001 — record and continue
            print(f"{name}\tERR\t{type(exc).__name__}: {exc}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
