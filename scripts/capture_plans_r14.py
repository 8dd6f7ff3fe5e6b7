"""Capture .explain('formatted') for headline (or named) queries into
plans/r14/<query>_<tag>.txt.

Usage: python scripts/capture_plans.py <tag> [names...]
  tag = "before" | "after" (file suffix)
  names default to bench.HEADLINE.

Plans are built only (no execution), so this is cheap and safe to run
alongside nothing else. Queries that run their own jobs at plan-build
time (upsert write workloads, streaming runners) still execute those.
"""
import os
import sys

sys.path.insert(0, "/root/repo")

from the_movies_db_spark.queries import load_all
from the_movies_db_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join("/root/repo/plans/r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    for name in names:
        try:
            df = registry[name].spark(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"PLAN CAPTURE FAILED: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
