"""x16 probe variant timing with count() instead of collect().

For pair-enumeration dedup ops whose OUTPUT is clique-quadratic under
the replica model (every former singleton becomes a 16-clique), the
standard probe's driver collect() of the pair table overflows
spark.driver.maxResultSize — a harness limit, not an operator one.
count() executes the identical join+filter plan (no aggregate-pruning
risk: the counted plan is a join/filter, not an Aggregate) without
shipping rows. Replica model identical to probe_r13opt_16x.py.

Usage: python scripts/probe_r13opt_16x_count.py <n> <query> [query...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from the_movies_db_spark.io import load_table, scratch_dir  # noqa: E402
from the_movies_db_spark.queries import load_all  # noqa: E402
from the_movies_db_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    n = int(sys.argv[1])
    names = sys.argv[2:]
    spark = get_spark("probe_r13opt_16x_count")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    work = scratch_dir("probe_r13opt_16x_count")
    rep = spark.range(n).select(F.col("id").alias("__rep"))

    (
        load_table(spark, SF_DIR, "documents")
        .crossJoin(rep)
        .withColumn(
            "doc_id", F.col("doc_id") + F.col("__rep") * F.lit(10_000_000)
        )
        .withColumn(
            "text", F.expr("concat(text, ' rep', CAST(__rep AS STRING))")
        )
        .drop("__rep")
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{work}/documents.parquet")
    )
    (
        load_table(spark, SF_DIR, "embeddings")
        .crossJoin(rep)
        .withColumn(
            "vec_id", F.col("vec_id") + F.col("__rep") * F.lit(10_000_000)
        )
        .drop("__rep")
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{work}/embeddings.parquet")
    )

    for name in names:
        for label, d in (("1x", SF_DIR), (f"{n}x", work)):
            spark.sparkContext.setJobDescription(f"{name}@{label}")
            t0 = time.perf_counter()
            cnt = reg[name].spark(spark, d).count()
            print(
                json.dumps(
                    {
                        "probe": f"{name}@{label}",
                        "sec": round(time.perf_counter() - t0, 2),
                        "rows": cnt,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
