"""Run the local oracle comparison for all (or selected) registry queries."""
import sys, time
sys.path.insert(0, "/root/repo")
from the_movies_db_spark.session import get_spark
from the_movies_db_spark.testing import compare_all

import os
sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
names = sys.argv[1:] or None
spark = get_spark("oracle-check")
spark.sparkContext.setLogLevel("ERROR")
t0 = time.time()
results = compare_all(spark, sf_dir, names)
fails = 0
for r in results:
    status = "OK " if r.ok else "FAIL"
    print(f"{status} {r.name:28s} spark={r.spark_rows} oracle={r.oracle_rows} {r.detail} "
          + (f"maxdiff={r.max_float_diff:.3e}" if r.max_float_diff else ""))
    if not r.ok:
        fails += 1
        for i, s, o in r.mismatches[:2]:
            print(f"     row {i}:\n       spark : {s}\n       oracle: {o}")
print(f"{len(results)-fails}/{len(results)} OK in {time.time()-t0:.1f}s")
sys.exit(1 if fails else 0)
