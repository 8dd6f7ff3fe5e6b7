import sys, re, json, io, contextlib
sys.path.insert(0, '/root/repo')
from the_movies_db_spark.session import get_spark
from the_movies_db_spark.queries import load_all
spark = get_spark("census")
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()
SF = '/root/testdata/sf0.001'
TABLES = ('lineitem','orders','customer','supplier','part','nation','region','events','documents','embeddings')
skip_prefix = ('streaming_', 'io_', 'upsert_', 'layout_')  # side-effectful/layout builders: skip plan census
out = []
for name, q in reg.items():
    if name.startswith(skip_prefix):
        continue
    try:
        txt = q.spark(spark, SF)._jdf.queryExecution().executedPlan().toString()
    except Exception as e:
        out.append({"q": name, "err": str(e)[:80]}); continue
    scans = {t: txt.count(f'{t}.parquet') for t in TABLES}
    rdd = len(re.findall('Scan ExistingRDD', txt))
    mx = max(scans.values())
    if mx >= 4 or rdd >= 8:
        out.append({"q": name, "max_scan": mx,
                    "tbl": max(scans, key=scans.get), "rdd": rdd})
for r in sorted(out, key=lambda r: -(r.get("max_scan", 0) + r.get("rdd", 0))):
    print(json.dumps(r))
print("census done", len(out), "flagged")
