import sys, time
sys.path.insert(0, "/root/repo")
from database_spark.session import get_spark
import __spark_entry__ as E
from database_spark.operators import lifecycle as L
from pyspark.sql import functions as F

spark = get_spark("probe-gas")
spark.sparkContext.setLogLevel("ERROR")
sf="/root/testdata/sf0.1"
spark.range(1_000_000).selectExpr("sum(id)").collect()
sc=spark.sparkContext
def njobs():
    t=sc.statusTracker(); ids=t.getJobIdsForGroup(None)
    return (max(ids)+1) if ids else 0
for name in ("gas_fuzzy_band","gas_cc_large","gas_bfs_large","gas_sssp_large","gas_pagerank_large","gas_cc","dedup_clusters"):
    walls=[]; jobs=[]
    for rep in range(3):
        j0=njobs(); t0=time.time()
        E.queries()[name](spark, sf).write.format("noop").mode("overwrite").save()
        walls.append(round(time.time()-t0,2)); jobs.append(njobs()-j0)
        L.sweep(spark)
    print(f"{name:20s} walls={walls} min={min(walls)} jobs={jobs}")
