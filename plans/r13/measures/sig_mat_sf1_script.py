"""A/B: materialize the double-consumed signature fragments (bands_df,
shingle docs) once vs recompute per consumer — at sf1 over the FULL
50k-doc documents table (the catalog entries slice 500 docs, so this
is the only honest scale measurement of the operator)."""
import sys, time, os
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from database_spark.session import get_spark
from database_spark.operators import lifecycle as L
from database_spark.pipeline import dedup

spark = get_spark("sig-mat-sf1")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
docs = spark.read.parquet("/root/repo/.testdata/sf1/documents.parquet")
print("docs:", docs.count())

def run(materialize: bool, tag: str):
    d = docs
    t0 = time.time()
    n, num_hashes, bands, threshold = 3, 24, 24, 0.5
    rows = num_hashes // bands
    sig = dedup.minhash_signatures(d, "doc_id", "text", n, num_hashes)
    bands_df = sig.select(
        "id",
        F.posexplode(F.array(*[
            F.xxhash64(*[F.col("sig")[i] for i in range(b * rows, (b + 1) * rows)])
            for b in range(bands)
        ])).alias("band", "bh"),
    )
    doc_sh = d.select(F.col("doc_id").alias("id"),
                      F.array_distinct(dedup.shingles(F.col("text"), n)).alias("shs"))
    owned = []
    if materialize:
        bands_df = L.checkpoint(bands_df); owned.append(bands_df)
        doc_sh = L.checkpoint(doc_sh); owned.append(doc_sh)
    l = bands_df.select(F.col("id").alias("id_a"), "band", "bh")
    r = bands_df.select(F.col("id").alias("id_b"), "band", "bh")
    cand = (l.join(r, ["band", "bh"]).where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").dropDuplicates())
    out = (cand
        .join(doc_sh.withColumnRenamed("id", "id_a").withColumnRenamed("shs", "sh_a"), "id_a")
        .join(doc_sh.withColumnRenamed("id", "id_b").withColumnRenamed("shs", "sh_b"), "id_b")
        .withColumn("jaccard", F.round(
            F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b")), 6))
        .where(F.col("jaccard") >= 0.5).select("id_a", "id_b", "jaccard"))
    out.write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    nrows = out.count()
    L.sweep(spark)
    print(f"{tag} materialize={materialize} wall={wall:.2f} pairs={nrows}")

for rep in range(3):
    run(False, f"rep{rep}")
    run(True, f"rep{rep}")
