"""One-off PQ recall tuning harness (judge ask r4 #4): measures ADC /
funnel / IVF-PQ recall vs the exact top-10 under parameter and seeding
variations, at a chosen sf dir. Run: python scripts/tune_pq.py [sf_dir]."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

from shortcut_spark.operators import similarity

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .appName("tune_pq")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
n = emb.count()
q = emb.orderBy("vec_id").limit(1).select(F.col("embedding").alias("qvec"))
exact = {r["vec_id"] for r in similarity.topk_cosine(emb, q, 10).collect()}
print(f"n={n} exact10={sorted(exact)}")

for m, ksub, iters in [(16, 64, 3), (16, 64, 4), (8, 64, 3), (16, 32, 3)]:
    t0 = time.time()
    codes, cb = similarity.pq_fit(emb, m=m, ksub=ksub, iters=iters)
    codes, cb = codes.persist(), cb.persist()
    adc = {r["vec_id"] for r in similarity.pq_topk(codes, cb, q, 10).collect()}
    fun = {
        r["vec_id"]
        for r in similarity.pq_funnel_topk(emb, codes, cb, q, shortlist=50, k=10).collect()
    }
    fitted = similarity.ivf_fit(emb, "vec_id", "embedding", 16, 2, normalize=True)
    ivfpq = {
        r["vec_id"]
        for r in similarity.ivf_pq_topk(codes, cb, fitted, q, k=10, nprobe=6).collect()
    }
    print(
        f"m={m} ksub={ksub} iters={iters}: adc={len(exact & adc)/10:.1f} "
        f"funnel={len(exact & fun)/10:.1f} ivfpq={len(exact & ivfpq)/10:.1f} "
        f"({time.time()-t0:.0f}s)"
    )
    codes.unpersist()
    cb.unpersist()
