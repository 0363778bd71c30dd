"""Phase decomposition of the decontam_bloom 5M-doc row (guide §1):
time successively larger prefixes of the corpus-side pipeline through
the noop sink, on the same fixture the bench uses. Run on a QUIET box.

Phases:
  scan        — parquet scan of (doc_id, text), source filter
  shingle     — + shingle_array (split/transform/array_join/distinct)
  explode     — + explode to one row per shingle
  md5         — + md5 hex string
  conv        — + the two conv(substring) 60-bit halves
  probe       — + k-probe forall against the binary literal
  agg         — + groupBy(doc_id).agg(count, sum)  (the full row)
"""
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from marex_spark.operators.dedup import (  # noqa: E402
    bloom_fit,
    bloom_flag_from_hashes,
    bloom_hash_cols,
    shingle_array,
)
from marex_spark.session import get_spark  # noqa: E402

spark = get_spark()
sc = spark.sparkContext
tmp = os.environ.get("TMPDIR", "/tmp")
sf = 0.1
corpus = f"{tmp}/marex_bench_corpus5m/documents.parquet"

docs = spark.read.parquet(corpus).filter(F.col("source") != "src0")
bench = spark.read.parquet(corpus).filter(F.col("source") == "src0")


def t(name, df, reps=2):
    best = None
    for _ in range(reps):
        sc.setJobDescription(f"decontam-phase: {name}")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:>10}: {best:7.2f}s")
    return best


# fit once (outside phases — same bits for probe/agg)
t0 = time.time()
bits, m, k = bloom_fit(bench, n=5)
print(f"bloom_fit: {time.time()-t0:.2f}s  m={m} k={k}")

sh = shingle_array(F.col("text"), 5)
scan = docs.select("doc_id", "text")
shingled = docs.select("doc_id", sh.alias("shs"))
exploded = docs.select("doc_id", F.explode(sh).alias("shingle"))
md5d = exploded.select("doc_id", F.md5("shingle").alias("h"))
h1, h2 = bloom_hash_cols(F.col("shingle"), m)
conved = exploded.select("doc_id", h1.alias("_h1"), h2.alias("_h2"))
flag = bloom_flag_from_hashes(bits, k, F.col("_h1"), F.col("_h2"))
probed = conved.select("doc_id", flag.alias("f"))
agg = conved.groupBy("doc_id").agg(
    F.count("*").alias("n"), F.sum(flag.cast("long")).alias("nh")
)

t("scan", scan)
t("shingle", shingled)
t("explode", exploded)
t("md5", md5d)
t("conv", conved)
t("probe", probed)
t("agg", agg)
