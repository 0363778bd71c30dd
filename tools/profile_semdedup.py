"""Phase decomposition of the semdedup_1m_vectors bench row (guide §1.2):
times count / seed / fit-iter / assign / kernel separately, same process,
noop-forced, so the dominant phase is identified before any change."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
EMB_DIR = os.environ.get(
    "SEMDEDUP_EMB_DIR", "/tmp/marex_bench_emb1m/embeddings.parquet"
)
N_VECS = int(os.environ.get("SEMDEDUP_N", "1000000"))


def main() -> None:
    from marex_spark.session import get_spark

    spark = get_spark(app_name="profile_semdedup", cores=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(EMB_DIR):
        from marex_spark.sources.synthetic import materialize_embedding_fixture

        materialize_embedding_fixture(
            spark, os.path.dirname(EMB_DIR), N_VECS
        )

    from marex_spark.operators import embed as em

    reps = int(os.environ.get("SEMDEDUP_REPS", "2"))
    for rep in range(reps):
        emb = spark.read.parquet(EMB_DIR)
        t = {}

        def mark(name, t0):
            t[name] = time.perf_counter() - t0
            print(f"  {name}: {t[name]:.2f}s", flush=True)

        t0 = time.perf_counter()
        n = emb.count()
        mark("count", t0)
        k = max(8, -(-n // 4096))

        t0 = time.perf_counter()
        seed_rows = (
            emb.select("vec_id", "embedding")
            .withColumn("_h", F.md5(F.col("vec_id").cast("string")))
            .orderBy("_h", "vec_id")
            .limit(k)
            .collect()
        )
        cents = [[float(x) for x in r["embedding"]] for r in seed_rows]
        mark("seed", t0)

        t0 = time.perf_counter()
        # the REAL BLAS fit iteration (r10: fused assign+sums Arrow
        # pass — this used to be an inline copy of the old
        # posexplode+avg form, which stopped matching the operator)
        cents = em._kmeans_fit_blas_iter(emb, cents, "embedding")
        mark("fit_iter", t0)

        # final assignment alone (forced via noop)
        t0 = time.perf_counter()
        asg = em.kmeans_assign_kernel(emb, cents, vec_col="embedding", exact=False)
        asg.write.format("noop").mode("overwrite").save()
        mark("assign_only", t0)

        # full kernel (assignment recomputed inside — lazy), minus above
        t0 = time.perf_counter()
        out = em.semdedup_kernel(emb, tau=0.95, k=k, n_iter=0, exact=False)
        out.write.format("noop").mode("overwrite").save()
        mark("n0_full", t0)
        # n_iter=0 skips the fit loop: count+seed+assign+kernel
        print(
            f"rep{rep}: "
            + "  ".join(f"{k_}={v:.2f}s" for k_, v in t.items()),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
