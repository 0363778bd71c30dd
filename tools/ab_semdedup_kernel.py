"""Kernel-only A/B for the semdedup applyInPandas stage (guide §1.4):
fit + assign once, then time ONLY the grouped kernel under different
partition placements, interleaved in one process.

Arms:
  base      — groupBy("cent_id").applyInPandas as shipped (AQE coalescing on)
  nocoal    — same, spark.sql.adaptive.coalescePartitions.enabled=false
  repart    — explicit repartition(4*cores, cent_id) before the groupBy
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

EMB_DIR = "/tmp/marex_bench_emb1m/embeddings.parquet"


def main() -> None:
    from marex_spark.session import get_spark
    from marex_spark.operators import embed as em

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab_semdedup_kernel", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(EMB_DIR)
    n = emb.count()
    k = max(8, -(-n // 4096))
    cents = em.kmeans_fit(emb, k=k, n_iter=1, exact=False)
    asg = em.kmeans_assign_kernel(emb, cents, vec_col="embedding", exact=False)
    asg = asg.select(
        F.col("vec_id"), "embedding", "cent_id", "dist2"
    ).localCheckpoint()  # pin the input so every arm times ONLY the kernel

    import numpy as np
    import pandas as pd

    tau_f = 0.95

    def _run(pdf):
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        X = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["embedding"].to_numpy()[order]]
        )
        d2 = pdf["dist2"].to_numpy()[order]
        n_c = len(ids)
        keep = np.ones(n_c, dtype=bool)
        if n_c > 1:
            nrm = np.sqrt((X * X).sum(axis=1))
            dropped = np.zeros(n_c, dtype=bool)
            rows_per_block = max(1, (1 << 24) // max(1, n_c))
            for a0 in range(0, n_c - 1, rows_per_block):
                a1 = min(a0 + rows_per_block, n_c - 1)
                dots = X[a0:a1] @ X.T
                for ai in range(a0, a1):
                    bs = np.arange(ai + 1, n_c)
                    if len(bs) == 0:
                        continue
                    with np.errstate(divide="ignore", invalid="ignore"):
                        cos = dots[ai - a0, bs] / (nrm[ai] * nrm[bs])
                    dup = (cos >= tau_f) | np.isnan(cos)
                    if not dup.any():
                        continue
                    bdup = bs[dup]
                    da = d2[ai]
                    drop_b = da >= d2[bdup]
                    dropped[bdup[drop_b]] = True
                    if (~drop_b).any():
                        dropped[ai] = True
            keep = ~dropped
        return pd.DataFrame(
            {"vec_id": ids, "cent_id": pdf["cent_id"].to_numpy()[order], "keep": keep}
        )

    schema = "vec_id long, cent_id long, keep boolean"

    def arm_base():
        out = asg.groupBy("cent_id").applyInPandas(_run, schema=schema)
        out.write.format("noop").mode("overwrite").save()

    def arm_nocoal():
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        try:
            arm_base()
        finally:
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    def arm_repart():
        out = (
            asg.repartition(4 * cores, "cent_id")
            .groupBy("cent_id")
            .applyInPandas(_run, schema=schema)
        )
        out.write.format("noop").mode("overwrite").save()

    arms = [("base", arm_base), ("nocoal", arm_nocoal), ("repart", arm_repart)]
    reps = int(os.environ.get("AB_REPS", "3"))
    res = {a: [] for a, _ in arms}
    for rep in range(reps):
        for name, fn in arms:
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            res[name].append(dt)
            print(f"rep{rep} {name}: {dt:.2f}s", flush=True)
    for name in res:
        print(f"{name}: min={min(res[name]):.2f}s all={['%.2f' % x for x in res[name]]}")
    spark.stop()


if __name__ == "__main__":
    main()
