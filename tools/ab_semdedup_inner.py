"""Kernel-content A/B for the semdedup applyInPandas stage:
  v0 — shipped form (per-row Python loop over pair rows, full X@X.T)
  v1 — vectorized keep rule (matrix dup/drop masks), same full X@X.T
  v2 — v1 + triangle blocking: block row a only multiplies X[a0:].T
       (halves the BLAS flops; pairs (a,b) with b<a0 are never used)
Also verifies all three arms return IDENTICAL keep decisions.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

EMB_DIR = "/tmp/marex_bench_emb1m/embeddings.parquet"
TAU = 0.95


def main() -> None:
    from marex_spark.session import get_spark
    from marex_spark.operators import embed as em

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab_semdedup_inner", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(EMB_DIR)
    n = emb.count()
    k = max(8, -(-n // 4096))
    cents = em.kmeans_fit(emb, k=k, n_iter=1, exact=False)
    asg = em.kmeans_assign_kernel(emb, cents, vec_col="embedding", exact=False)
    asg = asg.select("vec_id", "embedding", "cent_id", "dist2").localCheckpoint()

    import numpy as np
    import pandas as pd

    def _prep(pdf):
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        d2 = pdf["dist2"].to_numpy()[order]
        return ids, order, d2

    def _v0_base(pdf, block_elems):
        ids, order, d2 = _prep(pdf)
        X = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["embedding"].to_numpy()[order]]
        )
        n_c = len(ids)
        keep = np.ones(n_c, dtype=bool)
        if n_c > 1:
            nrm = np.sqrt((X * X).sum(axis=1))
            dropped = np.zeros(n_c, dtype=bool)
            rows_per_block = max(1, block_elems // max(1, n_c))
            for a0 in range(0, n_c - 1, rows_per_block):
                a1 = min(a0 + rows_per_block, n_c - 1)
                dots = X[a0:a1] @ X.T
                for ai in range(a0, a1):
                    bs = np.arange(ai + 1, n_c)
                    if len(bs) == 0:
                        continue
                    with np.errstate(divide="ignore", invalid="ignore"):
                        cos = dots[ai - a0, bs] / (nrm[ai] * nrm[bs])
                    dup = (cos >= TAU) | np.isnan(cos)
                    if not dup.any():
                        continue
                    bdup = bs[dup]
                    da = d2[ai]
                    drop_b = da >= d2[bdup]
                    dropped[bdup[drop_b]] = True
                    if (~drop_b).any():
                        dropped[ai] = True
            keep = ~dropped
        return pd.DataFrame({"vec_id": ids, "cent_id": pdf["cent_id"].to_numpy()[order], "keep": keep})

    def _vec_core(pdf, triangle, block_elems=1 << 24):
        ids, order, d2 = _prep(pdf)
        X = np.stack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
        n_c = len(ids)
        keep = np.ones(n_c, dtype=bool)
        if n_c > 1:
            nrm = np.sqrt((X * X).sum(axis=1))
            dropped = np.zeros(n_c, dtype=bool)
            rows_per_block = max(1, block_elems // max(1, n_c))
            cols = np.arange(n_c)
            for a0 in range(0, n_c - 1, rows_per_block):
                a1 = min(a0 + rows_per_block, n_c - 1)
                if triangle:
                    dots = X[a0:a1] @ X[a0:].T  # (a1-a0, n_c-a0)
                    sub_cols = cols[a0:]
                else:
                    dots = X[a0:a1] @ X.T
                    sub_cols = cols
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dots / (nrm[a0:a1, None] * nrm[sub_cols][None, :])
                dup = (cos >= TAU) | np.isnan(cos)
                dup &= sub_cols[None, :] > np.arange(a0, a1)[:, None]
                if dup.any():
                    drop_b = dup & (d2[a0:a1, None] >= d2[sub_cols][None, :])
                    if triangle:
                        dropped[a0:] |= drop_b.any(axis=0)
                    else:
                        dropped |= drop_b.any(axis=0)
                    dropped[a0:a1] |= (dup & ~drop_b).any(axis=1)
            keep = ~dropped
        return pd.DataFrame({"vec_id": ids, "cent_id": pdf["cent_id"].to_numpy()[order], "keep": keep})

    def _v0(pdf):
        return _v0_base(pdf, 1 << 24)

    def _v0s(pdf):
        return _v0_base(pdf, 1 << 20)

    def _v0t(pdf):
        return _v0_base(pdf, 1 << 18)

    # r10: cache-sized VECTORIZED arms — r9 refuted vectorization only
    # at full-cluster mask sizes (128 MB dots blocks); a vectorized keep
    # rule over the SAME 8 MB blocks as v0s removes the per-row Python
    # loop (n_c iterations/cluster) without the DRAM-thrash temporaries.
    def _v1s(pdf):
        return _vec_core(pdf, triangle=True, block_elems=1 << 20)

    def _v1m(pdf):
        return _vec_core(pdf, triangle=True, block_elems=1 << 22)

    def _v1full(pdf):
        return _vec_core(pdf, triangle=True, block_elems=1 << 24)

    schema = "vec_id long, cent_id long, keep boolean"

    def run(fn, force=True):
        out = asg.groupBy("cent_id").applyInPandas(fn, schema=schema)
        if force:
            out.write.format("noop").mode("overwrite").save()
            return None
        return {(r.vec_id): r.keep for r in out.collect()}

    # equality check first (collect once per arm)
    r0 = run(_v0, force=False)
    r1 = run(_v0s, force=False)
    r2 = run(_v1s, force=False)
    r3 = run(_v1m, force=False)
    print(
        "v0s==v0:", r1 == r0, " v1s==v0:", r2 == r0,
        " v1m==v0:", r3 == r0, flush=True,
    )

    arms = [("v0s", _v0s), ("v1s", _v1s), ("v1m", _v1m), ("v1full", _v1full)]
    reps = int(os.environ.get("AB_REPS", "4"))
    res = {a: [] for a, _ in arms}
    for rep in range(reps):
        for name, fn in arms:
            t0 = time.perf_counter()
            run(fn)
            dt = time.perf_counter() - t0
            res[name].append(dt)
            print(f"rep{rep} {name}: {dt:.2f}s", flush=True)
    for name in res:
        print(f"{name}: min={min(res[name]):.2f}s all={['%.2f' % x for x in res[name]]}")
    spark.stop()


if __name__ == "__main__":
    main()
