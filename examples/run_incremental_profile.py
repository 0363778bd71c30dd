#!/usr/bin/env python
"""Incremental corpus profiling with mergeable theta sketches — the
100 TB shape the engine's sketch tier exists for: each ingest batch
(per day / per source shard) computes and PERSISTS its tiny survivor
set; the corpus-wide distinct profile is then maintained by folding
survivor sets alone. Raw text is touched exactly once, at ingest.

Demonstrates, on the real sf0.001 documents table split into 5
simulated daily batches:

1. per-batch ``theta_survivors(tag_scale=True)`` written to a
   partitioned parquet profile store (KB per batch, not GB),
2. the cross-batch fold ``theta_estimate`` over the store — never
   re-reading documents — matching the single-pass estimate exactly
   (survivor sets are uniform hash samples: union+distinct == the
   sketch of the union),
3. the guard rail: folding a set built at a DIFFERENT scale raises
   inside the job instead of silently biasing the estimate,
4. honest accuracy: estimate vs the exact per-source distinct count.

Run: python examples/run_incremental_profile.py [out_dir]
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import marex_spark as mx
from marex_spark.operators.sketch import theta_estimate, theta_survivors
from marex_spark.sources.parquet import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
SCALE = 16
N_BATCHES = 5


def shingles(docs):
    words = F.split(F.col("text"), " ")
    idx = F.when(
        F.size(words) >= 3, F.sequence(F.lit(1), F.size(words) - 2)
    ).otherwise(F.array().cast("array<int>"))
    parts = [F.element_at(F.col("w"), F.col("i") + j) for j in range(3)]
    return docs.select(
        "source", words.alias("w"), F.explode(idx).alias("i")
    ).select("source", F.concat_ws(" ", *parts).alias("shingle"))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="mx_prof_")
    store = f"{out}/profile_store"
    spark = mx.get_spark("example-incremental-profile")
    docs = load_table(spark, SF_DIR, "documents")

    # ---- ingest: one survivor set per simulated daily batch ----------
    for day in range(N_BATCHES):
        batch = docs.filter(F.pmod("doc_id", F.lit(N_BATCHES)) == day)
        surv = theta_survivors(
            shingles(batch), ["source"], F.col("shingle"), SCALE, tag_scale=True
        ).withColumn("day", F.lit(day))
        surv.write.mode("append").partitionBy("day").parquet(store)
        n = spark.read.parquet(store).filter(F.col("day") == day).count()
        print(f"day {day}: persisted {n} survivor rows")

    # ---- profile: fold the store, never re-reading documents ---------
    merged = theta_estimate(
        spark.read.parquet(store).drop("day"), ["source"], SCALE
    )
    single_pass = theta_estimate(
        theta_survivors(
            shingles(docs), ["source"], F.col("shingle"), SCALE, tag_scale=True
        ),
        ["source"],
        SCALE,
    )
    m = {r["source"]: r["est_distinct"] for r in merged.collect()}
    s = {r["source"]: r["est_distinct"] for r in single_pass.collect()}
    assert m == s, "survivor-set fold must equal the single-pass sketch"
    print(f"merged profile == single-pass sketch for all {len(m)} sources")

    # ---- honest accuracy vs the exact distinct ------------------------
    exact = {
        r["source"]: r["n"]
        for r in shingles(docs)
        .groupBy("source")
        .agg(F.countDistinct("shingle").alias("n"))
        .collect()
    }
    worst = max(abs(m[k] - exact[k]) / exact[k] for k in exact)
    print(f"worst per-source relative error at scale {SCALE}: {worst:.3f}")

    # ---- guard rail: a foreign-scale set cannot sneak in --------------
    bad = theta_survivors(
        shingles(docs), ["source"], F.col("shingle"), SCALE * 2, tag_scale=True
    )
    try:
        theta_estimate(
            spark.read.parquet(store).drop("day").unionByName(bad),
            ["source"],
            SCALE,
        ).collect()
        raise AssertionError("mixed-scale merge must raise")
    except Exception as e:
        assert "theta_estimate" in str(e)
        print("mixed-scale merge rejected inside the job, as designed")
    print("profile store:", store)
    spark.stop()


if __name__ == "__main__":
    main()
