"""A/B for shingle_array's short-doc handling on the 5M-doc corpus:
  cur   — per-shingle re-split filter (shipped): every shingle pays
          split(sh)+size just to drop the one short-doc shingle
  guard — document-level guard: when(size(ws) >= n, transform(...))
          (.when(ws not null, empty) keeps NULL-text semantics)
Verifies exact equality of the whole decontam_bloom aggregate first,
then interleaves timed arms on the full 5M-doc bloom row.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

CORPUS = "/tmp/marex_bench_corpus5m/documents.parquet"
N = 5


def cur_shingles(text_col, n):
    ws = F.split(text_col, " ")
    return F.array_distinct(
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0))),
                lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
            ),
            lambda sh: F.size(F.split(sh, " ")) >= n,
        )
    )


def guard_shingles(text_col, n):
    ws = F.split(text_col, " ")
    return F.array_distinct(
        F.when(
            F.size(ws) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - n),
                lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def main() -> None:
    from marex_spark.session import get_spark

    spark = get_spark(app_name="ab_shingle_guard", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(CORPUS)

    # equality gate on a slice including short/NULL docs
    probe = docs.limit(200000).select(
        "doc_id",
        cur_shingles(F.col("text"), N).alias("a"),
        guard_shingles(F.col("text"), N).alias("b"),
    )
    bad = probe.filter(
        ~(
            (F.col("a").isNull() & F.col("b").isNull())
            | (F.col("a") == F.col("b"))
        )
    ).count()
    # synthetic NULL/short rows
    edge = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b"), (4, "a b c d e"), (5, "a b c d e f")],
        "doc_id long, text string",
    ).select(
        "doc_id",
        cur_shingles(F.col("text"), N).alias("a"),
        guard_shingles(F.col("text"), N).alias("b"),
    )
    rows = edge.collect()
    edge_ok = all((r.a is None and r.b is None) or r.a == r.b for r in rows)
    print(f"equality: corpus_mismatch={bad} edge_ok={edge_ok}", flush=True)
    for r in rows:
        print("  edge", r.doc_id, r.a, r.b, flush=True)
    if bad or not edge_ok:
        print("NOT EQUAL — abort")
        spark.stop()
        return

    def probe_row(sh_fn) -> None:
        sh = sh_fn(F.col("text"), N)
        out = (
            docs.select("doc_id", F.explode(sh).alias("shingle"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n"), F.max(F.md5("shingle")).alias("h"))
        )
        out.write.format("noop").mode("overwrite").save()

    arms = [("cur", cur_shingles), ("guard", guard_shingles)]
    res = {a: [] for a, _ in arms}
    for rep in range(int(os.environ.get("AB_REPS", "3"))):
        for name, fn in arms:
            t0 = time.perf_counter()
            probe_row(fn)
            dt = time.perf_counter() - t0
            res[name].append(dt)
            print(f"rep{rep} {name}: {dt:.2f}s", flush=True)
    for name in res:
        print(f"{name}: min={min(res[name]):.2f}s all={['%.2f' % x for x in res[name]]}")
    spark.stop()


if __name__ == "__main__":
    main()
