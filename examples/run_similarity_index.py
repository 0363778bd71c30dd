#!/usr/bin/env python
"""Embedding similarity pipeline: normalise -> train IVF centroids
with distributed k-means -> bucket the corpus -> multi-probe ANN, and
an in-engine quality classifier (hashed-BoW logistic regression) on
the document corpus.

Run: python examples/run_similarity_index.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    from marex_spark.operators.classify import (
        hashed_bow_features,
        logreg_fit,
        logreg_predict,
    )
    from marex_spark.operators.embed import (
        embedding_normalize,
        kmeans_assign,
        kmeans_fit,
    )
    from marex_spark.session import get_spark
    from marex_spark.sources.parquet import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="similarity-index-example")

    print("== IVF index training (distributed Lloyd's k-means) ==")
    emb = embedding_normalize(load_table(spark, sf_dir, "embeddings"))
    cents = kmeans_fit(emb, k=8, n_iter=4)
    bucketed = kmeans_assign(emb, cents)
    bucketed.groupBy("cent_id").count().orderBy("cent_id").show()

    print("== PQ compression + IVF-PQ query (Faiss index shape) ==")
    from marex_spark.operators.embed import kmeans_assign_cols, pq_fit

    books = pq_fit(emb, m=4, k=8, n_iter=1)
    codes = emb.select(
        "vec_id",
        *[
            kmeans_assign_cols(F.slice("embedding", j * 16 + 1, 16), books[j])[0]
            .alias(f"code{j}")
            for j in range(4)
        ],
    )
    print("   corpus as 4 uint8 codes/vector (64x smaller than float32):")
    codes.show(3)

    print("== PQ-ADC scoring (zero-exchange scan) + IVF-PQ top-k ==")
    from marex_spark.queries import QUERIES

    for name in ("ann_pq_adc_fast", "ann_ivfpq_topk", "ann_hard_negatives"):
        out = QUERIES[name](spark, sf_dir)
        print(f"   {name}:")
        out.show(3, truncate=40)

    print("== quality classifier (hashed-BoW logistic regression) ==")
    docs = load_table(spark, sf_dir, "documents")
    feats = hashed_bow_features(docs, dim=16).localCheckpoint()
    labels = docs.select(
        "doc_id", (F.col("lang") == "en").cast("double").alias("y")
    )
    w = logreg_fit(feats, labels, dim=16, n_iter=10, lr=1.0,
                   features_materialized=True)
    pred = logreg_predict(feats, w).join(labels, "doc_id")
    acc = (
        pred.filter(
            (F.col("label") & (F.col("y") == 1.0))
            | (~F.col("label") & (F.col("y") == 0.0))
        ).count()
        / pred.count()
    )
    print(f"   train accuracy (en-vs-rest): {acc:.3f}")
    print(
        "   (the synthetic corpus shares one vocabulary across langs, so"
        " ~majority-class accuracy is expected here; the planted-"
        "vocabulary test in tests/test_classify.py shows full separation)"
    )

    print("== BPE tokenizer training (in-engine) ==")
    from marex_spark.operators.bpe import bpe_fit, word_frequency

    words = word_frequency(docs).localCheckpoint()
    merges = bpe_fit(words, n_merges=6)
    print("   learned merges:", " ".join(f"{l}+{r}" for l, r in merges))

    print("== SRP hyperplane-LSH index (training-free, Charikar 2002) ==")
    from marex_spark.operators.embed import srp_fingerprints_fast
    from marex_spark.operators.simhash import simhash_bands

    emb = load_table(spark, sf_dir, "embeddings")
    fps = srp_fingerprints_fast(emb)  # numpy tier; md5-derived planes
    bands = simhash_bands(fps, bands=8, band_bits=8,
                          id_col="vec_id", fp_name="srp")
    q = bands.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("q_id"), "band", "key"
    )
    c = bands.select(F.col("doc_id").alias("c_id"), "band", "key")
    cand = (
        q.join(c, ["band", "key"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
        .distinct()
    )
    n_corpus = emb.count()
    per_q = cand.groupBy("q_id").count().agg(F.avg("count")).first()[0]
    print(
        f"   probe touches ~{per_q:.0f}/{n_corpus} vectors per query "
        f"({100 * per_q / n_corpus:.1f}% of the corpus; exact-cosine "
        "rerank + measured recall live in ann_srp_topk / ann_srp_recall)"
    )

    print("== SRP at the scale-safe geometry (r9): 4x16 bands + multi-probe ==")
    # Same 64-bit fingerprints; 16-bit band keys make buckets ~n/65,536
    # and the query side probes each key plus its 16 hamming-1
    # neighbours — candidates drop ~20-30x vs the 8x8 slices at equal
    # planted-neighbour recall (see ann_srp_curve_clustered).
    from marex_spark.queries.similarity import _srp_candidates_from_fps

    cand16 = _srp_candidates_from_fps(fps, 4, 16, probe_1bit=True, nq=5)
    per_q16 = (
        cand16.groupBy("q_id").count().agg(F.avg("count")).first() or [0.0]
    )[0] or 0.0
    print(
        f"   multi-probe candidates: ~{per_q16:.0f}/{n_corpus} per query "
        f"({100 * per_q16 / n_corpus:.2f}% of the corpus; serving row "
        "ann_srp16_topk, operating curve ann_srp_curve_clustered)"
    )


if __name__ == "__main__":
    main()
