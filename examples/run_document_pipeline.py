#!/usr/bin/env python
"""Training-data document pipeline over the synthetic corpus: quality
gates (Gopher rules), PII redaction, exact + MinHash-LSH dedup,
benchmark decontamination (n-gram semi-join AND derived-geometry Bloom
bitset), per-domain capping, BM25 search, theta-sketch per-source
vocabulary profiling, temperature-weighted source mixing, DSIR
importance resampling toward the target language, and CCNet
perplexity bucketing.

Run: python examples/run_document_pipeline.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import marex_spark as mx
from marex_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else SF
    spark = mx.get_spark("example-docs")
    for name in (
        "txt_gopher_rules",
        "txt_pii_redact",
        "dedup_exact",
        "dedup_minhash_lsh",
        "decontam_ngram",
        "decontam_bloom",
        "pipe_domain_cap",
        "txt_bm25_search",
        "sketch_theta_distinct",
        "pipe_source_mix_temperature",
        "pipe_dsir_resample",
        "pipe_ccnet_buckets",
    ):
        df = QUERIES[name](spark, sf)
        print(f"{name}: {df.count()} rows")
        df.show(3, truncate=60)
    spark.stop()


if __name__ == "__main__":
    main()
