"""Multimodal-pipeline queries over the documents table: typed binary
metadata, frame sampling, resize planning (oracle-checked SQL algebra),
and the mapInPandas decode/feature kernel (rows-only: the fake decode
is deterministic but byte-level, outside SQL's reach)."""

from __future__ import annotations

from pyspark.sql import functions as F

from marex_spark.functions.multimodal import (
    attach_media,
    extract_features,
    resize_meta,
    sample_frames,
)
from marex_spark.queries.registry import register
from marex_spark.sources.parquet import load_table


@register(
    "mm_media_meta",
    """SELECT doc_id,
              CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
              CAST(n_chars % 64 + 16 AS BIGINT) AS width,
              CAST(n_chars % 48 + 12 AS BIGINT) AS height,
              CAST(n_chars % 30 + 1 AS BIGINT) AS n_frames,
              CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       FROM documents""",
)
def mm_media_meta(spark, sf_dir):
    """Typed metadata for opaque binary media columns: the schema
    contract every downstream multimodal kernel consumes."""
    docs = load_table(spark, sf_dir, "documents")
    m = attach_media(docs)
    return m.select(
        "doc_id",
        F.col("meta.kind").alias("kind"),
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.height").cast("long").alias("height"),
        F.col("meta.n_frames").cast("long").alias("n_frames"),
        F.octet_length("media").cast("long").alias("n_bytes"),
    )


@register(
    "mm_frame_sample",
    """SELECT doc_id, CAST(t.f AS BIGINT) AS frame_idx
       FROM documents,
            UNNEST(generate_series(0, CAST(n_chars % 30 AS BIGINT), 5)) AS t(f)
       WHERE doc_id % 3 = 2""",
)
def mm_frame_sample(spark, sf_dir):
    """Video frame sampling: every 5th frame index exploded to a row
    (sequence+explode — the declarative fan-out the decode kernel maps
    over)."""
    docs = load_table(spark, sf_dir, "documents")
    m = attach_media(docs)
    return sample_frames(m, stride=5).select(
        "doc_id", F.col("frame_idx").cast("long").alias("frame_idx")
    )


@register(
    "mm_resize_plan",
    """SELECT doc_id,
              CAST(GREATEST(CAST(ROUND((n_chars % 64 + 16) * 32.0 / GREATEST(n_chars % 64 + 16, n_chars % 48 + 12)) AS INT), 1) AS BIGINT) AS rw,
              CAST(GREATEST(CAST(ROUND((n_chars % 48 + 12) * 32.0 / GREATEST(n_chars % 64 + 16, n_chars % 48 + 12)) AS INT), 1) AS BIGINT) AS rh
       FROM documents""",
)
def mm_resize_plan(spark, sf_dir):
    """Aspect-preserving resize planning as pure column math."""
    docs = load_table(spark, sf_dir, "documents")
    m = resize_meta(attach_media(docs), max_side=32)
    return m.select(
        "doc_id",
        F.col("resized.width").cast("long").alias("rw"),
        F.col("resized.height").cast("long").alias("rh"),
    )


@register("mm_feature_extract")
def mm_feature_extract(spark, sf_dir):
    """Decode + 8-dim feature extraction through the Arrow-batched
    mapInPandas kernel (stubbed codec, real plumbing). Rows-only: the
    byte-level fake decode is deterministic but not SQL-expressible."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_media(docs))
    return feats.select(
        "doc_id",
        F.round(F.element_at("features", 1), 4).alias("mean_r"),
        F.round(F.element_at("features", 4), 4).alias("std"),
        F.element_at("features", 7).cast("long").alias("width"),
    )
