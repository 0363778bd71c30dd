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


_FEAT_SQL = """WITH docs AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS L,
         CAST(n_chars % 64 + 16 AS BIGINT) AS w,
         CAST(n_chars % 48 + 12 AS BIGINT) AS h
  FROM documents),
pos AS (
  SELECT doc_id, text, L, w, h, UNNEST(range(w * h * 3)) AS p
  FROM docs),
b AS (
  SELECT doc_id, w, h, p % 3 AS ch,
         CAST(ascii(substr(text, CAST(p % L AS INT) + 1, 1)) AS DOUBLE) AS v
  FROM pos),
agg AS (
  SELECT doc_id, w, h,
         SUM(CASE WHEN ch = 0 THEN v END) / (w * h) AS mean_r,
         SUM(CASE WHEN ch = 1 THEN v END) / (w * h) AS mean_g,
         SUM(CASE WHEN ch = 2 THEN v END) / (w * h) AS mean_b,
         sqrt(AVG(v * v) - AVG(v) * AVG(v)) AS sd,
         MIN(v) AS minv, MAX(v) AS maxv
  FROM b GROUP BY doc_id, w, h)
SELECT doc_id,
       ROUND(mean_r, 6) AS mean_r,
       ROUND(mean_g, 6) AS mean_g,
       ROUND(mean_b, 6) AS mean_b,
       ROUND(sd, 2) AS std2,
       CAST(minv AS BIGINT) AS min_v, CAST(maxv AS BIGINT) AS max_v,
       w AS width, h AS height
FROM agg"""


@register("mm_feature_extract", _FEAT_SQL)
def mm_feature_extract(spark, sf_dir):
    """Decode + 8-dim feature extraction through the Arrow-batched
    mapInPandas kernel (stubbed codec, real plumbing). The stub tiles
    the (ASCII) payload bytes into (h, w, 3) pixels, so the channel
    means and min/max are EXACT integer-sum arithmetic the oracle
    replays by exploding byte positions (channel = flat index mod 3,
    byte = position mod payload length). Integer sums are exact in
    float64, making the means bit-identical; std is rounded to 2
    decimals (numpy's two-pass vs SQL's moment formula differ at
    ~1e-13). ORACLE PRECONDITION: the documents fixture is pure ASCII
    and non-empty (verified for the driver's testdata at every SF) —
    the SQL tiles by character position, which equals the engine's
    byte tiling only for 1-byte characters."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_media(docs))
    return feats.select(
        "doc_id",
        F.round(F.element_at("features", 1), 6).alias("mean_r"),
        F.round(F.element_at("features", 2), 6).alias("mean_g"),
        F.round(F.element_at("features", 3), 6).alias("mean_b"),
        F.round(F.element_at("features", 4), 2).alias("std2"),
        F.element_at("features", 5).cast("long").alias("min_v"),
        F.element_at("features", 6).cast("long").alias("max_v"),
        F.element_at("features", 7).cast("long").alias("width"),
        F.element_at("features", 8).cast("long").alias("height"),
    )


@register(
    "mm_scene_cuts",
    """WITH f AS (
      SELECT doc_id, CAST(t.f AS BIGINT) AS frame_idx,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                                      CAST(t.f AS VARCHAR)), 1, 8)) AS BIGINT)
               / 4294967296.0 AS sig
      FROM documents,
           UNNEST(generate_series(0, CAST(n_chars % 30 AS BIGINT), 5)) AS t(f)
      WHERE doc_id % 3 = 2),
    d AS (
      SELECT doc_id, frame_idx,
             ABS(sig - LAG(sig) OVER (PARTITION BY doc_id
                                      ORDER BY frame_idx)) AS diff
      FROM f)
    SELECT doc_id, frame_idx,
           FLOOR(diff * 1e6 + 0.5) / 1e6 AS cut_score
    FROM d WHERE diff > 0.5""",
)
def mm_scene_cuts(spark, sf_dir):
    """Video scene-cut detection plumbing: per sampled frame a
    signature (here the deterministic stub — md5-uniform per
    (doc, frame); a real pipeline injects a perceptual-hash or
    embedding decoder via functions/multimodal.set_decoder), then a
    per-video LAG window flags frames whose signature jumps past the
    threshold. The shape is the point: frame fan-out → doc-partitioned
    lag diff → filter, one shuffle keyed by video — at 100 TB every
    video's frames co-locate once and the cut scan is window-local,
    never a self-join."""
    from pyspark.sql import Window as W

    from marex_spark.queries.registry import round6

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_media(docs), stride=5)
    sig = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("doc_id").cast("string"),
                        F.col("frame_idx").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    w = W.partitionBy("doc_id").orderBy("frame_idx")
    d = frames.select(
        "doc_id", F.col("frame_idx").cast("long").alias("frame_idx"), sig.alias("sig")
    ).withColumn("diff", F.abs(F.col("sig") - F.lag("sig").over(w)))
    return d.filter(F.col("diff") > 0.5).select(
        "doc_id", "frame_idx", round6(F.col("diff")).alias("cut_score")
    )
