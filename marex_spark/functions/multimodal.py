"""Multimodal column support: images/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``
kernels (the same chunk-function-chunk contract as the engine's
labelling UDFs).

The actual media codecs (PIL/ffmpeg/soundfile) are NOT available in
this environment, so ``decode_image`` is a clearly-marked DETERMINISTIC
FAKE (bytes → pseudo-pixel array); swap in a real decoder via
``set_decoder``. Everything Spark-side — schema, partitioning, UDF
signatures, Arrow batch shapes — is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "kind string, width int, height int, n_frames int, sample_rate int"
)

_N_FEATURES = 8


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """DETERMINISTIC FAKE decode: tile the payload bytes into an
    (height, width, 3) uint8 array. Stands in for PIL.Image.open —
    replace via set_decoder() when a codec is installed."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) == 0:
        buf = np.zeros(1, dtype=np.uint8)
    n = width * height * 3
    reps = -(-n // len(buf))
    return np.tile(buf, reps)[:n].reshape(height, width, 3)


_decoder: Callable[[bytes, int, int], np.ndarray] = _fake_decode


def set_decoder(fn: Callable[[bytes, int, int], np.ndarray]) -> None:
    """Install a real decoder (e.g. PIL-backed) in place of the fake."""
    global _decoder
    _decoder = fn


try:  # real decoder if a codec library is present (not in this image)
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def attach_media(docs: DataFrame) -> DataFrame:
    """Derive a media table from the documents table: payload = utf-8
    bytes of the text (an opaque binary stand-in), metadata typed from
    deterministic doc properties. Schema: (doc_id, media binary,
    meta struct<kind, width, height, n_frames, sample_rate>)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        kind.alias("kind"),
        (F.col("n_chars") % 64 + 16).cast("int").alias("width"),
        (F.col("n_chars") % 48 + 12).cast("int").alias("height"),
        (F.col("n_chars") % 30 + 1).cast("int").alias("n_frames"),
        F.lit(16000).cast("int").alias("sample_rate"),
    )
    return docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("media"), meta.alias("meta")
    )


def extract_features(media: DataFrame, batch_hint: int = 0) -> DataFrame:
    """Decode + feature-extract via mapInPandas: per row, decode the
    payload to pixels (stubbed) and emit an 8-dim float feature vector
    (channel means/stds + shape). Arrow-batched; scales by input
    partitioning (repartition upstream for skewed media sizes)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, w, h in zip(
                pdf["media"], pdf["meta_width"], pdf["meta_height"]
            ):
                img = _decoder(bytes(payload), int(w), int(h))
                f64 = img.astype(np.float64)
                feats.append(
                    [
                        float(f64[..., 0].mean()),
                        float(f64[..., 1].mean()),
                        float(f64[..., 2].mean()),
                        float(f64.std()),
                        float(f64.min()),
                        float(f64.max()),
                        float(w),
                        float(h),
                    ]
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    flat = media.select(
        "doc_id",
        "media",
        F.col("meta.width").alias("meta_width"),
        F.col("meta.height").alias("meta_height"),
    )
    return flat.mapInPandas(_extract, schema="doc_id long, features array<double>")


def resize_meta(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize planning as metadata math (the pixel resample itself lives
    in the decode kernel): scale so max(width, height) == max_side,
    preserving aspect ratio. Pure column expressions — JVM-side."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.lit(max_side) / F.greatest(w, h)
    return media.withColumn(
        "resized",
        F.struct(
            F.greatest(F.round(w * scale).cast("int"), F.lit(1)).alias("width"),
            F.greatest(F.round(h * scale).cast("int"), F.lit(1)).alias("height"),
        ),
    )


def sample_frames(media: DataFrame, stride: int = 5) -> DataFrame:
    """Frame sampling for video rows: explode every ``stride``-th frame
    index into its own row (the decode of each frame is the stubbed
    kernel's job). sequence+explode keeps the fan-out declarative."""
    vids = media.filter(F.col("meta.kind") == "video")
    return vids.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(stride))
        ).alias("frame_idx"),
    )
