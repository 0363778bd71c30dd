"""Multimodal plumbing tests: binary column round-trip, Arrow batch
shapes through mapInPandas, deterministic stub decode, frame fan-out."""

from __future__ import annotations

from pyspark.sql import functions as F

from marex_spark.functions.multimodal import (
    _fake_decode,
    attach_media,
    extract_features,
    sample_frames,
)


def _docs(spark):
    rows = [(i, "x" * (10 + i * 7), "en", "web", 10 + i * 7) for i in range(20)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_fake_decode_shape_and_determinism():
    a = _fake_decode(b"hello world", 16, 12)
    assert a.shape == (12, 16, 3) and a.dtype.name == "uint8"
    b = _fake_decode(b"hello world", 16, 12)
    assert (a == b).all()


def test_media_schema(spark):
    m = attach_media(_docs(spark))
    assert dict(m.dtypes)["media"] == "binary"
    meta = m.schema["meta"].dataType
    assert {f.name for f in meta.fields} == {
        "kind", "width", "height", "n_frames", "sample_rate",
    }


def test_feature_extraction_through_arrow(spark):
    m = attach_media(_docs(spark)).repartition(4)
    feats = extract_features(m)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r.features) == 8 for r in rows)
    # 'x' == 0x78 == 120: constant-payload image has mean 120, std 0
    const = [r for r in rows if r.features[3] == 0.0]
    assert const and all(r.features[0] == 120.0 for r in const)


def test_frame_sampling_fanout(spark):
    m = attach_media(_docs(spark))
    frames = sample_frames(m, stride=5)
    pdf = frames.toPandas()
    assert (pdf["frame_idx"] % 5 == 0).all()
    meta = {r.doc_id: r.asDict() for r in m.select("doc_id", "meta.*").collect()}
    for doc_id, g in pdf.groupby("doc_id"):
        assert meta[doc_id]["kind"] == "video"
        expect = len(range(0, meta[doc_id]["n_frames"], 5))
        assert len(g) == expect
