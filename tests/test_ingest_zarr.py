"""Zarr-v2 ingestion round-trip (reference helper.py:733-736 native
input path): a store written chunk-by-chunk with the stdlib (zlib
codec, NaN fill) must land in the engine's long and packed layouts
with exact values — including edge chunks and missing-chunk fill."""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pytest


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    """5×4×6 (time,y,x) float32 store, chunks (2,3,4) → edge chunks on
    every axis; one chunk file deliberately missing (all-fill)."""
    root = tmp_path_factory.mktemp("zstore")
    T, NY, NX = 5, 4, 6
    ct, cy, cx = 2, 3, 4
    a = (
        np.arange(T)[:, None, None] * 100.0
        + np.arange(NY)[None, :, None] * 10.0
        + np.arange(NX)[None, None, :]
    ).astype(np.float32)

    var_dir = root / "sst"
    var_dir.mkdir()
    meta = {
        "zarr_format": 2,
        "shape": [T, NY, NX],
        "chunks": [ct, cy, cx],
        "dtype": "<f4",
        "order": "C",
        "compressor": {"id": "zlib", "level": 1},
        "fill_value": "NaN",
        "filters": None,
    }
    (var_dir / ".zarray").write_text(json.dumps(meta))
    for it in range(-(-T // ct)):
        for iy in range(-(-NY // cy)):
            for ix in range(-(-NX // cx)):
                if (it, iy, ix) == (2, 1, 1):
                    continue  # missing chunk → fill
                chunk = np.full((ct, cy, cx), np.nan, dtype=np.float32)
                ts = a[it * ct : (it + 1) * ct, iy * cy : (iy + 1) * cy, ix * cx : (ix + 1) * cx]
                chunk[: ts.shape[0], : ts.shape[1], : ts.shape[2]] = ts
                (var_dir / f"{it}.{iy}.{ix}").write_bytes(
                    zlib.compress(chunk.tobytes(), 1)
                )

    tdir = root / "time"
    tdir.mkdir()
    (tdir / ".zarray").write_text(
        json.dumps(
            {
                "zarr_format": 2,
                "shape": [T],
                "chunks": [T],
                "dtype": "<i8",
                "order": "C",
                "compressor": None,
                "fill_value": 0,
                "filters": None,
            }
        )
    )
    days = np.arange(18262, 18262 + T, dtype=np.int64)  # 2020-01-01…
    (tdir / "0").write_bytes(days.tobytes())
    return str(root), a


def test_zarr_long_roundtrip(spark, store):
    from marex_spark.sources.zarr import ingest_zarr_gridded

    root, a = store
    df = ingest_zarr_gridded(spark, root, "sst", layout="long")
    got = {(r.time.day, r.y, r.x): r.value for r in df.collect()}
    # the missing chunk (t∈{4}, y=3, x∈{4,5}) must be absent (fill=NaN)
    expect = {
        (t + 1, y, x): float(a[t, y, x])
        for t in range(5)
        for y in range(4)
        for x in range(6)
        if not (t == 4 and y == 3 and x >= 4)
    }
    assert set(got) == set(expect)
    assert all(abs(got[k] - expect[k]) < 1e-5 for k in expect)


def test_zarr_unknown_filter_refused():
    """Stores with filter stages we can't replay byte-exactly must
    refuse loudly — decoding around them would silently corrupt every
    value (r2 review). Known numcodecs filters now decode natively."""
    from marex_spark.sources.zarr import _decode_chunk

    meta = {
        "chunks": [1],
        "dtype": "<f4",
        "compressor": None,
        "filters": [{"id": "categorize", "labels": ["a"], "dtype": "<U1"}],
    }
    with pytest.raises(NotImplementedError, match="filter"):
        _decode_chunk(b"\x00\x00\x00\x00", meta)


class TestZarrV2Filters:
    """The stdlib reader replays numcodecs' documented decode formulas
    for the array-to-array filters real climate stores use (Delta,
    FixedScaleOffset, Quantize, Shuffle, AsType, PackBits). Each test
    ENCODES with the published numcodecs encode formula — that formula
    IS the spec — and asserts the reader inverts it exactly."""

    @staticmethod
    def _decode(buf, filters, dtype, n):
        from marex_spark.sources.zarr import _decode_chunk

        meta = {
            "chunks": [n],
            "dtype": dtype,
            "compressor": None,
            "filters": filters,
        }
        return _decode_chunk(buf, meta)

    def test_delta(self):
        rng = np.random.default_rng(7)
        arr = np.cumsum(rng.integers(0, 50, 64)).astype("<i8")
        # numcodecs Delta.encode: enc[0]=arr[0]; enc[1:]=np.diff(arr)
        enc = np.empty_like(arr, dtype="<i4")
        enc[0] = arr[0]
        enc[1:] = np.diff(arr)
        got = self._decode(
            enc.tobytes(),
            [{"id": "delta", "dtype": "<i8", "astype": "<i4"}],
            "<i8",
            arr.size,
        )
        np.testing.assert_array_equal(got, arr)

    def test_fixedscaleoffset(self):
        rng = np.random.default_rng(8)
        arr = (1000 + rng.random(48) * 10).astype("<f8")
        offset, scale = 1000.0, 100.0  # 2 decimal digits kept
        # numcodecs FixedScaleOffset.encode: round((x-offset)*scale)
        enc = np.around((arr - offset) * scale).astype("<i2")
        got = self._decode(
            enc.tobytes(),
            [
                {
                    "id": "fixedscaleoffset",
                    "offset": offset,
                    "scale": scale,
                    "dtype": "<f8",
                    "astype": "<i2",
                }
            ],
            "<f8",
            arr.size,
        )
        # decode formula: enc/scale + offset (lossy to 1/scale)
        np.testing.assert_allclose(got, arr, atol=0.5 / scale + 1e-12)
        np.testing.assert_array_equal(
            got, enc.astype("<f8") / scale + offset
        )

    def test_quantize_and_astype(self):
        rng = np.random.default_rng(9)
        arr = rng.random(32).astype("<f8")
        # numcodecs Quantize.encode keeps `digits` bits; decode is a
        # pure dtype cast from astype back to dtype
        digits = 3
        precision = 10.0 ** -digits
        exp = np.floor(np.log10(precision))
        bits = np.ceil(np.log2(10.0 ** -exp))
        scale = 2.0 ** bits
        q = (np.around(scale * arr) / scale).astype("<f4")
        got = self._decode(
            q.tobytes(),
            [{"id": "quantize", "digits": digits, "dtype": "<f8", "astype": "<f4"}],
            "<f8",
            arr.size,
        )
        np.testing.assert_array_equal(got, q.astype("<f8"))
        np.testing.assert_allclose(got, arr, atol=2 * precision)
        # astype: encode_dtype -> decode_dtype cast
        small = np.arange(20, dtype="<i2")
        got2 = self._decode(
            small.tobytes(),
            [{"id": "astype", "encode_dtype": "<i2", "decode_dtype": "<i8"}],
            "<i8",
            small.size,
        )
        np.testing.assert_array_equal(got2, small.astype("<i8"))

    def test_shuffle(self):
        arr = np.arange(24, dtype="<f4")
        # numcodecs Shuffle.encode: byte-lane transpose (lane-major)
        es = 4
        enc = (
            np.frombuffer(arr.tobytes(), dtype=np.uint8)
            .reshape(arr.size, es)
            .T.tobytes()
        )
        got = self._decode(
            enc, [{"id": "shuffle", "elementsize": es}], "<f4", arr.size
        )
        np.testing.assert_array_equal(got, arr)

    def test_packbits(self):
        arr = np.array([True, False, True, True, False] * 3, dtype=bool)
        # numcodecs PackBits.encode: header byte = padded-bit count
        n_leftover = arr.size % 8
        header = np.uint8(0 if n_leftover == 0 else 8 - n_leftover)
        enc = np.concatenate([[header], np.packbits(arr)]).astype("u1")
        got = self._decode(
            enc.tobytes(), [{"id": "packbits"}], "|b1", arr.size
        )
        np.testing.assert_array_equal(got, arr)

    def test_chain_order_and_store_roundtrip(self, tmp_path):
        """Filters apply encode-order first-to-last, decode in reverse;
        a delta+shuffle chain under zlib must read back exactly through
        the public driver-side reader."""
        import zlib as _zlib

        from marex_spark.sources.zarr import read_array_driver

        rng = np.random.default_rng(10)
        arr = np.cumsum(rng.integers(-3, 9, 40)).astype("<i4")
        # encode: delta first, then shuffle, then the compressor
        enc = np.empty_like(arr)
        enc[0] = arr[0]
        enc[1:] = np.diff(arr)
        shuffled = (
            np.frombuffer(enc.tobytes(), dtype=np.uint8)
            .reshape(arr.size, 4)
            .T.tobytes()
        )
        var = tmp_path / "v"
        var.mkdir(parents=True)
        (var / ".zarray").write_text(
            json.dumps(
                {
                    "zarr_format": 2,
                    "shape": [40],
                    "chunks": [40],
                    "dtype": "<i4",
                    "order": "C",
                    "compressor": {"id": "zlib", "level": 1},
                    "filters": [
                        {"id": "delta", "dtype": "<i4"},
                        {"id": "shuffle", "elementsize": 4},
                    ],
                    "fill_value": 0,
                }
            )
        )
        (var / "0").write_bytes(_zlib.compress(shuffled, 1))
        got = read_array_driver(str(var))
        np.testing.assert_array_equal(got, arr)


def test_zarr_v2_big_endian_dtype(tmp_path):
    """v2 stores may declare big-endian dtypes ('>f4'); the reader
    passes the declared dtype straight to numpy, so values must round
    byte order correctly."""
    from marex_spark.sources.zarr import read_array_driver

    var = tmp_path / "v"
    var.mkdir()
    a = (np.arange(12, dtype="<f4").reshape(3, 4) * 1.5).astype(">f4")
    (var / ".zarray").write_text(json.dumps({
        "zarr_format": 2, "shape": [3, 4], "chunks": [3, 4],
        "dtype": ">f4", "order": "C",
        "compressor": {"id": "zlib", "level": 1},
        "filters": None, "fill_value": 0,
    }))
    (var / "0.0").write_bytes(zlib.compress(a.tobytes(), 1))
    out = read_array_driver(str(var))
    np.testing.assert_array_equal(out.astype("f8"), a.astype("f8"))


def test_zarr_string_fill_value(tmp_path, spark):
    """zarr-v2 JSON string-encoded fill ('Infinity') must be decoded
    before the fill comparison, not silently compared as a string."""
    import numpy as np

    root = tmp_path / "store"
    var = root / "v"
    var.mkdir(parents=True)
    a = np.array([[[1.5, np.inf], [2.5, 3.5]]], dtype=np.float32)  # (1,2,2)
    (var / ".zarray").write_text(
        json.dumps(
            {
                "zarr_format": 2,
                "shape": [1, 2, 2],
                "chunks": [1, 2, 2],
                "dtype": "<f4",
                "order": "C",
                "compressor": None,
                "fill_value": "Infinity",
                "filters": None,
            }
        )
    )
    (var / "0.0.0").write_bytes(a.tobytes())
    from marex_spark.sources.zarr import ingest_zarr_gridded

    df = ingest_zarr_gridded(spark, str(root), "v", layout="long")
    got = {(r.y, r.x): r.value for r in df.collect()}
    assert (0, 1) not in got  # +inf == fill → dropped
    assert abs(got[(0, 0)] - 1.5) < 1e-6 and len(got) == 3


def test_zarr_packed_roundtrip(spark, store):
    from marex_spark.sources.zarr import ingest_zarr_gridded

    root, a = store
    packed = ingest_zarr_gridded(spark, root, "sst", layout="packed")
    row = [r for r in packed.collect() if r.time.day == 2 and r.y == 1][0]
    assert [round(v, 2) for v in row.vals] == [
        round(float(a[1, 1, x]), 2) for x in range(6)
    ]


def test_zattrs_calendar_decode(spark, tmp_path):
    """A time array with CF .zattrs (units + noleap calendar) decodes by
    model-day arithmetic: day 365 of a noleap series is Jan 1 of the
    next year, day-of-year 1."""
    root = tmp_path / "cal.zarr"
    T, NY, NX = 366, 1, 2
    var_dir = root / "sst"
    var_dir.mkdir(parents=True)
    a = np.arange(T * NY * NX, dtype=np.float32).reshape(T, NY, NX)
    (var_dir / ".zarray").write_text(json.dumps({
        "zarr_format": 2, "shape": [T, NY, NX], "chunks": [T, NY, NX],
        "dtype": "<f4", "order": "C", "compressor": None,
        "fill_value": "NaN", "filters": None,
    }))
    (var_dir / "0.0.0").write_bytes(a.tobytes())
    tdir = root / "time"
    tdir.mkdir()
    (tdir / ".zarray").write_text(json.dumps({
        "zarr_format": 2, "shape": [T], "chunks": [T], "dtype": "<i8",
        "order": "C", "compressor": None, "fill_value": 0, "filters": None,
    }))
    (tdir / "0").write_bytes(np.arange(T, dtype=np.int64).tobytes())
    (tdir / ".zattrs").write_text(json.dumps({
        "units": "days since 2000-01-01", "calendar": "noleap",
    }))

    from pyspark.sql import functions as F

    from marex_spark.sources.zarr import ingest_zarr_gridded

    df = ingest_zarr_gridded(spark, str(root), "sst", layout="long")
    d365 = df.filter(F.col("value") == 365 * NX).select(
        F.year("time").alias("y"), F.dayofyear("time").alias("d")
    ).first()
    assert (d365.y, d365.d) == (2001, 1)  # noleap: no Feb 29 slot


def test_read_array_driver_integer_fill(tmp_path):
    """Missing chunks of an INTEGER array must read back as the store's
    fill_value (e.g. -1 'no neighbour' padding), not fabricated zeros."""
    import json
    import os
    import zlib

    import numpy as np

    from marex_spark.sources.zarr import read_array_driver

    d = tmp_path / "arr"
    os.makedirs(d)
    meta = {
        "zarr_format": 2, "shape": [4, 3], "chunks": [2, 3],
        "dtype": "<i4", "order": "C", "fill_value": -1,
        "compressor": {"id": "zlib", "level": 1}, "filters": None,
    }
    (d / ".zarray").write_text(json.dumps(meta))
    # write ONLY chunk 0.0; chunk 1.0 is omitted (all-fill)
    a = np.arange(6, dtype="<i4").reshape(2, 3)
    (d / "0.0").write_bytes(zlib.compress(a.tobytes()))
    out = read_array_driver(str(d))
    np.testing.assert_array_equal(out[:2], a)
    assert (out[2:] == -1).all()


class TestBloscDecoders:
    """Spec-derived vectors for the pure-Python codec primitives
    (sources/blosc.py) — the lz4 path is also validated end-to-end
    against the reference's real stores in test_reference_parity."""

    def test_blosclz_vectors(self):
        from marex_spark.sources.blosc import _blosclz_decompress

        # ctrl=0x01 -> 2 literals; ctrl=0x40 -> match len 4, ofs 1
        # (overlapping copy from dst[-2]) -> "ababab"
        s = bytes([0x01]) + b"ab" + bytes([0x40, 0x01])
        assert _blosclz_decompress(s, 6) == b"ababab"
        assert _blosclz_decompress(bytes([0x04]) + b"hello", 5) == b"hello"

    def test_lz4_vectors(self):
        from marex_spark.sources.blosc import lz4_block_decompress

        assert lz4_block_decompress(bytes([0x50]) + b"hello", 5) == b"hello"
        # 2 literals + overlapping match (len 6, offset 2)
        l2 = bytes([0x22]) + b"ab" + bytes([0x02, 0x00])
        assert lz4_block_decompress(l2, 8) == b"abababab"
        # long literal run (>=15 -> extension byte)
        payload = bytes(range(20))
        l3 = bytes([0xF0, 0x05]) + payload
        assert lz4_block_decompress(l3, 20) == payload

    def test_unshuffle(self):
        import numpy as np

        from marex_spark.sources.blosc import _unshuffle

        a = np.arange(12, dtype="<i4")
        shuf = a.view(np.uint8).reshape(12, 4).T.tobytes()
        assert _unshuffle(shuf, 4) == a.tobytes()


# --------------------------------------------------------------- writer


class TestWriteZarr:
    def _long_df(self, spark):
        """Deterministic 7-day 5x9 grid with two NaN holes."""
        from pyspark.sql import functions as F

        df = (
            spark.range(7 * 5 * 9)
            .select(
                F.expr("date_add(DATE '2001-03-01', CAST(id / 45 AS INT))")
                .cast("timestamp")
                .alias("time"),
                (F.col("id") % 45 / 9).cast("int").alias("y"),
                (F.col("id") % 9).cast("int").alias("x"),
                (F.col("id") * 2).cast("float").alias("value"),
            )
            # punch two holes: absent rows must round-trip as NaN/absent
            .filter("NOT (y = 1 AND x = 2)")
        )
        return df

    def test_roundtrip_through_reader(self, spark, tmp_path):
        from marex_spark.sources.zarr import ingest_zarr_gridded, write_zarr_gridded

        store = str(tmp_path / "w.zarr")
        df = self._long_df(spark)
        receipts = write_zarr_gridded(
            df, store, var="sst", chunks=(3, 2, 4)
        )
        # every chunk wrote exactly once, with plausible payload sizes
        rec = {(r.it, r.iy, r.ix): r for r in receipts.collect()}
        assert len(rec) == 3 * 3 * 3  # ceil(7/3) x ceil(5/2) x ceil(9/4)
        assert all(r.n_bytes > 0 for r in rec.values())

        back = ingest_zarr_gridded(spark, store, "sst", layout="long")
        a = {(r.time, r.y, r.x): r.value for r in df.collect()}
        b = {(r.time, r.y, r.x): r.value for r in back.collect()}
        assert a == b

    def test_metadata_is_xarray_compatible(self, spark, tmp_path):
        from marex_spark.sources.zarr import write_zarr_gridded

        store = str(tmp_path / "m.zarr")
        write_zarr_gridded(self._long_df(spark), store, var="sst")
        meta = json.load(open(os.path.join(store, "sst", ".zarray")))
        assert meta["zarr_format"] == 2
        assert meta["shape"] == [7, 5, 9]
        assert meta["dtype"] == "<f4"
        assert meta["fill_value"] == "NaN"
        zattrs = json.load(open(os.path.join(store, "sst", ".zattrs")))
        assert zattrs["_ARRAY_DIMENSIONS"] == ["time", "y", "x"]
        tmeta = json.load(open(os.path.join(store, "time", ".zattrs")))
        assert tmeta["units"].startswith("days since 1970")
        # coordinate values decode driver-side
        from marex_spark.sources.zarr import _read_small_array

        t = _read_small_array(os.path.join(store, "time"))
        assert t[0] == (np.datetime64("2001-03-01") - np.datetime64("1970-01-01")).astype(int)
        assert len(t) == 7

    def test_empty_chunks_skipped_and_refilled(self, spark, tmp_path):
        """An all-NaN chunk writes no file; the reader treats the
        missing file as fill (round-trips to absence)."""
        from pyspark.sql import functions as F

        from marex_spark.sources.zarr import ingest_zarr_gridded, write_zarr_gridded

        store = str(tmp_path / "e.zarr")
        # values only in y<2: with cy=2 the iy=1 stripe (y 2..3) is empty
        df = (
            spark.range(4 * 4)
            .select(
                F.lit("2001-01-01").cast("timestamp").alias("time"),
                (F.col("id") / 4).cast("int").alias("y"),
                (F.col("id") % 4).cast("int").alias("x"),
                F.col("id").cast("float").alias("value"),
            )
            .filter("y < 2")
        )
        receipts = write_zarr_gridded(
            df, store, var="v", ny=4, nx=4, chunks=(1, 2, 4)
        )
        rec = {(r.it, r.iy, r.ix): r.n_bytes for r in receipts.collect()}
        # the empty stripe has no rows, hence no group, no receipt, no file
        assert (0, 1, 0) not in rec
        assert not os.path.exists(os.path.join(store, "v", "0.1.0"))
        back = ingest_zarr_gridded(spark, store, "v", layout="long")
        assert back.count() == 8
        assert back.agg({"y": "max"}).first()[0] == 1

    def test_raw_compressor_and_driver_read(self, spark, tmp_path):
        from marex_spark.sources.zarr import read_array_driver, write_zarr_gridded

        store = str(tmp_path / "r.zarr")
        write_zarr_gridded(
            self._long_df(spark), store, var="sst", compressor={}, ny=5, nx=9
        )
        a = read_array_driver(os.path.join(store, "sst"))
        assert a.shape == (7, 5, 9)
        assert a[0, 0, 0] == 0.0
        assert np.isnan(a[0, 1, 2])  # the punched hole
        assert a[6, 4, 8] == float((7 * 45 - 1) * 2)

    def test_empty_input_refused(self, spark, tmp_path):
        from marex_spark.exceptions import DataValidationError
        from marex_spark.sources.zarr import write_zarr_gridded

        df = self._long_df(spark).filter("1 = 0")
        with pytest.raises(DataValidationError):
            write_zarr_gridded(df, str(tmp_path / "x.zarr"))

    def test_int_id_field_export(self, spark, tmp_path):
        """Integer dtype path: the reference-style event-ID field
        (int32, background fill 0) round-trips through driver read and
        the distributed reader (background dropped as fill)."""
        from pyspark.sql import functions as F

        from marex_spark.sources.io import export_events_zarr
        from marex_spark.sources.zarr import ingest_zarr_gridded, read_array_driver

        events = (
            spark.range(6)
            .select(
                F.lit("2002-06-01").cast("timestamp").alias("time"),
                (F.col("id") / 3).cast("int").alias("y"),
                (F.col("id") % 3).cast("int").alias("x"),
                (F.col("id") + 10).cast("long").alias("event_id"),
                F.lit(1).alias("obj_id"),
            )
        )
        store = str(tmp_path / "ids.zarr")
        export_events_zarr(events, store, ny=3, nx=4, chunks=(1, 2, 2))
        meta = json.load(open(os.path.join(store, "ID_field", ".zarray")))
        assert meta["dtype"] == "<i4"
        assert meta["fill_value"] == 0
        a = read_array_driver(os.path.join(store, "ID_field"))
        assert a.shape == (1, 3, 4)
        assert a.dtype == np.int32
        assert a[0, 0, 0] == 10 and a[0, 1, 2] == 15
        assert a[0, 2, 0] == 0 and a[0, 0, 3] == 0  # background
        back = ingest_zarr_gridded(spark, store, "ID_field", layout="long")
        got = {(r.y, r.x): int(r.value) for r in back.collect()}
        assert got == {(i // 3, i % 3): i + 10 for i in range(6)}


class TestZarrV3:
    """zarr-v3 (zarr.json) stores — the default format of zarr-python
    3.x — through the same distributed reader."""

    def _make_store(self, root, codecs, cke=None):
        """3x2x4 (t,y,x) float32 v3 store, chunks (2,2,2), value
        t*100+y*10+x, fill NaN, one missing chunk (t-chunk 1, x-chunk 1)."""
        T, NY, NX = 3, 2, 4
        ct, cy, cx = 2, 2, 2
        a = (
            np.arange(T)[:, None, None] * 100.0
            + np.arange(NY)[None, :, None] * 10.0
            + np.arange(NX)[None, None, :]
        ).astype(np.float32)
        var = root / "sst"
        var.mkdir(parents=True)
        meta = {
            "zarr_format": 3,
            "node_type": "array",
            "shape": [T, NY, NX],
            "data_type": "float32",
            "chunk_grid": {
                "name": "regular",
                "configuration": {"chunk_shape": [ct, cy, cx]},
            },
            "chunk_key_encoding": cke or {"name": "default"},
            "fill_value": "NaN",
            "codecs": codecs,
            "dimension_names": ["time", "y", "x"],
        }
        (var / "zarr.json").write_text(json.dumps(meta))
        kind = (cke or {"name": "default"})["name"]
        for it in range(2):
            for iy in range(1):
                for ix in range(2):
                    if (it, ix) == (1, 1):
                        continue  # missing chunk → fill
                    chunk = np.full((ct, cy, cx), np.nan, dtype=np.float32)
                    ts = a[it * ct:(it + 1) * ct, :, ix * cx:(ix + 1) * cx]
                    chunk[: ts.shape[0], : ts.shape[1], : ts.shape[2]] = ts
                    raw = chunk.tobytes()
                    if any(c["name"] == "gzip" for c in codecs):
                        raw = zlib.compress(raw, 1)
                    if kind == "default":
                        p = var / "c" / str(it) / str(iy) / str(ix)
                        p.parent.mkdir(parents=True, exist_ok=True)
                    else:
                        p = var / f"{it}.{iy}.{ix}"
                    p.write_bytes(raw)
        # v3 time coordinate with CF attributes inside zarr.json
        tdir = root / "time"
        tdir.mkdir()
        (tdir / "zarr.json").write_text(json.dumps({
            "zarr_format": 3, "node_type": "array", "shape": [T],
            "data_type": "int64",
            "chunk_grid": {"name": "regular",
                           "configuration": {"chunk_shape": [T]}},
            "chunk_key_encoding": {"name": "default"},
            "fill_value": 0,
            "codecs": [{"name": "bytes",
                        "configuration": {"endian": "little"}}],
            "attributes": {"units": "days since 2010-01-01"},
        }))
        (tdir / "c").mkdir()
        (tdir / "c" / "0").write_bytes(
            np.arange(T, dtype=np.int64).tobytes()
        )
        return a

    def test_v3_gzip_default_keys(self, spark, tmp_path):
        from marex_spark.sources.zarr import ingest_zarr_gridded

        root = tmp_path / "v3.zarr"
        a = self._make_store(
            root,
            [{"name": "bytes", "configuration": {"endian": "little"}},
             {"name": "gzip", "configuration": {"level": 1}}],
        )
        df = ingest_zarr_gridded(spark, str(root), "sst", layout="long")
        got = {(r.time, r.y, r.x): r.value for r in df.collect()}
        import pandas as pd

        # CF attrs from zarr.json: day 0 = 2010-01-01
        assert (pd.Timestamp("2010-01-02"), 1, 3) in got
        assert got[(pd.Timestamp("2010-01-02"), 1, 3)] == float(a[1, 1, 3])
        # missing chunk (t=2, x in {2,3}) absent
        assert (pd.Timestamp("2010-01-03"), 0, 2) not in got
        assert len(got) == 3 * 2 * 4 - 1 * 2 * 2

    def test_v3_raw_v2_keys_driver_read(self, tmp_path):
        from marex_spark.sources.zarr import read_array_driver

        root = tmp_path / "v3b.zarr"
        a = self._make_store(
            root,
            [{"name": "bytes", "configuration": {"endian": "little"}}],
            cke={"name": "v2", "configuration": {"separator": "."}},
        )
        out = read_array_driver(str(root / "sst"))
        assert out.shape == (3, 2, 4)
        np.testing.assert_allclose(out[0], a[0])
        assert np.isnan(out[2, 0, 2])  # missing chunk → NaN fill

    def test_v3_transpose_decodes(self, tmp_path):
        """v3 ``transpose`` codec (spec: permute axes BEFORE the bytes
        codec): the stored chunk is the permuted array in C order; the
        reader must invert the permutation back to the logical shape."""
        from marex_spark.sources.zarr import read_array_driver

        var = tmp_path / "s"
        var.mkdir()
        a = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        order = [2, 0, 1]
        (var / "zarr.json").write_text(json.dumps({
            "zarr_format": 3, "node_type": "array", "shape": [2, 3, 4],
            "data_type": "float32",
            "chunk_grid": {"name": "regular",
                           "configuration": {"chunk_shape": [2, 3, 4]}},
            "fill_value": 0.0,
            "codecs": [
                {"name": "transpose", "configuration": {"order": order}},
                {"name": "bytes", "configuration": {"endian": "little"}},
                {"name": "gzip", "configuration": {"level": 1}},
            ],
        }))
        (var / "c").mkdir()
        enc = zlib.compress(
            np.ascontiguousarray(a.transpose(order)).tobytes(), 1
        )
        (var / "c" / "0").mkdir()
        (var / "c" / "0" / "0").mkdir()
        with open(var / "c" / "0" / "0" / "0", "wb") as f:
            f.write(enc)
        out = read_array_driver(str(var))
        np.testing.assert_array_equal(out, a)

    def test_v3_sharded_inner_transpose(self):
        """transpose inside a sharding_indexed inner chain must thread
        through to every inner-chunk decode."""
        import struct

        from marex_spark.sources.zarr import _decode_shard, _parse_v3_codecs

        a = np.arange(12, dtype=np.float32).reshape(1, 3, 4)
        payload = zlib.compress(
            np.ascontiguousarray(a.transpose([2, 0, 1])).tobytes(), 1
        )
        index = struct.pack("<QQ", 0, len(payload))
        raw = payload + index
        _, shard, _ = _parse_v3_codecs(
            [{
                "name": "sharding_indexed",
                "configuration": {
                    "chunk_shape": [1, 3, 4],
                    "codecs": [
                        {"name": "transpose",
                         "configuration": {"order": [2, 0, 1]}},
                        {"name": "bytes",
                         "configuration": {"endian": "little"}},
                        {"name": "gzip", "configuration": {"level": 1}},
                    ],
                    "index_codecs": [{"name": "bytes"}],
                    "index_location": "end",
                },
            }],
            allow_shard=True,
        )
        meta = {"chunks": [1, 3, 4], "dtype": "<f4", "fill_value": 0.0}
        out = _decode_shard(raw, meta, shard)
        np.testing.assert_array_equal(out, a)

    def test_v3_bad_transpose_refused(self, tmp_path):
        from marex_spark.sources.zarr import _read_meta

        var = tmp_path / "s"
        var.mkdir()
        (var / "zarr.json").write_text(json.dumps({
            "zarr_format": 3, "node_type": "array", "shape": [4],
            "data_type": "float32",
            "chunk_grid": {"name": "regular",
                           "configuration": {"chunk_shape": [2]}},
            "fill_value": 0.0,
            "codecs": [{"name": "transpose",
                        "configuration": {"order": [0, 0]}}],
        }))
        with pytest.raises(NotImplementedError, match="transpose"):
            _read_meta(str(var))

    def _make_sharded_store(self, root):
        """3x2x4 (t,y,x) float32 v3 SHARDED store (the default layout
        zarr-python 3 writes for large arrays): shard shape (2,2,4),
        inner chunks (1,2,2) gzip-encoded, index (offset,nbytes) u64
        pairs + crc32c at the shard end. Shard t=1 is partial (t=2
        only) and drops one inner chunk entirely → fill NaN."""
        T, NY, NX = 3, 2, 4
        a = (
            np.arange(T)[:, None, None] * 100.0
            + np.arange(NY)[None, :, None] * 10.0
            + np.arange(NX)[None, None, :]
        ).astype(np.float32)
        var = root / "sst"
        (var / "c").mkdir(parents=True)
        (var / "zarr.json").write_text(json.dumps({
            "zarr_format": 3, "node_type": "array",
            "shape": [T, NY, NX], "data_type": "float32",
            "chunk_grid": {"name": "regular",
                           "configuration": {"chunk_shape": [2, 2, 4]}},
            "chunk_key_encoding": {"name": "default"},
            "fill_value": "NaN",
            "codecs": [{
                "name": "sharding_indexed",
                "configuration": {
                    "chunk_shape": [1, 2, 2],
                    "codecs": [
                        {"name": "bytes",
                         "configuration": {"endian": "little"}},
                        {"name": "gzip", "configuration": {"level": 1}},
                    ],
                    "index_codecs": [
                        {"name": "bytes",
                         "configuration": {"endian": "little"}},
                        {"name": "crc32c"},
                    ],
                    "index_location": "end",
                },
            }],
            "dimension_names": ["time", "y", "x"],
        }))
        missing = (1 << 64) - 1
        for st in range(2):  # shard grid: 2 x 1 x 1
            body = b""
            index = []
            # inner grid inside the shard: 2 (t) x 1 (y) x 2 (x), C order
            for it in range(2):
                for ix in range(2):
                    t_abs = st * 2 + it
                    if t_abs >= T or (st, it, ix) == (0, 1, 1):
                        index.append((missing, missing))  # absent chunk
                        continue
                    chunk = a[t_abs:t_abs + 1, :, ix * 2:(ix + 1) * 2]
                    enc = zlib.compress(np.ascontiguousarray(chunk).tobytes(), 1)
                    index.append((len(body), len(enc)))
                    body += enc
            idx = np.array(index, dtype="<u8").tobytes() + b"\x00\x00\x00\x00"
            p = var / "c" / str(st) / "0" / "0"
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_bytes(body + idx)
        tdir = root / "time"
        (tdir / "c").mkdir(parents=True)
        (tdir / "zarr.json").write_text(json.dumps({
            "zarr_format": 3, "node_type": "array", "shape": [T],
            "data_type": "int64",
            "chunk_grid": {"name": "regular",
                           "configuration": {"chunk_shape": [T]}},
            "chunk_key_encoding": {"name": "default"},
            "fill_value": 0,
            "codecs": [{"name": "bytes",
                        "configuration": {"endian": "little"}}],
            "attributes": {"units": "days since 2010-01-01"},
        }))
        (tdir / "c" / "0").write_bytes(np.arange(T, dtype=np.int64).tobytes())
        return a

    def test_v3_sharded_driver_read(self, tmp_path):
        from marex_spark.sources.zarr import read_array_driver

        a = self._make_sharded_store(tmp_path / "sh.zarr")
        out = read_array_driver(str(tmp_path / "sh.zarr" / "sst"))
        assert out.shape == (3, 2, 4)
        np.testing.assert_allclose(out[0], a[0])
        np.testing.assert_allclose(out[2], a[2])
        # dropped inner chunk (t=1, x 2..3) → fill NaN
        assert np.isnan(out[1, :, 2:]).all()
        np.testing.assert_allclose(out[1, :, :2], a[1, :, :2])

    def test_v3_sharded_distributed_read(self, spark, tmp_path):
        from marex_spark.sources.zarr import ingest_zarr_gridded

        a = self._make_sharded_store(tmp_path / "sh2.zarr")
        df = ingest_zarr_gridded(
            spark, str(tmp_path / "sh2.zarr"), "sst", layout="long"
        )
        got = {(r.time.day, r.y, r.x): r.value for r in df.collect()}
        assert got[(1, 1, 3)] == float(a[0, 1, 3])
        assert got[(3, 0, 0)] == float(a[2, 0, 0])
        # NaN fill cells from the absent inner chunk are dropped
        assert (2, 0, 2) not in got
        assert len(got) == 3 * 2 * 4 - 1 * 2 * 2


class TestTimePruning:
    def test_chunk_pruning_never_opens_out_of_range(self, spark, tmp_path):
        """time_min/time_max prune whole t-chunks on the driver: an
        out-of-range chunk file is corrupted on disk, and the pruned
        read still succeeds with exact in-range rows (would crash on
        decode if the chunk were opened)."""
        from pyspark.sql import functions as F

        from marex_spark.sources.zarr import ingest_zarr_gridded, write_zarr_gridded

        store = str(tmp_path / "p.zarr")
        df = (
            spark.range(10 * 2 * 2)
            .select(
                F.expr("date_add(DATE '2020-01-01', CAST(id / 4 AS INT))")
                .cast("timestamp")
                .alias("time"),
                (F.col("id") % 4 / 2).cast("int").alias("y"),
                (F.col("id") % 2).cast("int").alias("x"),
                F.col("id").cast("float").alias("value"),
            )
        )
        write_zarr_gridded(df, store, var="v", chunks=(2, 2, 2))
        # corrupt the first t-chunk (days 0-1) — out of requested range
        with open(os.path.join(store, "v", "0.0.0"), "wb") as f:
            f.write(b"\x00garbage not zlib")
        back = ingest_zarr_gridded(
            spark, store, "v", layout="long",
            time_min="2020-01-05", time_max="2020-01-08",
        )
        rows = back.collect()
        days = sorted({r.time.day for r in rows})
        assert days == [5, 6, 7, 8]
        assert len(rows) == 4 * 4
        # boundary trim: day 5 sits mid-chunk (t-chunk 2 covers days 5-6)
        got = {(r.time.day, r.y, r.x): r.value for r in rows}
        assert got[(5, 0, 0)] == 16.0

    def test_empty_selection(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from marex_spark.sources.zarr import ingest_zarr_gridded, write_zarr_gridded

        store = str(tmp_path / "q.zarr")
        df = spark.range(4).select(
            F.lit("2020-01-01").cast("timestamp").alias("time"),
            F.lit(0).alias("y"),
            F.col("id").cast("int").alias("x"),
            F.col("id").cast("float").alias("value"),
        )
        write_zarr_gridded(df, store, var="v")
        back = ingest_zarr_gridded(
            spark, store, "v", layout="long", time_min="2031-01-01"
        )
        assert back.count() == 0


class TestWriteZarrV3:
    def test_v3_roundtrip_and_metadata(self, spark, tmp_path):
        """zarr_format=3 emits zarr.json + c/t/y/x gzip chunks and
        round-trips through the v3 reader; values identical to the v2
        write of the same frame."""
        from marex_spark.sources.zarr import ingest_zarr_gridded, write_zarr_gridded

        df = TestWriteZarr()._long_df(spark)
        s3 = str(tmp_path / "w3.zarr")
        s2 = str(tmp_path / "w2.zarr")
        receipts = write_zarr_gridded(df, s3, var="sst", chunks=(3, 2, 4), zarr_format=3)
        write_zarr_gridded(df, s2, var="sst", chunks=(3, 2, 4))
        assert all(r.n_bytes > 0 for r in receipts.collect())

        meta = json.load(open(os.path.join(s3, "sst", "zarr.json")))
        assert meta["zarr_format"] == 3 and meta["node_type"] == "array"
        assert meta["data_type"] == "float32"
        assert meta["chunk_grid"]["configuration"]["chunk_shape"] == [3, 2, 4]
        assert meta["fill_value"] == "NaN"
        assert [c["name"] for c in meta["codecs"]] == ["bytes", "gzip"]
        assert meta["dimension_names"] == ["time", "y", "x"]
        root = json.load(open(os.path.join(s3, "zarr.json")))
        assert root["node_type"] == "group"
        # default chunk-key encoding: c/<t>/<y>/<x>
        assert os.path.exists(os.path.join(s3, "sst", "c", "0", "0", "0"))
        # gzip framing (RFC 1952 magic), not raw zlib
        with open(os.path.join(s3, "sst", "c", "0", "0", "0"), "rb") as f:
            assert f.read(2) == b"\x1f\x8b"

        b3 = {(r.time, r.y, r.x): r.value
              for r in ingest_zarr_gridded(spark, s3, "sst", layout="long").collect()}
        b2 = {(r.time, r.y, r.x): r.value
              for r in ingest_zarr_gridded(spark, s2, "sst", layout="long").collect()}
        assert b3 == b2
        a = {(r.time, r.y, r.x): r.value for r in df.collect()}
        assert b3 == a

    def test_v3_integer_ids_and_coord_arrays(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from marex_spark.sources.zarr import read_array_driver, write_zarr_gridded

        df = TestWriteZarr()._long_df(spark).withColumn(
            "value", (F.col("value") / 2).cast("long")
        )
        store = str(tmp_path / "ids3.zarr")
        write_zarr_gridded(
            df, store, var="ID_field", dtype="<i4", zarr_format=3,
        )
        meta = json.load(open(os.path.join(store, "ID_field", "zarr.json")))
        assert meta["data_type"] == "int32" and meta["fill_value"] == 0
        t = read_array_driver(os.path.join(store, "time"))
        assert len(t) == 7  # v3 coordinate array reads driver-side too

    def test_v3_sharded_write_roundtrip(self, spark, tmp_path):
        """shard_shape writes sharding_indexed v3 (one FILE per shard,
        gzip inner chunks + u64 index at the end) and round-trips
        value-identical with the unsharded v3 write of the same frame."""
        from marex_spark.sources.zarr import ingest_zarr_gridded, write_zarr_gridded

        df = TestWriteZarr()._long_df(spark)
        ss = str(tmp_path / "ws.zarr")
        s3 = str(tmp_path / "wp.zarr")
        receipts = write_zarr_gridded(
            df, ss, var="sst", chunks=(2, 2, 2), zarr_format=3,
            shard_shape=(4, 4, 4),
        )
        write_zarr_gridded(df, s3, var="sst", chunks=(2, 2, 2), zarr_format=3)
        assert all(r.n_bytes > 0 for r in receipts.collect())

        meta = json.load(open(os.path.join(ss, "sst", "zarr.json")))
        assert meta["codecs"][0]["name"] == "sharding_indexed"
        cfg = meta["codecs"][0]["configuration"]
        assert cfg["chunk_shape"] == [2, 2, 2]
        assert [c["name"] for c in cfg["codecs"]] == ["bytes", "gzip"]
        # chunk grid = SHARD grid; shard files exist under c/
        shard_grid = meta["chunk_grid"]["configuration"]["chunk_shape"]
        assert all(s % c == 0 for s, c in zip(shard_grid, cfg["chunk_shape"]))
        assert os.path.exists(os.path.join(ss, "sst", "c", "0", "0", "0"))

        bs = {(r.time, r.y, r.x): r.value
              for r in ingest_zarr_gridded(spark, ss, "sst", layout="long").collect()}
        b3 = {(r.time, r.y, r.x): r.value
              for r in ingest_zarr_gridded(spark, s3, "sst", layout="long").collect()}
        assert bs == b3
        # fewer files: shards bound the object count
        n_shard_files = sum(len(fs) for _, _, fs in os.walk(os.path.join(ss, "sst", "c")))
        n_chunk_files = sum(len(fs) for _, _, fs in os.walk(os.path.join(s3, "sst", "c")))
        assert n_shard_files < n_chunk_files


class TestBloscZstd:
    """blosc(cname='zstd') — a common xarray/zarr compressor choice on
    real climate archives — decodes through pyarrow's bundled zstd
    without numcodecs; unsupported blosc variants fall back to a typed
    DependencyError when numcodecs is absent."""

    @staticmethod
    def _frame(data: bytes, typesize: int, codec: int, shuffle: bool,
               blocksize: int | None = None) -> bytes:
        """Build a valid blosc-1 frame (README_CHUNK_FORMAT.rst layout)
        with pyarrow-compressed streams. zstd/zlib/snappy blocks are
        never split (c-blosc split_block), so nstreams=1."""
        import struct

        import pyarrow as pa

        nbytes = len(data)
        blocksize = blocksize or nbytes
        if shuffle and typesize > 1:
            n = nbytes // typesize
            shuf = (
                np.frombuffer(data[: n * typesize], dtype=np.uint8)
                .reshape(n, typesize).T.tobytes() + data[n * typesize:]
            )
        else:
            shuf = data
        flags = (1 if shuffle and typesize > 1 else 0) | (codec << 5)
        nblocks = -(-nbytes // blocksize)
        comp = {2: "snappy", 4: "zstd"}.get(codec)
        blocks = []
        for bi in range(nblocks):
            raw = shuf[bi * blocksize: (bi + 1) * blocksize]
            payload = pa.Codec(comp).compress(raw).to_pybytes()
            if len(payload) >= len(raw):
                payload = raw  # stored raw: csize == uncompressed size
            blocks.append(struct.pack("<I", len(payload)) + payload)
        bstart = 16 + 4 * nblocks
        bstarts = []
        for b in blocks:
            bstarts.append(bstart)
            bstart += len(b)
        body = struct.pack(f"<{nblocks}I", *bstarts) + b"".join(blocks)
        cbytes = 16 + len(body)
        head = struct.pack(
            "<BBBBIII", 2, 1, flags, typesize, nbytes, blocksize, cbytes
        )
        return head + body

    @pytest.mark.parametrize("shuffle", [False, True])
    def test_zstd_frame_roundtrip(self, shuffle):
        from marex_spark.sources.blosc import blosc_decompress

        arr = np.arange(600, dtype=np.float32)
        data = arr.tobytes()
        frame = self._frame(data, typesize=4, codec=4, shuffle=shuffle)
        assert blosc_decompress(frame) == data

    def test_zstd_multiblock_and_raw_streams(self):
        from marex_spark.sources.blosc import blosc_decompress

        rng = np.random.default_rng(7)
        # incompressible bytes force the stored-raw (csize == neblock)
        # stream branch; 3 blocks incl. a short edge block
        data = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
        frame = self._frame(data, typesize=1, codec=4, shuffle=False,
                            blocksize=400)
        assert blosc_decompress(frame) == data

    def test_zstd_store_roundtrip(self, tmp_path):
        """Chunk files written as blosc-zstd frames read back exactly
        through the stdlib store reader (driver path)."""
        from marex_spark.sources.zarr import read_array_driver

        a = (np.arange(24, dtype=np.float32) * 1.5).reshape(4, 6)
        var = tmp_path / "to"
        var.mkdir()
        (var / ".zarray").write_text(json.dumps({
            "zarr_format": 2, "shape": [4, 6], "chunks": [4, 6],
            "dtype": "<f4", "order": "C",
            "compressor": {"id": "blosc", "cname": "zstd", "clevel": 5,
                           "shuffle": 1, "blocksize": 0},
            "fill_value": "NaN", "filters": None,
        }))
        (var / "0.0").write_bytes(
            self._frame(a.tobytes(), typesize=4, codec=4, shuffle=True)
        )
        got = read_array_driver(str(var))
        np.testing.assert_array_equal(got, a)

    def test_unsupported_variant_typed_error(self, tmp_path):
        """bit-shuffle (flag 0x4) is refused by the frame decoder; with
        numcodecs absent the reader raises DependencyError, not a bare
        NotImplementedError."""
        import struct

        from marex_spark.exceptions import DependencyError
        from marex_spark.sources.zarr import read_array_driver

        var = tmp_path / "bs"
        var.mkdir()
        (var / ".zarray").write_text(json.dumps({
            "zarr_format": 2, "shape": [4], "chunks": [4],
            "dtype": "<f4", "order": "C",
            "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5,
                           "shuffle": 2, "blocksize": 0},
            "fill_value": "NaN", "filters": None,
        }))
        payload = np.zeros(4, dtype=np.float32).tobytes()
        head = struct.pack("<BBBBIII", 2, 1, 0x4, 4, 16, 16, 16 + len(payload))
        (var / "0").write_bytes(head + payload)
        try:
            import numcodecs  # noqa: F401
            pytest.skip("numcodecs installed: fallback decodes instead")
        except ImportError:
            pass
        with pytest.raises(DependencyError):
            read_array_driver(str(var))


class TestZstdCodec:
    """Raw-zstd codec paths (pyarrow bundled, no numcodecs): v2 store
    with numcodecs' Zstd id, v3 with the spec's zstd codec, and
    sharded v3 with zstd inner chunks — write and read both ways."""

    def _df(self, spark):
        from pyspark.sql import functions as F

        return spark.range(6 * 4 * 5).select(
            F.expr("date_add(DATE '2012-06-01', CAST(id / 20 AS INT))")
            .cast("timestamp").alias("time"),
            (F.col("id") % 20 / 5).cast("int").alias("y"),
            (F.col("id") % 5).cast("int").alias("x"),
            (F.col("id") * 1.5).cast("float").alias("value"),
        ).filter("NOT (y = 2 AND x = 3)")

    def _roundtrip(self, spark, tmp_path, name, **kw):
        from marex_spark.sources.zarr import (
            ingest_zarr_gridded,
            write_zarr_gridded,
        )

        store = str(tmp_path / name)
        df = self._df(spark)
        write_zarr_gridded(
            df, store, var="v", chunks=(2, 2, 3),
            compressor={"id": "zstd", "level": 3}, **kw,
        )
        back = ingest_zarr_gridded(spark, store, "v", layout="long")
        a = {(r.time, r.y, r.x): r.value for r in df.collect()}
        b = {(r.time, r.y, r.x): r.value for r in back.collect()}
        assert a == b
        return store

    def test_v2_zstd_roundtrip(self, spark, tmp_path):
        store = self._roundtrip(spark, tmp_path, "z2.zarr")
        meta = json.loads((tmp_path / "z2.zarr" / "v" / ".zarray").read_text())
        assert meta["compressor"]["id"] == "zstd"
        # frames are real zstd (magic 0xFD2FB528 little-endian)
        chunk = next(
            p for p in (tmp_path / "z2.zarr" / "v").iterdir()
            if p.name[0].isdigit()
        )
        assert chunk.read_bytes()[:4] == b"\x28\xb5\x2f\xfd"

    def test_v3_zstd_roundtrip(self, spark, tmp_path):
        self._roundtrip(spark, tmp_path, "z3.zarr", zarr_format=3)
        meta = json.loads(
            (tmp_path / "z3.zarr" / "v" / "zarr.json").read_text()
        )
        names = [c["name"] for c in meta["codecs"]]
        assert names == ["bytes", "zstd"]
        assert meta["codecs"][1]["configuration"]["checksum"] is False

    def test_v3_sharded_zstd_roundtrip(self, spark, tmp_path):
        self._roundtrip(
            spark, tmp_path, "z3s.zarr", zarr_format=3,
            shard_shape=(4, 4, 6),
        )
        meta = json.loads(
            (tmp_path / "z3s.zarr" / "v" / "zarr.json").read_text()
        )
        assert meta["codecs"][0]["name"] == "sharding_indexed"
        inner = meta["codecs"][0]["configuration"]["codecs"]
        assert [c["name"] for c in inner] == ["bytes", "zstd"]
