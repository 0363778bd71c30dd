"""NetCDF-4/HDF5 ingestion (S2, reference detect.py:409 — xarray's
default engine reads NetCDF-4/HDF5): the package's spec-literal HDF5
writer builds fixtures (no h5py in this image), the distributed reader
must recover every value through contiguous and chunked layouts,
deflate/shuffle filters, fills, scale/offset — and agree byte-for-byte
with the CDF-2 path on the same data (the VERDICT r3 acceptance
criterion)."""

from __future__ import annotations

import numpy as np
import pytest

from marex_spark.sources.hdf5 import (
    ingest_netcdf4,
    read_hdf5_header,
    write_netcdf4,
)


@pytest.fixture(scope="module")
def field():
    rng = np.random.default_rng(11)
    return rng.normal(15.0, 2.0, size=(6, 5, 7)).astype(np.float32)


def _collect(df):
    return {(r.time, r.y, r.x): r.value for r in df.collect()}


def test_header_parse(tmp_path, field):
    p = str(tmp_path / "h.nc")
    write_netcdf4(p, field, np.arange(6, dtype=np.float64))
    hdr = read_hdf5_header(p)
    assert set(hdr["datasets"]) == {"time", "sst"}
    sst = hdr["datasets"]["sst"]
    assert sst["dims"] == [6, 5, 7]
    assert sst["dtype"] == np.dtype("<f4")
    assert sst["layout"]["class"] == "contiguous"
    t = hdr["datasets"]["time"]
    assert t["attrs"]["units"].startswith("days since")


def test_contiguous_roundtrip(spark, tmp_path, field):
    p = str(tmp_path / "c.nc")
    write_netcdf4(p, field, np.arange(6, dtype=np.float64))
    rows = _collect(ingest_netcdf4(spark, p, "sst"))
    assert len(rows) == field.size
    for (t, y, x), v in rows.items():
        assert v == pytest.approx(float(field[t.day - 1, y, x]), rel=1e-6)


@pytest.mark.parametrize(
    "chunks,compress,shuffle",
    [
        ((2, 3, 4), False, False),
        ((2, 3, 4), True, False),
        ((2, 3, 4), True, True),
        ((6, 5, 7), True, True),   # single chunk
        ((1, 2, 2), False, True),  # many edge chunks
    ],
)
def test_chunked_roundtrip(spark, tmp_path, field, chunks, compress, shuffle):
    p = str(tmp_path / f"k{chunks[0]}{chunks[1]}{chunks[2]}{compress}{shuffle}.nc")
    write_netcdf4(
        p, field, np.arange(6, dtype=np.float64),
        chunks=chunks, compress=compress, shuffle=shuffle,
    )
    hdr = read_hdf5_header(p)
    assert hdr["datasets"]["sst"]["layout"]["class"] == "chunked"
    rows = _collect(ingest_netcdf4(spark, p, "sst"))
    assert len(rows) == field.size
    for (t, y, x), v in rows.items():
        assert v == pytest.approx(float(field[t.day - 1, y, x]), rel=1e-6)


def test_matches_classic_reader_exactly(spark, tmp_path, field):
    """Acceptance: the HDF5 path on the same data equals the CDF-2 path
    byte-for-byte (same float32 values, same timestamps)."""
    from marex_spark.sources.netcdf import (
        ingest_netcdf_classic,
        write_netcdf_classic,
    )

    tvals = np.arange(6, dtype=np.float64)
    pc = str(tmp_path / "c2.nc")
    ph = str(tmp_path / "h5.nc")
    write_netcdf_classic(pc, field, tvals, version=2)
    write_netcdf4(ph, field, tvals, chunks=(2, 2, 3), compress=True, shuffle=True)
    a = _collect(ingest_netcdf_classic(spark, pc, "sst"))
    b = _collect(ingest_netcdf4(spark, ph, "sst"))
    assert a == b  # exact equality, not approx


def test_fill_and_scale(spark, tmp_path, field):
    data = field.copy()
    data[0, 0, 0] = 9999.0
    p = str(tmp_path / "fs.nc")
    write_netcdf4(
        p, data, np.arange(6, dtype=np.float64),
        chunks=(3, 5, 7), fill=9999.0, scale=0.5, offset=100.0,
    )
    rows = {(r.time.day, r.y, r.x): r.value for r in ingest_netcdf4(spark, p, "sst").collect()}
    assert (1, 0, 0) not in rows  # fill dropped
    assert rows[(1, 1, 1)] == pytest.approx(float(field[0, 1, 1]) * 0.5 + 100.0, rel=1e-6)


def test_calendar_attr_decodes(spark, tmp_path, field):
    p = str(tmp_path / "cal.nc")
    write_netcdf4(
        p, field, np.arange(363, 369, dtype=np.float64),
        time_units="days since 2000-01-01", calendar="noleap",
    )
    times = sorted({r.time for r in ingest_netcdf4(spark, p, "sst").collect()})
    import pandas as pd

    # noleap: model day 364 has model doy 365 (year 2000), model day
    # 365 rolls to year 2001 doy 1 — a Gregorian decode of leap-year
    # 2000 would keep day 365 inside 2000 (doy 366)
    assert pd.Timestamp(times[1]).dayofyear == 365
    t2 = pd.Timestamp(times[2])
    assert t2.year == 2001 and t2.dayofyear == 1


def test_packed_layout_matches_long(spark, tmp_path, field):
    p = str(tmp_path / "pk.nc")
    write_netcdf4(p, field, np.arange(6, dtype=np.float64), chunks=(2, 3, 4))
    long_rows = _collect(ingest_netcdf4(spark, p, "sst"))
    packed = ingest_netcdf4(spark, p, "sst", layout="packed")
    pk_rows = {
        (r.time, r.y, x): v
        for r in packed.collect()
        for x, v in enumerate(r.vals)
        if v == v
    }
    assert long_rows == pk_rows


def test_dispatch_from_io(spark, tmp_path, field):
    """io.ingest_netcdf routes HDF5 magic to the HDF5 reader."""
    from marex_spark.sources.io import ingest_netcdf

    p = str(tmp_path / "disp.nc")
    write_netcdf4(p, field, np.arange(6, dtype=np.float64), chunks=(2, 3, 4))
    assert ingest_netcdf(spark, p, "sst").count() == field.size


def test_rejects_classic_magic(tmp_path):
    from marex_spark.exceptions import DataValidationError

    p = str(tmp_path / "bad.nc")
    with open(p, "wb") as f:
        f.write(b"CDF\x01" + b"\x00" * 64)
    with pytest.raises(DataValidationError):
        read_hdf5_header(p)


class TestPropertyRoundTrip:
    """Hypothesis round-trips through the writer/reader pair: random
    shapes, chunk geometries and filter combos must recover every
    value (driver-side decode via the same chunk machinery)."""

    def test_random_shapes_and_chunks(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from marex_spark.sources.hdf5 import (
            _read_small_dataset,
            read_hdf5_header,
            write_netcdf4,
        )

        @settings(max_examples=25, deadline=None)
        @given(
            t=st.integers(1, 9),
            ny=st.integers(1, 7),
            nx=st.integers(1, 8),
            ct=st.integers(1, 9),
            cy=st.integers(1, 7),
            cx=st.integers(1, 8),
            compress=st.booleans(),
            shuffle=st.booleans(),
            contiguous=st.booleans(),
            seed=st.integers(0, 2**31 - 1),
        )
        def prop(t, ny, nx, ct, cy, cx, compress, shuffle, contiguous, seed):
            import tempfile

            rng = np.random.default_rng(seed)
            data = rng.normal(0, 3, size=(t, ny, nx)).astype(np.float32)
            with tempfile.TemporaryDirectory() as td:
                p = f"{td}/f.nc"
                write_netcdf4(
                    p, data, np.arange(t, dtype=np.float64),
                    chunks=None if contiguous else (ct, cy, cx),
                    compress=compress and not contiguous,
                    shuffle=shuffle and not contiguous,
                )
                hdr = read_hdf5_header(p)
                back = _read_small_dataset(p, hdr["datasets"]["sst"])
                np.testing.assert_array_equal(back, data)
                tv = _read_small_dataset(p, hdr["datasets"]["time"])
                np.testing.assert_array_equal(tv, np.arange(t, dtype=np.float64))

        prop()


def test_archive_multi_file_equals_single(spark, tmp_path, field):
    """One-file-per-'year' archive: three files with DIFFERENT chunking
    and compression must ingest as one DataFrame equal to the
    single-file ingest of the whole series."""
    from marex_spark.sources.hdf5 import ingest_netcdf4_archive

    tvals = np.arange(6, dtype=np.float64)
    whole = str(tmp_path / "whole.nc")
    write_netcdf4(whole, field, tvals)
    parts = []
    configs = [
        dict(chunks=(1, 2, 3), compress=True, shuffle=True),
        dict(chunks=None),
        dict(chunks=(2, 5, 7), compress=True, shuffle=False),
    ]
    for i, (sl, cfg) in enumerate(zip([(0, 2), (2, 4), (4, 6)], configs)):
        p = str(tmp_path / f"part{i}.nc")
        write_netcdf4(
            p, field[sl[0] : sl[1]], tvals[sl[0] : sl[1]],
            time_units="days since 2020-01-01", **cfg,
        )
        parts.append(p)
    a = _collect(ingest_netcdf4(spark, whole, "sst"))
    b = _collect(ingest_netcdf4_archive(spark, parts, "sst"))
    assert a == b


def test_archive_grid_mismatch_rejected(spark, tmp_path, field):
    from marex_spark.exceptions import DataValidationError
    from marex_spark.sources.hdf5 import ingest_netcdf4_archive

    p1 = str(tmp_path / "g1.nc")
    p2 = str(tmp_path / "g2.nc")
    write_netcdf4(p1, field, np.arange(6, dtype=np.float64))
    write_netcdf4(p2, field[:, :3, :4], np.arange(6, dtype=np.float64))
    with pytest.raises(DataValidationError, match="grid"):
        ingest_netcdf4_archive(spark, [p1, p2], "sst")


def test_io_archive_dispatch_glob(spark, tmp_path, field):
    """io.ingest_netcdf_archive: glob of HDF5 files takes the
    single-plan archive path; mixed classic+HDF5 unions per-file."""
    from marex_spark.sources.io import ingest_netcdf_archive
    from marex_spark.sources.netcdf import write_netcdf_classic

    tvals = np.arange(6, dtype=np.float64)
    for i, sl in enumerate([(0, 3), (3, 6)]):
        write_netcdf4(
            str(tmp_path / f"y{i}.nc"), field[sl[0] : sl[1]],
            tvals[sl[0] : sl[1]], time_units="days since 2020-01-01",
            chunks=(2, 3, 4), compress=True,
        )
    out = ingest_netcdf_archive(spark, f"{tmp_path}/y*.nc", "sst")
    assert out.count() == field.size

    # mixed-format archive: classic + HDF5
    write_netcdf_classic(
        str(tmp_path / "m0.nc"), field[:3], tvals[:3]
    )
    write_netcdf4(
        str(tmp_path / "m1.nc"), field[3:], tvals[3:],
        time_units="days since 2020-01-01",
    )
    mixed = ingest_netcdf_archive(
        spark, [str(tmp_path / "m0.nc"), str(tmp_path / "m1.nc")], "sst"
    )
    assert mixed.count() == field.size


def test_time_pruning_skips_chunks_and_files(spark, tmp_path, field):
    """time_min/time_max drop out-of-range chunk descriptors on the
    driver. Two one-per-'year' files; the out-of-range file's data
    bytes are corrupted after header parse — the pruned read must not
    touch them."""
    import pandas as pd

    from marex_spark.sources.hdf5 import ingest_netcdf4_archive

    p1 = str(tmp_path / "y1990.nc")
    p2 = str(tmp_path / "y1990b.nc")
    # file 1: days 0-5, file 2: days 6-11 (same grid)
    write_netcdf4(p1, field, np.arange(6, dtype=np.float64),
                  chunks=(2, 5, 7), compress=True)
    write_netcdf4(p2, field + 100.0, np.arange(6, 12, dtype=np.float64),
                  chunks=(2, 5, 7), compress=True)
    # corrupt exactly file 1's chunk PAYLOADS (addresses from the
    # header; B-tree and metadata stay intact, so planning succeeds
    # and any actual read of these chunks would fail to inflate)
    hdr = read_hdf5_header(p1)
    with open(p1, "r+b") as f:
        for c in hdr["datasets"]["sst"]["chunks"]:
            f.seek(c["addr"])
            f.write(b"\xff" * min(16, c["nbytes"]))
    # writer epoch is 2020-01-01: file 1 = Jan 1-6, file 2 = Jan 7-12
    df = ingest_netcdf4_archive(
        spark, [p1, p2], "sst",
        time_min="2020-01-08",  # only file 2's chunks survive pruning
    )
    got = {(r.time, r.y, r.x): r.value for r in df.collect()}
    days = sorted({k[0].day for k in got})
    assert days == [8, 9, 10, 11, 12]
    # boundary trim: file 2's first chunk covers Jan 7-8 — chunk kept,
    # Jan 7 rows trimmed by the residual filter
    assert len(got) == 5 * 5 * 7
    want = float(np.float32(field[3, 2, 4] + 100.0))
    key = (pd.Timestamp("2020-01-10"), 2, 4)
    assert abs(got[key] - want) < 1e-5


def test_time_pruning_empty_selection(spark, tmp_path, field):
    from marex_spark.sources.hdf5 import ingest_netcdf4

    p = str(tmp_path / "e.nc")
    write_netcdf4(p, field, np.arange(6, dtype=np.float64))
    df = ingest_netcdf4(spark, p, "sst", time_min="2044-01-01")
    assert df.count() == 0
