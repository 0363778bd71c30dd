"""NetCDF classic ingestion round-trip (S2, reference detect.py:409):
a spec-literal CDF-1/CDF-2 writer builds fixtures in-test (the image
has no netCDF4), the distributed stdlib reader must recover every
value, timestamp, fill and scale/offset. Mirrors tests/test_ingest_zarr.py.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from marex_spark.sources.netcdf import ingest_netcdf_classic, read_header

NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C


def _name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + b + b"\x00" * (-len(b) % 4)


def _att(name: str, nc_type: int, values) -> bytes:
    out = _name(name) + struct.pack(">ii", nc_type, len(values))
    fmt = {4: ">i", 5: ">f", 6: ">d"}[nc_type]
    raw = b"".join(struct.pack(fmt, v) for v in values)
    return out + raw + b"\x00" * (-len(raw) % 4)


def _att_list(atts: list[bytes]) -> bytes:
    if not atts:
        return struct.pack(">ii", 0, 0)
    return struct.pack(">ii", NC_ATTRIBUTE, len(atts)) + b"".join(atts)


def write_classic(
    path: str,
    data: np.ndarray,  # (T, NY, NX) float32
    time_vals: np.ndarray,  # (T,) float64 days
    version: int = 1,
    record_time: bool = True,
    fill: float | None = None,
    scale: float | None = None,
    offset: float | None = None,
) -> None:
    """Minimal CDF-1/CDF-2 writer following the classic format spec:
    header (dims, no gatts, two variables), then fixed data, then the
    record data interleaved per record."""
    T, NY, NX = data.shape
    dims = [("time", 0 if record_time else T), ("lat", NY), ("lon", NX)]

    off_fmt = ">i" if version == 1 else ">q"

    def var_entry(name, dimids, atts, nc_type, vsize, begin):
        return (
            _name(name)
            + struct.pack(">i", len(dimids))
            + b"".join(struct.pack(">i", d) for d in dimids)
            + _att_list(atts)
            + struct.pack(">ii", nc_type, vsize)
            + struct.pack(off_fmt, begin)
        )

    sst_atts = []
    if fill is not None:
        sst_atts.append(_att("_FillValue", 5, [fill]))
    if scale is not None:
        sst_atts.append(_att("scale_factor", 6, [scale]))
    if offset is not None:
        sst_atts.append(_att("add_offset", 6, [offset]))
    time_atts = [] if record_time else []
    time_atts.append(_att_time_units())

    plane = NY * NX * 4
    time_vsize = 8 if record_time else T * 8
    sst_vsize = plane if record_time else T * plane

    # layout: header | time data | sst data  (fixed case)
    #         header | [per-record: time(8) + sst(plane)]  (record case)
    header_wo_vars = (
        b"CDF"
        + bytes([version])
        + struct.pack(">i", T if record_time else 0)
        + struct.pack(">ii", NC_DIMENSION, len(dims))
        + b"".join(_name(n) + struct.pack(">i", s) for n, s in dims)
        + _att_list([])
        + struct.pack(">ii", NC_VARIABLE, 2)
    )
    # two passes: sizes depend on begin offsets only via fixed widths
    dummy = var_entry("time", [0], time_atts, 6, time_vsize, 0) + var_entry(
        "sst", [0, 1, 2], sst_atts, 5, sst_vsize, 0
    )
    data_start = len(header_wo_vars) + len(dummy)
    if record_time:
        time_begin = data_start
        sst_begin = data_start + 8
    else:
        time_begin = data_start
        sst_begin = data_start + T * 8
    body = header_wo_vars + var_entry(
        "time", [0], time_atts, 6, time_vsize, time_begin
    ) + var_entry("sst", [0, 1, 2], sst_atts, 5, sst_vsize, sst_begin)

    be_data = data.astype(">f4")
    be_time = time_vals.astype(">f8")
    with open(path, "wb") as f:
        f.write(body)
        if record_time:
            for t in range(T):
                # slice, not scalar index: a numpy scalar silently
                # drops the big-endian dtype
                f.write(be_time[t : t + 1].tobytes())
                f.write(be_data[t].tobytes())
        else:
            f.write(be_time.tobytes())
            f.write(be_data.tobytes())


def _att_time_units() -> bytes:
    s = b"days since 2020-01-01"
    return (
        _name("units")
        + struct.pack(">ii", 2, len(s))
        + s
        + b"\x00" * (-len(s) % 4)
    )


@pytest.fixture(scope="module")
def field():
    rng = np.random.default_rng(7)
    return rng.normal(15.0, 2.0, size=(6, 4, 5)).astype(np.float32)


@pytest.mark.parametrize("version", [1, 2])
@pytest.mark.parametrize("record_time", [True, False])
def test_roundtrip(spark, tmp_path_factory, field, version, record_time):
    p = str(
        tmp_path_factory.mktemp("nc") / f"v{version}_{int(record_time)}.nc"
    )
    write_classic(
        p, field, np.arange(6, dtype=np.float64), version, record_time
    )
    hdr = read_header(p)
    assert set(hdr["vars"]) == {"time", "sst"}
    df = ingest_netcdf_classic(spark, p, "sst")
    rows = df.collect()
    assert len(rows) == field.size
    got = {}
    for r in rows:
        got[(r.time.day, r.y, r.x)] = r.value
    for t in range(6):
        for y in range(4):
            for x in range(5):
                assert got[(t + 1, y, x)] == pytest.approx(
                    float(field[t, y, x]), rel=1e-6
                )


def test_fill_and_scale(spark, tmp_path_factory, field):
    data = field.copy()
    data[0, 0, 0] = 9999.0
    p = str(tmp_path_factory.mktemp("nc") / "fs.nc")
    write_classic(
        p,
        data,
        np.arange(6, dtype=np.float64),
        fill=9999.0,
        scale=0.5,
        offset=100.0,
    )
    df = ingest_netcdf_classic(spark, p, "sst")
    rows = {(r.time.day, r.y, r.x): r.value for r in df.collect()}
    assert (1, 0, 0) not in rows  # fill dropped
    assert rows[(1, 1, 1)] == pytest.approx(float(field[0, 1, 1]) * 0.5 + 100.0, rel=1e-6)


def test_packed_layout_matches_long(spark, tmp_path_factory, field):
    p = str(tmp_path_factory.mktemp("nc") / "pk.nc")
    write_classic(p, field, np.arange(6, dtype=np.float64))
    long_rows = {
        (r.time, r.y, r.x): r.value
        for r in ingest_netcdf_classic(spark, p, "sst").collect()
    }
    packed = ingest_netcdf_classic(spark, p, "sst", layout="packed")
    pk_rows = {
        (r.time, r.y, x): v
        for r in packed.collect()
        for x, v in enumerate(r.vals)
        if v == v
    }
    assert long_rows == pk_rows


def test_dispatch_from_io(spark, tmp_path_factory, field):
    """io.ingest_netcdf routes classic magic to the stdlib reader."""
    from marex_spark.sources.io import ingest_netcdf

    p = str(tmp_path_factory.mktemp("nc") / "disp.nc")
    write_classic(p, field, np.arange(6, dtype=np.float64))
    assert ingest_netcdf(spark, p, "sst").count() == field.size


def test_rejects_non_classic(spark, tmp_path_factory):
    from marex_spark.exceptions import DataValidationError

    p = str(tmp_path_factory.mktemp("nc") / "bad.nc")
    with open(p, "wb") as f:
        f.write(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(DataValidationError):
        ingest_netcdf_classic(spark, p, "sst")
