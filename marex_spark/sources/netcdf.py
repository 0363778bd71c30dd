"""NetCDF classic (CDF-1 / CDF-2) gridded ingestion, stdlib-only
(reference detect.py:409 reads NetCDF natively via xarray; this image
has no netCDF4/xarray, so the classic format — which is a simple
documented binary layout — gets a first-class distributed reader, and
only NetCDF-4/HDF5 files still require the xarray path, io.py).

Design mirrors sources/zarr.py: the driver parses only the tiny header
(dims, variable offsets, attributes, the time coordinate); the record
axis becomes a DataFrame of record ranges and executors read their own
byte ranges in parallel via mapInPandas — no driver-side array
materialisation, so ingestion scales as wide as the cluster.

Format reference: the NetCDF classic format specification (public,
https://docs.unidata.ucar.edu/netcdf-c/current/file_format_specifications.html).
All header integers are big-endian; data is big-endian too.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd

NC_DIMENSION = 0x0A
NC_VARIABLE = 0x0B
NC_ATTRIBUTE = 0x0C

# nc_type → (numpy big-endian dtype, element size)
_TYPES = {
    1: (">i1", 1),  # NC_BYTE
    2: ("S1", 1),  # NC_CHAR
    3: (">i2", 2),  # NC_SHORT
    4: (">i4", 4),  # NC_INT
    5: (">f4", 4),  # NC_FLOAT
    6: (">f8", 8),  # NC_DOUBLE
}


class _Cursor:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def _need(self, n: int) -> None:
        if self.pos + n > len(self.buf):
            raise _HeaderTruncated()

    def u32(self) -> int:
        self._need(4)
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def u64(self) -> int:
        self._need(8)
        (v,) = struct.unpack_from(">q", self.buf, self.pos)
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.u32()
        padded = (n + 3) // 4 * 4
        self._need(padded)
        s = self.buf[self.pos : self.pos + n].decode("utf-8")
        self.pos += padded
        return s

    def att_values(self, nc_type: int, nelems: int):
        dt, isize = _TYPES[nc_type]
        nbytes = nelems * isize
        padded = (nbytes + 3) // 4 * 4
        self._need(padded)
        raw = self.buf[self.pos : self.pos + nbytes]
        self.pos += padded
        if nc_type == 2:
            return raw.decode("utf-8", errors="replace")
        return np.frombuffer(raw, dtype=dt).tolist()


class _HeaderTruncated(Exception):
    pass


def _parse_att_list(c: _Cursor) -> dict:
    tag = c.u32()
    count = c.u32()
    atts: dict = {}
    if tag == 0 and count == 0:
        return atts
    if tag != NC_ATTRIBUTE:
        from marex_spark.exceptions import DataValidationError

        raise DataValidationError(
            "malformed NetCDF header: bad attribute-list tag", details={"tag": tag}
        )
    for _ in range(count):
        name = c.name()
        nc_type = c.u32()
        nelems = c.u32()
        atts[name] = c.att_values(nc_type, nelems)
    return atts


def _parse_header(buf: bytes) -> dict:
    c = _Cursor(buf)
    magic = buf[:3]
    version = buf[3]
    if magic != b"CDF" or version not in (1, 2):
        from marex_spark.exceptions import DataValidationError

        raise DataValidationError(
            "not a NetCDF classic (CDF-1/CDF-2) file",
            details={"magic": repr(buf[:4])},
            suggestions=[
                "NetCDF-4/HDF5 and CDF-5 need the xarray ingestion path "
                "(sources/io.py ingest_netcdf)"
            ],
        )
    c.pos = 4
    numrecs = c.u32()  # -1 = STREAMING (unsupported, caught below)

    dims: list[tuple[str, int]] = []
    tag = c.u32()
    count = c.u32()
    if count and tag != NC_DIMENSION:
        from marex_spark.exceptions import DataValidationError

        raise DataValidationError(
            "malformed NetCDF header: bad dimension-list tag", details={"tag": tag}
        )
    for _ in range(count):
        dims.append((c.name(), c.u32()))

    gatts = _parse_att_list(c)

    variables: list[dict] = []
    tag = c.u32()
    count = c.u32()
    if count and tag != NC_VARIABLE:
        from marex_spark.exceptions import DataValidationError

        raise DataValidationError(
            "malformed NetCDF header: bad variable-list tag", details={"tag": tag}
        )
    for _ in range(count):
        name = c.name()
        ndims = c.u32()
        dimids = [c.u32() for _ in range(ndims)]
        atts = _parse_att_list(c)
        nc_type = c.u32()
        vsize = c.u32()
        begin = c.u32() if version == 1 else c.u64()
        variables.append(
            {
                "name": name,
                "dimids": dimids,
                "atts": atts,
                "nc_type": nc_type,
                "vsize": vsize,
                "begin": begin,
            }
        )
    return {
        "version": version,
        "numrecs": numrecs,
        "dims": dims,
        "gatts": gatts,
        "vars": {v["name"]: v for v in variables},
    }


def read_header(path: str) -> dict:
    """Driver-side header parse with buffer doubling (headers are KBs;
    the loop guards pathological thousand-variable files)."""
    size = os.path.getsize(path)
    n = min(size, 1 << 16)
    while True:
        with open(path, "rb") as f:
            buf = f.read(n)
        try:
            return _parse_header(buf)
        except _HeaderTruncated:
            if n >= size:
                raise
            n = min(size, n * 4)


def _record_stride(header: dict) -> int:
    """Bytes per record slab: sum of record-variable vsizes (each
    already 4-byte padded by the writer); the spec's single-record-var
    special case stores that variable contiguously, which the sum
    degenerates to."""
    rec_dim = next((i for i, (_, sz) in enumerate(header["dims"]) if sz == 0), None)
    stride = 0
    for v in header["vars"].values():
        if v["dimids"] and rec_dim is not None and v["dimids"][0] == rec_dim:
            stride += v["vsize"]
    return stride


def _var_decode_params(v: dict) -> tuple:
    atts = v["atts"]
    fill = atts.get("_FillValue", atts.get("missing_value"))
    fill = fill[0] if isinstance(fill, list) else None
    scale = atts.get("scale_factor", [1.0])
    offset = atts.get("add_offset", [0.0])
    return fill, float(scale[0]), float(offset[0])


_FIXED_CALENDARS = {"noleap": 365, "365_day": 365, "360_day": 360}


def _decode_time_units(units: str, vals: np.ndarray, calendar: str = "") -> list:
    """CF-style 'UNIT since BASE' decode for the common units; raw
    integers pass through as day counts from the epoch.

    ``calendar`` (CF time:calendar attribute) — fixed-length model
    calendars (noleap/365_day and 360_day, the climate-model norm)
    decode by (year, day-of-year) arithmetic: model day d of year Y
    maps to the Gregorian timestamp Jan-1-of-Y + (d-1) days, which
    makes Spark's year()/dayofyear() recover the MODEL calendar
    exactly (dayofyear(Jan1 + k days) ≡ k+1; with ≤365 model days per
    year the mapping is injective in every Gregorian year).
    Climatology and thresholds group on the model's own day index
    instead of drifting ~1 day per 4 years, the way a Gregorian decode
    of noleap data does. (The reference gets the same behaviour from
    xarray's cftime decoding, detect.py's dayofyear use.)

    366-day calendars (all_leap) are refused: 366 model days cannot map
    injectively into non-leap Gregorian years while preserving year(),
    so a silent decode would merge model days 366 and 1.

    The base date's day-of-year offset is computed in the MODEL
    calendar (non-leap doy for noleap; 30-day months for 360_day), not
    the Gregorian one — a "days since 2000-07-01" noleap base must not
    inherit year-2000's leap-shifted doy."""
    unit_s = {"days": 86400, "hours": 3600, "minutes": 60, "seconds": 1}
    base = pd.Timestamp("1970-01-01")
    mult = 86400
    if units:
        parts = units.split(" since ")
        if len(parts) == 2 and parts[0].strip().lower() in unit_s:
            mult = unit_s[parts[0].strip().lower()]
            base = pd.Timestamp(parts[1].strip())
    cal = (calendar or "").strip().lower()
    if cal in ("all_leap", "366_day"):
        from marex_spark.exceptions import ConfigurationError

        raise ConfigurationError(
            "366-day model calendars cannot be decoded onto Gregorian "
            "timestamps without merging model days 366 and 1 in non-leap "
            "years",
            details={"calendar": cal},
            suggestions=[
                "re-encode the series on a noleap/360_day/standard calendar",
                "or ingest with integer day indices and derive doy yourself",
            ],
        )
    year_len = _FIXED_CALENDARS.get(cal)
    if year_len is not None:
        # whole model days since BASE (sub-day parts truncate)
        days = (vals.astype(np.float64) * mult // 86400).astype(np.int64)
        if year_len == 360:
            # 30-day months; clamp Gregorian day 31 in the base string
            base_doy = (base.month - 1) * 30 + min(base.day, 30) - 1
        else:
            # non-leap doy regardless of the base string's Gregorian year
            # (a Feb-29 Gregorian base clamps to Feb 28 — no model slot)
            bd = min(base.day, 28) if base.month == 2 else base.day
            base_doy = (
                pd.Timestamp(year=2001, month=base.month, day=bd).dayofyear - 1
            )
        total = base_doy + days
        year = base.year + total // year_len
        doy = total % year_len  # 0-based, < 365 → injective per year
        return [
            pd.Timestamp(year=int(y), month=1, day=1) + pd.Timedelta(days=int(d))
            for y, d in zip(year, doy)
        ]
    return list(base + pd.to_timedelta(vals.astype(np.float64) * mult, unit="s"))


def _read_coord(path: str, header: dict, v: dict, n: int) -> np.ndarray:
    """Driver-side read of a small 1-D coordinate variable (record or
    fixed)."""
    dt, isize = _TYPES[v["nc_type"]]
    rec_dim = next((i for i, (_, sz) in enumerate(header["dims"]) if sz == 0), None)
    with open(path, "rb") as f:
        if v["dimids"] and v["dimids"][0] == rec_dim:
            stride = _record_stride(header)
            out = np.empty(n, dtype=np.dtype(dt).newbyteorder("="))
            for i in range(n):
                f.seek(v["begin"] + i * stride)
                out[i] = np.frombuffer(f.read(isize), dtype=dt)[0]
            return out
        f.seek(v["begin"])
        return np.frombuffer(f.read(n * isize), dtype=dt).copy()


def ingest_netcdf_classic(
    spark,
    path: str,
    var: str,
    time_var: str = "time",
    layout: str = "long",
    target_chunk_bytes: int = 16 << 20,
    time_min=None,
    time_max=None,
):
    """3-D (time, y, x) variable in a NetCDF classic file → Spark
    DataFrame (S2; the stdlib mirror of sources/zarr.ingest_zarr_gridded).
    ``layout="packed"`` lands the blocked-kernel layout directly.
    ``time_min``/``time_max`` prune record ranges on the driver before
    any task launches (see zarr.ingest_zarr_gridded)."""
    from pyspark.sql import functions as F

    header = read_header(path)
    if var not in header["vars"]:
        from marex_spark.exceptions import CoordinateError

        raise CoordinateError(
            f"variable '{var}' not in file",
            details={"have": sorted(header["vars"])},
        )
    v = header["vars"][var]
    if len(v["dimids"]) != 3:
        from marex_spark.exceptions import CoordinateError

        raise CoordinateError(
            "expected a 3-D (time, y, x) variable",
            details={"ndims": len(v["dimids"]), "var": var},
        )
    if v["nc_type"] == 2:
        from marex_spark.exceptions import DataValidationError

        raise DataValidationError("char variables are not gridded data")

    dims = header["dims"]
    rec_dim = next((i for i, (_, sz) in enumerate(dims) if sz == 0), None)
    d0, d1, d2 = v["dimids"]
    NY, NX = dims[d1][1], dims[d2][1]
    is_record = rec_dim is not None and d0 == rec_dim
    if is_record:
        T = header["numrecs"]
        if T < 0:
            from marex_spark.exceptions import DataValidationError

            raise DataValidationError(
                "STREAMING numrecs (-1) is unsupported; rewrite with a "
                "fixed record count"
            )
        stride = _record_stride(header)
    else:
        T = dims[d0][1]
        stride = None  # contiguous

    dt, isize = _TYPES[v["nc_type"]]
    plane = NY * NX * isize
    fill, scale, offset = _var_decode_params(v)
    begin = v["begin"]

    # time coordinate (driver-side, metadata-sized)
    tv = header["vars"].get(time_var)
    if tv is not None and len(tv["dimids"]) == 1 and tv["dimids"][0] == d0:
        raw_t = _read_coord(path, header, tv, T)
        units = tv["atts"].get("units", "")
        cal = tv["atts"].get("calendar", "")
        times = _decode_time_units(
            units if isinstance(units, str) else "",
            raw_t,
            cal if isinstance(cal, str) else "",
        )
    else:
        times = _decode_time_units("", np.arange(T))

    ct = max(1, min(T, target_chunk_bytes // max(plane, 1)))
    tmin_ts = pd.Timestamp(time_min) if time_min is not None else None
    tmax_ts = pd.Timestamp(time_max) if time_max is not None else None

    def _in_range(t0: int, nt: int) -> bool:
        if tmin_ts is not None and pd.Timestamp(times[t0 + nt - 1]) < tmin_ts:
            return False
        if tmax_ts is not None and pd.Timestamp(times[t0]) > tmax_ts:
            return False
        return True

    keys = [
        (t0, min(ct, T - t0))
        for t0 in range(0, T, ct)
        if _in_range(t0, min(ct, T - t0))
    ]
    if not keys:
        empty = spark.createDataFrame(
            [], "time timestamp, y int, x int, value float"
        )
        if layout == "long":
            return empty
        from marex_spark.operators.detect_blocked import pack_gridded

        return pack_gridded(empty, nx=NX)
    keys_df = spark.createDataFrame(keys, "t0 int, nt int").repartition(
        min(len(keys), spark.sparkContext.defaultParallelism * 4)
    )

    def _decode(batches):
        for b in batches:
            for t0, nt in zip(b["t0"], b["nt"]):
                t0, nt = int(t0), int(nt)
                with open(path, "rb") as f:
                    if stride is None:
                        f.seek(begin + t0 * plane)
                        raw = f.read(nt * plane)
                        a = np.frombuffer(raw, dtype=dt, count=nt * NY * NX)
                    else:
                        parts = []
                        for i in range(nt):
                            f.seek(begin + (t0 + i) * stride)
                            parts.append(f.read(plane))
                        a = np.frombuffer(b"".join(parts), dtype=dt)
                a = a.astype(np.float64).reshape(nt, NY, NX)
                if fill is not None:
                    a = np.where(a == fill, np.nan, a)
                a = a * scale + offset
                tt, yy, xx = np.meshgrid(
                    np.arange(nt), np.arange(NY), np.arange(NX), indexing="ij"
                )
                yield pd.DataFrame(
                    {
                        "time": [times[t0 + k] for k in tt.ravel()],
                        "y": yy.ravel().astype(np.int32),
                        "x": xx.ravel().astype(np.int32),
                        "value": a.ravel().astype(np.float32),
                    }
                )

    long_df = keys_df.mapInPandas(
        _decode, schema="time timestamp, y int, x int, value float"
    ).filter(F.col("value").isNotNull() & ~F.isnan("value"))
    if tmin_ts is not None:
        long_df = long_df.filter(F.col("time") >= F.lit(tmin_ts))
    if tmax_ts is not None:
        long_df = long_df.filter(F.col("time") <= F.lit(tmax_ts))
    if layout == "long":
        return long_df
    from marex_spark.operators.detect_blocked import pack_gridded

    return pack_gridded(long_df, nx=NX)


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


def write_netcdf_classic(
    path: str,
    data: np.ndarray,  # (T, NY, NX) float32
    time_vals: np.ndarray,  # (T,) float64 days
    version: int = 1,
    record_time: bool = True,
    fill: float | None = None,
    scale: float | None = None,
    offset: float | None = None,
) -> None:
    """Minimal CDF-1/CDF-2 WRITER (the export counterpart of the
    reader above; the reference round-trips NetCDF via xarray,
    detect.py:409 / docs): one (time, lat, lon) float variable plus
    its time coordinate, record or fixed time dim, optional
    _FillValue / scale_factor / add_offset encoding attributes.
    Driver-side (fixtures, small exports); spec-literal so the
    distributed reader is exercised against an independent encoding
    of the format."""
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
