"""NetCDF-4 / HDF5 gridded ingestion, stdlib-only (reference
detect.py:409 reads any xarray-supported store, which in practice is
NetCDF-4/HDF5 for most real archives; this image has no h5py/netCDF4,
so the HDF5 subset that NetCDF-4 writers actually emit gets a
first-class distributed reader, closing the gap the classic reader
(sources/netcdf.py) left open).

Same design as the CDF reader: the driver parses only metadata — the
superblock, the root group's symbol-table B-tree, each dataset's
object-header messages (dataspace, datatype, layout, filters,
attributes) and the chunk-index B-tree — while executors read their own
byte ranges in parallel via ``mapInPandas`` (inflate + unshuffle + edge
trim per chunk). Nothing data-sized ever lands on the driver, so
ingestion scales as wide as the cluster: a 100 TB archive is just a
longer chunk-descriptor DataFrame.

Format subset (the old-style layout libhdf5 emits by default, i.e.
what netCDF4-python/h5netcdf files look like):
- superblock version 0, 8-byte offsets/lengths
- old-style groups: B-tree v1 (node type 0) + SNOD symbol nodes +
  local heap
- object headers v1 (+ continuation blocks)
- dataspace v1/v2, datatype classes 0 (fixed) / 1 (float), layout v3
  (contiguous | chunked), filter pipeline v1 (deflate, shuffle),
  attributes v1/v3
- chunk index: B-tree v1 (node type 1), any depth

Format reference: the public HDF5 File Format Specification
(https://support.hdfgroup.org/documentation/hdf5/latest/_f_m_t3.html).
All integers little-endian. The writer below emits the same subset so
the distributed reader is exercised against an independent, spec-
literal encoding (mirroring write_netcdf_classic)."""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pandas as pd

_SIG = b"\x89HDF\r\n\x1a\n"
_UNDEF = 0xFFFFFFFFFFFFFFFF

H5_DEFLATE = 1
H5_SHUFFLE = 2


def _err(msg, **details):
    from marex_spark.exceptions import DataValidationError

    raise DataValidationError(msg, details=details or None)


# ---------------------------------------------------------------------------
# Driver-side metadata parser
# ---------------------------------------------------------------------------


class _File:
    """Random-access little-endian reader over the (driver-local) file."""

    def __init__(self, path: str):
        self.path = path
        self.f = open(path, "rb")

    def close(self):
        self.f.close()

    def read(self, addr: int, n: int) -> bytes:
        self.f.seek(addr)
        b = self.f.read(n)
        if len(b) != n:
            _err("truncated HDF5 file", addr=addr, want=n, got=len(b))
        return b

    def u(self, addr: int, n: int) -> int:
        return int.from_bytes(self.read(addr, n), "little")


def _parse_superblock(fh: _File) -> dict:
    head = fh.read(0, 8)
    if head != _SIG:
        _err("not an HDF5 file", magic=repr(head))
    ver = fh.u(8, 1)
    if ver != 0:
        _err(
            "only superblock version 0 (the libhdf5 default that NetCDF-4 "
            "files use) is supported",
            version=ver,
        )
    size_off = fh.u(13, 1)
    size_len = fh.u(14, 1)
    if size_off != 8 or size_len != 8:
        _err("only 8-byte offsets/lengths supported", offsets=size_off, lengths=size_len)
    # v0 layout: 24 fixed bytes, 4 addresses, then the root symbol entry
    root_entry_addr = 24 + 4 * 8
    oh_addr = fh.u(root_entry_addr + 8, 8)
    return {"root_header": oh_addr}


def _parse_messages(fh: _File, addr: int) -> list[tuple[int, bytes]]:
    """Object header v1 → [(msg_type, body)], following continuations."""
    ver = fh.u(addr, 1)
    if ver != 1:
        _err("only version-1 object headers supported (old-style files)", version=ver)
    nmsgs = fh.u(addr + 2, 2)
    header_size = fh.u(addr + 8, 4)
    blocks = [(addr + 16, header_size)]  # 12B prefix + 4B alignment gap
    msgs: list[tuple[int, bytes]] = []
    seen = 0
    bi = 0
    pos, remaining = blocks[0]
    while seen < nmsgs and bi < len(blocks):
        if remaining < 8:
            bi += 1
            if bi >= len(blocks):
                break
            pos, remaining = blocks[bi]
            continue
        mtype = fh.u(pos, 2)
        msize = fh.u(pos + 2, 2)
        body = fh.read(pos + 8, msize)
        pos += 8 + msize
        remaining -= 8 + msize
        seen += 1
        if mtype == 0x10:  # continuation: (offset, length)
            cont_addr, cont_len = struct.unpack("<QQ", body[:16])
            blocks.append((cont_addr, cont_len))
        else:
            msgs.append((mtype, body))
    return msgs


def _parse_dataspace(body: bytes) -> list[int]:
    ver = body[0]
    rank = body[1]
    flags = body[2]
    off = 8 if ver == 1 else 4
    dims = [
        int.from_bytes(body[off + 8 * i : off + 8 * (i + 1)], "little")
        for i in range(rank)
    ]
    return dims


def _parse_datatype(body: bytes) -> np.dtype:
    cls = body[0] & 0x0F
    ver = body[0] >> 4
    size = int.from_bytes(body[4:8], "little")
    big = body[1] & 1
    order = ">" if big else "<"
    if cls == 1:  # float
        return np.dtype(f"{order}f{size}")
    if cls == 0:  # fixed-point
        signed = "i" if body[1] & 0x08 else "u"
        return np.dtype(f"{order}{signed}{size}")
    if cls == 3:  # string (attribute values)
        return np.dtype(f"S{size}")
    _err("unsupported datatype class", dtype_class=cls, version=ver)


def _parse_filters(body: bytes) -> list[tuple[int, list[int]]]:
    nfilters = body[1]
    pos = 8
    out = []
    for _ in range(nfilters):
        fid = int.from_bytes(body[pos : pos + 2], "little")
        namelen = int.from_bytes(body[pos + 2 : pos + 4], "little")
        ncv = int.from_bytes(body[pos + 6 : pos + 8], "little")
        pos += 8 + namelen
        vals = [
            int.from_bytes(body[pos + 4 * i : pos + 4 * (i + 1)], "little")
            for i in range(ncv)
        ]
        pos += 4 * ncv
        if ncv % 2:
            pos += 4
        out.append((fid, vals))
    return out


def _parse_attribute(body: bytes) -> tuple[str, object]:
    ver = body[0]
    if ver not in (1, 3):
        _err("unsupported attribute message version", version=ver)
    name_size = int.from_bytes(body[2:4], "little")
    dt_size = int.from_bytes(body[4:6], "little")
    ds_size = int.from_bytes(body[6:8], "little")
    pos = 8
    if ver == 3:
        pos += 1  # name character-set encoding
        pad = 0  # v3: no 8-byte padding of the variable parts
    else:
        pad = 1
    name = body[pos : pos + name_size].split(b"\x00")[0].decode()
    pos += (name_size + 7) // 8 * 8 if pad else name_size
    dt = _parse_datatype(body[pos : pos + dt_size])
    pos += (dt_size + 7) // 8 * 8 if pad else dt_size
    dims = _parse_dataspace(body[pos : pos + ds_size])
    pos += (ds_size + 7) // 8 * 8 if pad else ds_size
    n = int(np.prod(dims)) if dims else 1
    raw = body[pos : pos + n * dt.itemsize]
    if dt.kind == "S":
        return name, raw.split(b"\x00")[0].decode("utf-8", errors="replace")
    vals = np.frombuffer(raw, dtype=dt, count=n)
    return name, vals.tolist()


def _walk_chunk_btree(fh: _File, addr: int, ndims: int) -> list[dict]:
    """B-tree v1 node type 1 → flat [(chunk offsets, file addr, nbytes,
    filter mask)] in key order; recurses through internal levels."""
    if addr == _UNDEF:
        return []
    sig = fh.read(addr, 4)
    if sig != b"TREE":
        _err("bad chunk B-tree signature", addr=addr, sig=repr(sig))
    level = fh.u(addr + 5, 1)
    used = fh.u(addr + 6, 2)
    pos = addr + 24
    key_size = 8 + 8 * ndims
    out: list[dict] = []
    for _ in range(used):
        nbytes = fh.u(pos, 4)
        fmask = fh.u(pos + 4, 4)
        offs = [fh.u(pos + 8 + 8 * i, 8) for i in range(ndims)]
        child = fh.u(pos + key_size, 8)
        if level == 0:
            out.append(
                {"offsets": offs[:-1], "addr": child, "nbytes": nbytes, "filter_mask": fmask}
            )
        else:
            out.extend(_walk_chunk_btree(fh, child, ndims))
        pos += key_size + 8
    return out


def _heap_name(fh: _File, heap_addr: int, offset: int) -> str:
    sig = fh.read(heap_addr, 4)
    if sig != b"HEAP":
        _err("bad local heap signature", addr=heap_addr)
    data_addr = fh.u(heap_addr + 24, 8)
    out = bytearray()
    pos = data_addr + offset
    while True:
        b = fh.read(pos, 16)
        i = b.find(b"\x00")
        if i >= 0:
            out.extend(b[:i])
            break
        out.extend(b)
        pos += 16
    return out.decode()


def _walk_group_btree(fh: _File, addr: int, heap_addr: int) -> dict[str, int]:
    """Group B-tree v1 → {link name: object header address}."""
    sig = fh.read(addr, 4)
    if sig != b"TREE":
        _err("bad group B-tree signature", addr=addr)
    level = fh.u(addr + 5, 1)
    used = fh.u(addr + 6, 2)
    pos = addr + 24 + 8  # skip leading key
    out: dict[str, int] = {}
    for _ in range(used):
        child = fh.u(pos, 8)
        if level == 0:
            csig = fh.read(child, 4)
            if csig != b"SNOD":
                _err("bad symbol node signature", addr=child)
            count = fh.u(child + 6, 2)
            epos = child + 8
            for _ in range(count):
                name_off = fh.u(epos, 8)
                oh = fh.u(epos + 8, 8)
                out[_heap_name(fh, heap_addr, name_off)] = oh
                epos += 40
        else:
            out.update(_walk_group_btree(fh, child, heap_addr))
        pos += 8 + 8  # child + next key
    return out


def _parse_dataset(fh: _File, oh_addr: int) -> dict:
    info: dict = {"attrs": {}}
    for mtype, body in _parse_messages(fh, oh_addr):
        if mtype == 0x01:
            info["dims"] = _parse_dataspace(body)
        elif mtype == 0x03:
            info["dtype"] = _parse_datatype(body)
        elif mtype == 0x08:
            ver, cls = body[0], body[1]
            if ver != 3:
                _err("only layout message version 3 supported", version=ver)
            if cls == 1:  # contiguous
                a, sz = struct.unpack("<QQ", body[2:18])
                info["layout"] = {"class": "contiguous", "addr": a, "size": sz}
            elif cls == 2:  # chunked
                nd = body[2]
                btree = int.from_bytes(body[3:11], "little")
                cdims = [
                    int.from_bytes(body[11 + 4 * i : 15 + 4 * i], "little")
                    for i in range(nd)
                ]
                info["layout"] = {
                    "class": "chunked",
                    "btree": btree,
                    "chunk": cdims[:-1],  # last entry = element size
                    "ndims": nd,
                }
            else:
                _err("unsupported layout class", layout_class=cls)
        elif mtype == 0x0B:
            info["filters"] = _parse_filters(body)
        elif mtype == 0x0C:
            k, v = _parse_attribute(body)
            info["attrs"][k] = v
    return info


def read_hdf5_header(path: str) -> dict:
    """Driver-side metadata parse: every dataset in the root group with
    dims/dtype/layout/filters/attributes and (for chunked layouts) the
    flat chunk index. Metadata-sized; no array data is read."""
    fh = _File(path)
    try:
        sb = _parse_superblock(fh)
        btree_addr = heap_addr = None
        for mtype, body in _parse_messages(fh, sb["root_header"]):
            if mtype == 0x11:  # symbol table message
                btree_addr, heap_addr = struct.unpack("<QQ", body[:16])
        if btree_addr is None:
            _err(
                "root group has no symbol-table message (new-style groups "
                "unsupported; write with the libhdf5 default settings)"
            )
        links = _walk_group_btree(fh, btree_addr, heap_addr)
        datasets = {}
        for name, oh in links.items():
            ds = _parse_dataset(fh, oh)
            if "dims" not in ds or "dtype" not in ds:
                continue  # a subgroup, not a dataset
            if ds.get("layout", {}).get("class") == "chunked":
                ds["chunks"] = _walk_chunk_btree(
                    fh, ds["layout"]["btree"], ds["layout"]["ndims"]
                )
            datasets[name] = ds
        return {"datasets": datasets}
    finally:
        fh.close()


# ---------------------------------------------------------------------------
# Chunk payload decode (executor-side)
# ---------------------------------------------------------------------------


def _decode_chunk(
    raw: bytes, filters: list[tuple[int, list[int]]], filter_mask: int, dtype, chunk_shape
) -> np.ndarray:
    # pipeline applies in reverse on read; bit i of filter_mask set
    # means filter i was SKIPPED at write time
    for i in range(len(filters) - 1, -1, -1):
        if filter_mask & (1 << i):
            continue
        fid, vals = filters[i]
        if fid == H5_DEFLATE:
            raw = zlib.decompress(raw)
        elif fid == H5_SHUFFLE:
            s = vals[0] if vals else dtype.itemsize
            n = len(raw) // s
            raw = (
                np.frombuffer(raw, dtype=np.uint8)
                .reshape(s, n)
                .T.tobytes()
            )
        else:
            _err("unsupported HDF5 filter", filter_id=fid)
    return np.frombuffer(raw, dtype=dtype, count=int(np.prod(chunk_shape))).reshape(
        chunk_shape
    )


# ---------------------------------------------------------------------------
# Distributed ingestion (S2, NetCDF-4 flavour)
# ---------------------------------------------------------------------------


def _plan_file(path: str, var: str, time_var: str) -> dict:
    """Driver-side ingest plan for ONE file: chunk descriptors + decode
    parameters + decoded time coordinate. Metadata-sized."""
    from marex_spark.sources.netcdf import _decode_time_units

    header = read_hdf5_header(path)
    dsets = header["datasets"]
    if var not in dsets:
        from marex_spark.exceptions import CoordinateError

        raise CoordinateError(
            f"variable '{var}' not in file",
            details={"have": sorted(dsets), "path": path},
        )
    v = dsets[var]
    if len(v["dims"]) != 3:
        from marex_spark.exceptions import CoordinateError

        raise CoordinateError(
            "expected a 3-D (time, y, x) variable",
            details={"ndims": len(v["dims"]), "var": var, "path": path},
        )
    T, NY, NX = v["dims"]
    dtype = v["dtype"]
    filters = v.get("filters", [])
    attrs = v.get("attrs", {})
    fill = attrs.get("_FillValue", attrs.get("missing_value"))
    fill = fill[0] if isinstance(fill, list) else fill
    scale = attrs.get("scale_factor", [1.0])
    scale = float(scale[0] if isinstance(scale, list) else scale)
    offset = attrs.get("add_offset", [0.0])
    offset = float(offset[0] if isinstance(offset, list) else offset)

    tv = dsets.get(time_var)
    if tv is not None and len(tv["dims"]) == 1 and tv["dims"][0] == T:
        raw_t = _read_small_dataset(path, tv)
        units = tv["attrs"].get("units", "")
        cal = tv["attrs"].get("calendar", "")
        times = _decode_time_units(
            units if isinstance(units, str) else "",
            raw_t,
            cal if isinstance(cal, str) else "",
        )
    else:
        times = _decode_time_units("", np.arange(T))

    lay = v["layout"]
    if lay["class"] == "contiguous":
        plane = NY * NX * dtype.itemsize
        descs = [
            (int(t0), 0, 0, int(lay["addr"] + t0 * plane), int(plane), 0, False)
            for t0 in range(T)
        ]
        chunk_shape = (1, NY, NX)
    else:
        chunk_shape = tuple(lay["chunk"])
        descs = [
            (
                int(c["offsets"][0]),
                int(c["offsets"][1]),
                int(c["offsets"][2]),
                int(c["addr"]),
                int(c["nbytes"]),
                int(c["filter_mask"]),
                True,
            )
            for c in v["chunks"]
        ]
    if not descs:
        _err("dataset has no stored chunks", var=var, path=path)
    # compare the fill in the VARIABLE's precision: a float64 _FillValue
    # attribute (or one from a writer that widened it) must still match
    # the float32-rounded stored values
    fill_val = None if fill is None else float(np.asarray(fill).astype(dtype))
    return {
        "path": path,
        "descs": descs,
        "chunk_shape": chunk_shape,
        "dtype_str": dtype.str,
        "filters": filters,
        "fill_val": fill_val,
        "scale": scale,
        "offset": offset,
        "times": list(times),
        "T": T,
        "NY": NY,
        "NX": NX,
    }


def ingest_netcdf4(
    spark,
    path: str,
    var: str,
    time_var: str = "time",
    layout: str = "long",
    time_min=None,
    time_max=None,
):
    """3-D (time, y, x) variable in a NetCDF-4/HDF5 file → Spark
    DataFrame, same output contract as
    :func:`marex_spark.sources.netcdf.ingest_netcdf_classic` (long rows
    filtered of fill, or ``layout="packed"`` for the blocked kernel).

    The driver reads only metadata: the chunk index becomes a
    DataFrame of (chunk offsets, file address, byte count) descriptors
    and each executor opens the file itself to read, inflate and
    unshuffle its own chunks — the natural parallel unit for chunked
    HDF5, one task per chunk batch, scaling with chunk count rather
    than driver memory."""
    return ingest_netcdf4_archive(
        spark, [path], var, time_var=time_var, layout=layout,
        time_min=time_min, time_max=time_max,
    )


def ingest_netcdf4_archive(
    spark,
    paths,
    var: str,
    time_var: str = "time",
    layout: str = "long",
    max_workers: int = 16,
    time_min=None,
    time_max=None,
):
    """A MULTI-FILE NetCDF-4 archive (the common one-file-per-year
    layout) as ONE DataFrame: every file's chunk index is parsed on the
    driver (thread pool — header parses are tiny random reads), all
    descriptors land in a single chunk-descriptor DataFrame tagged by
    file id, and one ``mapInPandas`` kernel decodes everything. Per-file
    decode parameters (chunk geometry, filters, fill/scale, time
    coordinate) ride a broadcast, so files may differ in chunking and
    compression — only the (y, x) grid must match.

    Scaling unit = the chunk across the WHOLE archive: a 1000-file
    century is one DataFrame of ~10⁶ descriptor rows, not 1000 unioned
    plans."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    paths = list(paths)
    if not paths:
        _err("empty path list")
    with ThreadPoolExecutor(max_workers=min(max_workers, len(paths))) as ex:
        plans = list(ex.map(lambda p: _plan_file(p, var, time_var), paths))
    NY, NX = plans[0]["NY"], plans[0]["NX"]
    for pl in plans[1:]:
        if (pl["NY"], pl["NX"]) != (NY, NX):
            _err(
                "archive files disagree on the (y, x) grid",
                path=pl["path"], grid=(pl["NY"], pl["NX"]), want=(NY, NX),
            )

    # driver-side time pruning over the chunk index: descriptors whose
    # time-slice range misses [time_min, time_max] never become tasks —
    # in the one-file-per-year layout this drops whole files' chunk
    # sets, so a daily append re-reads only the newest file's tail
    tmin_ts = pd.Timestamp(time_min) if time_min is not None else None
    tmax_ts = pd.Timestamp(time_max) if time_max is not None else None

    def _in_range(pl, t0):
        if tmin_ts is None and tmax_ts is None:
            return True
        ct = pl["chunk_shape"][0]  # contiguous planes are (1, NY, NX)
        lo = pd.Timestamp(pl["times"][int(t0)])
        hi = pd.Timestamp(pl["times"][min(int(t0) + ct, pl["T"]) - 1])
        if tmin_ts is not None and hi < tmin_ts:
            return False
        if tmax_ts is not None and lo > tmax_ts:
            return False
        return True

    rows = [
        (fid, t0, y0, x0, addr, nbytes, fmask, filtered)
        for fid, pl in enumerate(plans)
        for (t0, y0, x0, addr, nbytes, fmask, filtered) in pl["descs"]
        if _in_range(pl, t0)
    ]
    if not rows:
        empty = spark.createDataFrame(
            [], "time timestamp, y int, x int, value float"
        )
        if layout == "long":
            return empty
        from marex_spark.operators.detect_blocked import pack_gridded

        return pack_gridded(empty, nx=NX)
    keys_df = spark.createDataFrame(
        rows,
        "fid int, t0 int, y0 int, x0 int, addr long, nbytes long, "
        "fmask int, filtered boolean",
    ).repartition(
        min(len(rows), spark.sparkContext.defaultParallelism * 4)
    )
    meta_bc = spark.sparkContext.broadcast(
        {
            fid: {
                k: pl[k]
                for k in (
                    "path", "chunk_shape", "dtype_str", "filters",
                    "fill_val", "scale", "offset", "times", "T",
                )
            }
            for fid, pl in enumerate(plans)
        }
    )

    def _decode(batches):
        meta = meta_bc.value
        for b in batches:
            frames = []
            handles: dict[int, object] = {}
            try:
                raws = []
                for fid, addr, nbytes in zip(b["fid"], b["addr"], b["nbytes"]):
                    fid = int(fid)
                    f = handles.get(fid)
                    if f is None:
                        f = handles[fid] = open(meta[fid]["path"], "rb")
                    f.seek(int(addr))
                    raws.append(f.read(int(nbytes)))
            finally:
                for f in handles.values():
                    f.close()
            for raw, fid, t0, y0, x0, fmask, filtered in zip(
                raws, b["fid"], b["t0"], b["y0"], b["x0"], b["fmask"], b["filtered"]
            ):
                m = meta[int(fid)]
                chunk_shape = m["chunk_shape"]
                dt = np.dtype(m["dtype_str"])
                a = _decode_chunk(
                    raw, m["filters"] if filtered else [], int(fmask), dt, chunk_shape
                )
                # trim edge chunks (stored full-size, padded past the grid)
                nt = min(chunk_shape[0], m["T"] - int(t0))
                ny = min(chunk_shape[1], NY - int(y0))
                nx = min(chunk_shape[2], NX - int(x0))
                a = a[:nt, :ny, :nx].astype(np.float64)
                if m["fill_val"] is not None:
                    a = np.where(a == m["fill_val"], np.nan, a)
                a = a * m["scale"] + m["offset"]
                tt, yy, xx = np.meshgrid(
                    np.arange(nt), np.arange(ny), np.arange(nx), indexing="ij"
                )
                frames.append(
                    pd.DataFrame(
                        {
                            "time": [m["times"][int(t0) + k] for k in tt.ravel()],
                            "y": (yy.ravel() + int(y0)).astype(np.int32),
                            "x": (xx.ravel() + int(x0)).astype(np.int32),
                            "value": a.ravel().astype(np.float32),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

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


def _read_small_dataset(path: str, ds: dict) -> np.ndarray:
    """Driver-side read of a small (coordinate-sized) dataset."""
    fh = _File(path)
    try:
        n = int(np.prod(ds["dims"]))
        lay = ds["layout"]
        if lay["class"] == "contiguous":
            raw = fh.read(lay["addr"], n * ds["dtype"].itemsize)
            return (
                np.frombuffer(raw, dtype=ds["dtype"], count=n)
                .reshape(ds["dims"])
                .copy()
            )
        shape = tuple(ds["dims"])
        out = np.zeros(shape, dtype=ds["dtype"])
        cshape = tuple(lay["chunk"])
        for c in ds.get("chunks", []):
            raw = fh.read(c["addr"], c["nbytes"])
            a = _decode_chunk(
                raw, ds.get("filters", []), c["filter_mask"], ds["dtype"], cshape
            )
            sl = tuple(
                slice(o, min(o + s, dim))
                for o, s, dim in zip(c["offsets"], cshape, shape)
            )
            out[sl] = a[tuple(slice(0, s.stop - s.start) for s in sl)]
        return out
    finally:
        fh.close()


# ---------------------------------------------------------------------------
# Minimal spec-literal WRITER (fixtures + small exports), mirroring
# write_netcdf_classic: one (time, y, x) float variable + a time
# coordinate, contiguous or chunked (optionally shuffle+deflate).
# ---------------------------------------------------------------------------


def _dt_msg(dtype: np.dtype) -> bytes:
    size = dtype.itemsize
    if dtype.kind == "f":
        bitfield = bytes([0x20, (8 * size - 1) & 0xFF, 0x00])
        if size == 4:
            props = struct.pack("<HHBBBBI", 0, 32, 23, 8, 0, 23, 127)
        else:
            props = struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
        return bytes([0x11]) + bitfield + struct.pack("<I", size) + props
    if dtype.kind in "iu":
        bf0 = 0x08 if dtype.kind == "i" else 0x00
        return (
            bytes([0x10, bf0, 0, 0])
            + struct.pack("<I", size)
            + struct.pack("<HH", 0, 8 * size)
        )
    if dtype.kind == "S":
        return bytes([0x13, 0, 0, 0]) + struct.pack("<I", size)
    raise ValueError(f"unsupported writer dtype {dtype}")


def _ds_msg(dims: tuple[int, ...]) -> bytes:
    return (
        bytes([1, len(dims), 0, 0, 0, 0, 0, 0])
        + b"".join(struct.pack("<Q", d) for d in dims)
    )


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _attr_msg(name: str, value) -> bytes:
    nm = name.encode() + b"\x00"
    if isinstance(value, str):
        data = value.encode()
        dt = _dt_msg(np.dtype(f"S{len(data)}"))
        ds = _ds_msg(())
    else:
        arr = np.asarray(value, dtype="<f8")
        data = arr.tobytes()
        dt = _dt_msg(np.dtype("<f8"))
        ds = _ds_msg(arr.shape if arr.ndim else ())
    body = (
        bytes([1, 0])
        + struct.pack("<HHH", len(nm), len(dt), len(ds))
        + _pad8(nm)
        + _pad8(dt)
        + _pad8(ds)
        + data
    )
    return body


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHBBBB", mtype, len(body), 0, 0, 0, 0) + body


def _object_header(msgs: list[bytes]) -> bytes:
    blob = b"".join(msgs)
    return (
        struct.pack("<BBHIIBBBB", 1, 0, len(msgs), 1, len(blob), 0, 0, 0, 0) + blob
    )


def write_netcdf4(
    path: str,
    data: np.ndarray,  # (T, NY, NX) float32
    time_vals: np.ndarray,  # (T,) float64
    time_units: str = "days since 2020-01-01",
    calendar: str = "",
    chunks: tuple[int, int, int] | None = None,
    compress: bool = False,
    shuffle: bool = False,
    fill: float | None = None,
    scale: float | None = None,
    offset: float | None = None,
    var: str = "sst",
) -> None:
    """Minimal HDF5 (NetCDF-4-flavoured) writer: superblock v0,
    old-style root group, v1 object headers, layout v3. ``chunks``
    selects the chunked B-tree path (with optional shuffle+deflate);
    ``None`` writes contiguous."""
    T, NY, NX = data.shape
    data = np.ascontiguousarray(data, dtype="<f4")
    tvals = np.ascontiguousarray(time_vals, dtype="<f8")

    chunks_blob = []  # (key offsets, payload)
    if chunks is not None:
        ct, cy, cx = chunks
        filters = []
        if shuffle:
            filters.append((H5_SHUFFLE, [4]))
        if compress:
            filters.append((H5_DEFLATE, [4]))
        for t0 in range(0, T, ct):
            for y0 in range(0, NY, cy):
                for x0 in range(0, NX, cx):
                    block = np.zeros((ct, cy, cx), dtype="<f4")
                    src = data[t0 : t0 + ct, y0 : y0 + cy, x0 : x0 + cx]
                    block[: src.shape[0], : src.shape[1], : src.shape[2]] = src
                    raw = block.tobytes()
                    for fid, vals in filters:
                        if fid == H5_SHUFFLE:
                            s = vals[0]
                            n = len(raw) // s
                            raw = (
                                np.frombuffer(raw, dtype=np.uint8)
                                .reshape(n, s)
                                .T.tobytes()
                            )
                        elif fid == H5_DEFLATE:
                            raw = zlib.compress(raw, vals[0])
                    chunks_blob.append(((t0, y0, x0), raw))

    # ---- plan addresses --------------------------------------------------
    cursor = [0]

    def alloc(n: int) -> int:
        a = cursor[0]
        cursor[0] += n
        return a

    alloc(24 + 32 + 40)  # superblock v0 + root symbol entry

    # root object header (symbol table message filled in later)
    root_oh_addr = alloc(len(_object_header([_msg(0x11, b"\x00" * 16)])))
    btree_addr = alloc(24 + 8 + 2 * (8 + 8))  # 1-SNOD group tree (2 keys, 1 child)
    snod_addr = alloc(8 + 2 * 40)
    heap_data = bytearray(b"\x00" * 8)
    name_offs = {}
    for nm in ("time", var):
        name_offs[nm] = len(heap_data)
        heap_data.extend(nm.encode() + b"\x00")
        heap_data.extend(b"\x00" * (-len(heap_data) % 8))
    heap_addr = alloc(32 + len(heap_data))

    # time dataset: contiguous
    time_data_addr_ph = [0]
    time_msgs_f = lambda addr: [
        _msg(0x01, _ds_msg((T,))),
        _msg(0x03, _dt_msg(np.dtype("<f8"))),
        _msg(0x0C, _attr_msg("units", time_units)),
    ] + ([_msg(0x0C, _attr_msg("calendar", calendar))] if calendar else []) + [
        _msg(0x08, bytes([3, 1]) + struct.pack("<QQ", addr, T * 8)),
    ]
    time_oh_addr = alloc(len(_object_header(time_msgs_f(0))))

    # main variable
    var_attr_msgs = []
    if fill is not None:
        var_attr_msgs.append(_msg(0x0C, _attr_msg("_FillValue", [fill])))
    if scale is not None:
        var_attr_msgs.append(_msg(0x0C, _attr_msg("scale_factor", [scale])))
    if offset is not None:
        var_attr_msgs.append(_msg(0x0C, _attr_msg("add_offset", [offset])))

    if chunks is None:
        var_msgs_f = lambda a, bt: [
            _msg(0x01, _ds_msg((T, NY, NX))),
            _msg(0x03, _dt_msg(np.dtype("<f4"))),
            *var_attr_msgs,
            _msg(0x08, bytes([3, 1]) + struct.pack("<QQ", a, data.nbytes)),
        ]
    else:
        filt_bodies = []
        if shuffle:
            filt_bodies.append(struct.pack("<HHHHI", H5_SHUFFLE, 0, 0, 1, 4) + b"\x00" * 4)
        if compress:
            filt_bodies.append(struct.pack("<HHHHI", H5_DEFLATE, 0, 0, 1, 4) + b"\x00" * 4)
        filt_msg = (
            [_msg(0x0B, bytes([1, len(filt_bodies), 0, 0, 0, 0, 0, 0]) + b"".join(filt_bodies))]
            if filt_bodies
            else []
        )
        var_msgs_f = lambda a, bt: [
            _msg(0x01, _ds_msg((T, NY, NX))),
            _msg(0x03, _dt_msg(np.dtype("<f4"))),
            *var_attr_msgs,
            *filt_msg,
            _msg(
                0x08,
                bytes([3, 2, 4])
                + struct.pack("<Q", bt)
                + struct.pack("<IIII", chunks[0], chunks[1], chunks[2], 4),
            ),
        ]
    var_oh_addr = alloc(len(_object_header(var_msgs_f(0, 0))))

    time_data_addr = alloc(T * 8)
    if chunks is None:
        var_data_addr = alloc(data.nbytes)
        chunk_btree_addr = _UNDEF
        chunk_addrs = []
    else:
        var_data_addr = None
        chunk_addrs = [alloc(len(raw)) for _, raw in chunks_blob]
        nent = len(chunks_blob)
        key_size = 8 + 8 * 4  # size+mask + 4 offsets (rank+1)
        chunk_btree_addr = alloc(24 + (nent + 1) * key_size + nent * 8)
        if nent > 1024:
            raise ValueError(
                "writer emits a single-level chunk B-tree; use larger chunks"
            )

    eof = cursor[0]

    # ---- emit ------------------------------------------------------------
    out = bytearray(eof)

    def put(addr: int, blob: bytes):
        out[addr : addr + len(blob)] = blob

    sb = (
        _SIG
        + bytes([0, 0, 0, 0, 0, 8, 8, 0])
        + struct.pack("<HHI", 4, 16, 0)
        + struct.pack("<QQQQ", 0, _UNDEF, eof, _UNDEF)
    )
    root_entry = struct.pack("<QQII", 0, root_oh_addr, 1, 0) + struct.pack(
        "<QQ", btree_addr, heap_addr
    )
    put(0, sb + root_entry)
    put(root_oh_addr, _object_header([_msg(0x11, struct.pack("<QQ", btree_addr, heap_addr))]))
    # group B-tree: one leaf entry -> SNOD
    gb = (
        b"TREE"
        + bytes([0, 0])
        + struct.pack("<H", 1)
        + struct.pack("<QQ", _UNDEF, _UNDEF)
        + struct.pack("<Q", 0)          # key 0
        + struct.pack("<Q", snod_addr)  # child
        + struct.pack("<Q", name_offs[max(name_offs, key=lambda k: k)])  # key 1
    )
    put(btree_addr, gb)
    entries = b""
    for nm in sorted(name_offs):  # SNOD entries sorted by link name
        oh = time_oh_addr if nm == "time" else var_oh_addr
        entries += struct.pack("<QQII", name_offs[nm], oh, 0, 0) + b"\x00" * 16
    put(snod_addr, b"SNOD" + bytes([1, 0]) + struct.pack("<H", len(name_offs)) + entries)
    put(
        heap_addr,
        b"HEAP"
        + bytes([0, 0, 0, 0])
        + struct.pack("<QQQ", len(heap_data), len(heap_data), heap_addr + 32)
        + bytes(heap_data),
    )
    put(time_oh_addr, _object_header(time_msgs_f(time_data_addr)))
    put(time_data_addr, tvals.tobytes())
    if chunks is None:
        put(var_oh_addr, _object_header(var_msgs_f(var_data_addr, 0)))
        put(var_data_addr, data.tobytes())
    else:
        put(var_oh_addr, _object_header(var_msgs_f(0, chunk_btree_addr)))
        for addr, (_, raw) in zip(chunk_addrs, chunks_blob):
            put(addr, raw)
        bt = bytearray()
        bt += b"TREE" + bytes([1, 0]) + struct.pack("<H", len(chunks_blob))
        bt += struct.pack("<QQ", _UNDEF, _UNDEF)
        for (offs, raw), addr in zip(chunks_blob, chunk_addrs):
            bt += struct.pack("<IIQQQQ", len(raw), 0, offs[0], offs[1], offs[2], 0)
            bt += struct.pack("<Q", addr)
        bt += struct.pack("<IIQQQQ", 0, 0, T, NY, NX, 0)  # +inf sentinel key
        put(chunk_btree_addr, bytes(bt))

    with open(path, "wb") as f:
        f.write(bytes(out))
