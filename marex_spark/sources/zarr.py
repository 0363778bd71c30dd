"""Zarr gridded ingestion — v2 (.zarray) and v3 (zarr.json) stores —
(reference helper.py:733-736 native input, track.py:1258-1262).

Spark-first: the driver reads only the tiny store metadata; the chunk
grid becomes a DataFrame of chunk keys and executors decode their own
chunk files in parallel via mapInPandas — no driver-side array
materialisation, so a 100 TB store ingests as wide as the cluster.

Codecs: stdlib zlib/gzip/raw built in; blosc via the pure-Python
frame decoder (sources/blosc.py), raw zstd via pyarrow's bundled
codec; anything else routes through numcodecs when installed, else raises a typed
DependencyError.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pandas as pd


# zarr-v3 core data types → numpy struct strings (v3 spec: names are
# endian-free; the "bytes" codec fixes the byte order, little here)
_V3_DTYPES = {
    "bool": "|b1",
    "int8": "|i1", "int16": "<i2", "int32": "<i4", "int64": "<i8",
    "uint8": "|u1", "uint16": "<u2", "uint32": "<u4", "uint64": "<u8",
    "float32": "<f4", "float64": "<f8",
}


def _parse_v3_codecs(codecs: list, allow_shard: bool = False):
    """Map a zarr-v3 codec chain onto (compressor-dict, shard-dict,
    transpose-order).

    bytes/gzip/zlib/blosc/zstd map onto the existing v2 decoders;
    ``transpose`` (v3 spec: permute axes BEFORE the bytes codec) is
    recorded as the permutation and inverted at decode;
    ``sharding_indexed`` (the default layout zarr-python 3 writes for
    large arrays) is parsed into a shard descriptor consumed by
    :func:`_decode_shard` — its inner chain recurses through this same
    parser. Anything else (big-endian bytes, nested sharding, …)
    changes the byte layout, so refuse loudly rather than corrupt
    silently."""
    comp = None
    shard = None
    transpose = None
    for c in codecs:
        name = c.get("name")
        cfg = c.get("configuration") or {}
        if name == "bytes":
            if cfg.get("endian", "little") != "little":
                raise NotImplementedError(
                    "zarr v3 big-endian bytes codec is not supported"
                )
        elif name in ("gzip", "zlib"):
            comp = {"id": "zlib"}  # zlib.decompress(raw, 47) autodetects
        elif name == "blosc":
            comp = {"id": "blosc"}
        elif name == "zstd":
            comp = {"id": "zstd"}  # pyarrow bundled codec
        elif name == "transpose":
            order = list(cfg.get("order") or [])
            if sorted(order) != list(range(len(order))):
                raise NotImplementedError(
                    f"zarr v3 transpose order {order!r} is not a "
                    "permutation"
                )
            transpose = order
        elif name == "sharding_indexed" and allow_shard:
            inner_comp, _, inner_tr = _parse_v3_codecs(
                cfg.get("codecs") or []
            )
            index_codecs = cfg.get("index_codecs") or []
            for ic in index_codecs:
                if ic.get("name") not in ("bytes", "crc32c"):
                    raise NotImplementedError(
                        f"zarr v3 shard index codec {ic.get('name')!r} "
                        "is not implemented in the stdlib reader"
                    )
            shard = {
                "inner": list(cfg["chunk_shape"]),
                "comp": inner_comp,
                "transpose": inner_tr,
                "loc": cfg.get("index_location", "end"),
                "crc": any(
                    ic.get("name") == "crc32c" for ic in index_codecs
                ),
            }
        else:
            # crc32c / nested sharding / … change the byte layout —
            # decoding around them would corrupt silently
            raise NotImplementedError(
                f"zarr v3 codec {name!r} is not implemented in the "
                "stdlib reader"
            )
    return comp, shard, transpose


_SHARD_MISSING = (1 << 64) - 1  # v3 spec: all-ones offset/len = absent chunk


def _decode_shard(raw: bytes, meta: dict, shard: dict) -> np.ndarray:
    """Decode one ``sharding_indexed`` shard file into the full outer
    chunk (v3 sharding spec): the trailing (or leading) index holds
    little-endian (offset, nbytes) uint64 pairs, one per inner chunk in
    C order over the intra-shard grid; absent inner chunks read as the
    fill value. The optional crc32c on the index only appends 4 bytes —
    layout-neutral, so it is skipped rather than verified (no stdlib
    crc32c)."""
    outer = meta["chunks"]
    inner = shard["inner"]
    grid = [-(-o // i) for o, i in zip(outer, inner)]
    n = 1
    for g in grid:
        n *= int(g)
    idx_nbytes = n * 16 + (4 if shard["crc"] else 0)
    if len(raw) < idx_nbytes:
        from marex_spark.exceptions import CoordinateError

        raise CoordinateError(
            "zarr shard smaller than its own index",
            details={"nbytes": len(raw), "index_nbytes": idx_nbytes},
        )
    idx = raw[-idx_nbytes:] if shard["loc"] == "end" else raw[:idx_nbytes]
    pairs = np.frombuffer(idx[: n * 16], dtype="<u8").reshape(n, 2)
    dtype = np.dtype(meta["dtype"])
    fill = meta.get("fill_value")
    out = np.full(outer, 0 if fill is None else fill, dtype=dtype)
    inner_meta = {
        "dtype": meta["dtype"],
        "chunks": inner,
        "order": "C",
        "compressor": shard["comp"],
        "filters": None,
        "_transpose": shard.get("transpose"),
    }
    for k in range(n):
        off, ln = int(pairs[k, 0]), int(pairs[k, 1])
        if off == _SHARD_MISSING:
            continue
        sub = _decode_chunk(raw[off : off + ln], inner_meta)
        pos = np.unravel_index(k, grid)
        sel = tuple(
            slice(p * i, min((p + 1) * i, o))
            for p, i, o in zip(pos, inner, outer)
        )
        out[sel] = sub[tuple(slice(0, s.stop - s.start) for s in sel)]
    return out


def _read_meta(array_dir: str) -> dict:
    """Array metadata, normalised to the v2 shape the decode path
    consumes. Reads `.zarray` (zarr v2) or `zarr.json` (zarr v3 — the
    default format of zarr-python 3.x, which xarray/the reference's
    ecosystem now writes); v3 codecs bytes/gzip/zlib/blosc map onto the
    existing decoders, ``sharding_indexed`` decodes through
    :func:`_decode_shard`, zstd decodes via pyarrow; anything else
    (transpose, exotic codecs) refuses loudly."""
    p2 = os.path.join(array_dir, ".zarray")
    if os.path.exists(p2):
        with open(p2) as f:
            meta = json.load(f)
        meta["_sep"] = meta.get("dimension_separator", ".")
        meta["_prefix"] = ""
        return meta
    p3 = os.path.join(array_dir, "zarr.json")
    if not os.path.exists(p3):
        from marex_spark.exceptions import CoordinateError

        raise CoordinateError(
            "no zarr array metadata (.zarray / zarr.json) found",
            details={"array_dir": array_dir},
        )
    with open(p3) as f:
        m = json.load(f)
    if m.get("node_type") != "array":
        from marex_spark.exceptions import CoordinateError

        raise CoordinateError(
            f"zarr.json is not an array node (node_type="
            f"{m.get('node_type')!r})",
            details={"array_dir": array_dir},
        )
    comp, shard, transpose = _parse_v3_codecs(
        m.get("codecs") or [], allow_shard=True
    )
    dt = m["data_type"]
    cke = m.get("chunk_key_encoding") or {"name": "default"}
    kind = cke.get("name", "default")
    sep = (cke.get("configuration") or {}).get(
        "separator", "/" if kind == "default" else "."
    )
    return {
        "zarr_format": 3,
        "shape": m["shape"],
        "chunks": m["chunk_grid"]["configuration"]["chunk_shape"],
        "dtype": _V3_DTYPES.get(dt, dt),
        "order": "C",
        "compressor": comp,
        "filters": None,
        "fill_value": m.get("fill_value"),
        "_sep": sep,
        "_prefix": "c" if kind == "default" else "",
        "_shard": shard,
        "_transpose": transpose,
    }


def _chunk_path(array_dir: str, meta: dict, idx) -> str:
    """Chunk file path for grid index ``idx`` under either format's key
    encoding (v2: '0.1.2' with the store separator; v3 default:
    'c/0/1/2')."""
    parts = [str(i) for i in idx]
    sep = meta.get("_sep", ".")
    if meta.get("_prefix"):
        key = sep.join([meta["_prefix"], *parts])
    else:
        key = sep.join(parts) if parts else "0"
    return os.path.join(array_dir, key)


def _filter_decode(buf: bytes, f: dict) -> bytes:
    """Decode ONE zarr-v2 filter stage (the numcodecs array-to-array
    codecs real climate stores actually use as ``filters``). Each
    implementation replays the published numcodecs decode formula
    exactly — these are simple, fully-specified numpy transforms
    (numcodecs docs: Delta, FixedScaleOffset, Quantize, Shuffle,
    AsType, PackBits), so no numcodecs install is needed:

    - ``delta``: cumulative sum of the stored diffs in the target
      dtype (``np.cumsum(enc.view(astype), dtype=dtype)``).
    - ``fixedscaleoffset``: ``enc / scale + offset`` cast to dtype.
    - ``quantize``: lossy on encode only; decode is a dtype cast.
    - ``shuffle``: byte-lane transpose (same layout as blosc's
      byte shuffle, with ``elementsize`` as the lane width).
    - ``astype``: cast from encode_dtype back to decode_dtype.
    - ``packbits``: header byte = padded-bit count, then
      ``np.unpackbits`` (bool arrays).
    - ``zlib``/``gzip``: stdlib decompress (any compressor is legal
      in a v2 filter slot).
    """
    fid = f.get("id")
    if fid == "delta":
        dtype = np.dtype(f["dtype"])
        astype = np.dtype(f.get("astype") or f["dtype"])
        enc = np.frombuffer(buf, dtype=astype)
        return np.cumsum(enc, dtype=dtype).tobytes()
    if fid == "fixedscaleoffset":
        dtype = np.dtype(f["dtype"])
        astype = np.dtype(f.get("astype") or f["dtype"])
        enc = np.frombuffer(buf, dtype=astype)
        dec = enc / f["scale"] + f["offset"]
        return dec.astype(dtype, copy=False).tobytes()
    if fid == "quantize":
        dtype = np.dtype(f["dtype"])
        astype = np.dtype(f.get("astype") or f["dtype"])
        enc = np.frombuffer(buf, dtype=astype)
        return enc.astype(dtype, copy=False).tobytes()
    if fid == "shuffle":
        es = int(f.get("elementsize", 4))
        if es <= 1:
            return buf
        n = len(buf) // es
        return (
            np.frombuffer(buf[: n * es], dtype=np.uint8)
            .reshape(es, n)
            .T.tobytes()
            + buf[n * es :]
        )
    if fid == "astype":
        enc = np.frombuffer(buf, dtype=np.dtype(f["encode_dtype"]))
        return enc.astype(np.dtype(f["decode_dtype"]), copy=False).tobytes()
    if fid == "packbits":
        enc = np.frombuffer(buf, dtype=np.uint8)
        n_padded = int(enc[0])
        dec = np.unpackbits(enc[1:])
        if n_padded:
            dec = dec[:-n_padded]
        return dec.astype(bool).tobytes()
    if fid in ("zlib", "gzip"):
        return zlib.decompress(buf, 47)
    # anything else (lossless codecs we can't replay byte-exactly)
    # changes the byte layout — decoding around it would silently
    # corrupt every value, so refuse loudly with ONE error type and
    # an actually-actionable suggestion (ADVICE r2: the old path
    # suggested installing numcodecs, then raised anyway when it
    # was present — the error type depended on an irrelevant import)
    raise NotImplementedError(
        f"zarr v2 filter {fid!r} is not implemented in the stdlib "
        "reader (delta/fixedscaleoffset/quantize/shuffle/astype/"
        "packbits/zlib supported); re-write the store without it"
    )


def _decode_chunk(raw: bytes, meta: dict) -> np.ndarray:
    if meta.get("_shard"):
        return _decode_shard(raw, meta, meta["_shard"])
    comp = meta.get("compressor")
    if comp is None:
        buf = raw
    elif comp.get("id") in ("zlib", "gzip"):
        buf = zlib.decompress(raw, 47)  # auto-detect zlib/gzip headers
    elif comp.get("id") == "blosc":
        # zarr/xarray's DEFAULT compressor — pure-Python frame decoder
        # (sources/blosc.py; inner codecs blosclz/lz4 native, zlib via
        # stdlib, zstd/snappy via pyarrow) so real marEx stores read
        # without numcodecs
        from marex_spark.sources.blosc import blosc_decompress

        try:
            buf = blosc_decompress(raw)
        except NotImplementedError as nie:
            # variants the frame decoder refuses (bit-shuffle, exotic
            # inner codecs): route through numcodecs' real blosc when
            # installed, typed DependencyError otherwise — mirroring
            # the generic-codec branch below
            try:
                import numcodecs

                buf = numcodecs.get_codec(comp).decode(raw)
            except ImportError:
                from marex_spark.exceptions import DependencyError

                raise DependencyError(
                    f"blosc variant not decodable without numcodecs: {nie}",
                    suggestions=[
                        "pip install numcodecs",
                        "re-write the store with blosc(cname='lz4'|'zstd', shuffle=1)",
                    ],
                ) from nie
    elif comp.get("id") == "zstd":
        # raw zstd frames (zarr v3's common default codec; also the
        # v2 numcodecs Zstd id) via pyarrow's bundled codec — exact
        # decompressed size is known from the chunk geometry
        import pyarrow as pa

        n = int(np.prod(meta["chunks"])) * np.dtype(meta["dtype"]).itemsize
        buf = pa.Codec("zstd").decompress(raw, decompressed_size=n).to_pybytes()
    else:
        try:  # real codec stack, if installed
            import numcodecs

            buf = numcodecs.get_codec(comp).decode(raw)
        except ImportError as e:
            from marex_spark.exceptions import DependencyError

            raise DependencyError(
                f"zarr compressor '{comp.get('id')}' needs numcodecs",
                suggestions=["pip install zarr numcodecs", "re-write store with zlib"],
            ) from e
    # v2 filter chains apply AFTER decompression, in reverse
    # registration order (zarr v2 spec: encode runs filters first,
    # then the compressor)
    for f in reversed(meta.get("filters") or []):
        buf = _filter_decode(buf, f)
    a = np.frombuffer(buf, dtype=np.dtype(meta["dtype"]))
    order = meta.get("order", "C")
    tr = meta.get("_transpose")
    if tr:
        # v3 transpose codec: the serialized buffer is the PERMUTED
        # chunk in C order — reshape to the permuted shape, then
        # invert the permutation back to the logical chunk shape
        perm_shape = [meta["chunks"][i] for i in tr]
        a = a.reshape(perm_shape, order=order)
        return np.ascontiguousarray(a.transpose(np.argsort(tr)))
    return a.reshape(meta["chunks"], order=order)


def _read_small_array(array_dir: str) -> np.ndarray:
    """Driver-side read of a small 1-D coordinate array (e.g. time)."""
    meta = _read_meta(array_dir)
    (n,) = meta["shape"]
    (cs,) = meta["chunks"]
    out = np.empty(n, dtype=np.dtype(meta["dtype"]))
    for c in range((n + cs - 1) // cs):
        with open(_chunk_path(array_dir, meta, (c,)), "rb") as f:
            chunk = _decode_chunk(f.read(), meta)
        out[c * cs : min((c + 1) * cs, n)] = chunk[: min(cs, n - c * cs)]
    return out


def read_array_driver(array_dir: str) -> np.ndarray:
    """Driver-side assembly of a METADATA-SIZED n-D zarr array (mesh
    geometry, adjacency tables, coordinate bounds — things the driver
    broadcasts anyway). Not for data arrays: those go through the
    distributed ingest paths."""
    meta = _read_meta(array_dir)
    shape = meta["shape"]
    chunks = meta["chunks"]
    fill = meta.get("fill_value")
    fv = float(fill) if isinstance(fill, str) else fill
    dt = np.dtype(meta["dtype"])
    if fv is not None and (
        dt.kind == "f" or (np.isfinite(fv) and float(fv) == int(fv))
    ):
        # integer arrays honour the fill too (e.g. a neighbours table
        # padded with -1 and written with write_empty_chunks=False —
        # zero-filling would fabricate VALID cell index 0)
        out = np.full(shape, dt.type(fv), dtype=dt)
    else:
        out = np.zeros(shape, dtype=dt)
    grid = [range((s + c - 1) // c) for s, c in zip(shape, chunks)]
    import itertools

    for idx in itertools.product(*grid):
        path = _chunk_path(array_dir, meta, idx)
        if not os.path.exists(path):
            continue
        with open(path, "rb") as f:
            a = _decode_chunk(f.read(), meta)
        sl = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunks, shape)
        )
        out[sl] = a[tuple(slice(0, s.stop - s.start) for s in sl)]
    return out


def ingest_zarr_gridded(
    spark,
    store: str,
    var: str,
    time_array: str = "time",
    time_units: str = "days",
    time_base: str = "1970-01-01",
    layout: str = "packed",
    calendar: str = "",
    time_min=None,
    time_max=None,
):
    """3-D (time, y, x) zarr array → Spark DataFrame in the requested
    layout. Distributed: one task per zarr chunk file.

    ``time_min``/``time_max`` (inclusive; timestamps or parseable
    strings) prune whole CHUNKS on the driver before any task launches
    — the partition-pruning analogue for the append cycle: a daily
    `extend_track_run` re-reads only the time-chunks carrying new
    slices, not the archive. Residual per-row trimming inside boundary
    chunks is an ordinary Catalyst filter."""
    from pyspark.sql import functions as F

    array_dir = os.path.join(store, var)
    meta = _read_meta(array_dir)
    if len(meta["shape"]) != 3:
        from marex_spark.exceptions import CoordinateError

        raise CoordinateError(
            "expected a 3-D (time, y, x) array",
            details={"shape": meta["shape"], "var": var},
        )
    T, NY, NX = meta["shape"]
    ct, cy, cx = meta["chunks"]
    fill = meta.get("fill_value")

    # timestamps: small driver-side coordinate read (optional)
    tdir = os.path.join(store, time_array)
    if os.path.isdir(tdir) and (
        os.path.exists(os.path.join(tdir, ".zarray"))
        or os.path.exists(os.path.join(tdir, "zarr.json"))
    ):
        tvals = _read_small_array(tdir).astype(np.int64)
    else:
        tvals = np.arange(T, dtype=np.int64)
    # if the time array carries CF attrs (v2 .zattrs, or the v3
    # zarr.json "attributes" object), they win over the keyword
    # defaults; fixed-length model calendars decode by (year, doy)
    # arithmetic (see netcdf._decode_time_units)
    units_str = f"{time_units} since {time_base}"
    atts = {}
    zattrs_path = os.path.join(tdir, ".zattrs")
    if os.path.exists(zattrs_path):
        try:
            atts = json.loads(open(zattrs_path).read())
        except (OSError, ValueError):
            atts = {}
    elif os.path.exists(os.path.join(tdir, "zarr.json")):
        try:
            atts = json.loads(
                open(os.path.join(tdir, "zarr.json")).read()
            ).get("attributes", {})
        except (OSError, ValueError):
            atts = {}
    units_str = atts.get("units", units_str)
    calendar = calendar or atts.get("calendar", "")
    from marex_spark.sources.netcdf import _decode_time_units

    times = _decode_time_units(units_str, tvals, calendar)

    # driver-side time-chunk pruning: only t-chunk indices whose slice
    # range intersects [time_min, time_max] become tasks
    it_lo, it_hi = 0, (T + ct - 1) // ct
    tmin_ts = pd.Timestamp(time_min) if time_min is not None else None
    tmax_ts = pd.Timestamp(time_max) if time_max is not None else None
    if tmin_ts is not None or tmax_ts is not None:
        tarr = pd.DatetimeIndex([pd.Timestamp(t) for t in times])
        keep = np.ones(len(tarr), dtype=bool)
        if tmin_ts is not None:
            keep &= tarr >= tmin_ts
        if tmax_ts is not None:
            keep &= tarr <= tmax_ts
        idx = np.nonzero(keep)[0]
        if len(idx) == 0:
            it_lo = it_hi = 0  # empty selection → zero tasks
        else:
            it_lo, it_hi = int(idx[0]) // ct, int(idx[-1]) // ct + 1

    keys = [
        (it, iy, ix)
        for it in range(it_lo, it_hi)
        for iy in range((NY + cy - 1) // cy)
        for ix in range((NX + cx - 1) // cx)
    ]
    if not keys:
        empty = spark.createDataFrame(
            [], "time timestamp, y int, x int, value float"
        )
        if layout == "long":
            return empty
        from marex_spark.operators.detect_blocked import pack_gridded

        return pack_gridded(empty, nx=NX)
    times_list = [pd.Timestamp(t) for t in times]

    def _emit_block(a: np.ndarray, t0: int, y0: int, x0: int):
        """Dense block at global origin (t0, y0, x0) → long rows,
        trimmed to the array bounds, fill → NaN (dropped downstream)."""
        # zarr-v2 JSON encodes non-finite fills as the strings
        # "NaN"/"Infinity"/"-Infinity" — decode before comparing,
        # else the float==str comparison is a silent no-op
        fv = float(fill) if isinstance(fill, str) else fill
        if fv is not None and not np.isnan(fv):
            a = np.where(a == fv, np.nan, a)
        nt = min(a.shape[0], T - t0)
        nyc = min(a.shape[1], NY - y0)
        nxc = min(a.shape[2], NX - x0)
        if nt <= 0 or nyc <= 0 or nxc <= 0:
            return None
        a = a[:nt, :nyc, :nxc]
        tt, yy2, xx2 = np.meshgrid(
            np.arange(nt), np.arange(nyc), np.arange(nxc), indexing="ij"
        )
        return pd.DataFrame(
            {
                "time": [times_list[t0 + k] for k in tt.ravel()],
                "y": (yy2.ravel() + y0).astype(np.int32),
                "x": (xx2.ravel() + x0).astype(np.int32),
                "value": a.ravel().astype(np.float32),
            }
        )

    shard = meta.get("_shard")
    if shard:
        # Sharded store: parallelise INSIDE each shard file. The shard
        # index enables byte-range reads, so each task seeks to the
        # index, then fetches only its own inner chunks' byte ranges —
        # a 100 TB store with multi-GB shards never makes one task
        # decode (or even read) a whole shard. Split each shard's inner
        # chunks into bands sized to the session's parallelism.
        ic = shard["inner"]
        igrid = [-(-c // i) for c, i in zip(meta["chunks"], ic)]
        n_inner = 1
        for g in igrid:
            n_inner *= int(g)
        want = spark.sparkContext.defaultParallelism * 4
        n_bands = max(1, min(n_inner, -(-want // max(1, len(keys)))))
        band = -(-n_inner // n_bands)
        keys4 = [
            (it, iy, ix, lo, min(lo + band, n_inner))
            for (it, iy, ix) in keys
            for lo in range(0, n_inner, band)
        ]
        keys_df = spark.createDataFrame(
            keys4, "it int, iy int, ix int, k_lo int, k_hi int"
        ).repartition(min(len(keys4), want))
        inner_meta = {
            "dtype": meta["dtype"],
            "chunks": ic,
            "order": "C",
            "compressor": shard["comp"],
            "filters": None,
            "_transpose": shard.get("transpose"),
        }
        idx_nbytes = n_inner * 16 + (4 if shard["crc"] else 0)

        def _decode(batches):
            for b in batches:
                for it, iy, ix, k_lo, k_hi in zip(
                    b["it"], b["iy"], b["ix"], b["k_lo"], b["k_hi"]
                ):
                    path = _chunk_path(array_dir, meta, (it, iy, ix))
                    if not os.path.exists(path):
                        continue  # missing shard = all fill_value
                    with open(path, "rb") as f:
                        if shard["loc"] == "end":
                            f.seek(-idx_nbytes, 2)
                            idx = f.read(idx_nbytes)
                        else:
                            idx = f.read(idx_nbytes)
                        pairs = np.frombuffer(
                            idx[: n_inner * 16], dtype="<u8"
                        ).reshape(n_inner, 2)
                        for k in range(int(k_lo), int(k_hi)):
                            off, ln = int(pairs[k, 0]), int(pairs[k, 1])
                            if off == _SHARD_MISSING:
                                continue
                            f.seek(off)
                            a = _decode_chunk(
                                f.read(ln), inner_meta
                            ).astype(np.float64)
                            pos = np.unravel_index(k, igrid)
                            out = _emit_block(
                                a,
                                it * ct + int(pos[0]) * ic[0],
                                iy * cy + int(pos[1]) * ic[1],
                                ix * cx + int(pos[2]) * ic[2],
                            )
                            if out is not None:
                                yield out

    else:
        keys_df = spark.createDataFrame(
            keys, "it int, iy int, ix int"
        ).repartition(
            min(len(keys), spark.sparkContext.defaultParallelism * 4)
        )

        def _decode(batches):
            for b in batches:
                for it, iy, ix in zip(b["it"], b["iy"], b["ix"]):
                    path = _chunk_path(array_dir, meta, (it, iy, ix))
                    if not os.path.exists(path):
                        continue  # missing chunk = all fill_value
                    with open(path, "rb") as f:
                        a = _decode_chunk(f.read(), meta).astype(np.float64)
                    out = _emit_block(a, it * ct, iy * cy, ix * cx)
                    if out is not None:
                        yield out

    long_df = keys_df.mapInPandas(
        _decode, schema="time timestamp, y int, x int, value float"
    ).filter(F.col("value").isNotNull() & ~F.isnan("value"))
    # (NaN written from pandas arrives as NULL through Arrow, and Spark's
    # isnan(NULL) is false — both forms must be dropped)
    if tmin_ts is not None:
        long_df = long_df.filter(F.col("time") >= F.lit(tmin_ts))
    if tmax_ts is not None:
        long_df = long_df.filter(F.col("time") <= F.lit(tmax_ts))
    if layout == "long":
        return long_df
    from marex_spark.operators.detect_blocked import pack_gridded

    return pack_gridded(long_df, nx=NX)


# --------------------------------------------------------------- zarr WRITE

def _encode_chunk(
    a: np.ndarray, compressor: dict | None, zarr_format: int = 2
) -> bytes:
    raw = np.ascontiguousarray(a).tobytes()
    if compressor is None:
        return raw
    if compressor.get("id") in ("zlib", "gzip"):
        if zarr_format == 3:
            # the v3 "gzip" codec is RFC-1952 gzip framing (what
            # zarr-python's GzipCodec emits), not raw zlib
            import gzip

            return gzip.compress(raw, compressor.get("level", 1))
        return zlib.compress(raw, compressor.get("level", 1))
    if compressor.get("id") == "zstd":
        # standard zstd frames via pyarrow's bundled codec — readable
        # by numcodecs Zstd (v2) and zarr-python's ZstdCodec (v3)
        import pyarrow as pa

        codec = pa.Codec("zstd", compression_level=compressor.get("level", 1))
        return codec.compress(raw).to_pybytes()
    from marex_spark.exceptions import ConfigurationError

    raise ConfigurationError(
        f"unsupported zarr write compressor {compressor.get('id')!r}",
        suggestions=[
            "use compressor={'id': 'zlib', 'level': 1}, "
            "{'id': 'zstd', 'level': 3}, or None"
        ],
    )


def _v3_dtype_name(np_dtype: np.dtype) -> str:
    """numpy dtype → zarr-v3 core data type name."""
    inv = {v.lstrip("|<"): k for k, v in _V3_DTYPES.items()}
    key = np_dtype.str.lstrip("|<")
    if np_dtype.str.startswith(">") or key not in inv:
        from marex_spark.exceptions import ConfigurationError

        raise ConfigurationError(
            f"dtype {np_dtype.str!r} has no zarr-v3 core data type",
            suggestions=["use a little-endian integer or float dtype"],
        )
    return inv[key]


def _v3_fill_json(fill_value, np_dtype: np.dtype):
    """v3 JSON encoding of a fill value (non-finite floats spell as
    strings per the spec)."""
    if np_dtype.kind == "f":
        f = float(fill_value)
        if np.isnan(f):
            return "NaN"
        if np.isinf(f):
            return "Infinity" if f > 0 else "-Infinity"
        return f
    return int(fill_value)


def _v3_array_meta(
    shape, chunk_shape, np_dtype, fill_value, compressor, dims, attrs=None,
    shard_shape=None,
) -> dict:
    codecs = [{"name": "bytes", "configuration": {"endian": "little"}}]
    if compressor is not None:
        if compressor.get("id") == "zstd":
            codecs.append(
                {
                    "name": "zstd",
                    "configuration": {
                        "level": compressor.get("level", 1),
                        "checksum": False,
                    },
                }
            )
        else:
            codecs.append(
                {
                    "name": "gzip",
                    "configuration": {"level": compressor.get("level", 1)},
                }
            )
    if shard_shape is not None:
        # sharding_indexed: the chunk grid is the SHARD grid; the given
        # chunk_shape becomes the inner chunk shape. Index = raw
        # little-endian (offset, nbytes) pairs at the shard end (the
        # index_codecs chain declares no checksum — stdlib has no
        # crc32c; zarr-python honours the declared chain on read).
        codecs = [{
            "name": "sharding_indexed",
            "configuration": {
                "chunk_shape": list(chunk_shape),
                "codecs": codecs,
                "index_codecs": [
                    {"name": "bytes", "configuration": {"endian": "little"}}
                ],
                "index_location": "end",
            },
        }]
        chunk_shape = shard_shape
    return {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(shape),
        "data_type": _v3_dtype_name(np_dtype),
        "chunk_grid": {
            "name": "regular",
            "configuration": {"chunk_shape": list(chunk_shape)},
        },
        "chunk_key_encoding": {
            "name": "default",
            "configuration": {"separator": "/"},
        },
        "fill_value": _v3_fill_json(fill_value, np_dtype),
        "codecs": codecs,
        "dimension_names": list(dims),
        "attributes": dict(attrs or {}),
    }


def _write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _write_small_array(
    array_dir: str,
    a: np.ndarray,
    dims: list[str],
    attrs: dict | None = None,
    compressor: dict | None = None,
    zarr_format: int = 2,
) -> None:
    """Driver-side write of a small coordinate array as ONE chunk."""
    os.makedirs(array_dir, exist_ok=True)
    a = np.ascontiguousarray(a)
    if zarr_format == 3:
        _write_json(
            os.path.join(array_dir, "zarr.json"),
            _v3_array_meta(
                a.shape, a.shape or (1,), a.dtype,
                0 if a.dtype.kind != "f" else float("nan"),
                compressor, dims, attrs,
            ),
        )
        key = os.path.join("c", *(["0"] * max(1, a.ndim)))
        os.makedirs(os.path.dirname(os.path.join(array_dir, key)), exist_ok=True)
    else:
        meta = {
            "zarr_format": 2,
            "shape": list(a.shape),
            "chunks": list(a.shape) or [1],
            "dtype": a.dtype.str,
            "compressor": compressor,
            "fill_value": None,
            "order": "C",
            "filters": None,
            "dimension_separator": ".",
        }
        _write_json(os.path.join(array_dir, ".zarray"), meta)
        _write_json(
            os.path.join(array_dir, ".zattrs"),
            {"_ARRAY_DIMENSIONS": dims, **(attrs or {})},
        )
        key = ".".join(["0"] * max(1, a.ndim))
    tmp = os.path.join(array_dir, key + ".tmp")
    with open(tmp, "wb") as f:
        f.write(_encode_chunk(a, compressor, zarr_format))
    os.replace(tmp, os.path.join(array_dir, key))


def write_zarr_gridded(
    df,
    store: str,
    var: str = "value",
    value_col: str = "value",
    ny: int | None = None,
    nx: int | None = None,
    chunks: tuple[int, int, int] = (64, 180, 360),
    compressor: dict | None = None,
    attrs: dict | None = None,
    write_empty_chunks: bool = False,
    dtype: str = "<f4",
    fill_value: float | int | None = None,
    zarr_format: int = 2,
    shard_shape: tuple[int, int, int] | None = None,
):
    """Long-format (time, y, x, value) DataFrame → a zarr store any
    zarr/xarray client can open (reference writes its detect/track
    output to zarr: helper.py:642-777, track.py:4323-4328; this is the
    symmetric sink to :func:`ingest_zarr_gridded`).

    ``zarr_format=3`` emits the v3 layout (``zarr.json`` metadata,
    ``c/t/y/x`` chunk keys, bytes+gzip codec chain) — what zarr-python
    3.x writes natively; 2 (default) stays bit-compatible with the
    v2 ecosystem. Both round-trip through :func:`ingest_zarr_gridded`.
    ``shard_shape`` (v3 only) switches to ``sharding_indexed``: one
    FILE per shard holding independently-gzipped inner ``chunks`` plus
    the u64 offset index — the layout that bounds object-store file
    counts at 100 TB (one task per shard; task memory is bounded by
    the shard's dense size, so pick shard_shape accordingly).

    Spark-first and driver-light: the driver writes only the tiny JSON
    metadata and the 1-D coordinate arrays; every DATA chunk file is
    assembled, compressed and written by the executor that owns that
    chunk's rows (``groupBy(chunk key).applyInPandas``) — exactly one
    task per chunk, atomic ``os.replace`` publishes, so a 100 TB write
    is as wide as the cluster and retry-safe. Absent cells become NaN
    (``fill_value``); with ``write_empty_chunks=False`` (xarray's
    steady-state default) all-NaN chunks write no file at all, which
    the reader round-trips as fill.

    Returns a small receipts DataFrame (one row per written chunk:
    ``it, iy, ix, n_values, n_bytes``) AFTER the write has executed.
    The time dimension is the sorted distinct timestamps of ``df``
    (days-since-epoch int64 with CF attrs, like the reference's CF
    time encoding); ``ny``/``nx`` default to ``max+1`` over the input.

    ``dtype`` selects the on-disk array type: ``"<f4"`` (default,
    ``fill_value`` NaN — anomaly/intensity fields) or an integer type
    like ``"<i4"`` (``fill_value`` 0 — the reference's event-ID field,
    track.py:4323-4328 writes `ID_field` as int zarr with background 0).
    """
    from pyspark.sql import functions as F

    if compressor is None:
        compressor = {"id": "zlib", "level": 1}
    elif compressor == {}:  # explicit "raw"
        compressor = None

    np_dtype = np.dtype(dtype)
    is_float = np_dtype.kind == "f"
    if fill_value is None:
        fill_value = float("nan") if is_float else 0
    spark_t = "float" if is_float else "long"

    sdf = df.select(
        F.col("time").cast("timestamp").alias("time"),
        F.col("y").cast("int").alias("y"),
        F.col("x").cast("int").alias("x"),
        F.col(value_col).cast(spark_t).alias("value"),
    )
    spark = sdf.sparkSession

    # -- dimensions (driver-side, bounded by #timesteps / grid extent)
    times = [
        r[0] for r in sdf.select("time").distinct().orderBy("time").collect()
    ]
    if not times:
        from marex_spark.exceptions import DataValidationError

        raise DataValidationError("write_zarr_gridded: empty input")
    if ny is None or nx is None:
        mx = sdf.agg(F.max("y"), F.max("x")).first()
        ny = ny if ny is not None else int(mx[0]) + 1
        nx = nx if nx is not None else int(mx[1]) + 1
    T = len(times)
    ct = min(chunks[0], T)
    cy = min(chunks[1], ny)
    cx = min(chunks[2], nx)
    shard = None
    if shard_shape is not None:
        # v3 sharding: SHARD shape must be a whole multiple of the
        # inner chunk shape (v3 sharding spec). At 100 TB scale this is
        # the layout that bounds object-store file counts: one file per
        # shard, many (independently compressed) inner chunks inside.
        if zarr_format != 3:
            from marex_spark.exceptions import ConfigurationError

            raise ConfigurationError(
                "shard_shape requires zarr_format=3",
                details={"zarr_format": zarr_format},
            )
        st = min(shard_shape[0], T)
        sy = min(shard_shape[1], ny)
        sx = min(shard_shape[2], nx)
        # clip inner chunks to the (possibly clipped) shard, then snap
        # the shard UP to a whole multiple of the inner chunk
        ct, cy, cx = min(ct, st), min(cy, sy), min(cx, sx)
        rt = -(-st // ct)
        ry = -(-sy // cy)
        rx = -(-sx // cx)
        st, sy, sx = rt * ct, ry * cy, rx * cx
        shard = {"dims": (st, sy, sx), "ratio": (rt, ry, rx)}

    # -- driver metadata: group, data array, coordinates
    if zarr_format not in (2, 3):
        from marex_spark.exceptions import ConfigurationError

        raise ConfigurationError(
            "zarr_format must be 2 or 3", details={"got": zarr_format}
        )
    v3 = zarr_format == 3
    array_dir = os.path.join(store, var)
    os.makedirs(array_dir, exist_ok=True)
    if v3:
        _write_json(
            os.path.join(store, "zarr.json"),
            {
                "zarr_format": 3,
                "node_type": "group",
                "attributes": dict(attrs or {}),
            },
        )
        _write_json(
            os.path.join(array_dir, "zarr.json"),
            _v3_array_meta(
                [T, ny, nx], [ct, cy, cx], np_dtype, fill_value,
                compressor, ["time", "y", "x"],
                shard_shape=list(shard["dims"]) if shard else None,
            ),
        )
    else:
        _write_json(os.path.join(store, ".zgroup"), {"zarr_format": 2})
        _write_json(os.path.join(store, ".zattrs"), dict(attrs or {}))
        _write_json(
            os.path.join(array_dir, ".zarray"),
            {
                "zarr_format": 2,
                "shape": [T, ny, nx],
                "chunks": [ct, cy, cx],
                "dtype": np_dtype.str,
                "compressor": compressor,
                # zarr-v2 JSON spells a float NaN fill as the string "NaN"
                "fill_value": "NaN"
                if (is_float and np.isnan(fill_value))
                else fill_value,
                "order": "C",
                "filters": None,
                "dimension_separator": ".",
            },
        )
        _write_json(
            os.path.join(array_dir, ".zattrs"),
            {"_ARRAY_DIMENSIONS": ["time", "y", "x"]},
        )
    epoch = pd.Timestamp("1970-01-01")
    tdays = np.asarray(
        [(pd.Timestamp(t) - epoch).days for t in times], dtype=np.int64
    )
    _write_small_array(
        os.path.join(store, "time"),
        tdays,
        ["time"],
        attrs={"units": "days since 1970-01-01", "calendar": "proleptic_gregorian"},
        zarr_format=zarr_format,
    )
    _write_small_array(
        os.path.join(store, "y"), np.arange(ny, dtype=np.int64), ["y"],
        zarr_format=zarr_format,
    )
    _write_small_array(
        os.path.join(store, "x"), np.arange(nx, dtype=np.int64), ["x"],
        zarr_format=zarr_format,
    )

    # -- distributed chunk writes: map each row to its chunk key JVM-side
    # via a broadcast time-index join, then one applyInPandas group per
    # chunk file.
    tindex = spark.createDataFrame(
        [(t, i) for i, t in enumerate(times)], "time timestamp, t_idx int"
    )
    gt, gy, gx = (shard["dims"] if shard else (ct, cy, cx))
    keyed = (
        sdf.join(F.broadcast(tindex), "time")
        .select(
            (F.col("t_idx") / gt).cast("int").alias("it"),
            (F.col("y") / gy).cast("int").alias("iy"),
            (F.col("x") / gx).cast("int").alias("ix"),
            (F.col("t_idx") % gt).alias("ot"),
            (F.col("y") % gy).alias("oy"),
            (F.col("x") % gx).alias("ox"),
            "value",
        )
    )

    def _write_chunk(key, pdf):
        it, iy, ix = int(key[0]), int(key[1]), int(key[2])
        a = np.full((ct, cy, cx), fill_value, dtype=np_dtype)
        vals = pdf["value"].to_numpy(dtype=np_dtype)
        a[
            pdf["ot"].to_numpy(dtype=np.int64),
            pdf["oy"].to_numpy(dtype=np.int64),
            pdf["ox"].to_numpy(dtype=np.int64),
        ] = vals
        n_finite = (
            int(np.isfinite(vals).sum()) if is_float else int(len(vals))
        )
        if n_finite == 0 and not write_empty_chunks:
            return pd.DataFrame(
                {"it": [it], "iy": [iy], "ix": [ix], "n_values": [0], "n_bytes": [0]}
            )
        payload = _encode_chunk(a, compressor, zarr_format)
        if v3:
            path = os.path.join(array_dir, "c", str(it), str(iy), str(ix))
            os.makedirs(os.path.dirname(path), exist_ok=True)
        else:
            path = os.path.join(array_dir, f"{it}.{iy}.{ix}")
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pd.DataFrame(
            {
                "it": [it],
                "iy": [iy],
                "ix": [ix],
                "n_values": [n_finite],
                "n_bytes": [len(payload)],
            }
        )

    def _write_shard(key, pdf):
        """One task per SHARD: scatter the shard's rows into a dense
        (st, sy, sx) block, encode each inner chunk independently
        (C-order over the intra-shard grid), append the (offset,
        nbytes) u64 index, publish atomically. Task memory is bounded
        by shard_shape — the knob that trades file count against task
        size at 100 TB."""
        it, iy, ix = int(key[0]), int(key[1]), int(key[2])
        st_, sy_, sx_ = shard["dims"]
        rt, ry, rx = shard["ratio"]
        a = np.full((st_, sy_, sx_), fill_value, dtype=np_dtype)
        vals = pdf["value"].to_numpy(dtype=np_dtype)
        a[
            pdf["ot"].to_numpy(dtype=np.int64),
            pdf["oy"].to_numpy(dtype=np.int64),
            pdf["ox"].to_numpy(dtype=np.int64),
        ] = vals
        n_finite = (
            int(np.isfinite(vals).sum()) if is_float else int(len(vals))
        )
        body = b""
        index = []
        wrote_any = False
        for kt in range(rt):
            for ky in range(ry):
                for kx in range(rx):
                    sub = a[
                        kt * ct:(kt + 1) * ct,
                        ky * cy:(ky + 1) * cy,
                        kx * cx:(kx + 1) * cx,
                    ]
                    empty = (
                        not np.isfinite(sub).any()
                        if is_float
                        else not sub.any()
                    )
                    if empty and not write_empty_chunks:
                        index.append((_SHARD_MISSING, _SHARD_MISSING))
                        continue
                    enc = _encode_chunk(
                        np.ascontiguousarray(sub), compressor, 3
                    )
                    index.append((len(body), len(enc)))
                    body += enc
                    wrote_any = True
        if not wrote_any:
            return pd.DataFrame(
                {"it": [it], "iy": [iy], "ix": [ix],
                 "n_values": [0], "n_bytes": [0]}
            )
        payload = body + np.array(index, dtype="<u8").tobytes()
        path = os.path.join(array_dir, "c", str(it), str(iy), str(ix))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return pd.DataFrame(
            {
                "it": [it],
                "iy": [iy],
                "ix": [ix],
                "n_values": [n_finite],
                "n_bytes": [len(payload)],
            }
        )

    receipts = (
        keyed.groupBy("it", "iy", "ix")
        .applyInPandas(
            _write_shard if shard else _write_chunk,
            "it int, iy int, ix int, n_values long, n_bytes long",
        )
        .cache()
    )
    receipts.count()  # execute the write NOW; receipts stay queryable
    return receipts


