"""plotX-equivalent RENDERING layer, dependency-free.

The reference ships ~1,500 LoC of matplotlib/cartopy plotters
(plotX/base.py:331-571 single_plot/multi_plot/animate, gridded.py:36,
unstructured.py:116, ID-field categorical plotting base.py:578-591).
matplotlib is not in this image, so rendering is implemented directly:
numpy colormap application + a minimal stdlib-zlib PNG writer. The
heavy lifting stays where it belongs — :mod:`marex_spark.viz` produces
the dense grids / limits / frames from distributed plans; this module
turns one driver-side numpy grid into pixels.

Everything is deterministic (fixed colormap tables, integer math where
possible) so renders are byte-stable across runs — tests pin pixels.
"""

from __future__ import annotations

import os
import struct
import zlib
from dataclasses import dataclass

import numpy as np

# ---------------------------------------------------------------------------
# Colormaps: control points interpolated in RGB. `viridis`-like for
# sequential, `coolwarm`-like for symmetric anomaly fields (the
# reference defaults: cmap="viridis" / "RdBu_r" when issym,
# plotX/base.py:573-576), plus a 20-colour categorical cycle for ID
# fields (base.py:578-591 setup_id_plot_params).
# ---------------------------------------------------------------------------

_CMAPS = {
    "viridis": [
        (68, 1, 84), (72, 40, 120), (62, 74, 137), (49, 104, 142),
        (38, 130, 142), (31, 158, 137), (53, 183, 121), (109, 205, 89),
        (180, 222, 44), (253, 231, 37),
    ],
    "rdbu_r": [
        (5, 48, 97), (33, 102, 172), (67, 147, 195), (146, 197, 222),
        (209, 229, 240), (247, 247, 247), (253, 219, 199), (244, 165, 130),
        (214, 96, 77), (178, 24, 43), (103, 0, 31),
    ],
    "greys": [(250, 250, 250), (5, 5, 5)],
}

# Tab20-style categorical cycle (ID plots; 0 reserved for background).
_ID_COLORS = np.array(
    [
        (31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40),
        (148, 103, 189), (140, 86, 75), (227, 119, 194), (127, 127, 127),
        (188, 189, 34), (23, 190, 207), (174, 199, 232), (255, 187, 120),
        (152, 223, 138), (255, 152, 150), (197, 176, 213), (196, 156, 148),
        (247, 182, 210), (199, 199, 199), (219, 219, 141), (158, 218, 229),
    ],
    dtype=np.uint8,
)

_NAN_RGB = np.array((220, 220, 220), dtype=np.uint8)  # land/missing


def colormap_table(name: str, n: int = 256) -> np.ndarray:
    """(n, 3) uint8 lookup table for a named colormap."""
    try:
        pts = np.array(_CMAPS[name.lower()], dtype=np.float64)
    except KeyError:
        raise ValueError(f"unknown colormap {name!r}; have {sorted(_CMAPS)}")
    src = np.linspace(0.0, 1.0, len(pts))
    dst = np.linspace(0.0, 1.0, n)
    out = np.stack(
        [np.interp(dst, src, pts[:, c]) for c in range(3)], axis=1
    )
    return np.round(out).astype(np.uint8)


def render_field(
    grid: np.ndarray,
    clim: tuple | None = None,
    cmap: str = "viridis",
    issym: bool = False,
) -> np.ndarray:
    """Float (ny, nx) grid → (ny, nx, 3) uint8 RGB. NaN renders as the
    missing-data grey. ``issym`` centres the scale on 0 with the
    diverging map (reference base.py:573-576 defaults)."""
    g = np.asarray(grid, dtype=np.float64)
    finite = np.isfinite(g)
    if clim is None:
        if not finite.any():
            lo, hi = 0.0, 1.0
        elif issym:
            m = float(np.abs(g[finite]).max())
            lo, hi = -m, m
        else:
            lo, hi = float(g[finite].min()), float(g[finite].max())
    else:
        lo, hi = float(clim[0]), float(clim[1])
    if issym and cmap == "viridis":
        cmap = "rdbu_r"
    lut = colormap_table(cmap)
    span = hi - lo if hi > lo else 1.0
    idx = np.clip((g - lo) / span, 0.0, 1.0)
    idx = np.where(finite, idx, 0.0)
    idx = np.round(idx * (len(lut) - 1)).astype(np.int64)
    rgb = lut[idx]
    rgb[~finite] = _NAN_RGB
    return rgb


def render_id_field(ids: np.ndarray, background=(255, 255, 255)) -> np.ndarray:
    """Int (ny, nx) label grid → RGB; 0/negative = background, positive
    IDs cycle through the categorical palette keyed by ID (stable
    across frames — the same event keeps its colour through an
    animation, like the reference's ID colormap)."""
    a = np.asarray(ids, dtype=np.int64)
    rgb = np.empty(a.shape + (3,), dtype=np.uint8)
    rgb[:] = np.array(background, dtype=np.uint8)
    pos = a > 0
    rgb[pos] = _ID_COLORS[(a[pos] - 1) % len(_ID_COLORS)]
    return rgb


def upscale(rgb: np.ndarray, k: int) -> np.ndarray:
    """Nearest-neighbour integer upscale (grid cells are data, not
    samples — interpolation would invent values)."""
    return np.repeat(np.repeat(rgb, k, axis=0), k, axis=1)


def colorbar_strip(
    cmap: str = "viridis", width: int = 256, height: int = 12
) -> np.ndarray:
    """Horizontal colourbar strip (reference _setup_colorbar)."""
    lut = colormap_table(cmap, width)
    return np.broadcast_to(lut[None, :, :], (height, width, 3)).copy()


# ---------------------------------------------------------------------------
# Minimal PNG writer: RGB8, no interlace, one zlib-compressed IDAT.
# Pure stdlib — the point is a real, testable rendering sink without
# matplotlib in the image.
# ---------------------------------------------------------------------------


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _scanline_payload(rgb: np.ndarray) -> tuple[bytes, int, int]:
    """(H, W, 3) uint8 → (zlib'd filter-0 scanlines, w, h) — the body
    shared by IDAT (plain PNG) and fdAT (APNG frames)."""
    a = np.ascontiguousarray(rgb, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {a.shape}")
    h, w = a.shape[:2]
    # filter byte 0 (None) per scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = a.reshape(h, w * 3)
    return zlib.compress(raw.tobytes(), 6), w, h


def png_bytes(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → PNG file bytes."""
    payload, w, h = _scanline_payload(rgb)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return b"".join(
        [
            b"\x89PNG\r\n\x1a\n",
            _chunk(b"IHDR", ihdr),
            _chunk(b"IDAT", payload),
            _chunk(b"IEND", b""),
        ]
    )


def write_png(rgb: np.ndarray, path: str) -> str:
    with open(path, "wb") as f:
        f.write(png_bytes(rgb))
    return path


def read_png(path_or_bytes) -> np.ndarray:
    """Decode a PNG written by :func:`png_bytes` (RGB8, filter 0) back
    to (H, W, 3) uint8 — the test-side inverse; not a general decoder."""
    buf = (
        path_or_bytes
        if isinstance(path_or_bytes, (bytes, bytearray))
        else open(path_or_bytes, "rb").read()
    )
    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(buf):
        (n,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + n]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if (depth, ctype) != (8, 2):
                raise ValueError("only RGB8 supported")
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + n
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    raw = raw.reshape(h, 1 + w * 3)
    if (raw[:, 0] != 0).any():
        raise ValueError("only filter-0 scanlines supported")
    return raw[:, 1:].reshape(h, w, 3).copy()


def apng_bytes(frames, fps: int = 10) -> bytes:
    """List/iterator of (H, W, 3) uint8 arrays → ANIMATED PNG bytes
    (APNG, RFC-pending PNG extension implemented by every browser) —
    the stdlib stand-in for the reference's ffmpeg mp4 (plotX
    base.py:408 ``animate``): one playable file, zero native deps.

    Layout: IHDR, acTL(n_frames), then per frame an fcTL and the pixel
    data — frame 0 as the canonical IDAT (so non-APNG decoders show it
    as a still), later frames as fdAT with running sequence numbers."""
    frames = list(frames)
    if not frames:
        raise ValueError("apng_bytes needs at least one frame")
    payload0, w, h = _scanline_payload(frames[0])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    actl = struct.pack(">II", len(frames), 0)  # num_plays 0 = loop forever
    out = [b"\x89PNG\r\n\x1a\n", _chunk(b"IHDR", ihdr), _chunk(b"acTL", actl)]
    seq = 0

    def fctl(seq_n: int) -> bytes:
        # full-canvas frame, delay fps⁻¹ s, dispose 0 (none), blend 0
        return _chunk(
            b"fcTL",
            struct.pack(">IIIIIHHBB", seq_n, w, h, 0, 0, 1, fps, 0, 0),
        )

    out.append(fctl(seq))
    seq += 1
    out.append(_chunk(b"IDAT", payload0))
    for f in frames[1:]:
        payload, fw, fh = _scanline_payload(f)
        if (fw, fh) != (w, h):
            raise ValueError(f"frame size {(fh, fw)} != canvas {(h, w)}")
        out.append(fctl(seq))
        seq += 1
        out.append(_chunk(b"fdAT", struct.pack(">I", seq) + payload))
        seq += 1
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def write_apng(frames, path: str, fps: int = 10) -> str:
    with open(path, "wb") as f:
        f.write(apng_bytes(frames, fps=fps))
    return path


# ---------------------------------------------------------------------------
# plotX-shaped frontend over the viz data layer.
# ---------------------------------------------------------------------------


def _resolve_plot_config(config, clim, cmap, issym):
    """Fold a PlotConfig into the per-call kwargs (explicit kwargs win;
    config supplies defaults). Returns (clim, cmap, issym, cperc)."""
    cperc = (2, 98)
    if config is not None:
        if clim is None and config.clim is not None:
            clim = tuple(config.clim)
        if cmap == "viridis" and config.cmap:
            cmap = config.cmap
        issym = issym or config.issym
        cperc = tuple(config.cperc)
    return clim, cmap, issym, cperc


class GriddedPlotter:
    """plotX ``GriddedPlotter`` analogue (reference gridded.py:36): holds
    a long-format DataFrame + grid shape; renders snapshots / ID fields
    / animations to PNG. Spark does the data reduction (one slice or
    one stats pass per render); numpy does the pixels."""

    def __init__(self, df, ny: int, nx: int, value_col="value", time_col="time"):
        self.df = df
        self.ny, self.nx = int(ny), int(nx)
        self.value_col, self.time_col = value_col, time_col

    def clim_robust(self, q=(0.02, 0.98), issym: bool = False) -> tuple:
        from marex_spark.viz import clim_robust_limits

        lo, hi = clim_robust_limits(self.df, self.value_col, q)
        if issym:
            m = max(abs(lo), abs(hi))
            return -m, m
        return lo, hi

    def single_plot(
        self, time_value, path: str, clim=None, cmap="viridis",
        issym=False, scale: int = 1, config=None,
    ) -> str:
        """Render one timestep to a PNG file (base.py:331 single_plot).
        ``config``: a PlotConfig supplying defaults for clim/cmap/issym
        (explicit kwargs win)."""
        from marex_spark.viz import snapshot_grid

        clim, cmap, issym, cperc = _resolve_plot_config(config, clim, cmap, issym)
        if clim is None and config is not None:
            # a PlotConfig asked for robust percentile limits — honour
            # cperc here exactly like multi_plot/animate do (review
            # finding: single_plot silently ignored it)
            clim = self.clim_robust(
                q=(cperc[0] / 100.0, cperc[1] / 100.0), issym=issym
            )

        g = snapshot_grid(
            self.df, time_value, self.ny, self.nx, self.value_col, self.time_col
        )
        rgb = render_field(g, clim=clim, cmap=cmap, issym=issym)
        if scale > 1:
            rgb = upscale(rgb, scale)
        return write_png(rgb, path)

    def multi_plot(
        self, time_values, path: str, clim=None, cmap="viridis",
        issym=False, scale: int = 1, ncols: int = 2, config=None,
    ) -> str:
        """plotX ``multi_plot`` (base.py:348): several timesteps side
        by side, SHARED colour scale (one robust-limits pass when clim
        absent — panels are comparable by construction)."""
        from marex_spark.viz import snapshot_grid

        clim, cmap, issym, cperc = _resolve_plot_config(config, clim, cmap, issym)
        if clim is None:
            clim = self.clim_robust(
                q=(cperc[0] / 100.0, cperc[1] / 100.0), issym=issym
            )
        panels = []
        for t in time_values:
            g = snapshot_grid(
                self.df, t, self.ny, self.nx, self.value_col, self.time_col
            )
            rgb = render_field(g, clim=clim, cmap=cmap, issym=issym)
            panels.append(upscale(rgb, scale) if scale > 1 else rgb)
        return write_png(compose_panels(panels, ncols=ncols), path)

    def id_plot(self, time_value, path: str, id_col="event_id", scale: int = 1) -> str:
        """Render one timestep of labelled events (base.py:578)."""
        from marex_spark.viz import event_snapshot

        g = event_snapshot(
            self.df, time_value, self.ny, self.nx, self.time_col, id_col
        )
        rgb = render_id_field(g)
        if scale > 1:
            rgb = upscale(rgb, scale)
        return write_png(rgb, path)

    def animate(
        self, out_dir: str, clim=None, cmap="viridis", issym=False,
        scale: int = 1, config=None,
    ) -> list:
        """All timesteps → ``frame_%05d.png`` under ``out_dir`` (plotX
        base.py:408 animate writes an mp4 via ffmpeg; frames are the
        portable stdlib equivalent — any encoder assembles them). The
        colour scale is fixed across frames: one robust-limits pass
        first unless ``clim`` given, so frames are comparable."""
        from marex_spark.viz import animation_frames

        clim, cmap, issym, cperc = _resolve_plot_config(config, clim, cmap, issym)
        os.makedirs(out_dir, exist_ok=True)
        if clim is None:
            clim = self.clim_robust(
                q=(cperc[0] / 100.0, cperc[1] / 100.0), issym=issym
            )
        paths = []
        for i, (_, g) in enumerate(
            animation_frames(self.df, self.ny, self.nx, self.value_col, self.time_col)
        ):
            rgb = render_field(g, clim=clim, cmap=cmap, issym=issym)
            if scale > 1:
                rgb = upscale(rgb, scale)
            paths.append(write_png(rgb, os.path.join(out_dir, f"frame_{i:05d}.png")))
        return paths

    def animate_apng(
        self, path: str, fps: int = 10, clim=None, cmap="viridis",
        issym=False, scale: int = 1, config=None,
    ) -> str:
        """All timesteps → ONE playable animated-PNG file — the
        single-artifact equivalent of the reference's ffmpeg mp4
        (plotX base.py:408), with the same fixed cross-frame colour
        scale as :meth:`animate`."""
        from marex_spark.viz import animation_frames

        clim, cmap, issym, cperc = _resolve_plot_config(config, clim, cmap, issym)
        if clim is None:
            clim = self.clim_robust(
                q=(cperc[0] / 100.0, cperc[1] / 100.0), issym=issym
            )

        def frames():
            for _, g in animation_frames(
                self.df, self.ny, self.nx, self.value_col, self.time_col
            ):
                rgb = render_field(g, clim=clim, cmap=cmap, issym=issym)
                yield upscale(rgb, scale) if scale > 1 else rgb

        return write_apng(frames(), path, fps=fps)


def fill_holes_nearest(grid: np.ndarray, max_iter: int = 8) -> np.ndarray:
    """Fill NaN pixels by iterative 4-neighbour mean dilation — the
    stdlib stand-in for the reference's ckdtree nearest-neighbour
    interpolation (plotX/unstructured.py:50-113). Pixels farther than
    ``max_iter`` steps from data stay NaN (honest: off-mesh regions
    render as missing rather than extrapolated)."""
    g = np.asarray(grid, dtype=np.float64).copy()
    for _ in range(max_iter):
        holes = np.isnan(g)
        if not holes.any():
            break
        pad = np.pad(g, 1, constant_values=np.nan)
        stack = np.stack(
            [pad[:-2, 1:-1], pad[2:, 1:-1], pad[1:-1, :-2], pad[1:-1, 2:]]
        )
        cnt = np.sum(~np.isnan(stack), axis=0)
        with np.errstate(invalid="ignore"):
            neigh = np.where(cnt > 0, np.nansum(stack, axis=0) / np.maximum(cnt, 1), np.nan)
        g[holes] = neigh[holes]
    return g


class UnstructuredPlotter:
    """plotX ``UnstructuredPlotter`` analogue (reference
    unstructured.py:116): renders mesh data by REGRIDDING to a regular
    lat/lon raster. The reference interpolates grid points from nearest
    cells via a ckdtree; here the assignment runs the other way — each
    CELL maps to its containing pixel (pure column arithmetic, no
    driver geometry pass), pixels average their cells, and an optional
    nearest-mean dilation fills pixels the mesh skipped. For meshes
    denser than the raster (the plotting regime) the two are
    equivalent; coarser meshes show NaN holes unless filled.

    Spark does the heavy half distributed: the cell→pixel map is a
    broadcast join and the per-pixel mean a groupBy — one small
    (≤ ny·nx rows) collect per frame."""

    def __init__(
        self,
        df,
        cell_geo,
        ny: int,
        nx: int,
        extent: tuple = (-90.0, 90.0, -180.0, 180.0),
        value_col: str = "value",
        time_col: str = "time",
        cell_col: str = "cell",
    ):
        from pyspark.sql import functions as F

        self.ny, self.nx = int(ny), int(nx)
        self.value_col, self.time_col = value_col, time_col
        lat0, lat1, lon0, lon1 = map(float, extent)
        dlat = (lat1 - lat0) / ny
        dlon = (lon1 - lon0) / nx
        pix = cell_geo.select(
            cell_col,
            F.least(
                F.lit(ny - 1),
                F.greatest(
                    F.lit(0), F.floor((F.col("lat") - lat0) / dlat).cast("int")
                ),
            ).alias("gy"),
            F.least(
                F.lit(nx - 1),
                F.greatest(
                    F.lit(0), F.floor((F.col("lon") - lon0) / dlon).cast("int")
                ),
            ).alias("gx"),
        )
        self._gridded = (
            df.join(F.broadcast(pix), cell_col)
            .groupBy(time_col, "gy", "gx")
            .agg(F.avg(value_col).alias(value_col))
            .withColumnRenamed("gy", "y")
            .withColumnRenamed("gx", "x")
        )

    def snapshot(self, time_value, fill: bool = True) -> np.ndarray:
        from marex_spark.viz import snapshot_grid

        g = snapshot_grid(
            self._gridded, time_value, self.ny, self.nx,
            self.value_col, self.time_col,
        )
        return fill_holes_nearest(g) if fill else g

    def single_plot(
        self, time_value, path: str, clim=None, cmap="viridis",
        issym=False, scale: int = 1, fill: bool = True, config=None,
    ) -> str:
        clim, cmap, issym, cperc = _resolve_plot_config(config, clim, cmap, issym)
        if clim is None and config is not None:
            # honour PlotConfig.cperc (same rule as GriddedPlotter)
            from marex_spark.viz import clim_robust_limits

            lo, hi = clim_robust_limits(
                self._gridded, self.value_col,
                (cperc[0] / 100.0, cperc[1] / 100.0),
            )
            if issym:
                m = max(abs(lo), abs(hi))
                lo, hi = -m, m
            clim = (lo, hi)
        rgb = render_field(
            self.snapshot(time_value, fill=fill), clim=clim, cmap=cmap,
            issym=issym,
        )
        if scale > 1:
            rgb = upscale(rgb, scale)
        return write_png(rgb, path)


def render_frames_distributed(
    df,
    out_dir: str,
    ny: int,
    nx: int,
    clim: tuple,
    cmap: str = "viridis",
    issym: bool = False,
    scale: int = 1,
    value_col: str = "value",
    time_col: str = "time",
) -> list:
    """Distributed animation rendering: every timestep becomes one
    PNG, rendered INSIDE executors in a single pass (applyInPandas per
    time slice) instead of the driver's frame-by-frame collect loop
    (``GriddedPlotter.animate``). ``clim`` is required because frames
    render independently — compute it once via ``clim_robust_limits``.

    Frames land in ``out_dir`` on executor-local storage keyed by the
    frame's own timestamp, so the pass is idempotent and order-free; on
    a cluster point ``out_dir`` at shared storage. Returns the sorted
    (time, path) list — the driver moves only one row per frame, never
    pixels. This is the plotX ``animate`` (base.py:408) reshaped for a
    rendering farm: 36k frames/century render in one Spark job.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    lo, hi = float(clim[0]), float(clim[1])

    def _render(pdf: "pd.DataFrame") -> "pd.DataFrame":
        t = pdf[time_col].iloc[0]
        g = np.full((ny, nx), np.nan)
        g[pdf["y"].to_numpy(), pdf["x"].to_numpy()] = pdf[value_col].to_numpy()
        rgb = render_field(g, clim=(lo, hi), cmap=cmap, issym=issym)
        if scale > 1:
            rgb = upscale(rgb, scale)
        stamp = str(t).replace(" ", "_").replace(":", "-")
        path = os.path.join(out_dir, f"frame_{stamp}.png")
        write_png(rgb, path)
        return pd.DataFrame({time_col: [t], "path": [path]})

    out = (
        df.select(time_col, "y", "x", value_col)
        .groupBy(time_col)
        .applyInPandas(
            _render,
            schema=f"{time_col} {df.schema[time_col].dataType.simpleString()}, path string",
        )
        .orderBy(time_col)
    )
    return [(r[time_col], r["path"]) for r in out.collect()]


def compose_panels(
    panels: list, ncols: int = 2, pad: int = 2, background=(255, 255, 255)
) -> np.ndarray:
    """Tile RGB panels into one image (row-major, padded) — the layout
    half of plotX ``multi_plot`` (base.py:348)."""
    if not panels:
        raise ValueError("no panels")
    h = max(p.shape[0] for p in panels)
    w = max(p.shape[1] for p in panels)
    nrows = (len(panels) + ncols - 1) // ncols
    out = np.empty(
        (nrows * h + pad * (nrows + 1), ncols * w + pad * (ncols + 1), 3),
        dtype=np.uint8,
    )
    out[:] = np.array(background, dtype=np.uint8)
    for i, p in enumerate(panels):
        r, c = divmod(i, ncols)
        y0 = pad + r * (h + pad)
        x0 = pad + c * (w + pad)
        out[y0 : y0 + p.shape[0], x0 : x0 + p.shape[1]] = p
    return out





# ---------------------------------------------------------------------------
# plotX module-level configuration + dispatcher (reference
# plotX/__init__.py:82-198: PlotConfig, specify_grid, the xr accessor's
# _detect_grid_type at 44-79).
# ---------------------------------------------------------------------------


@dataclass
class PlotConfig:
    """Per-plot options (reference plotX ``PlotConfig``): the knobs the
    reference exposes on its accessor, minus the cartopy-specific ones
    (projection/land features need cartopy; the PNG layer renders plain
    rasters)."""

    title: str | None = None
    var_units: str = ""
    issym: bool = False
    cmap: str | None = None
    cperc: tuple = (4, 96)
    clim: tuple | None = None
    show_colorbar: bool = True
    grid_labels: bool = False
    dimensions: dict | None = None
    norm: object | None = None
    plot_IDs: bool = False
    extend: str = "both"


_grid_spec: dict = {"grid_type": None, "cell_geo": None, "ny": None, "nx": None}


def specify_grid(
    grid_type: str | None = None,
    cell_geo=None,
    ny: int | None = None,
    nx: int | None = None,
) -> None:
    """Set the global grid specification used by ``plotX()`` dispatch
    (reference plotX/__init__.py:157-198 — its tgrid/ckdtree paths
    become the ``cell_geo`` dimension table here)."""
    from marex_spark.exceptions import ConfigurationError

    if grid_type is not None and grid_type.lower() not in (
        "gridded",
        "unstructured",
    ):
        raise ConfigurationError(
            "Invalid grid type specification",
            details={"provided_type": grid_type,
                     "valid_types": ["gridded", "unstructured"]},
            suggestions=[
                "Use 'gridded' for regular lat/lon grids",
                "Use 'unstructured' for triangular/irregular meshes",
            ],
        )
    _grid_spec.update(
        grid_type=grid_type.lower() if grid_type else None,
        cell_geo=cell_geo, ny=ny, nx=nx,
    )


def clear_grid_spec() -> None:
    """Reset the global grid specification (reference
    plotX/__init__.py:201-210 reset helper)."""
    _grid_spec.update(grid_type=None, cell_geo=None, ny=None, nx=None)


def plotX(df, ny: int | None = None, nx: int | None = None, **kwargs):
    """Grid-type-detecting plotter constructor — the accessor entry
    point (reference plotX/__init__.py:44-79 ``_detect_grid_type``: a
    'y' dimension present → gridded, else unstructured). Column-based
    here: (y, x) columns → GriddedPlotter; a 'cell' column →
    UnstructuredPlotter (needs cell_geo from specify_grid or kwargs).
    An explicit specify_grid(grid_type=...) overrides detection."""
    from marex_spark.exceptions import VisualisationError

    ny = ny or _grid_spec["ny"]
    nx = nx or _grid_spec["nx"]
    cols = set(df.columns)
    forced = _grid_spec["grid_type"]
    gridded = {"y", "x"} <= cols if forced is None else forced == "gridded"
    if gridded:
        if ny is None or nx is None:
            raise VisualisationError(
                "gridded plotting needs ny and nx",
                details={"ny": ny, "nx": nx},
                suggestions=["pass ny=/nx= or call specify_grid(ny=..., nx=...)"],
            )
        return GriddedPlotter(df, ny=ny, nx=nx, **kwargs)
    if "cell" not in cols:
        raise VisualisationError(
            "cannot detect grid type: no (y, x) and no cell column",
            details={"columns": sorted(cols)},
            suggestions=["call specify_grid(grid_type=...)"],
        )
    cell_geo = kwargs.pop("cell_geo", None) or _grid_spec["cell_geo"]
    if cell_geo is None:
        raise VisualisationError(
            "unstructured plotting needs cell_geo (cell, lat, lon)",
            suggestions=["specify_grid(cell_geo=...) or pass cell_geo="],
        )
    return UnstructuredPlotter(
        df, cell_geo, ny=ny or 180, nx=nx or 360, **kwargs
    )
