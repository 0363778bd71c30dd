"""Dependency-free plotX rendering layer (reference plotX/base.py:
331-591, gridded.py:36): colormap determinism, NaN handling, PNG
round-trip, ID-colour stability across frames, plotter end-to-end."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from marex_spark.render import (
    GriddedPlotter,
    colorbar_strip,
    colormap_table,
    png_bytes,
    read_png,
    render_field,
    render_id_field,
    upscale,
    write_png,
)


def test_colormap_table_endpoints():
    lut = colormap_table("viridis")
    assert lut.shape == (256, 3) and lut.dtype == np.uint8
    assert tuple(lut[0]) == (68, 1, 84)
    assert tuple(lut[-1]) == (253, 231, 37)
    with pytest.raises(ValueError):
        colormap_table("nope")


def test_render_field_scales_and_nan():
    g = np.array([[0.0, 5.0], [10.0, np.nan]])
    rgb = render_field(g)
    assert tuple(rgb[0, 0]) == (68, 1, 84)  # min -> first entry
    assert tuple(rgb[1, 0]) == (253, 231, 37)  # max -> last entry
    assert tuple(rgb[1, 1]) == (220, 220, 220)  # NaN -> grey
    # symmetric: 0 maps to the diverging midpoint neighbourhood
    rgb_sym = render_field(np.array([[-2.0, 0.0, 2.0]]), issym=True)
    mid = rgb_sym[0, 1].astype(int)
    assert abs(int(mid[0]) - 247) <= 8 and abs(int(mid[2]) - 247) <= 8
    # explicit clim clips
    rgb_c = render_field(np.array([[100.0]]), clim=(0.0, 1.0))
    assert tuple(rgb_c[0, 0]) == (253, 231, 37)


def test_id_field_colours_stable():
    a = np.array([[0, 1], [21, 1]])
    rgb = render_id_field(a)
    assert tuple(rgb[0, 0]) == (255, 255, 255)  # background
    assert tuple(rgb[0, 1]) == tuple(rgb[1, 1])  # same ID same colour
    assert tuple(rgb[1, 0]) == tuple(rgb[0, 1])  # 21 cycles onto 1's colour


def test_png_round_trip():
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    buf = png_bytes(rgb)
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    out = read_png(buf)
    np.testing.assert_array_equal(out, rgb)
    up = upscale(rgb, 3)
    assert up.shape == (51, 69, 3)
    np.testing.assert_array_equal(up[::3, ::3], rgb)


def test_colorbar_strip():
    bar = colorbar_strip("rdbu_r", width=64, height=4)
    assert bar.shape == (4, 64, 3)
    assert tuple(bar[0, 0]) == (5, 48, 97)


def test_gridded_plotter_end_to_end(spark, tmp_path):
    pdf_rows = [
        (t, y, x, float(t * 10 + y * 2 + x))
        for t in range(3)
        for y in range(4)
        for x in range(5)
        if not (y == 0 and x == 0)  # hole -> NaN pixel
    ]
    df = spark.createDataFrame(pdf_rows, "time int, y int, x int, value double")
    p = GriddedPlotter(df, ny=4, nx=5)
    lo, hi = p.clim_robust()
    assert lo < hi
    f = p.single_plot(1, str(tmp_path / "snap.png"), scale=2)
    img = read_png(f)
    assert img.shape == (8, 10, 3)
    assert tuple(img[0, 0]) == (220, 220, 220)  # the hole
    frames = p.animate(str(tmp_path / "anim"), clim=(0.0, 30.0))
    assert len(frames) == 3
    # fixed clim: the same cell brightens monotonically over frames
    reds = [read_png(fp)[2, 2].sum() for fp in frames]
    assert reds[0] != reds[-1]

    ids = df.withColumn(
        "event_id", (F.col("value") > 15).cast("int") * (F.col("y") + 1)
    )
    fid = GriddedPlotter(ids, ny=4, nx=5).id_plot(2, str(tmp_path / "ids.png"))
    idimg = read_png(fid)
    assert idimg.shape == (4, 5, 3)


def test_fill_holes_nearest():
    import numpy as np

    from marex_spark.render import fill_holes_nearest

    g = np.full((5, 5), np.nan)
    g[2, 2] = 4.0
    out = fill_holes_nearest(g, max_iter=1)
    assert out[1, 2] == 4.0 and out[2, 1] == 4.0
    assert np.isnan(out[0, 0])  # beyond one step stays missing
    full = fill_holes_nearest(g, max_iter=8)
    assert not np.isnan(full).any()


def test_unstructured_plotter(spark, tmp_path):
    import numpy as np

    from marex_spark.render import UnstructuredPlotter, read_png

    # 16-cell mesh covering a 4x4 raster of a 40x40 degree box
    geo_rows = [
        (c, -20.0 + 5.0 + 10.0 * (c // 4), -20.0 + 5.0 + 10.0 * (c % 4))
        for c in range(16)
    ]
    geo = spark.createDataFrame(geo_rows, "cell long, lat double, lon double")
    data = spark.createDataFrame(
        [(0, c, float(c)) for c in range(16) if c != 5],
        "time int, cell long, value double",
    )
    p = UnstructuredPlotter(
        data, geo, ny=4, nx=4, extent=(-20.0, 20.0, -20.0, 20.0)
    )
    raw = p.snapshot(0, fill=False)
    assert raw.shape == (4, 4)
    assert raw[0, 0] == 0.0 and raw[3, 3] == 15.0
    assert np.isnan(raw[1, 1])  # the missing cell's pixel
    filled = p.snapshot(0)
    assert not np.isnan(filled[1, 1])
    f = p.single_plot(0, str(tmp_path / "mesh.png"), scale=4)
    assert read_png(f).shape == (16, 16, 3)


def test_render_frames_distributed(spark, tmp_path):
    import numpy as np

    from marex_spark.render import read_png, render_frames_distributed

    rows = [
        (t, y, x, float(t + y + x))
        for t in range(4)
        for y in range(3)
        for x in range(4)
    ]
    df = spark.createDataFrame(rows, "time int, y int, x int, value double")
    frames = render_frames_distributed(
        df, str(tmp_path / "farm"), ny=3, nx=4, clim=(0.0, 9.0), scale=2
    )
    assert [t for t, _ in frames] == [0, 1, 2, 3]
    imgs = [read_png(p) for _, p in frames]
    assert all(im.shape == (6, 8, 3) for im in imgs)
    # same clim across frames: the same cell brightens with t
    assert not np.array_equal(imgs[0], imgs[3])


def test_png_roundtrip_property():
    """Property: encode/decode is identity for arbitrary RGB arrays,
    including degenerate 1-pixel and single-row/column shapes."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from marex_spark.render import png_bytes, read_png

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, seed):
        rgb = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8
        )
        np.testing.assert_array_equal(read_png(png_bytes(rgb)), rgb)

    check()


def test_multi_plot_shared_scale(spark, tmp_path):
    import numpy as np

    from marex_spark.render import GriddedPlotter, compose_panels, read_png

    rows = [
        (t, y, x, float(10 * t + y + x))
        for t in range(4)
        for y in range(3)
        for x in range(4)
    ]
    df = spark.createDataFrame(rows, "time int, y int, x int, value double")
    p = GriddedPlotter(df, ny=3, nx=4)
    f = p.multi_plot([0, 1, 2, 3], str(tmp_path / "multi.png"), ncols=2)
    img = read_png(f)
    # 2x2 grid of 3x4 panels with pad 2
    assert img.shape == (3 * 2 + 2 * 3, 4 * 2 + 2 * 3, 3)
    with np.testing.assert_raises(ValueError):
        compose_panels([])


class TestPlotXDispatch:
    """plotX() accessor dispatch + specify_grid (reference
    plotX/__init__.py:44-79, 157-198)."""

    def test_detects_gridded(self, spark):
        from marex_spark.render import GriddedPlotter, plotX

        df = spark.createDataFrame(
            [(0, 0, 0, 1.0)], "t int, y int, x int, value double"
        )
        p = plotX(df, ny=4, nx=4)
        assert isinstance(p, GriddedPlotter)

    def test_detects_unstructured_with_spec(self, spark):
        from marex_spark.render import (
            UnstructuredPlotter,
            clear_grid_spec,
            plotX,
            specify_grid,
        )

        geo = spark.createDataFrame(
            [(0, 0.0, 0.0)], "cell int, lat double, lon double"
        )
        df = spark.createDataFrame([(0, 0, 1.0)], "t int, cell int, value double")
        specify_grid(cell_geo=geo, ny=8, nx=16)
        try:
            p = plotX(df, time_col="t")
            assert isinstance(p, UnstructuredPlotter)
        finally:
            clear_grid_spec()

    def test_invalid_grid_type_rejected(self):
        import pytest

        from marex_spark.exceptions import ConfigurationError
        from marex_spark.render import specify_grid

        with pytest.raises(ConfigurationError, match="grid type"):
            specify_grid(grid_type="hexagonal")

    def test_missing_geo_raises_typed(self, spark):
        import pytest

        from marex_spark.exceptions import VisualisationError
        from marex_spark.render import clear_grid_spec, plotX

        clear_grid_spec()
        df = spark.createDataFrame([(0, 0, 1.0)], "t int, cell int, value double")
        with pytest.raises(VisualisationError, match="cell_geo"):
            plotX(df)

    def test_plot_config_defaults(self):
        from marex_spark.render import PlotConfig

        c = PlotConfig(title="snap", issym=True)
        assert c.cperc == (4, 96)
        assert c.show_colorbar and c.issym

    def test_plot_config_consumed(self, spark, tmp_path):
        """PlotConfig must actually drive rendering (review finding):
        cmap/issym/clim from the config reach the pixels."""
        import numpy as np

        from marex_spark.render import GriddedPlotter, PlotConfig, read_png

        df = spark.createDataFrame(
            [(0, y, x, float(y * 4 + x)) for y in range(4) for x in range(4)],
            "t int, y int, x int, value double",
        )
        p = GriddedPlotter(df, ny=4, nx=4, time_col="t")
        a = p.single_plot(0, str(tmp_path / "a.png"))
        b = p.single_plot(
            0, str(tmp_path / "b.png"), config=PlotConfig(cmap="rdbu_r")
        )
        assert not np.array_equal(read_png(a), read_png(b))
        # explicit kwarg wins over config
        c = p.single_plot(
            0, str(tmp_path / "c.png"), cmap="rdbu_r",
            config=PlotConfig(cmap="greys"),
        )
        assert np.array_equal(read_png(b), read_png(c))


def test_single_plot_honours_config_cperc(spark, tmp_path):
    """PlotConfig.cperc must drive single_plot's colour limits exactly
    like multi_plot's (review finding: it was silently ignored)."""
    from marex_spark.render import GriddedPlotter, PlotConfig

    rows = [
        (0, y, x, float(y * 8 + x)) for y in range(4) for x in range(8)
    ]
    df = spark.createDataFrame(rows, "time int, y int, x int, value double")
    p = GriddedPlotter(df, ny=4, nx=8)
    cfg = PlotConfig(cperc=(10, 90))
    a = p.single_plot(0, f"{tmp_path}/a.png", config=cfg)
    lo, hi = p.clim_robust(q=(0.10, 0.90))
    b = p.single_plot(0, f"{tmp_path}/b.png", clim=(lo, hi))
    assert open(a, "rb").read() == open(b, "rb").read()
    # and differs from the raw min/max scaling
    c = p.single_plot(0, f"{tmp_path}/c.png")
    assert open(a, "rb").read() != open(c, "rb").read()


def test_apng_structure_and_first_frame_roundtrip():
    """apng_bytes writes a spec-shaped animated PNG: acTL frame count,
    one fcTL per frame, fdAT for frames 1.., shared sequence numbering
    0..2n-2, and a canonical IDAT so non-APNG decoders (read_png
    ignores ancillary chunks) render frame 0 as a still."""
    import struct

    import numpy as np

    from marex_spark.render import apng_bytes, read_png

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 255, (6, 9, 3)).astype(np.uint8) for _ in range(3)]
    buf = apng_bytes(frames, fps=5)
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"

    chunks = []
    pos = 8
    while pos < len(buf):
        (n,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        chunks.append((tag, buf[pos + 8 : pos + 8 + n]))
        pos += 12 + n
    tags = [t for t, _ in chunks]
    assert tags[0] == b"IHDR" and tags[-1] == b"IEND"
    (n_frames, n_plays) = struct.unpack(
        ">II", dict(chunks)[b"acTL"]
    )
    assert (n_frames, n_plays) == (3, 0)
    assert tags.count(b"fcTL") == 3
    assert tags.count(b"fdAT") == 2
    assert tags.count(b"IDAT") == 1
    # shared sequence numbering across fcTL + fdAT, strictly 0..4
    seqs = [
        struct.unpack(">I", payload[:4])[0]
        for tag, payload in chunks
        if tag in (b"fcTL", b"fdAT")
    ]
    assert seqs == [0, 1, 2, 3, 4]
    # fcTL geometry: full canvas, fps delay
    fctl0 = next(p for t, p in chunks if t == b"fcTL")
    _, w, h, x0, y0, dnum, dden = struct.unpack(">IIIIIHH", fctl0[:24])
    assert (w, h, x0, y0, dnum, dden) == (9, 6, 0, 0, 1, 5)
    # a plain-PNG decoder sees frame 0
    assert (read_png(buf) == frames[0]).all()


def test_apng_rejects_mismatched_frames():
    import numpy as np
    import pytest

    from marex_spark.render import apng_bytes

    a = np.zeros((4, 4, 3), dtype=np.uint8)
    b = np.zeros((5, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="frame size"):
        apng_bytes([a, b])
    with pytest.raises(ValueError, match="at least one frame"):
        apng_bytes([])
