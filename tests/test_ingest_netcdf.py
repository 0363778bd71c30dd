"""NetCDF classic ingestion round-trip (S2, reference detect.py:409):
the package's spec-literal CDF-1/CDF-2 writer builds fixtures (the
image has no netCDF4), the distributed stdlib reader must recover
every value, timestamp, fill and scale/offset. Mirrors
tests/test_ingest_zarr.py.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from marex_spark.sources.netcdf import (
    ingest_netcdf_classic,
    read_header,
    write_netcdf_classic as write_classic,
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


class TestFixedCalendars:
    """CF fixed-length model calendars (noleap/360_day) decode by
    (year, doy) arithmetic so Spark's dayofyear() recovers the model
    day index without leap drift."""

    def test_noleap_no_drift(self):
        import numpy as np
        import pandas as pd

        from marex_spark.sources.netcdf import _decode_time_units

        # 10 model years of noleap days from 2000-01-01; gregorian
        # decode would drift +2 days by 2008 (2000, 2004 leaps)
        vals = np.arange(10 * 365)
        ts = _decode_time_units("days since 2000-01-01", vals, "noleap")
        assert ts[0] == pd.Timestamp("2000-01-01")
        # model day 0 of year Y is always Jan 1, doy 1
        for y in range(10):
            t = ts[y * 365]
            assert (t.year, t.month, t.day) == (2000 + y, 1, 1)
        # model doy is exactly periodic with period 365
        assert all(ts[i].dayofyear == (i % 365) + 1 for i in range(0, 3650, 37))

    def test_360_day(self):
        import numpy as np

        from marex_spark.sources.netcdf import _decode_time_units

        vals = np.arange(720)
        ts = _decode_time_units("days since 1850-01-01", vals, "360_day")
        assert ts[360].year == 1851 and ts[360].dayofyear == 1
        assert ts[719].dayofyear == 360

    def test_standard_calendar_unchanged(self):
        import numpy as np
        import pandas as pd

        from marex_spark.sources.netcdf import _decode_time_units

        vals = np.arange(366)
        ts = _decode_time_units("days since 2020-01-01", vals, "standard")
        assert ts[59] == pd.Timestamp("2020-02-29")  # leap day kept

    def test_mid_year_base_uses_model_doy(self):
        import numpy as np

        from marex_spark.sources.netcdf import _decode_time_units

        ts = _decode_time_units("days since 2000-07-01", np.arange(2), "noleap")
        # July 1 is model doy 182 in a NOLEAP calendar (the Gregorian
        # base year 2000 being leap must not shift it to 183)
        assert ts[0].dayofyear == 182
        assert ts[1].dayofyear == 183

    def test_366_day_calendar_refused(self):
        import numpy as np
        import pytest

        from marex_spark.exceptions import ConfigurationError
        from marex_spark.sources.netcdf import _decode_time_units

        with pytest.raises(ConfigurationError, match="366"):
            _decode_time_units("days since 1970-01-01", np.arange(3), "all_leap")

    def test_noleap_injective_around_year_end(self):
        import numpy as np

        from marex_spark.sources.netcdf import _decode_time_units

        # model days 364 (Dec 31) and 365 (next Jan 1) must be distinct
        # timestamps in every year, including Gregorian leap years
        for base_year in (1970, 1972, 2000):
            ts = _decode_time_units(
                f"days since {base_year}-01-01", np.array([364, 365]), "noleap"
            )
            assert ts[0] != ts[1]
            assert ts[0].year == base_year and ts[0].dayofyear == 365
            assert ts[1].year == base_year + 1 and ts[1].dayofyear == 1


def test_classic_time_pruning(spark, tmp_path):
    """time_min/time_max prune record ranges driver-side; boundary
    rows trim exactly; empty selection yields an empty frame."""
    import numpy as np
    import pandas as pd

    from marex_spark.sources.netcdf import (
        ingest_netcdf_classic,
        write_netcdf_classic,
    )

    T, NY, NX = 10, 2, 3
    t, y, x = np.meshgrid(np.arange(T), np.arange(NY), np.arange(NX),
                          indexing="ij")
    data = (t * 100 + y * 10 + x).astype(np.float32)
    p = str(tmp_path / "p.nc")
    write_netcdf_classic(p, data, np.arange(T, dtype=np.float64))
    # small target_chunk_bytes → one record per range, so pruning is
    # visible at record granularity
    df = ingest_netcdf_classic(
        spark, p, "sst", target_chunk_bytes=1,
        time_min="2020-01-04", time_max="2020-01-06",
    )
    rows = df.collect()
    days = sorted({r.time.day for r in rows})
    assert days == [4, 5, 6]
    assert len(rows) == 3 * NY * NX
    got = {(r.time.day, r.y, r.x): r.value for r in rows}
    assert got[(5, 1, 2)] == 412.0  # t=4 → 400+10+2
    empty = ingest_netcdf_classic(spark, p, "sst", time_min="2044-01-01")
    assert empty.count() == 0
