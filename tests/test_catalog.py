"""S6 catalog scan (reference pulls test data through intake YAML
catalogs — tests/make_test_data.ipynb cells 6-8). Covers YAML + JSON
parsing, nested sub-catalog traversal, relative-path resolution, lazy
parquet dispatch, and the error surface."""

import json
import os

import pytest

from marex_spark.exceptions import CoordinateError, DataValidationError
from marex_spark.sources.catalog import (
    Catalog,
    open_catalog,
    star_schema_catalog,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def star_cat(tmp_path):
    return open_catalog(
        star_schema_catalog(SF, str(tmp_path / "star.json"))
    )


def test_names_and_describe(star_cat):
    names = star_cat.names()
    assert "nation" in names and "lineitem" in names
    d = star_cat.describe("nation")
    assert d["driver"] == "parquet"
    assert d["args"]["urlpath"].endswith("nation.parquet")


def test_parquet_read_matches_direct(spark, star_cat):
    via_cat = star_cat.read(spark, "nation")
    direct = spark.read.parquet(os.path.join(SF, "nation.parquet"))
    assert via_cat.count() == direct.count()
    assert via_cat.schema == direct.schema


def test_yaml_catalog_and_relative_paths(spark, tmp_path):
    (tmp_path / "cat.yaml").write_text(
        "sources:\n"
        "  nat:\n"
        "    driver: parquet\n"
        f"    args: {{urlpath: nation.parquet}}\n"
        "    metadata: {description: tpc-h nation}\n"
    )
    # relative urlpath resolves against the catalog file's directory
    os.symlink(
        os.path.join(SF, "nation.parquet"), tmp_path / "nation.parquet"
    )
    cat = open_catalog(str(tmp_path / "cat.yaml"))
    assert cat.read(spark, "nat").count() == 25
    assert cat.describe("nat")["metadata"]["description"] == "tpc-h nation"


def test_nested_subcatalog(spark, tmp_path):
    star = star_schema_catalog(SF, str(tmp_path / "star.json"))
    root = tmp_path / "root.json"
    root.write_text(
        json.dumps(
            {"sources": {"star": {"driver": "catalog", "args": {"urlpath": star}}}}
        )
    )
    cat = open_catalog(str(root))
    assert "star.region" in cat.names()
    assert cat.read(spark, "star.region").count() == 5
    # a sub-catalog is not itself readable
    with pytest.raises(DataValidationError):
        cat.read(spark, "star")


def test_error_surface(tmp_path, star_cat):
    with pytest.raises(CoordinateError) as ei:
        star_cat._entry("nope")
    assert "available" in ei.value.details
    (tmp_path / "bad.json").write_text('{"no_sources": 1}')
    with pytest.raises(DataValidationError):
        Catalog(str(tmp_path / "bad.json"))
    (tmp_path / "noargs.json").write_text(
        '{"sources": {"a": {"driver": "parquet", "args": {}}}}'
    )
    with pytest.raises(DataValidationError):
        Catalog(str(tmp_path / "noargs.json")).read(None, "a")


def test_catalog_netcdf_glob_archive(spark, tmp_path):
    """A netcdf catalog entry with a glob urlpath reads the whole
    multi-file archive through the HDF5 single-plan path."""
    import json

    import numpy as np

    from marex_spark.sources.catalog import open_catalog
    from marex_spark.sources.hdf5 import write_netcdf4

    rng = np.random.default_rng(5)
    field = rng.normal(10, 1, size=(4, 3, 5)).astype(np.float32)
    for i, sl in enumerate([(0, 2), (2, 4)]):
        write_netcdf4(
            str(tmp_path / f"year{i}.nc"), field[sl[0] : sl[1]],
            np.arange(sl[0], sl[1], dtype=np.float64),
            time_units="days since 2020-01-01", chunks=(1, 3, 5),
        )
    spec = {
        "sources": {
            "sst_archive": {
                "driver": "netcdf",
                "args": {"urlpath": "year*.nc", "var": "sst"},
            }
        }
    }
    (tmp_path / "cat.json").write_text(json.dumps(spec))
    cat = open_catalog(str(tmp_path / "cat.json"))
    df = cat.read(spark, "sst_archive")
    assert df.count() == field.size


def test_catalog_time_range_override(spark, tmp_path):
    """time_min/time_max ride catalog read() overrides into the
    netcdf and zarr drivers (driver-side chunk pruning end to end)."""
    import json

    import numpy as np

    from marex_spark.sources.catalog import open_catalog
    from marex_spark.sources.netcdf import write_netcdf_classic

    T, NY, NX = 8, 2, 2
    t, y, x = np.meshgrid(np.arange(T), np.arange(NY), np.arange(NX),
                          indexing="ij")
    data = (t * 100 + y * 10 + x).astype(np.float32)
    nc = str(tmp_path / "c.nc")
    write_netcdf_classic(nc, data, np.arange(T, dtype=np.float64))
    cat_path = str(tmp_path / "cat.json")
    with open(cat_path, "w") as f:
        json.dump(
            {"sources": {"sst": {"driver": "netcdf",
                                 "args": {"urlpath": nc, "var": "sst"}}}},
            f,
        )
    cat = open_catalog(cat_path)
    df = cat.read(spark, "sst", time_min="2020-01-03", time_max="2020-01-04")
    days = sorted({r.time.day for r in df.collect()})
    assert days == [3, 4]
