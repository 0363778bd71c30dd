"""S6 — catalog scan: dataset discovery via a declarative catalog file.

The reference pulls its test data through intake YAML catalogs
(``intake.open_catalog(...)['dataset'].to_dask()`` — reference
tests/make_test_data.ipynb cells 6-8; examples/regional data/
01_preprocess_extremes.ipynb). The Spark-native equivalent is a small
declarative catalog mapping dataset names to (driver, path, options);
``Catalog.read`` dispatches to the matching source reader so a user
never hard-codes storage paths in pipeline code.

Catalog format (YAML or JSON; intake-v1-flavoured):

    sources:
      sst_daily:
        driver: parquet              # parquet | zarr | netcdf | catalog
        args: {urlpath: "data/sst"}  # relative paths resolve against
        metadata: {description: ..} #   the catalog file's directory

Nested catalogs (``driver: catalog``) are addressed with dotted names
(``sub.dataset``), mirroring intake's sub-catalog traversal.

Scale note: the catalog file itself is metadata (driver-side, bytes);
every ``read`` returns a lazy distributed DataFrame from the underlying
source reader — nothing is materialised at open time.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from marex_spark.exceptions import CoordinateError, DataValidationError

_DRIVERS = ("parquet", "zarr", "netcdf", "catalog")


def _load_spec(path: str) -> dict:
    with open(path, "rb") as f:
        raw = f.read()
    text = raw.decode("utf-8")
    if path.endswith(".json"):
        spec = json.loads(text)
    else:
        import yaml  # PyYAML; stdlib-json fallback below for .json files

        spec = yaml.safe_load(text)
    if not isinstance(spec, dict) or not isinstance(spec.get("sources"), dict):
        raise DataValidationError(
            "catalog file must be a mapping with a top-level 'sources' dict",
            details={"path": path},
        )
    return spec


class Catalog:
    """A parsed catalog; ``read(spark, name)`` returns a lazy DataFrame."""

    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        self._dir = os.path.dirname(self.path)
        self._spec = _load_spec(self.path)
        self._subcats: dict[str, Catalog] = {}

    # -- discovery ---------------------------------------------------
    @property
    def sources(self) -> dict:
        return self._spec["sources"]

    def names(self) -> list[str]:
        """Flat list of addressable dataset names (dotted for nested)."""
        out = []
        for name, ent in sorted(self.sources.items()):
            if ent.get("driver") == "catalog":
                out.extend(f"{name}.{n}" for n in self._sub(name).names())
            else:
                out.append(name)
        return out

    def describe(self, name: str) -> dict:
        ent = self._entry(name)
        return {
            "name": name,
            "driver": ent.get("driver"),
            "args": dict(ent.get("args") or {}),
            "metadata": dict(ent.get("metadata") or {}),
        }

    # -- resolution --------------------------------------------------
    def _sub(self, name: str) -> "Catalog":
        if name not in self._subcats:
            ent = self.sources[name]
            self._subcats[name] = Catalog(self._resolve_path(ent))
        return self._subcats[name]

    def _entry(self, name: str) -> dict:
        head, _, rest = name.partition(".")
        if head not in self.sources:
            raise CoordinateError(
                f"dataset '{name}' not in catalog",
                details={"catalog": self.path, "available": self.names()},
            )
        ent = self.sources[head]
        if rest:
            if ent.get("driver") != "catalog":
                raise CoordinateError(
                    f"'{head}' is not a sub-catalog", details={"name": name}
                )
            return self._sub(head)._entry(rest)
        return ent

    def _resolve_path(self, ent: dict) -> str:
        args = ent.get("args") or {}
        p = args.get("urlpath") or args.get("path")
        if not p:
            raise DataValidationError(
                "catalog entry has no args.urlpath/path", details={"entry": ent}
            )
        if not os.path.isabs(p):
            p = os.path.join(self._dir, p)
        return p

    # -- reading -----------------------------------------------------
    def read(self, spark: SparkSession, name: str, **overrides) -> DataFrame:
        """Open dataset ``name`` as a lazy DataFrame via its driver."""
        head, _, rest = name.partition(".")
        if rest:
            return self._sub(head).read(spark, rest, **overrides)
        ent = self._entry(head)
        driver = ent.get("driver")
        if driver not in _DRIVERS:
            raise DataValidationError(
                f"unknown catalog driver '{driver}'",
                details={"name": name, "supported": list(_DRIVERS)},
            )
        path = self._resolve_path(ent)
        args = {
            k: v
            for k, v in (ent.get("args") or {}).items()
            if k not in ("urlpath", "path")
        }
        args.update(overrides)
        if driver == "parquet":
            # forward declared args + caller overrides as reader options
            # (mergeSchema, recursiveFileLookup, ...) — dropping them
            # silently honoured only part of the catalog entry
            return spark.read.options(**{k: str(v) for k, v in args.items()}).parquet(
                path
            )
        if driver == "zarr":
            from marex_spark.sources.zarr import ingest_zarr_gridded

            return ingest_zarr_gridded(spark, path, **args)
        if driver == "netcdf":
            # magic-dispatched (classic → record-range reader, HDF5 →
            # chunk-index reader); a glob or list entry becomes a
            # multi-file archive read
            from marex_spark.sources.io import (
                ingest_netcdf,
                ingest_netcdf_archive,
            )

            if "time_var" in args:  # classic-reader arg name accepted too
                args["time_dim"] = args.pop("time_var")
            if isinstance(path, (list, tuple)) or any(
                ch in str(path) for ch in "*?["
            ):
                return ingest_netcdf_archive(spark, path, **args)
            return ingest_netcdf(spark, path, **args)
        raise DataValidationError(  # driver == "catalog" with no rest
            f"'{name}' is a sub-catalog, not a dataset",
            details={"datasets": self._sub(head).names()},
        )

    def __repr__(self) -> str:  # pragma: no cover - debug nicety
        return f"Catalog({self.path!r}, datasets={self.names()!r})"


def open_catalog(path: str) -> Catalog:
    """Mirror of ``intake.open_catalog`` (reference
    tests/make_test_data.ipynb cell 6) for local YAML/JSON catalogs."""
    return Catalog(path)


def star_schema_catalog(sf_dir: str, out_path: str) -> str:
    """Write a catalog covering the driver's star-schema parquet tables
    (TESTDATA.md) — used by the s6 registry query and tests."""
    from marex_spark.sources.parquet import STAR_TABLES

    spec = {
        "sources": {
            t: {
                "driver": "parquet",
                "args": {"urlpath": os.path.join(sf_dir, f"{t}.parquet")},
                "metadata": {"table": t},
            }
            for t in STAR_TABLES
        }
    }
    with open(out_path, "w") as f:
        json.dump(spec, f, indent=1)
    return out_path
