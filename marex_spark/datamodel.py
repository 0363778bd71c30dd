"""Dimension-name mapping — the reference's ``dimensions`` /
``coordinates`` interface (reference detect.py:131-220
``_infer_dims_coords``; tracker dimensions default
``{"time": "time", "x": "lon", "y": "lat"}`` at track.py:119-127).

The engine's long format uses canonical column names (``time``, ``y``,
``x`` gridded / ``cell`` unstructured, ``value``).  Users whose tables
carry different names pass a mapping once instead of renaming by hand;
partial mappings default the rest, as the reference permits
(detect.py:165).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from marex_spark.exceptions import CoordinateError

DEFAULT_DIMENSIONS_GRIDDED = {"time": "time", "y": "y", "x": "x", "value": "value"}
DEFAULT_DIMENSIONS_UNSTRUCTURED = {"time": "time", "cell": "cell", "value": "value"}


def apply_dimensions(
    df: DataFrame,
    dimensions: dict | None,
    unstructured: bool = False,
    require: tuple[str, ...] | None = None,
) -> DataFrame:
    """Rename user columns to the engine's canonical names.

    ``dimensions`` maps canonical → actual (e.g. ``{"time": "t", "y":
    "lat_idx", "x": "lon_idx"}``); omitted keys default to themselves.
    Raises CoordinateError naming every missing column, with the
    frame's actual columns in the details (the reference's validation
    contract, detect.py:170-220)."""
    mapping = dict(
        DEFAULT_DIMENSIONS_UNSTRUCTURED if unstructured else DEFAULT_DIMENSIONS_GRIDDED
    )
    mapping.update(dimensions or {})
    want = require or tuple(k for k in mapping if k != "value")
    missing = {
        canon: actual
        for canon, actual in mapping.items()
        if canon in want and actual not in df.columns
    }
    if missing:
        raise CoordinateError(
            "mapped dimension columns not found in the DataFrame",
            details={"missing": missing, "columns": sorted(df.columns)},
            suggestions=["pass dimensions={'<canonical>': '<actual column>'}"],
        )
    out = df
    for canon, actual in mapping.items():
        if actual != canon and actual in out.columns:
            out = out.withColumnRenamed(actual, canon)
    return out
