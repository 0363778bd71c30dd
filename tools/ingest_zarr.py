#!/usr/bin/env python
"""Zarr → parquet ingestion job CLI: land a gridded zarr array (the
reference's native input, helper.py:733-736) in the engine's layouts —
long (time, y, x, value) and/or packed (time, y, vals array<float>).
Core reader: marex_spark/sources/zarr.py (distributed chunk decode).

Usage:
    python tools/ingest_zarr.py STORE_PATH VAR OUT_PATH [--layout packed|long]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(2)
    store, var, out = sys.argv[1:4]
    layout = "packed"
    if "--layout" in sys.argv:
        layout = sys.argv[sys.argv.index("--layout") + 1]
    from marex_spark.session import get_spark
    from marex_spark.sources.io import add_time_bucket, write_region
    from marex_spark.sources.zarr import ingest_zarr_gridded

    spark = get_spark("ingest_zarr")
    df = ingest_zarr_gridded(spark, store, var, layout=layout)
    write_region(add_time_bucket(df), out)
    print(f"wrote {layout} layout to {out}")


if __name__ == "__main__":
    main()
