#!/usr/bin/env python
"""NetCDF classic → parquet ingestion job CLI: land a (time, y, x)
variable from a CDF-1/CDF-2 file (reference detect.py:409 input) in
the engine's layouts — long (time, y, x, value) and/or packed
(time, y, vals array<float>). Core reader:
marex_spark/sources/netcdf.py (distributed record-range decode;
NetCDF-4/HDF5 containers need the xarray path, sources/io.py).

Usage:
    python tools/ingest_netcdf.py NC_PATH VAR OUT_PATH [--layout packed|long]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(2)
    nc_path, var, out = sys.argv[1:4]
    layout = "packed"
    if "--layout" in sys.argv:
        layout = sys.argv[sys.argv.index("--layout") + 1]

    from marex_spark.session import get_spark
    from marex_spark.sources.netcdf import ingest_netcdf_classic

    spark = get_spark("ingest_netcdf")
    df = ingest_netcdf_classic(spark, nc_path, var, layout=layout)
    df.write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    print(f"wrote {n} rows ({layout}) to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
