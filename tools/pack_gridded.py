#!/usr/bin/env python
"""Long-parquet → packed-layout ingestion job: convert a long gridded
table (time, y, x, value) into the packed layout (time, y,
vals array<float>) once, so every downstream blocked pass reads plain
float arrays (see operators/detect_blocked.pack_gridded and SCALE.md).

Usage:
    python tools/pack_gridded.py IN_PATH OUT_PATH NX [TIME_COL] [VALUE_COL]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(2)
    in_path, out_path, nx = sys.argv[1], sys.argv[2], int(sys.argv[3])
    time_col = sys.argv[4] if len(sys.argv) > 4 else "time"
    value_col = sys.argv[5] if len(sys.argv) > 5 else "value"
    from marex_spark.operators.detect_blocked import pack_gridded
    from marex_spark.session import get_spark
    from marex_spark.sources.io import add_time_bucket, write_region

    spark = get_spark("pack_gridded")
    long_df = spark.read.parquet(in_path)
    packed = pack_gridded(long_df, nx=nx, time_col=time_col, value_col=value_col)
    write_region(add_time_bucket(packed, time_col=time_col), out_path)
    print(f"wrote packed layout to {out_path}")


if __name__ == "__main__":
    main()
