"""Decomposition of detect_only_band_100x into cumulative stages
(guide §1.4; interleaved arms, min-of-N):
  scan        — parquet scan only (noop)
  shuffle     — scan + the band shuffle (noop)
  deser       — + mapInArrow that combines/flattens/gathers per band
                but skips the detect kernel (emits one row per band)
  full        — the real operator
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BAND = "/tmp/marex_bench_band_100x"


def main() -> None:
    from marex_spark.session import get_spark
    from marex_spark.operators.detect_blocked import (
        _band_shuffle,
        detect_extremes_blocked_packed,
    )

    spark = get_spark(app_name="ab_band_row_decomp", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    import pathlib
    for f in pathlib.Path(BAND).glob("*.parquet"):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    def arm_scan():
        spark.read.parquet(BAND).write.format("noop").mode("overwrite").save()

    def arm_shuffle():
        df = spark.read.parquet(BAND)
        _band_shuffle(df, "y", spark.sparkContext.defaultParallelism).write.format(
            "noop"
        ).mode("overwrite").save()

    def arm_deser():
        import numpy as np
        import pyarrow as pa

        def _run(batches):
            blist = list(batches)
            if not blist or sum(b.num_rows for b in blist) == 0:
                return
            tbl = pa.Table.from_batches(blist).combine_chunks()
            y = tbl["y"].to_numpy()
            ts = tbl["time"].cast(pa.int64()).to_numpy()
            vcol = tbl["vals"].combine_chunks()
            flat = vcol.flatten().to_numpy(zero_copy_only=False)
            mat_all = flat.reshape(len(y), -1)
            out = []
            for band in np.unique(y):
                rows = np.flatnonzero(y == band)
                order = np.argsort(ts[rows], kind="stable")
                m = mat_all[rows[order]]
                out.append(float(m[0, 0]))
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.asarray(out))], names=["v"]
            )

        df = spark.read.parquet(BAND)
        _band_shuffle(df, "y", spark.sparkContext.defaultParallelism).mapInArrow(
            _run, schema="v double"
        ).write.format("noop").mode("overwrite").save()

    def arm_full():
        detect_extremes_blocked_packed(
            spark.read.parquet(BAND),
            method_percentile="histogram",
            method_anomaly="detrend_harmonic",
            method_extreme="global_extreme",
        ).write.format("noop").mode("overwrite").save()

    arms = [("scan", arm_scan), ("shuffle", arm_shuffle), ("deser", arm_deser), ("full", arm_full)]
    res = {a: [] for a, _ in arms}
    for rep in range(int(os.environ.get("AB_REPS", "3"))):
        for name, fn in arms:
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            res[name].append(dt)
            print(f"rep{rep} {name}: {dt:.2f}s", flush=True)
        spark.catalog.clearCache()
    for name in res:
        print(f"{name}: min={min(res[name]):.2f}s all={['%.2f' % x for x in res[name]]}")
    spark.stop()


if __name__ == "__main__":
    main()
