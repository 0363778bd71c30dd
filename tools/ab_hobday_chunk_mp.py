"""32-way concurrent A/B of the NON-spatial hobday threshold's internal
x-chunk cap at the 8y x 80-col bench band (where _band_extremes' outer
chunk (~179 cols at T=2922) passes the full 80-wide band through, so
_thr_hobday's internal cap is the binding one).

  OPENBLAS_NUM_THREADS=1 python tools/ab_hobday_chunk_mp.py [nproc] [rounds]
"""

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

ARMS = [int(a) for a in os.environ.get("AB_ARMS", "256,32").split(",")]


def worker(args):
    seed, chunk_max = args
    import numpy as np

    from marex_spark.operators import detect_blocked as db

    db._THR_CHUNK_MAX = chunk_max
    rng = np.random.default_rng(seed)
    T, NX = 8 * 365 + 2, 80
    t = np.arange(T)
    m = (
        10
        + 3 * np.sin(2 * np.pi * t / 365.25)[:, None]
        + rng.normal(0, 1.2, (T, NX))
    )
    m[rng.random((T, NX)) < 0.01] = np.nan
    ut = (
        (np.datetime64("2000-01-01") + np.arange(T))
        .astype("datetime64[D]")
        .astype(np.int64)
    )
    doy0, years, days = db._time_parts(ut, "D", True, "UTC")
    p = db._kernel_params(
        method_anomaly="shifting_baseline", method_extreme="hobday_extreme",
        method_percentile="histogram", threshold_percentile=0.95,
        precision=0.01, max_anomaly=5.0, window_year_baseline=5,
        smooth_days=21, window_days_hobday=11, n_harmonics=2,
        detrend_orders=(1,), force_zero_mean=False,
    )
    t0 = time.perf_counter()
    ext, thr = db._band_extremes(m, doy0, years, days, p)
    dt = time.perf_counter() - t0
    return dt, float(np.nansum(thr)) + float(ext.sum())


def main() -> None:
    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    res = {c: [] for c in ARMS}
    sums = {}
    with mp.get_context("spawn").Pool(nproc) as pool:
        pool.map(worker, [(i, 256) for i in range(nproc)])
        for r in range(rounds):
            for chunk_max in ARMS:
                t0 = time.perf_counter()
                out = pool.map(
                    worker, [(100 + i, chunk_max) for i in range(nproc)]
                )
                wall = time.perf_counter() - t0
                times = [o[0] for o in out]
                key = tuple(round(o[1], 6) for o in out)
                sums.setdefault(key, set()).add(chunk_max)
                res[chunk_max].append(wall)
                print(
                    f"round{r} chunk={chunk_max}: wall={wall:.2f}s "
                    f"per-task min/med/max={min(times):.2f}/"
                    f"{sorted(times)[len(times)//2]:.2f}/{max(times):.2f}",
                    flush=True,
                )
    print(f"checksum groups (must be 1): {len(sums)}")
    for c in ARMS:
        print(f"chunk={c}: min wall={min(res[c]):.2f}s all={['%.2f' % x for x in res[c]]}")


if __name__ == "__main__":
    main()
