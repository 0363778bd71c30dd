"""32-way concurrent A/B of the x-chunked band kernel vs full-band:
models the real detect stage (32 single-thread tasks hammering DRAM at
once). Each worker runs _band_extremes on its own 30y x 480 band;
makespan per arm is the metric. Arms interleave full/chunked rounds.

  OPENBLAS_NUM_THREADS=1 python tools/ab_band_chunk_mp.py [nproc] [rounds]
"""

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")


def worker(args):
    seed, budget = args
    import numpy as np

    from marex_spark.operators import detect_blocked as db

    if budget:
        db._BAND_CHUNK_BUDGET = budget
    else:
        db._BAND_CHUNK_BUDGET = 1 << 62  # effectively full-band
    rng = np.random.default_rng(seed)
    T, NX = 10957, 480
    t = np.arange(T)
    m = (
        10
        + 3 * np.sin(2 * np.pi * t / 365.25)[:, None]
        + rng.normal(0, 1.2, (T, NX))
    )
    m[rng.random((T, NX)) < 0.01] = np.nan
    m = m.astype(np.float32).astype(np.float64)
    ut = (
        (np.datetime64("1990-01-01") + np.arange(T))
        .astype("datetime64[D]")
        .astype(np.int64)
    )
    doy0, years, days = db._time_parts(ut, "D", True, "UTC")
    p = db._kernel_params(
        method_anomaly="detrend_harmonic", method_extreme="global_extreme",
        method_percentile="histogram", threshold_percentile=0.95,
        precision=0.01, max_anomaly=5.0, window_year_baseline=5,
        smooth_days=21, window_days_hobday=11, n_harmonics=2,
        detrend_orders=(1,), force_zero_mean=False,
    )
    t0 = time.perf_counter()
    db._band_extremes(m, doy0, years, days, p)
    return time.perf_counter() - t0


def main() -> None:
    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    res = {"full": [], "chunked": []}
    with mp.get_context("spawn").Pool(nproc) as pool:
        # warm the pool (imports, numpy)
        pool.map(worker, [(i, 4 << 20) for i in range(nproc)])
        for r in range(rounds):
            for name, budget in (("full", 0), ("chunked", 4 << 20)):
                t0 = time.perf_counter()
                times = pool.map(worker, [(100 + i, budget) for i in range(nproc)])
                wall = time.perf_counter() - t0
                res[name].append(wall)
                print(
                    f"round{r} {name}: wall={wall:.2f}s "
                    f"per-task min/med/max={min(times):.2f}/"
                    f"{sorted(times)[len(times)//2]:.2f}/{max(times):.2f}",
                    flush=True,
                )
    for name in res:
        print(f"{name}: min wall={min(res[name]):.2f}s all={['%.2f' % x for x in res[name]]}")


if __name__ == "__main__":
    main()
