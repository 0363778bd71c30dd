"""Standalone (no Spark) A/B of x-chunked _band_extremes vs the full-band
form on the detect_only_band_100x geometry: 30y daily x 480 columns,
detrend_harmonic + histogram global threshold. Every op in that path is
column-separable, so chunking must be BIT-identical; the win, if any,
comes from the per-band temporaries (safe/bins/flat/anom ~350 MB) being
cache-resident per chunk instead of DRAM round-trips.

Run single-threaded (the kernel runs one band per task):
  OPENBLAS_NUM_THREADS=1 OMP_NUM_THREADS=1 python tools/ab_band_chunk.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from marex_spark.operators.detect_blocked import (
    _band_extremes,
    _kernel_params,
    _time_parts,
)


def make_band(T, NX, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(T)
    base = 10 + 3 * np.sin(2 * np.pi * t / 365.25)[:, None]
    m = base + 0.002 * t[:, None] + rng.normal(0, 1.2, (T, NX))
    # sprinkle NaNs like gappy cells
    nan_mask = rng.random((T, NX)) < 0.01
    m[nan_mask] = np.nan
    return m.astype(np.float32).astype(np.float64)


def chunked_band_extremes(m, doy0, years, days, p, chunk):
    T, NX = m.shape
    ext = np.zeros((T, NX), dtype=bool)
    thr_parts = []
    for c0 in range(0, NX, chunk):
        c1 = min(c0 + chunk, NX)
        e, t = _band_extremes(np.ascontiguousarray(m[:, c0:c1]), doy0, years, days, p)
        ext[:, c0:c1] = e
        thr_parts.append(t)
    thr = np.concatenate(thr_parts, axis=-1)
    return ext, thr


def main() -> None:
    configs = [
        ("band100x", dict(method_anomaly="detrend_harmonic",
                          method_extreme="global_extreme",
                          method_percentile="histogram")),
        ("hobday", dict(method_anomaly="fixed_baseline",
                        method_extreme="hobday_extreme",
                        method_percentile="histogram")),
    ]
    T = 10957
    NX = 480
    m = make_band(T, NX)
    ut = (np.datetime64("1990-01-01") + np.arange(T)).astype("datetime64[D]").astype(np.int64)
    doy0, years, days = _time_parts(ut, "D", True, "UTC")

    for name, kw in configs:
        p = _kernel_params(
            method_anomaly=kw["method_anomaly"],
            method_extreme=kw["method_extreme"],
            method_percentile=kw["method_percentile"],
            threshold_percentile=0.95,
            precision=0.01,
            max_anomaly=5.0,
            window_year_baseline=5,
            smooth_days=21,
            window_days_hobday=11,
            n_harmonics=2,
            detrend_orders=(1,),
            force_zero_mean=False,
        )
        ext0, thr0 = _band_extremes(m, doy0, years, days, p)
        for chunk in (16, 32, 64, 128):
            ext1, thr1 = chunked_band_extremes(m, doy0, years, days, p, chunk)
            same = np.array_equal(ext0, ext1) and np.array_equal(
                thr0, thr1, equal_nan=True
            )
            print(f"{name} chunk={chunk}: identical={same}", flush=True)
        reps = 3
        res = {}
        for arm, fn in [
            ("full", lambda: _band_extremes(m, doy0, years, days, p)),
            ("c32", lambda: chunked_band_extremes(m, doy0, years, days, p, 32)),
            ("c64", lambda: chunked_band_extremes(m, doy0, years, days, p, 64)),
            ("c128", lambda: chunked_band_extremes(m, doy0, years, days, p, 128)),
        ]:
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            res[arm] = min(ts)
            print(f"{name} {arm}: min={min(ts):.3f}s all={['%.3f' % x for x in ts]}",
                  flush=True)


if __name__ == "__main__":
    main()
