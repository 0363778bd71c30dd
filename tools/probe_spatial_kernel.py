"""Single-thread decomposition of the spatial-hobday band kernel at the
bench geometry (8y daily x 40x80, 5x5 pooling): how long do the 5 halo
anomaly passes and the pooled threshold take per band?

Run single-threaded (the kernel runs one band per task):
  OPENBLAS_NUM_THREADS=1 OMP_NUM_THREADS=1 python tools/probe_spatial_kernel.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from marex_spark.operators.detect_blocked import (
    _anomaly_of,
    _kernel_params,
    _thr_hobday_spatial,
    _time_parts,
)


def main() -> None:
    T = 8 * 365 + 2
    NX = 80
    rng = np.random.default_rng(3)
    ut = (np.datetime64("2000-01-01") + np.arange(T)).astype("datetime64[D]").astype(np.int64)
    doy0, years, days = _time_parts(ut, "D", True, "UTC")
    p = _kernel_params(
        method_anomaly="shifting_baseline",
        method_extreme="hobday_extreme",
        method_percentile="histogram",
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
    p["spatial_window"] = 5

    mats = {
        y: 10 + 3 * np.sin(2 * np.pi * np.arange(T) / 365.25)[:, None]
        + rng.normal(0, 1.2, (T, NX))
        for y in range(5)
    }

    for rep in range(3):
        t0 = time.perf_counter()
        anoms = {
            y: _anomaly_of(m, doy0, years, days, p) for y, m in mats.items()
        }
        t_anom = time.perf_counter() - t0
        t0 = time.perf_counter()
        thr = _thr_hobday_spatial(
            anoms, 2, doy0, p["q"], p["window_days_hobday"],
            p["spatial_window"], p["precision"], p["max_anomaly"], NX,
        )
        t_thr = time.perf_counter() - t0
        print(
            f"rep {rep}: 5x anomaly={t_anom:.3f}s  spatial_thr={t_thr:.3f}s"
            f"  (per-band total ~{t_anom + t_thr:.3f}s)",
            flush=True,
        )
    print("thr nan frac:", float(np.isnan(thr).mean()))


if __name__ == "__main__":
    main()
