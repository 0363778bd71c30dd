"""Same-box A/B of the executor BLAS-thread cap (session.py, commit
f49096c) on the numpy-kernel detect rows, per the r7 verdict watch
item: quiet floors of detect_only_fixed_hobday_10x drifted +15-25% in
r7 and the cap was the only engine change touching those rows.

Each arm runs in a FRESH subprocess (fresh JVM + fresh Python workers,
so the env cap genuinely applies/unapplies), arms interleaved
A B A B ... to decorrelate from ambient load. Within a child each row
is timed twice and the min kept (first run absorbs residual JIT).

Usage: python tools/ab_blas_cap.py [n_reps]   (default 3)
Child mode (internal): python tools/ab_blas_cap.py --child cap1|uncapped
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROWS = ("detect_only_10x", "detect_only_fixed_hobday_10x")
PACKED_10X = "/tmp/marex_bench_packed_10x"


def child(arm: str) -> None:
    from marex_spark.session import get_spark

    extra = {}
    if arm == "uncapped":
        # revert the session cap: numpy's OpenBLAS default is ncpu
        # threads per worker process (what the engine shipped pre-r7)
        ncpu = str(os.cpu_count() or 32)
        extra = {
            "spark.executorEnv.OPENBLAS_NUM_THREADS": ncpu,
            "spark.executorEnv.OMP_NUM_THREADS": ncpu,
            "spark.executorEnv.MKL_NUM_THREADS": ncpu,
        }
    spark = get_spark(app_name=f"ab-blas-{arm}", extra_conf=extra)
    from marex_spark.operators.detect_blocked import (
        detect_track_packed,
        materialize_packed_bench,
    )
    from marex_spark.pipeline import detect_track_bench

    if not Path(PACKED_10X).exists():
        materialize_packed_bench(spark, 1.0, PACKED_10X)
    detect_track_bench(spark, 0.001)  # warm JIT/codegen/UDF workers

    def run(name: str) -> None:
        kwargs = {"track": False}
        if name == "detect_only_fixed_hobday_10x":
            kwargs.update(
                method_anomaly="detrend_fixed_baseline",
                method_extreme="hobday_extreme",
            )
        detect_track_packed(spark, 1.0, PACKED_10X, **kwargs)
        spark.catalog.clearCache()

    out = {}
    for name in ROWS:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(name)
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    print("ABRESULT " + json.dumps({"arm": arm, "rows": out}), flush=True)
    spark.stop()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results: dict[str, dict[str, list[float]]] = {
        a: {r: [] for r in ROWS} for a in ("cap1", "uncapped")
    }
    for rep in range(reps):
        for arm in ("cap1", "uncapped"):
            p = subprocess.run(
                [sys.executable, __file__, "--child", arm],
                capture_output=True, text=True, timeout=900,
            )
            line = next(
                (l for l in p.stdout.splitlines() if l.startswith("ABRESULT ")),
                None,
            )
            if line is None:
                print(f"rep{rep} {arm}: CHILD FAILED\n{p.stderr[-2000:]}")
                continue
            rows = json.loads(line[len("ABRESULT "):])["rows"]
            for r, v in rows.items():
                results[arm][r].append(v)
            print(f"rep{rep} {arm}: {rows}", flush=True)
    print(json.dumps(results, indent=2))
    for r in ROWS:
        a = min(results["cap1"][r] or [float("nan")])
        b = min(results["uncapped"][r] or [float("nan")])
        print(f"{r}: cap1 min {a:.2f}s  uncapped min {b:.2f}s  ratio {a / b:.2f}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(sys.argv[2])
    else:
        main()
