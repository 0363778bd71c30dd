"""32-way concurrent A/B of the dense morphology kernel's sub-batch
size at PRODUCTION grid dims (720 x 1440 — 1 MB of bools per slice,
invisible at bench dims where a whole partition is ~3.5 MB): each
worker runs close-then-open (R=4 separable disk) over 60 slices,
stacked at different sub-batch depths. Values are slice-independent so
batch depth cannot change them (checksummed).

  OPENBLAS_NUM_THREADS=1 python tools/ab_morph_batch_mp.py [nproc] [rounds]
"""

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

ARMS = [64_000_000, 8_000_000, 2_000_000]  # sub-batch bool budget


def worker(args):
    seed, budget = args
    import numpy as np

    from marex_spark.operators.morphology import (
        _dilate_np,
        _erode_np,
        disk_offsets,
    )

    rng = np.random.default_rng(seed)
    T, NY, NX = 60, 720, 1440
    offsets = disk_offsets(4)
    # sparse-ish extremes field (~5% fill), like a detect output
    g_all = rng.random((T, NY, NX)) < 0.05
    per = max(1, budget // (NY * NX))
    t0 = time.perf_counter()
    total = 0
    for lo in range(0, T, per):
        g = g_all[lo : lo + per]
        closed = _erode_np(_dilate_np(g, offsets, True), offsets, True)
        opened = _dilate_np(_erode_np(closed, offsets, True), offsets, True)
        total += int(opened.sum())
    return time.perf_counter() - t0, total


def main() -> None:
    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    res = {c: [] for c in ARMS}
    sums = {}
    with mp.get_context("spawn").Pool(nproc) as pool:
        pool.map(worker, [(i, ARMS[0]) for i in range(nproc)])  # warm
        for r in range(rounds):
            for budget in ARMS:
                t0 = time.perf_counter()
                out = pool.map(worker, [(100 + i, budget) for i in range(nproc)])
                wall = time.perf_counter() - t0
                times = [o[0] for o in out]
                key = tuple(o[1] for o in out)
                sums.setdefault(key, set()).add(budget)
                res[budget].append(wall)
                print(
                    f"round{r} budget={budget//1_000_000}M: wall={wall:.2f}s "
                    f"per-task min/med/max={min(times):.2f}/"
                    f"{sorted(times)[len(times)//2]:.2f}/{max(times):.2f}",
                    flush=True,
                )
    print(f"checksum groups (must be 1): {len(sums)}")
    for c in ARMS:
        print(
            f"budget={c//1_000_000}M: min wall={min(res[c]):.2f}s "
            f"all={['%.2f' % x for x in res[c]]}"
        )


if __name__ == "__main__":
    main()
