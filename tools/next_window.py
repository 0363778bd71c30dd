"""Compute the next round's driver-window rotation plan.

The driver verifies the FIRST 50 registry entries each round
(CORRECTNESS_r{N}.json records which). The standing policy
(queries/__init__.py): never-driver-verified rows first, then
engine-changed rows, then 2 sentinels, then the stalest
previously-green rows, oldest last-verified round first.

This tool PRINTS the computed plan — it does not edit the registry.
Usage:
    python tools/next_window.py [--assume-current-window-green]

``--assume-current-window-green`` treats the current first-50 as
verified THIS round (use mid-round, before the driver has written
its CORRECTNESS file).
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    assume_green = "--assume-current-window-green" in sys.argv

    last: dict[str, int] = {}
    max_round = 0
    for f in sorted(glob.glob(str(Path(__file__).parent.parent / "CORRECTNESS_r*.json"))):
        rnd = int("".join(ch for ch in Path(f).stem.split("_r")[1] if ch.isdigit()))
        max_round = max(max_round, rnd)
        for name, rec in json.load(open(f)).items():
            ok = rec is True or (
                isinstance(rec, dict)
                and not rec.get("err")
                and all(
                    rec.get(k) is True
                    for k in ("rows_match", "schema_match", "hash_match")
                )
            )
            if ok:
                last[name] = max(last.get(name, 0), rnd)

    import marex_spark.queries as q

    names = list(q.QUERIES)
    window = names[:50]
    if assume_green:
        for n in window:
            last[n] = max_round + 1

    never = [n for n in names if n not in last]
    stale = sorted((last[n], n) for n in names if n in last)

    print(f"# registry: {len(names)} | verified at least once: {len(last)}")
    if never:
        print(f"# NEVER driver-verified ({len(never)}) — these lead the window:")
        for n in never:
            print(f"  {n}")
    print("# stalest 60 (last-verified round, name) — fill the window oldest-first,")
    print("# after never-verified + engine-changed rows + 2 sentinels:")
    for rnd, n in stale[:60]:
        print(f"  r{rnd} {n}")


if __name__ == "__main__":
    main()
