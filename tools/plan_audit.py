#!/usr/bin/env python
"""Capture ``explain('formatted')`` for every registered query and print a
one-line plan-shape summary per query (Exchange count, join strategies,
Python-boundary nodes, pushdown state).

The optimization rounds' measure-first tool (guide §1): the captured
plans land under ``plans/r{NN}/<query>_<tag>.txt`` so before/after plan
claims in OPTIMIZATION_r{NN}.md are checkable without running Spark.

Usage:
    python tools/plan_audit.py DATA_DIR OUT_DIR TAG [--time] [name ...]

With ``--time`` each query is additionally executed through the noop
sink (min of 2 passes) — use on a quiet box only.
"""

from __future__ import annotations

import contextlib
import io
import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(plan: str) -> dict:
    return {
        "exchanges": len(
            re.findall(r"(?<!Broadcast)Exchange (?:hash|range|Single)", plan)
        ),
        "broadcasts": plan.count("BroadcastExchange"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bhj": plan.count("BroadcastHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "py_batch": plan.count("BatchEvalPython"),
        "py_arrow": plan.count("ArrowEvalPython"),
        "map_arrow": plan.count("MapInArrow") + plan.count("PythonMapInArrow"),
        "map_pandas": plan.count("MapInPandas"),
        "grp_pandas": plan.count("FlatMapGroupsInPandas"),
        "sorts": plan.count("Sort ["),
        "window": plan.count("Window ["),
        "pushed_empty": bool(re.search(r"PushedFilters: \[\]", plan)),
        "lines": plan.count("\n"),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_time = "--time" in sys.argv
    data_dir, out_dir, tag = args[0], args[1], args[2]
    names = args[3:]

    from marex_spark.session import get_spark
    from marex_spark.queries import QUERIES

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="plan-audit")

    rows = []
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        try:
            df = fn(spark, data_dir)
            plan = formatted_plan(df)
            (out / f"{name}_{tag}.txt").write_text(plan)
            s = summarize(plan)
            if do_time:
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    df.write.mode("overwrite").format("noop").save()
                    best = min(best, time.perf_counter() - t0)
                s["sec"] = round(best, 3)
            s["name"] = name
            rows.append(s)
            print(json.dumps(s), flush=True)
        except Exception as e:  # keep auditing remaining queries
            print(
                json.dumps({"name": name, "err": f"{type(e).__name__}: {e}"[:200]}),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
