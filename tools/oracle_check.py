"""Local mimic of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB, compare row count,
column names/types, and order-insensitive values.

Usage: python tools/oracle_check.py [--exact] [sf_dir] [name_filter ...]
(filters are substrings by default; --exact requires full-name matches)
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402


def normalize(rows, cols):
    """Sort columns by name, then rows; stringify values canonically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(v))
            else:
                vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out


def main():
    args = [a for a in sys.argv[1:] if a != "--exact"]
    exact = "--exact" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    name_filter = args[1:]

    import __spark_entry__ as entry_mod

    # Deliberately a PLAIN session — the driver harness constructs its own
    # unconfigured SparkSession, so verifying against get_spark() would hide
    # any dependence on marex_spark.session's configs (the round-1 nanos bug).
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("oracle_check_plain")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_noracle = 0
    failures = []
    for name, fn in sorted(qs.items()):
        if name_filter and (
            name not in name_filter
            if exact
            else not any(f in name for f in name_filter)
        ):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            n_noracle += 1
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            failures.append(name)
            continue
        sc, sn = normalize(s_rows, s_cols)
        dc, dn = normalize(d_rows, d_cols)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            n_fail += 1
            failures.append(name)
        elif len(sn) != len(dn):
            print(f"FAIL {name}: rowcount {len(sn)} vs {len(dn)}")
            n_fail += 1
            failures.append(name)
        elif sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {diff}")
            n_fail += 1
            failures.append(name)
        else:
            print(f"PASS {name} ({len(sn)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    if failures:
        print("failures:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
