"""Driver simulation (the verify skill's main drive, as a script).

Runs the full __spark_entry__ contract the way the external driver does:
a VANILLA SparkSession (none of our session factory's configs) with a
non-UTC timezone, every queries() entry executed at sf0.01 and compared
against its oracle_sql() with the dtype-strict local comparator.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from ppdb_parser_spark.plans.oracle import compare_frames, duck_connect

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    rows = e.entry(spark).collect()
    assert len(rows) > 0, "entry smoke failed"

    con = duck_connect(sf)
    qs, osql = e.queries(), e.oracle_sql()
    fails: list[str] = []
    t0 = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spdf = fn(spark, sf).toPandas()
        if name in osql:
            r = compare_frames(name, spdf, con.execute(osql[name]).df())
            if not r.ok:
                print("FAIL", name, r.detail)
                fails.append(name)
        else:
            # the driver's rows-only canonicalizer: must sort without error
            if len(spdf.columns):
                spdf.sort_values(by=list(spdf.columns), kind="mergesort")
            print("ROWS-ONLY", name, len(spdf), "rows")
    n = len(only) if only else len(qs)
    print(f"FAILS: {fails} ({n} queries, {time.time() - t0:.0f}s)")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
