"""Per-query DuckDB oracle check for NAMED registry queries — the
round-15 optimization loop's fast equivalence gate (full_sweep.py runs
all 270; this runs just the queries a change touched).

Run: python tools/oracle_check.py name1 name2 ... [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    import __spark_entry__ as e
    from ppdb_parser_spark.plans.oracle import compare_frames, duck_connect
    from ppdb_parser_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duck_connect(args.sf)
    qs, osql = e.queries(), e.oracle_sql()
    fails = 0
    for name in args.names:
        spdf = qs[name](spark, args.sf).toPandas()
        if name not in osql:
            print(f"{name}: rows-only ({len(spdf)} rows, ran clean)")
            continue
        r = compare_frames(name, spdf, con.execute(osql[name]).df())
        print(f"{name}: {'OK' if r.ok else 'FAIL ' + str(r.detail)}")
        fails += 0 if r.ok else 1
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
