"""Full-registry oracle sweep at an arbitrary SF (default sf0.1).

The per-round driver checks a 50-query prefix at sf0.01; this tool is the
stronger artifact recorded in BASELINE.md §"full-registry parity": every
registered query's value-hash compared against its DuckDB oracle at the
given scale. Rows-only queries execute (must not error) but skip the
compare.

Run:  python tools/full_sweep.py [sf_dir]

Memory: the round-8 note here ("a default-memory vanilla session OOMs
the JVM on the heavy dedup tiers at sf0.1, GCLocker stalls") is CLOSED
as of round 11 — the bytes-aware kernel block sizing
(``kernel_block_count``, operators/similarity.py) removed the oversized
collect_list blocks, and ``tools/default_mem_smoke.py`` measures all ten
heavy-tier queries oracle-clean on a 1g (Spark-default) driver at sf0.1.
The sweep therefore no longer pins 24g: it runs on whatever
``SPARK_GRAFT_DRIVER_MEM`` says (repo default 24g purely for wall-clock
headroom — GC pressure at 1g costs time, not correctness).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from ppdb_parser_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="full-sweep", master="local[16]", shuffle_partitions=32
    )
    import __spark_entry__ as e
    from ppdb_parser_spark.plans.oracle import compare_frames, duck_connect

    con = duck_connect(sf)
    qs, osql = e.queries(), e.oracle_sql()
    t0 = time.time()
    fails, rows_only = [], []
    for name, fn in sorted(qs.items()):
        try:
            spdf = fn(spark, sf).toPandas()
            if name in osql:
                r = compare_frames(name, spdf, con.execute(osql[name]).df())
                if not r.ok:
                    fails.append((name, r.detail))
                    print("FAIL", name, r.detail, flush=True)
            else:
                rows_only.append((name, len(spdf)))
        except Exception as ex:  # noqa: BLE001 — report and continue
            fails.append((name, str(ex)[:200]))
            print("ERR", name, str(ex)[:200], flush=True)
    print(
        f"SWEEP DONE: {len(qs)} queries, {len(fails)} fails, "
        f"{len(rows_only)} rows-only, {time.time() - t0:.0f}s"
    )
    print("ROWS-ONLY:", sorted(n for n, _ in rows_only))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
