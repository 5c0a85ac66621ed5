"""Split a named registry query's timed wall into plan-BUILD phase vs
forced ACTION — the round-16 probe behind the plan-construction work
(OPTIMIZATION_r16.md §11). The bench's timed region is
``fn(spark, sf_dir)`` + the forced-hash action, so Python-side
expression construction, py4j round trips, and the AQE-eager
materialization inside lazy ``localCheckpoint`` calls all land in the
"build" half; profiling (cProfile over fn) tells them apart.

Run: python tools/build_split.py name1 name2 ... [--sf DIR] [--profile]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--profile",
        action="store_true",
        help="cProfile the build phase (top-25 cumulative)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F  # noqa: E402

    from ppdb_parser_spark.queries import REGISTRY  # noqa: E402
    from ppdb_parser_spark.session import get_spark  # noqa: E402

    spark = get_spark(app_name="build-split")
    for name in args.names:
        fn = REGISTRY[name].fn
        fn(spark, args.sf)  # warm: JVM, codegen caches, loader stamps
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            df.select(
                F.bit_xor(F.xxhash64(F.struct("*"))).alias("h")
            ).collect()
            t2 = time.perf_counter()
            print(f"{name}: build={t1 - t0:.3f}s action={t2 - t1:.3f}s")
        if args.profile:
            import cProfile
            import io
            import pstats

            pr = cProfile.Profile()
            pr.enable()
            fn(spark, args.sf)
            pr.disable()
            s = io.StringIO()
            pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(
                25
            )
            print(s.getvalue())


if __name__ == "__main__":
    main()
