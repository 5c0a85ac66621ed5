"""Isolated per-query walls: back-to-back min-of-N forced-hash runs for
named registry queries — the round-15 optimization loop's primary
measurement (guide §1: measure first; consecutive runs, not interleaved,
so the number measures the plan, not neighbors' GC/codegen churn).

Run: python tools/isolate_bench.py q1 q2 ... [--sf DIR] [--n N]
     [--conf k=v ...]

Prints one JSON line {"sf": ..., "n": N, "conf": {...},
"walls": {name: min_sec}, "runs": {name: [s, ...]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    extra = dict(kv.split("=", 1) for kv in args.conf)

    from bench import force_full  # noqa: E402 — repo root on sys.path
    from ppdb_parser_spark.queries import REGISTRY  # noqa: E402
    from ppdb_parser_spark.session import get_spark  # noqa: E402

    spark = get_spark(app_name="isolate-bench", extra_conf=extra or None)
    # conf overrides that are plain runtime SQL confs apply even when an
    # earlier session exists (getOrCreate reuses it); set them explicitly
    # so A/B runs inside one JVM are honest.
    for k, v in extra.items():
        try:
            spark.conf.set(k, v)
        except Exception as e:  # static confs can't be set post-start
            print(f"WARN conf {k} not applied: {e}", file=sys.stderr)

    walls: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in args.names:
        spec = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"isolate:{name}")
        force_full(spec.fn(spark, args.sf))  # warm-up (codegen, scans)
        ts = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            force_full(spec.fn(spark, args.sf))
            ts.append(round(time.perf_counter() - t0, 3))
        runs[name] = ts
        walls[name] = min(ts)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": args.sf, "n": args.n, "conf": extra,
                      "walls": walls, "runs": runs}))


if __name__ == "__main__":
    main()
