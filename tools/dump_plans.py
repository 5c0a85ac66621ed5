"""Dump `.explain("formatted")` for named registry queries to
plans/<tag>/<name>_<suffix>.txt — the optimization round's plan-evidence
artifact (OPTIMIZATION_r15.md references these files).

Run: python tools/dump_plans.py --tag r15 --suffix before [names ...]
     (no names => every bench=True headliner)
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from ppdb_parser_spark.plans.checks import plan_string
    from ppdb_parser_spark.queries import REGISTRY
    from ppdb_parser_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    names = args.names or [n for n, s in REGISTRY.items() if s.bench]
    out_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        plan = plan_string(REGISTRY[name].fn(spark, args.sf))
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
