"""Forced per-stage walls for the two slowest headliners (VERDICT r12
next-round #5 — the curation-v3 method applied to `dedup_jaccard_prefix`
and `dedup_minhash_relational`).

Each operator exposes its stage boundaries through the `stage_probe` hook
(pure plan objects). Stages are forced IN PLAN ORDER with bench.py's
full-column xxhash64 reduction; because the operators' lazy cut points
(`localCheckpoint(eager=False)`) materialize on first action and are
reused afterwards, each wall is the INCREMENTAL cost of that stage given
everything upstream already materialized — the same decomposition a
single full action pays internally. The final row re-times the complete
query cold (fresh plan, no probe) as the cross-check that Σ stages ≈
full wall.

Run: python tools/stage_walls.py [sf_dir]  (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ppdb_parser_spark.operators import dedup as DD  # noqa: E402
from ppdb_parser_spark.session import get_spark  # noqa: E402
from ppdb_parser_spark.sources.tables import load_table  # noqa: E402


def force(df) -> float:
    t0 = time.perf_counter()
    df.select(F.bit_xor(F.xxhash64(F.struct("*"))).alias("h")).collect()
    return round(time.perf_counter() - t0, 3)


def staged(name: str, build) -> dict[str, float]:
    probe: dict = {}
    full = build(probe)
    walls: dict[str, float] = {}
    for key, inter in probe.items():
        walls[key] = force(inter)
    walls["tail"] = force(full)
    # cold full-query cross-check on a FRESH plan (new probe-less build →
    # new localCheckpoint instances, nothing pre-materialized)
    walls["full_cold"] = force(build(None))
    print(name, json.dumps(walls))
    return walls


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="stage-walls")
    docs = load_table(spark, sf_dir, "documents")

    # match the registry queries' parameters exactly
    from ppdb_parser_spark.queries.dedup import _MH_BANDS, _MH_N, _par

    nparts = _par(spark)

    def build_prefix(probe):
        return DD.jaccard_pairs_prefix(
            docs, threshold=0.5, min_partitions=nparts, stage_probe=probe
        )

    def build_minhash(probe):
        return DD.minhash_match(
            docs,
            n_hashes=_MH_N,
            n_bands=_MH_BANDS,
            threshold=0.3,
            min_partitions=nparts,
            stage_probe=probe,
        )

    # warm-up: JVM + codegen, exactly as bench.py does
    force(build_prefix(None))
    force(build_minhash(None))

    out = {
        "dedup_jaccard_prefix": staged("dedup_jaccard_prefix", build_prefix),
        "dedup_minhash_relational": staged(
            "dedup_minhash_relational", build_minhash
        ),
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
