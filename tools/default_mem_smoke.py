"""Default-memory (1g driver, Spark's own default) smoke over the heavy
sf0.1 tiers — the measured answer to VERDICT r10 item 1's done-clause.

Round-8 recorded that a default-memory vanilla session OOMs the JVM on
the heavy dedup tiers at sf0.1 (GCLocker allocation stalls), which is
why ``tools/full_sweep.py`` pins the 24g repo session. Round 11 made
every collect_list kernel block bytes-aware (``kernel_block_count``,
operators/similarity.py) — this tool re-measures whether the 1g session
now clears the heavy tiers, oracle-compared, so the 24g requirement is
either deleted or carried with a recorded profile naming the stage that
still needs it.

Run:  python tools/default_mem_smoke.py [sf_dir] [query ...]

Each named query (default: the heavy-tier list below) runs in THIS
process's 1g session and hash-compares against its DuckDB oracle.
Outcome per query: ok/wall, rows_only/wall, or the exception class —
an OOM surfaces as java.lang.OutOfMemoryError / executor-lost, never a
silent pass.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The tiers full_sweep's harness note names as the OOM class (pair-join
# dedup + the 8-stage pipeline), plus one kernel-family representative
# per collect_list block site so the bytes-aware sizing itself is what
# the smoke exercises.
HEAVY = [
    "dedup_jaccard_prefix",
    "dedup_minhash_relational",
    "dedup_semantic",
    "dedup_semantic_gemm",
    "dedup_winnow_match",
    "pipeline_corpus_curation_v3",
    "sim_ivf_topk",
    "sim_pq_topk",
    "sim_pq_kmeans_topk",
    "text_repetition",
]


def main() -> None:
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = "1g"  # Spark's own default
    from ppdb_parser_spark.session import get_spark

    args = sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or HEAVY
    spark = get_spark(
        app_name="default-mem-smoke", master="local[16]", shuffle_partitions=32
    )
    mem = spark.conf.get("spark.driver.memory")
    print(f"driver.memory={mem} sf={sf}")
    import __spark_entry__ as e
    from ppdb_parser_spark.plans.oracle import compare_frames, duck_connect

    con = duck_connect(sf)
    qs, osql = e.queries(), e.oracle_sql()
    results = {}
    for n in names:
        t0 = time.time()
        try:
            spdf = qs[n](spark, sf).toPandas()
            if n in osql:
                r = compare_frames(n, spdf, con.execute(osql[n]).df())
                status = "ok" if r.ok else f"MISMATCH {r.detail}"
            else:
                status = "rows_only"
        except Exception as ex:  # noqa: BLE001 — record the class, keep going
            status = f"FAIL {type(ex).__name__}: {str(ex)[:200]}"
        wall = round(time.time() - t0, 2)
        results[n] = (status, wall)
        print(f"{n}: {status} ({wall}s)", flush=True)
    bad = {n: r for n, r in results.items() if not r[0].startswith(("ok", "rows"))}
    print(f"summary: {len(results) - len(bad)}/{len(results)} clean on 1g driver")
    if bad:
        print("needs-24g profile:", bad)


if __name__ == "__main__":
    main()
