"""Benchmark harness: times the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. The FINAL
stdout line is the driver's gate artifact — one JSON object
{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...} kept under the driver's
2000-char tail-capture budget (ms-rounded walls; spreads/fallbacks print
as separate earlier lines). The complete record including all raw runs
is also written to $SPARK_GRAFT_BENCH_OUT (default ./bench_results.json)
so the repo carries its own numbers.

Each query is executed by reducing ``xxhash64`` over EVERY output column
to one row JVM-side (forces the full plan without driver-side toPandas
transfer noise). Rounds 1-6 used ``.count()`` here, which let Catalyst
ELIMINATE cardinality-preserving work — a left join on a unique key (and
every projection feeding only it) contributes rows but no count, so e.g.
``dedup_semantic``'s entire dominated-pair scan was optimized out of its
round-6 number (measured round 7: 0.43s counted vs 2.99s materialized).
The hash reduction keeps every output column live, so the timing covers
the plan users actually run; BASELINE.md round-7 notes carry both-method
numbers for the affected queries. A warm-up pass absorbs JVM/codegen
startup, then each query is timed three times and the MINIMUM is
reported: this host shows ±30 % background-load variance run-to-run —
round 4's artifact recorded a 2.6× uniform slowdown with byte-identical
plans purely from host contention (verdict r4) — and min-of-3
steady-state measures the plan, not the host.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from ppdb_parser_spark.queries import REGISTRY
from ppdb_parser_spark.session import get_spark


def force_full(df) -> str:
    """Materialize every output column JVM-side: one-row bit_xor of the
    per-row xxhash64 over all columns (bit_xor, not sum — summing int64
    hashes overflows under ANSI mode on enough rows; the old bare-except
    then silently degraded exactly those queries to count(), the failure
    mode this function exists to eliminate). Map- and variant-typed
    columns are not hashable in Spark — route them through
    ``to_json``/string first.

    Returns the method used: ``"hash"`` (the intended full-plan
    methodology), ``"json"`` (whole-row to_json hash — still forces every
    column), or ``"count"`` (weakest: Catalyst may eliminate work; only
    legal for schemas to_json cannot serialize). Only analysis-time
    failures (unhashable/unserializable schema) trigger a fallback —
    genuine EXECUTION errors propagate, so a query that breaks under full
    materialization fails the bench loudly instead of being silently
    timed with a weaker methodology (ADVICE r7)."""
    from pyspark.errors import AnalysisException

    cols = []
    for f in df.schema.fields:
        s = f.dataType.simpleString()
        c = F.col(f.name)
        if "map<" in s:
            c = F.to_json(F.struct(c))
        elif "variant" in s:
            c = c.cast("string")
        cols.append(c)
    try:
        df.select(F.bit_xor(F.xxhash64(F.struct(*cols))).alias("h")).collect()
        return "hash"
    except AnalysisException:
        pass
    try:
        df.select(
            F.bit_xor(F.xxhash64(F.to_json(F.struct("*")))).alias("h")
        ).collect()
        return "json"
    except AnalysisException:
        df.count()
        return "count"


#: Queries whose in-bench walls have drifted above baseline under
#: interleave while consecutive-run probes sat AT baseline (VERDICT r13
#: #6 names the decontaminate pair as the worst two shared-subset ratios
#: two rounds running; the jaccard/minhash family showed the same
#: signature in r12/r13). Each gets an isolated back-to-back min-of-3
#: beside the interleaved number in the bench record.
_ISOLATED_CROSSCHECK = (
    "pipeline_decontaminate",
    "pipeline_decontaminate_bloom",
    "dedup_minhash_relational",
    "dedup_jaccard_prefix",
    # round 15 (VERDICT r14 #2): the sim_lsh family carried the round's
    # worst baseline ratios (1.51-1.61x) with no isolated probe to
    # separate host drift from regression, and sim_ivf_persisted_topk
    # measured above its pin four consecutive runs. Plus the two
    # operators whose internals changed this round (winnow int64
    # fingerprints, minhash int64 signatures ride the relational probe
    # above; winnow_match gets its own).
    "sim_lsh_pairs_checked",
    "sim_lsh_jl_screened_pairs",
    "sim_lsh_multiprobe_topk",
    "sim_ivf_persisted_topk",
    "dedup_winnow_match",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="ppdb-parser-spark-bench")

    bench_specs = [s for s in REGISTRY.values() if s.bench]
    # Warm-up pass over every headline query: amortizes JVM startup +
    # whole-stage-codegen compilation exactly as a long-lived cluster does,
    # so timings below reflect steady-state execution.
    methods: dict[str, str] = {}
    for spec in bench_specs:
        methods[spec.name] = force_full(spec.fn(spark, sf_dir))

    runs: dict[str, list[float]] = {s.name: [] for s in bench_specs}
    for _ in range(3):
        for spec in bench_specs:
            t0 = time.perf_counter()
            force_full(spec.fn(spark, sf_dir))
            runs[spec.name].append(round(time.perf_counter() - t0, 4))

    # Isolated-wall cross-check (VERDICT r13 #6): the interleaved loop
    # above measures each query with ~40 neighbors' GC/codegen churn
    # between its runs; the jaccard/decontaminate families have shown
    # 1.2-2.8× in-bench elevation that vanishes when runs are
    # CONSECUTIVE (BASELINE.md r12/r13 drift notes). For the named
    # drift-watch set, also record a back-to-back min-of-3 so
    # drift-vs-interleave is machine-readable per round instead of a
    # hand-run probe. Diagnostics only — the gate metric stays the
    # interleaved wall.
    isolated: dict[str, float] = {}
    for name in _ISOLATED_CROSSCHECK:
        spec = REGISTRY.get(name)
        if spec is None or not spec.bench:
            continue
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            force_full(spec.fn(spark, sf_dir))
            walls.append(time.perf_counter() - t0)
        isolated[name] = round(min(walls), 3)

    # Walls rounded to ms: the driver's artifact capture keeps only the
    # LAST 2000 chars of stdout and json-parses the final line, so the
    # final metric line must stay well under that budget (BENCH_r08 came
    # back ``parsed: null`` with 8 headline timings truncated once the
    # headline set hit 33 queries at 4-decimal precision — VERDICT r8
    # item 1). Sub-millisecond digits carry no information on this host
    # (±30 % run-to-run variance), so nothing is lost.
    timings = {name: round(min(ts), 3) for name, ts in runs.items()}
    # Per-query max/min spread: >1.5 on many queries means the host was
    # contended during the run and the totals should be re-measured, not
    # interpreted as a plan regression (the round-4 failure mode).
    spreads = {name: round(max(ts) / min(ts), 2) for name, ts in runs.items()}
    # Any query NOT timed under the full-column hash method is named
    # here with the method actually used (ADVICE r7: no silent
    # methodology degradation).
    fallbacks = {n: m for n, m in methods.items() if m != "hash"}
    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # The EFFECTIVE parallelism the session actually ran with, so the
        # artifact itself proves the $SPARK_GRAFT_CPUS contract was honored
        # (VERDICT r15 #2: the driver's scaling check fired
        # `suspect_cpus_ignored` on a flat 8c/32c ratio because nothing in
        # the output distinguished "honored but overhead-bound at sf0.1"
        # from "ignored"). defaultParallelism = local[N]'s N here, total
        # executor cores on a cluster. ~14 chars of budget (guard below).
        "cpus": spark.sparkContext.defaultParallelism,
    }
    full = dict(
        payload,
        spreads=spreads,
        fallbacks=fallbacks,
        runs=runs,
        isolated=isolated,
    )
    # The complete record (all three raw runs, spreads, fallbacks) goes to
    # a file the repo commits each round, so the numbers survive even if
    # stdout capture regresses; spreads/fallbacks also print as their own
    # stdout lines ABOVE the metric line — diagnostics the tail may crop,
    # never the gate artifact itself.
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT", "bench_results.json")
    with open(out_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    # Every spread value carries an explicit "x" suffix: the driver's
    # tail capture keeps only the LAST 2000 stdout chars, which can crop
    # the line's leading label and leave a bare {"query": 3.21, ...} map
    # that reads like walls (VERDICT r10 wrong #2 — BENCH_r10's tail did
    # exactly that). A "3.21x" string cannot be misread as seconds no
    # matter where the crop lands.
    print(
        "spreads_maxmin_ratio "
        + json.dumps({n: f"{v}x" for n, v in spreads.items()})
    )
    print("fallbacks " + json.dumps(fallbacks))
    # Isolated walls print with an explicit unit suffix for the same
    # crop-safety reason as the spreads line.
    print(
        "isolated_min3_consecutive "
        + json.dumps({n: f"{v}s" for n, v in isolated.items()})
    )
    line = json.dumps(payload)
    # Loud guard: if the headline set ever grows the final line past the
    # driver's capture window again, fail the bench run instead of
    # shipping a truncated artifact. An explicit raise, not an assert —
    # `python -O` strips asserts, which would silently re-ship the exact
    # r8 truncation this guard exists to prevent (ADVICE r9).
    if len(line) > 1700:
        raise SystemExit(
            f"final metric line {len(line)} chars — exceeds the driver's "
            "2000-char tail budget; split the headline map"
        )
    print(line)


if __name__ == "__main__":
    main()
