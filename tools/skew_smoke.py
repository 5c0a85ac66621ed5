"""Hot-key skew stress (VERDICT r5 item 6): prove AQE's skew-join split
actually fires on a deliberately hot-keyed shuffle join, and measure how
the engine's two skew answers behave on the same data:

1. ``plain vs AQE-split``: a fact relation with ~1/3 of all rows on ONE
   join key, shuffle-joined (broadcast disabled) to a dim relation. With
   the skew thresholds scaled down to smoke size (the 256 MiB production
   default never trips on MBs of local data — the *mechanism* under test
   is identical), the final adaptive plan must contain a
   ``SortMergeJoin(skew=true)`` / skewed ``AQEShuffleRead``: AQE carved
   the hot partition into multiple tasks at runtime.
2. ``salted``: the engine's explicit salting operator on the same skewed
   input — the plan-level answer that works even where AQE skew split
   cannot (e.g. when the skewed side must keep its partitioning for a
   downstream stage).
3. ``jaccard_prefix hot-shingle``: the 64×-scale Zipfian corpus with a
   planted ultra-hot shingle (df ≈ 4% of docs): reports the prefix
   candidate join's wall and whether its fp-keyed exchange shows skew
   handling in the final plan.

Run: ``python tools/skew_smoke.py [n_fact] [n_docs]`` (defaults
4_000_000 / 80_000). Results recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ppdb_parser_spark.session import get_spark  # noqa: E402

#: smoke-scale AQE skew thresholds (production keeps the defaults; these
#: scale the 256 MiB partition threshold down to local fixture bytes)
SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def final_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def skew_markers(plan: str) -> dict[str, int]:
    return {
        "skew=true": plan.count("skew=true"),
        "skewed AQEShuffleRead": sum(
            1
            for line in plan.splitlines()
            if "AQEShuffleRead" in line and "skewed" in line
        ),
    }


def hot_fact(spark, n: int):
    """~1/3 of rows on key 0, remainder uniform over 1000 keys."""
    return spark.range(n).select(
        F.when(F.col("id") % 3 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(1000)))
        .alias("k"),
        (F.col("id") % 97).alias("v"),
    )


def dim(spark):
    return spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("w")
    )


def timed_collect(df) -> tuple[float, int]:
    """collect(), not count(): count()/write() compile a SEPARATE
    QueryExecution, so the input df's AdaptiveSparkPlan never finalizes
    and the skew markers are invisible (measured: isFinalPlan stays
    false). collect() runs the dataset's OWN plan — always aggregate
    before calling."""
    t0 = time.perf_counter()
    n = len(df.collect())
    return time.perf_counter() - t0, n


def main() -> int:
    spark = get_spark(app_name="skew-smoke")
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 80_000

    saved = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    ok = True
    try:
        for k, v in SKEW_CONFS.items():
            spark.conf.set(k, v)

        # 1. plain hot-keyed shuffle join: AQE must split the hot
        # partition. The downstream aggregate keys on v, NOT the join
        # key — AQE refuses to split a skewed join whose output
        # partitioning is reused by the next stage (splitting would force
        # an extra shuffle); grouping by the join key is exactly that
        # blocked case, see variant 1b.
        j = (
            hot_fact(spark, n_fact)
            .join(dim(spark), "k")
            .groupBy("v")
            .agg(F.sum(F.col("v") + F.col("w")).alias("s"))
        )
        wall, rows = timed_collect(j)
        marks = skew_markers(final_plan(j))
        fired = any(marks.values())
        ok &= fired
        print(
            f"plain hot join: n={n_fact} wall={wall:.2f}s groups={rows} "
            f"markers={marks} -> AQE skew split "
            f"{'FIRED' if fired else 'DID NOT FIRE'}"
        )

        # 1b. grouping by the JOIN key reuses the join's partitioning, so
        # plain AQE must NOT split (no marker); forceOptimizeSkewedJoin
        # accepts the extra shuffle and splits anyway — the knob a 100 TB
        # pipeline flips when one hot key dominates end-to-end wall.
        jk = (
            hot_fact(spark, n_fact)
            .join(dim(spark), "k")
            .groupBy("k")
            .agg(F.sum(F.col("v") + F.col("w")).alias("s"))
        )
        kwall, _ = timed_collect(jk)
        blocked = not any(skew_markers(final_plan(jk)).values())
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        jf = (
            hot_fact(spark, n_fact)
            .join(dim(spark), "k")
            .groupBy("k")
            .agg(F.sum(F.col("v") + F.col("w")).alias("s"))
        )
        fwall, _ = timed_collect(jf)
        fmarks = skew_markers(final_plan(jf))
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
        ok &= blocked and any(fmarks.values())
        print(
            f"groupBy(join key): wall={kwall:.2f}s split blocked={blocked}; "
            f"forced: wall={fwall:.2f}s markers={fmarks}"
        )

        # 2. the explicit salting operator on the same input
        from ppdb_parser_spark.operators.skew import salted_replicate_join

        sj = (
            salted_replicate_join(
                hot_fact(spark, n_fact),
                dim(spark),
                key_col="k",
                salt_from=["v"],
                n_salts=16,
            )
            .groupBy("k")
            .agg(F.sum(F.col("v") + F.col("w")).alias("s"))
        )
        swall, srows = timed_collect(sj)
        assert srows == 1000, "salted join changed the group count"
        print(f"salted join:    n={n_fact} wall={swall:.2f}s groups={srows}")

        # 3. jaccard_prefix on the 64x Zipf corpus with a planted hot
        # shingle (one bigram injected into 4% of documents)
        from ppdb_parser_spark.operators.dedup import jaccard_pairs_prefix
        from tools.zipf_smoke import with_planted_dups, zipf_docs

        docs = with_planted_dups(zipf_docs(spark, n_docs))
        hot = docs.withColumn(
            "text",
            F.when(
                F.pmod(F.col("doc_id"), F.lit(25)) == 3,
                F.concat(F.lit("hotkey hotkey2 "), F.col("text")),
            ).otherwise(F.col("text")),
        )
        pairs = jaccard_pairs_prefix(hot, threshold=0.5, n=2)
        pwall, n_pairs = timed_collect(pairs)
        pmarks = skew_markers(final_plan(pairs))
        print(
            f"jaccard_prefix hot-shingle: docs={n_docs} (hot df≈"
            f"{n_docs // 25}) wall={pwall:.2f}s pairs={n_pairs} "
            f"markers={pmarks}"
        )
        assert n_pairs >= n_docs // 100, "planted near-dups missed"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    print("OK" if ok else "SKEW SPLIT DID NOT FIRE")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
