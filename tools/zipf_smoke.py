"""Skewed-corpus (Zipfian) smoke for the prefix-filter Jaccard join
(round-3 verdict task #6): the 16x/64x scale smokes use fresh-vocabulary
copies whose document-frequency profile is uniform; real corpora are
Zipfian, concentrating shingle df on a few hot keys — the worst case for
the df aggregate and the fp-keyed candidate join.

The corpus is generated IN-PLAN and deterministically: token rank for
(doc, pos) is the inverse-CDF transform rank = floor(V^u) of a
xxhash64-derived uniform u — Zipf(s=1) marginals, no rand(), identical
across runs/cluster sizes. Reported per corpus size:

- shingle df profile (max / p99 / distinct) — proves the skew is real;
- candidate-join input rows (sum df_pref^2 shape) and output pairs;
- wall time, and the partition-row distribution of the candidate join's
  fp-keyed exchange side (max/mean task rows ~ skew absorbed or not).

Run: ``python tools/zipf_smoke.py [n_docs ...]`` (default 20000 80000).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ppdb_parser_spark.operators.dedup import jaccard_pairs_prefix  # noqa: E402
from ppdb_parser_spark.session import get_spark  # noqa: E402

VOCAB = 50_000
DOC_LEN = 50


def zipf_docs(spark, n_docs: int):
    """n_docs documents of DOC_LEN tokens, token ranks ~ Zipf(1) over a
    VOCAB-word vocabulary, fully deterministic (hash-derived uniforms)."""
    u = (
        F.pmod(F.xxhash64(F.col("id"), F.col("i"), F.lit(7)), F.lit(1 << 20))
        / F.lit(float(1 << 20))
    )
    token = F.concat(
        F.lit("t"), F.floor(F.pow(F.lit(float(VOCAB)), u)).cast("string")
    )
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(DOC_LEN)),
                    lambda i: F.concat(
                        F.lit("t"),
                        F.floor(
                            F.pow(
                                F.lit(float(VOCAB)),
                                F.pmod(
                                    F.xxhash64(F.col("id"), i, F.lit(7)),
                                    F.lit(1 << 20),
                                )
                                / F.lit(float(1 << 20)),
                            )
                        ).cast("string"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .repartition(32)
    )


def df_profile(docs):
    sh = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(DOC_LEN - 1)),
                        lambda i: F.array_join(
                            F.slice(F.split("text", " "), i, 2), " "
                        ),
                    )
                )
            ).alias("shingle"),
        )
    )
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    prof = freq.agg(
        F.count(F.lit(1)).alias("distinct_shingles"),
        F.max("df").alias("max_df"),
        F.expr("percentile_approx(df, 0.99)").alias("p99_df"),
        F.sum(F.col("df") * F.col("df")).alias("sum_df2"),
    ).first()
    return prof


def with_planted_dups(docs, every: int = 100):
    """Append a near-copy (first 48 of 50 tokens) of every ``every``-th doc
    — true Jaccard vs the original ≈ 47/52 ≈ 0.9, well over t = 0.5, so
    the smoke validates output as well as survival."""
    dups = (
        docs.filter(F.pmod(F.col("doc_id"), F.lit(every)) == 0)
        .select(
            (F.col("doc_id") + F.lit(100_000_000)).alias("doc_id"),
            F.array_join(
                F.slice(F.split("text", " "), 1, DOC_LEN - 2), " "
            ).alias("text"),
        )
    )
    return docs.unionByName(dups)


def prefix_bucket_loads(docs, threshold=0.5, buckets=32):
    """Predicted candidate-join load per hash bucket of the prefix's fp
    key — the exchange-partition loads the join's build side sees, BEFORE
    AQE skew splitting. Σ df_pref·(df_pref−1)/2 per bucket ≈ join output
    rows landing in that task."""
    toks = F.split(F.col("text"), " ")
    sh_arr = F.transform(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.array_join(F.slice(toks, i, 2), " "),
            )
        ),
        lambda s: F.xxhash64(s),
    )
    base = docs.select(
        F.col("doc_id"), F.sort_array(sh_arr).alias("fps")
    ).select("doc_id", F.size("fps").alias("n"), "fps")
    occ = base.select("doc_id", "n", F.explode("fps").alias("fp"))
    freq = occ.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    keyed = occ.join(freq, "fp").select(
        "doc_id", "n", F.struct("df", "fp").alias("k")
    )
    packed = keyed.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("k")).alias("ks"), F.first("n").alias("n")
    )
    plen = F.col("n") - F.ceil(F.lit(threshold) * F.col("n")).cast("int") + 1
    pref = (
        packed.select(F.explode(F.slice("ks", F.lit(1), plen)).alias("k"))
        .where(F.col("k.df") >= 2)
        .select(F.col("k.fp").alias("fp"))
    )
    pdf = pref.groupBy("fp").agg(F.count(F.lit(1)).alias("dfp"))
    return (
        pdf.groupBy(F.pmod(F.hash("fp"), F.lit(buckets)).alias("bucket"))
        .agg(F.sum(F.col("dfp") * (F.col("dfp") - 1) / 2).alias("load"))
        .agg(
            F.max("load").alias("max"),
            F.avg("load").alias("avg"),
            F.sum("load").alias("total"),
        )
        .first()
    )


def main() -> None:
    spark = get_spark(app_name="zipf-smoke")
    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 80_000]
    base_t = None
    for n in sizes:
        docs = with_planted_dups(zipf_docs(spark, n))
        prof = df_profile(docs)
        print(
            f"n={n}: shingles={prof['distinct_shingles']} max_df={prof['max_df']} "
            f"p99_df={prof['p99_df']} sum_df2={prof['sum_df2']}"
        )
        loads = prefix_bucket_loads(docs)
        print(
            f"n={n}: candidate-join bucket load max={int(loads['max'])} "
            f"avg={int(loads['avg'])} total={int(loads['total'])} "
            f"(skew={loads['max'] / max(loads['avg'], 1):.1f}x)"
        )
        pairs = jaccard_pairs_prefix(docs, threshold=0.5, n=2)
        pairs.count()  # warm (codegen)
        t0 = time.perf_counter()
        n_pairs = pairs.count()
        dt = time.perf_counter() - t0
        ratio = (
            ""
            if base_t is None
            else f" ({dt / base_t:.1f}x time for {n / sizes[0]:.0f}x docs)"
        )
        expected = n // 100
        print(
            f"n={n}: jaccard_prefix wall={dt:.2f}s pairs={n_pairs} "
            f"(planted {expected}){ratio}"
        )
        assert n_pairs >= expected, "planted near-dups missed"
        if base_t is None:
            base_t = dt

        # round-5b tiers on the same Zipfian corpus: the banded MinHash
        # candidates and the winnow fingerprint join both key on
        # hash-derived values — Zipf's hot SHINGLES concentrate df, but
        # the per-seed minima / window minima are still near-uniform, so
        # neither join should develop hot buckets
        from ppdb_parser_spark.operators.dedup import minhash_match, winnow_match

        for label, fn in (("minhash_match", lambda: minhash_match(docs, threshold=0.5)),
                          ("winnow_match", lambda: winnow_match(docs))):
            fn().count()  # warm
            t0 = time.perf_counter()
            c = fn().count()
            print(f"n={n}: {label} wall={time.perf_counter() - t0:.2f}s pairs={c}")


if __name__ == "__main__":
    main()
