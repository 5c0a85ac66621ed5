"""A/B: banded-LSH exact join shuffle volume — carry-embeddings vs
bare-id dedup + rejoin (ADVICE r5: the band fan-out was shuffling dim-64
float arrays and the pair-set distinct compared arrays; only (id_a, id_b)
is needed until the refine cosine).

Runs the retired carry-variant (inlined here for the A/B) and the shipped
:func:`lsh_similarity_join_exact` in separate SparkSessions (isolated
stage metrics), verifies identical pair sets, prints wall + shuffle
bytes. Result recorded in BASELINE.md.

Usage: python tools/lsh_shuffle_ab.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.jaccard_shuffle_compare import total_shuffle_bytes  # noqa: E402


def carry_variant(df, threshold, n_planes, n_bands, seed, dim):
    """The pre-round-6 shape: embeddings ride through the band join."""
    from pyspark.sql import functions as F

    from ppdb_parser_spark.operators.similarity import (
        PQ_GRID,
        _grid_dot,
        _grid_norm6,
        lsh_planes,
    )

    planes = lsh_planes(n_planes, dim, seed)
    bits_per_band = n_planes // n_bands
    bit_cols = [
        F.when(
            _grid_dot(F.col("embedding"), F.array(*[F.lit(x) for x in p])) >= 0,
            1,
        )
        .otherwise(0)
        .alias(f"bit{i}")
        for i, p in enumerate(planes)
    ]
    sig = df.select(F.col("vec_id"), F.col("embedding"), *bit_cols)
    band_cols = [
        F.concat_ws(
            "",
            *[F.col(f"bit{b * bits_per_band + j}") for j in range(bits_per_band)],
        ).alias(f"band{b}")
        for b in range(n_bands)
    ]
    sig = sig.select("vec_id", "embedding", *band_cols)
    banded = sig.select(
        "vec_id",
        "embedding",
        F.posexplode(
            F.array(*[F.col(f"band{b}") for b in range(n_bands)])
        ).alias("band", "band_sig"),
    )
    a = banded.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        "band",
        "band_sig",
    )
    b = banded.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        "band",
        "band_sig",
    )
    cand = (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .distinct()
    )
    cos = F.round(
        (_grid_dot(F.col("va"), F.col("vb")) / float(PQ_GRID))
        / (_grid_norm6(F.col("va")) * _grid_norm6(F.col("vb"))),
        6,
    )
    return (
        cand.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def run(variant: str, sf_dir: str):
    from pyspark.sql import SparkSession

    from ppdb_parser_spark.operators.similarity import lsh_similarity_join_exact
    from ppdb_parser_spark.sources.tables import load_table

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"lsh-ab-{variant}")
        .config("spark.sql.shuffle.partitions", "8")
        # at fixture scale every side fits the broadcast threshold and the
        # band join's exchange vanishes; disable broadcast so both
        # variants run the SHUFFLE plans a 100 TB corpus would
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        emb = load_table(spark, sf_dir, "embeddings")
        if variant == "carry":
            mk = lambda: carry_variant(emb, 0.35, 16, 8, 42, 64)
        else:
            mk = lambda: lsh_similarity_join_exact(emb, 0.35, 16, 8, 42, dim=64)
        mk().count()  # warm
        t0 = time.perf_counter()
        rows = mk().collect()
        dt = time.perf_counter() - t0
        w, r = total_shuffle_bytes(spark.sparkContext)
        return sorted((x["id_a"], x["id_b"]) for x in rows), dt, w, r
    finally:
        spark.stop()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    p1, t1, w1, r1 = run("carry", sf_dir)
    print(
        f"  carry-embeddings: {t1:6.2f}s  shuffle write {w1/1e6:8.1f} MB "
        f"({len(p1)} pairs)",
        flush=True,
    )
    p2, t2, w2, r2 = run("rejoin", sf_dir)
    print(
        f"  bare-id + rejoin: {t2:6.2f}s  shuffle write {w2/1e6:8.1f} MB "
        f"({len(p2)} pairs)",
        flush=True,
    )
    assert p1 == p2, f"pair sets differ: {len(p1)} vs {len(p2)}"
    print(f"pairs identical; shuffle-bytes ratio rejoin/carry: {w2/max(w1,1):.2f}")


if __name__ == "__main__":
    main()
