"""Measure approximation quality of the ANN/LSH tiers against their exact
twins (round-3 verdict task #5: "a user tuning n_planes/n_bands/n_probe is
flying blind").

Metrics (all on the fixture embeddings, 64-dim isotropic):

- hyperplane-LSH pair recall: |LSH pairs ∩ exact pairs| / |exact pairs|
  at cosine >= t, swept over (n_planes, n_bands);
- embedding-dedup survivor agreement: fraction of vec_ids whose
  kept/dropped status under LSH candidates matches the exact path;
- IVF recall@k vs brute-force top-k, swept over n_probe (and n_cells for
  the kmeans-refined variant).

Prints one JSON line per configuration plus a summary; results are
recorded in RECALL.md. Exact pair sets are collected once per scale —
these are diagnostics at fixture scale (<= 2,000 vectors), not engine
paths, so driver-side set math is fine here.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ppdb_parser_spark.operators import similarity as SIM
from ppdb_parser_spark.session import get_spark
from ppdb_parser_spark.sources.tables import load_table

THRESHOLD = 0.35


def pair_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def lsh_sweep(spark, sf_dir, exact_pairs, results):
    for n_planes, n_bands in [(8, 2), (8, 4), (16, 2), (16, 4), (16, 8), (24, 4), (32, 4), (32, 8)]:
        e = load_table(spark, sf_dir, "embeddings")
        got = pair_set(
            SIM.lsh_similarity_join(
                e, threshold=THRESHOLD, n_planes=n_planes, n_bands=n_bands,
                seed=42, dim=64,
            )
        )
        # precision is 1.0 by construction (exact cosine refinement); recall
        # is the quantity of interest
        rec = len(got & exact_pairs) / len(exact_pairs) if exact_pairs else 1.0
        assert got <= exact_pairs, "LSH emitted a pair failing the exact threshold"
        row = {
            "metric": "lsh_pair_recall", "sf_dir": sf_dir,
            "n_planes": n_planes, "n_bands": n_bands,
            "bits_per_band": n_planes // n_bands,
            "exact_pairs": len(exact_pairs), "lsh_pairs": len(got),
            "recall": round(rec, 4),
        }
        results.append(row)
        print(json.dumps(row))


def dedup_agreement(spark, sf_dir, results):
    e = load_table(spark, sf_dir, "embeddings")
    exact_pairs = SIM.pairwise_cosine_pairs(e, threshold=THRESHOLD)
    lsh_pairs = SIM.lsh_similarity_join(
        e, threshold=THRESHOLD, n_planes=16, n_bands=8, seed=42, dim=64
    )
    exact_drop = {r["id_b"] for r in exact_pairs.select("id_b").distinct().collect()}
    lsh_drop = {r["id_b"] for r in lsh_pairs.select("id_b").distinct().collect()}
    n = e.count()
    agree = n - len(exact_drop.symmetric_difference(lsh_drop))
    row = {
        "metric": "dedup_survivor_agreement", "sf_dir": sf_dir,
        "n_vectors": n, "exact_dropped": len(exact_drop),
        "lsh_dropped": len(lsh_drop),
        "agreement": round(agree / n, 4),
        "drop_recall": round(
            len(exact_drop & lsh_drop) / len(exact_drop), 4
        ) if exact_drop else 1.0,
    }
    results.append(row)
    print(json.dumps(row))


def ivf_sweep(spark, sf_dir, results):
    e = load_table(spark, sf_dir, "embeddings")
    k = 10
    for probe_id in (1, 7, 13, 29):
        exact = [
            r["vec_id"]
            for r in SIM.cosine_topk_by_id(e, probe_id=probe_id, k=k).collect()
        ]
        for n_probe in (1, 2, 4):
            ivf = [
                r["vec_id"]
                for r in SIM.ivf_topk(
                    e, n_cells=8, probe_id=probe_id, n_probe=n_probe, k=k
                ).collect()
            ]
            row = {
                "metric": "ivf_recall_at_k", "sf_dir": sf_dir, "k": k,
                "probe_id": probe_id, "n_cells": 8, "n_probe": n_probe,
                "recall": round(len(set(ivf) & set(exact)) / k, 4),
            }
            results.append(row)
            print(json.dumps(row))


def pq_sweep(spark, sf_dir, results):
    """PQ ADC recall@k vs brute force, swept over the rerank depth R —
    the PQ cost/recall knob (codes scan is fixed; R controls how many
    exact-cosine rerank lookups run)."""
    e = load_table(spark, sf_dir, "embeddings")
    k = 10
    for probe_id in (1, 7, 13, 29):
        exact = [
            r["vec_id"]
            for r in SIM.cosine_topk_by_id(e, probe_id=probe_id, k=k).collect()
        ]
        for rerank in (25, 50, 100, 200):
            for variant, fn in (("seeded", SIM.pq_topk),
                                ("kmeans", SIM.pq_kmeans_topk)):
                pq = [
                    r["vec_id"]
                    for r in fn(
                        e, probe_id=probe_id, k=k, rerank=rerank, dim=64
                    ).collect()
                ]
                row = {
                    "metric": "pq_recall_at_k", "sf_dir": sf_dir, "k": k,
                    "probe_id": probe_id, "m": 8, "n_centroids": 16,
                    "rerank": rerank, "codebook": variant,
                    "recall": round(len(set(pq) & set(exact)) / k, 4),
                }
                results.append(row)
                print(json.dumps(row))


def ivfpq_sweep(spark, sf_dir, results):
    """IVF-PQ raw-code vs residual-code (IVFADC) recall@k at matched
    routing/rerank budget — the measurement behind the round-6 note that
    residual codes don't pay on ISOTROPIC synthetic data (residual
    distribution ≈ raw distribution) while being the standard win on
    clustered real embeddings."""
    e = load_table(spark, sf_dir, "embeddings")
    k = 10
    for probe_id in (1, 7, 13, 29):
        exact = [
            r["vec_id"]
            for r in SIM.cosine_topk_by_id(e, probe_id=probe_id, k=k).collect()
        ]
        for rerank in (50, 100):
            for variant, fn in (("raw", SIM.ivfpq_topk),
                                ("residual", SIM.ivfpq_residual_topk)):
                got = [
                    r["vec_id"]
                    for r in fn(
                        e, probe_id=probe_id, k=k, rerank=rerank, dim=64
                    ).collect()
                ]
                row = {
                    "metric": "ivfpq_recall_at_k", "sf_dir": sf_dir, "k": k,
                    "probe_id": probe_id, "n_cells": 8, "n_probe": 2,
                    "rerank": rerank, "codes": variant,
                    "recall": round(len(set(got) & set(exact)) / k, 4),
                }
                results.append(row)
                print(json.dumps(row))


def make_clustered(spark, n=2000, dim=64, n_clusters=16, seed=7, spread=0.18):
    """Seeded mixture-of-Gaussians embedding fixture (round-7, VERDICT r6
    item 3): unit-norm cluster centers, Gaussian spread around each — the
    CLUSTERED geometry real text embeddings have, vs the isotropic
    fixture where residual coding demonstrably can't pay (residual
    distribution ≈ raw distribution). Deterministic: numpy RandomState
    with a fixed seed, built driver-side once (diagnostic tool, not an
    engine path)."""
    import numpy as np

    rs = np.random.RandomState(seed)
    centers = rs.normal(0.0, 1.0, (n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rs.randint(0, n_clusters, n)
    pts = centers[assign] + rs.normal(0.0, spread, (n, dim))
    rows = [
        (i, f"c{assign[i]}", [float(x) for x in pts[i]]) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    ).repartition(8, "vec_id")


def clustered_sweep(spark, results):
    """recall@10 for every ANN tier on the clustered fixture — the
    measurement that replaces the tier table's 'residual should win on
    clustered data' footnote with numbers."""
    e = make_clustered(spark).localCheckpoint(eager=True)
    k = 10
    tiers = [
        ("ivf_seeded", lambda p: SIM.ivf_topk(
            e, n_cells=8, probe_id=p, n_probe=2, k=k)),
        ("ivf_kmeans", lambda p: SIM.ivf_kmeans_topk(
            e, n_cells=8, probe_id=p, n_probe=2, k=k)),
        ("pq_seeded", lambda p: SIM.pq_topk(
            e, probe_id=p, k=k, rerank=50, dim=64)),
        ("pq_kmeans", lambda p: SIM.pq_kmeans_topk(
            e, probe_id=p, k=k, rerank=50, dim=64)),
        ("ivfpq_raw", lambda p: SIM.ivfpq_topk(
            e, probe_id=p, k=k, rerank=50, dim=64)),
        ("ivfpq_residual", lambda p: SIM.ivfpq_residual_topk(
            e, probe_id=p, k=k, rerank=50, dim=64)),
        ("ivfpq_residual_trained", lambda p: SIM.ivfpq_residual_topk(
            e, probe_id=p, k=k, rerank=50, dim=64, train_codebook=True)),
        ("lsh_multiprobe", lambda p: SIM.lsh_multiprobe_topk(
            e, probe_id=p, k=k, dim=64)),
    ]
    per_tier: dict[str, list[float]] = {}
    for probe_id in (1, 7, 13, 29, 57, 101):
        exact = [
            r["vec_id"]
            for r in SIM.cosine_topk_by_id(e, probe_id=probe_id, k=k).collect()
        ]
        for name, fn in tiers:
            got = [r["vec_id"] for r in fn(probe_id).collect()]
            rec = len(set(got) & set(exact)) / k
            per_tier.setdefault(name, []).append(rec)
            row = {
                "metric": "clustered_recall_at_k", "fixture": "mog16",
                "k": k, "probe_id": probe_id, "tier": name,
                "recall": round(rec, 4),
            }
            results.append(row)
            print(json.dumps(row))
    for name, recs in per_tier.items():
        row = {
            "metric": "clustered_recall_mean", "fixture": "mog16",
            "k": k, "tier": name, "n_probes": len(recs),
            "mean_recall": round(sum(recs) / len(recs), 4),
        }
        results.append(row)
        print(json.dumps(row))

    # Coarse-resolution sweep for the IVF-PQ family: the offline ceiling
    # experiment (numpy, 25-iter converged k-means — see BASELINE.md)
    # shows residual coding only overtakes raw codes once the coarse
    # quantizer OVER-resolves the true cluster count; measure the in-plan
    # tiers along the same axis (8/16/32 cells over 16 true clusters,
    # scan fraction held at 1/4 via n_probe).
    for n_cells, n_probe in ((8, 2), (16, 4), (32, 8)):
        fam = [
            ("ivfpq_raw", lambda p, c=n_cells, np_=n_probe: SIM.ivfpq_topk(
                e, probe_id=p, n_cells=c, n_probe=np_, k=k, rerank=50,
                dim=64)),
            ("ivfpq_residual",
             lambda p, c=n_cells, np_=n_probe: SIM.ivfpq_residual_topk(
                 e, probe_id=p, n_cells=c, n_probe=np_, k=k, rerank=50,
                 dim=64)),
            ("ivfpq_residual_trained",
             lambda p, c=n_cells, np_=n_probe: SIM.ivfpq_residual_topk(
                 e, probe_id=p, n_cells=c, n_probe=np_, k=k, rerank=50,
                 dim=64, train_codebook=True)),
        ]
        for name, fn in fam:
            recs = []
            for probe_id in (1, 7, 13, 29, 57, 101):
                exact = {
                    r["vec_id"]
                    for r in SIM.cosine_topk_by_id(
                        e, probe_id=probe_id, k=k
                    ).collect()
                }
                got = {r["vec_id"] for r in fn(probe_id).collect()}
                recs.append(len(got & exact) / k)
            row = {
                "metric": "clustered_cells_sweep", "fixture": "mog16",
                "k": k, "n_cells": n_cells, "n_probe": n_probe,
                "tier": name,
                "mean_recall": round(sum(recs) / len(recs), 4),
            }
            results.append(row)
            print(json.dumps(row))


def main():
    spark = get_spark(app_name="ann-recall")
    results: list[dict] = []
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    only = None
    if sf_dirs and sf_dirs[0].startswith("--only="):
        only = sf_dirs[0][len("--only="):]
        sf_dirs = sf_dirs[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    for sf_dir in sf_dirs:
        if only is None or only == "lsh":
            e = load_table(spark, sf_dir, "embeddings")
            exact_pairs = pair_set(
                SIM.pairwise_cosine_pairs(e, threshold=THRESHOLD)
            )
            lsh_sweep(spark, sf_dir, exact_pairs, results)
            dedup_agreement(spark, sf_dir, results)
        if only is None or only == "ivf":
            ivf_sweep(spark, sf_dir, results)
        if only is None or only == "pq":
            pq_sweep(spark, sf_dir, results)
        if only is None or only == "ivfpq":
            ivfpq_sweep(spark, sf_dir, results)
    if only is None or only == "clustered":
        clustered_sweep(spark, results)
    print(json.dumps({"metric": "summary", "n_results": len(results)}))


if __name__ == "__main__":
    main()
