"""Semantic invariants for the monitoring/audit family added in round 8
(drift, anomaly argmax, tier agreement, cluster report) — properties the
hash-parity sweep can't express as cross-engine equality."""

from __future__ import annotations

from ppdb_parser_spark.queries import REGISTRY


def test_drift_tvd_is_a_bounded_distance(spark, sf_dir):
    for name in ("pipeline_drift_tvd", "stream_drift_batch"):
        rows = REGISTRY[name].fn(spark, sf_dir).collect()
        assert rows, name
        for r in rows:
            assert 0 <= r.drift_bp <= 10000, (name, r)
            assert r.n_train > 0 and r.n_eval > 0, (name, r)


def test_anomaly_argmax_consistency(spark, sf_dir):
    """Batch and live forms must be row-identical (same oracle claims it;
    this asserts it engine-side too), and every argmax deviation is
    non-negative with a sane verdict type."""
    batch = sorted(
        map(tuple, REGISTRY["ts_anomaly_argmax"].fn(spark, sf_dir).collect())
    )
    live = sorted(
        map(tuple, REGISTRY["stream_anomaly_live"].fn(spark, sf_dir).collect())
    )
    assert batch == live
    for r in REGISTRY["ts_anomaly_argmax"].fn(spark, sf_dir).collect():
        assert r.dev >= 0 and r.n_events >= 2, r


def test_tier_agreement_set_algebra(spark, sf_dir):
    [r] = REGISTRY["dedup_tier_agreement"].fn(spark, sf_dir).collect()
    assert r.n_both <= min(r.n_simhash, r.n_jaccard)
    assert r.n_simhash == r.n_both + r.n_simhash_only
    assert r.n_jaccard == r.n_both + r.n_jaccard_only
    assert 0 <= r.agreement_bp <= 10000


def test_cluster_report_density_well_formed(spark, sf_dir):
    rows = REGISTRY["dedup_cluster_report"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_docs >= 2, r
        # a connected component of n nodes has between n-1 and C(n,2) edges
        assert r.n_docs - 1 <= r.n_edges <= r.n_docs * (r.n_docs - 1) // 2, r
        assert 0 < r.density_bp <= 10000, r
        # triangles need at least 3 docs
        if r.n_docs == 2:
            assert r.n_triangles == 0, r
