"""Semantic invariants for the governance extensions (queries/governance.py)
that the hash-oracle parity test cannot express: Bloom filters never
false-negative, span mass is a well-formed fraction, DSIR excludes its
own target slice. Correctness-vs-DuckDB is covered for all three by
tests/test_oracle_parity.py (they are registered queries)."""

from __future__ import annotations

from ppdb_parser_spark.queries import REGISTRY


def test_bloom_decontaminate_superset_of_exact(spark, sf_dir):
    """A Bloom filter has false positives but NEVER false negatives, so
    per language bloom-flagged ⊇ exact-flagged must hold exactly."""
    rows = REGISTRY["pipeline_decontaminate_bloom"].fn(spark, sf_dir).collect()
    assert rows, "expected at least one language group"
    for r in rows:
        assert r.n_bloom_flagged >= r.n_exact_flagged, r
        assert r.n_false_pos == r.n_bloom_flagged - r.n_exact_flagged, r
        assert 0 <= r.n_bloom_flagged <= r.n_train, r


def test_substring_spans_mass_well_formed(spark, sf_dir):
    rows = REGISTRY["dedup_substring_spans"].fn(spark, sf_dir).collect()
    assert rows, "fixture contains exact duplicates; spans must collide"
    for r in rows:
        assert 1 <= r.n_dup_spans <= r.n_spans, r
        assert r.dup_bp == r.n_dup_spans * 10000 // r.n_spans, r
    # the fixture plants exact full-document copies: at least one doc
    # must be duplicated wall-to-wall (every span shared)
    assert any(r.dup_bp == 10000 for r in rows)


def test_dsir_weights_exclude_target_and_are_ordered(spark, sf_dir):
    df = REGISTRY["pipeline_dsir_weights"].fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 50
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # deterministic tiebreak inside equal scores: doc_id ascending
    for a, b in zip(rows, rows[1:]):
        if a.score == b.score:
            assert a.doc_id < b.doc_id
    assert all(r.score > 0 and r.n_tokens > 0 for r in rows)
