"""Semantic invariants for the governance extensions (queries/governance.py)
that the hash-oracle parity test cannot express: Bloom filters never
false-negative, span mass is a well-formed fraction, DSIR excludes its
own target slice. Correctness-vs-DuckDB is covered for all three by
tests/test_oracle_parity.py (they are registered queries)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ppdb_parser_spark.queries import REGISTRY
from ppdb_parser_spark.queries.governance import luhn_valid


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


def _luhn_ref(digits: str) -> bool:
    """Reference Luhn (ISO/IEC 7812): double every second digit from the
    right, subtract 9 over 9, sum divisible by 10."""
    total = 0
    for k, ch in enumerate(reversed(digits)):
        d = int(ch)
        if k % 2 == 1:
            d = d * 2 - 9 if d * 2 > 9 else d * 2
        total += d
    return total % 10 == 0


def test_luhn_fold_matches_reference(spark):
    """The in-plan HOF fold vs a plain-Python Luhn over 300 seeded random
    digit runs of mixed length (plus known-valid card test numbers)."""
    rng = random.Random(8)
    cases = [
        "".join(rng.choice("0123456789") for _ in range(rng.randint(1, 19)))
        for _ in range(300)
    ]
    cases += ["4111111111111111", "79927398713", "49927398716"]  # Luhn-valid
    cases += ["4111111111111112", "49927398717"]  # invalid
    df = spark.createDataFrame([(c,) for c in cases], ["digits"])
    got = {
        r.digits: r.ok
        for r in df.select("digits", luhn_valid(F.col("digits")).alias("ok"))
        .collect()
    }
    for c in cases:
        assert got[c] == _luhn_ref(c), c


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


def test_ewma_dyadic_matches_reference(spark, sf_dir):
    """The 8-tap dyadic EWMA window vs a plain-Python reference over the
    fixture's purchase series (every row, every user)."""
    from collections import defaultdict

    from ppdb_parser_spark.queries import REGISTRY

    rows = REGISTRY["ts_ewma_dyadic"].fn(spark, sf_dir).collect()
    series = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r.user_id, r.event_id)):
        series[r.user_id].append(r)
    checked = 0
    for user, rs in series.items():
        hist = []
        for r in rs:
            hist.append(r.vmilli)
            taps = hist[-8:][::-1]  # newest first
            num = sum(v * (1 << (7 - k)) for k, v in enumerate(taps))
            den = sum(1 << (7 - k) for k in range(len(taps)))
            assert r.ewma_micro == num * 1000 // den, (user, r)
            checked += 1
    assert checked == len(rows) > 0
