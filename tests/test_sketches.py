"""Sketch invariants (queries/sketches.py) beyond hash parity:
HLL registers must be max-mergeable (the property that makes the sketch
shippable between executors instead of token sets), the HLL error must
sit inside the m=64 theoretical band on the fixture, and Count-Min
estimates are one-sided."""

from __future__ import annotations

from pyspark.sql import functions as F

from ppdb_parser_spark.queries import REGISTRY
from ppdb_parser_spark.queries.sketches import hll_estimate, hll_registers
from ppdb_parser_spark.sources.tables import load_table


def test_hll_registers_merge_law(spark, sf_dir):
    """Sketch(A ∪ B) == max-merge(Sketch(A), Sketch(B)) — register tables
    from two disjoint halves of the corpus, unioned and re-maxed, must be
    row-identical to the whole-corpus register table."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    whole = hll_registers(toks, ["lang"], "token")
    half_a = hll_registers(toks.filter("doc_id % 2 = 0"), ["lang"], "token")
    half_b = hll_registers(toks.filter("doc_id % 2 = 1"), ["lang"], "token")
    merged = (
        half_a.unionByName(half_b)
        .groupBy("lang", "j")
        .agg(F.max("reg").alias("reg"))
    )
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0
    # and the estimate of the merge equals the whole-corpus estimate
    e_w = {r.lang: r.hll_est for r in hll_estimate(whole, ["lang"]).collect()}
    e_m = {r.lang: r.hll_est for r in hll_estimate(merged, ["lang"]).collect()}
    assert e_w == e_m


def test_hll_error_inside_theory_band(spark, sf_dir):
    """m=64 raw HLL has relative std error 1.04/sqrt(64) = 13 %; on the
    fixture every language must land within ~3 sigma (≤ 40 %)."""
    rows = REGISTRY["agg_hll_sketch"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.err_bp <= 4000, r


def test_cms_estimates_one_sided(spark, sf_dir):
    rows = REGISTRY["text_cms_heavy_hitters"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cm_est >= r.n_exact, r
        assert r.overest_bp >= 0, r


def test_recommend_bloom_bits_pinned_to_theory():
    """~9.6 bits/item at 1 % FPR, ~14.4 at 0.1 %; the fixture's 16x rung
    (BASELINE_HISTORY.md bloomscale: 195,645 shingles) needs ~29x the fixed
    m=2^16 the fixture uses — the saturation the smoke measured."""
    from ppdb_parser_spark.queries.sketches import recommend_bloom_bits

    m1, k1 = recommend_bloom_bits(10_000, 0.01)
    assert 9.5 <= m1 / 10_000 <= 9.7 and k1 == 7
    m2, k2 = recommend_bloom_bits(10_000, 0.001)
    assert 14.3 <= m2 / 10_000 <= 14.5 and k2 == 10
    m16, _ = recommend_bloom_bits(195_645, 0.01)
    assert m16 > 25 * 65536  # the fixed fixture m is deeply saturated
    import pytest

    with pytest.raises(ValueError):
        recommend_bloom_bits(0)
    with pytest.raises(ValueError):
        recommend_bloom_bits(10, 1.5)
