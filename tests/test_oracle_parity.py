"""Mirror of the driver's t2 gate (SURVEY.md §5.3 layer 4).

Every registered query runs at sf0.001 against its DuckDB oracle with a
comparison stricter than the driver's (exact cell equality, not a hash) —
so the driver's sf0.01 run is never the first execution of a query.
"""

from __future__ import annotations

import pytest

from ppdb_parser_spark.plans.oracle import check_query
from ppdb_parser_spark.queries import REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, sf_dir, name):
    result = check_query(spark, sf_dir, name)
    assert result.ok, f"{name}: {result.detail}"
    # degenerate (empty) results pass a hash-compare trivially — require
    # every registered query to produce rows at fixture scale
    import re

    m = re.search(r"(\d+) rows", result.detail)
    assert m and int(m.group(1)) > 0, (
        f"{name} is degenerate at {sf_dir}: {result.detail}"
    )


@pytest.mark.parametrize(
    "name", sorted(n for n, s in REGISTRY.items() if s.oracle is None)
)
def test_rows_only_driver_sortable(spark, sf_dir, name):
    """The driver's rows-only canonicalizer does a pandas sort_values over
    every column; nested array/struct columns are unhashable there and
    crashed ppdb_collect_nested in round 1. Every rows-only query must emit
    only scalar (sortable) columns."""
    pdf = REGISTRY[name].fn(spark, sf_dir).toPandas()
    # mimics the driver: this must not raise
    if len(pdf.columns):
        pdf.sort_values(by=list(pdf.columns), kind="mergesort")


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.schema) >= 2


def test_coverage_order_seeds_never_checked_backlog_first():
    """Round-5 ordering contract: the driver samples a ~50-query PREFIX of
    queries(), and after the round-5 re-freeze the checked set covers
    r1∪r2∪r3∪r4 (all 137 round-4 registrations) — so the prefix's value
    lies in (a) queries that have never earned a driver CORRECTNESS row
    (anything new this round) and (b) the implementation-changed marquee
    re-checks right behind them. Oracle-backed before rows-only inside
    tier 1, and the full order still enumerates the entire registry with
    every tag covered."""
    from ppdb_parser_spark.queries.registry import (
        _DRIVER_CHECKED_R1_R4,
        _ROUND5_MARQUEE,
        coverage_order,
    )

    order = coverage_order()
    assert sorted(order) == sorted(REGISTRY)
    all_tags = set().union(*(REGISTRY[n].tags for n in order))
    covered = set().union(*(REGISTRY[n].tags for n in order))
    assert covered == all_tags

    never = {
        n
        for n in REGISTRY
        if n not in _DRIVER_CHECKED_R1_R4 and n not in _ROUND5_MARQUEE
    }
    k = len(never)
    # the round-5 additions must be in the never-checked tier
    assert {"pipeline_corpus_curation_v2", "text_unigram_logprob"} <= never
    assert set(order[:k]) == never, "tier 1 must be exactly the backlog"
    # oracle-backed backlog entries precede rows-only ones (driver hash
    # checks are stronger evidence than rows-only)
    seen_rows_only = False
    for n in order[:k]:
        if REGISTRY[n].oracle is None:
            seen_rows_only = True
        else:
            assert not seen_rows_only, f"oracle-backed {n} after rows-only"
    # tier 2: the implementation-changed marquee re-checks ride right
    # behind. With 46 round-5 registrations the full marquee no longer
    # fits a ~50-query prefix; the ORACLE-BACKED marquee (hash-value
    # checks) must still land inside it — only the two rows-only LSH
    # re-checks (weakest check form, results already r1–r4 green and
    # locally parity-swept) may spill past the sample boundary.
    assert tuple(order[k : k + len(_ROUND5_MARQUEE)]) == _ROUND5_MARQUEE
    # the hard inside-the-sample guarantee applies to the BACKLOG (every
    # query's FIRST driver row); marquee re-checks ride immediately behind
    # and may spill once the backlog approaches the sample size — they
    # already hold r1–r4 rows and are re-verified by the local parity
    # sweep every session, so first-rows outrank re-checks by design.
    n_oracle_backlog = sum(1 for n in order[:k] if REGISTRY[n].oracle is not None)
    assert n_oracle_backlog <= 50, (
        "oracle-backed backlog no longer fits the driver sample"
    )
    # rows-only backlog entries sort last inside the tier, so if anything
    # spills past the ~50-query sample it is a rows-only live twin whose
    # hash-checked batch twin sits inside the prefix — weakest check out
    # rows-only marquee entries must still be ordered last within the tier
    kinds = [REGISTRY[n].oracle is None for n in _ROUND5_MARQUEE]
    assert kinds == sorted(kinds)


def test_contract_shape():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 10
