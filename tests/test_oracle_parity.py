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


def test_coverage_order_round14_prefix_contract():
    """Round-14 ordering contract (VERDICT r8 item 2 lineage): the driver
    samples a ~50-query PREFIX of queries(), so the prefix must spend its
    rows on (tier 1) queries with no driver CORRECTNESS row in any of
    r1-r13 — anything new this round — then (tier 2) the six stale-evidence
    marquee rows (X6 r10, J7/J8/L3 r9-r11; VERDICT r13 next-round #2), then
    (tier 3) the rest rotated least-recently-checked first so the whole
    registry re-certifies on a bounded cycle. The full
    order still enumerates the entire registry with every tag covered.
    The freeze literals must also be an EXACT subset of the live
    registry (VERDICT r7 item 7 — no deregistered residue)."""
    from ppdb_parser_spark.queries.registry import (
        _DRIVER_CHECKED_R1_R13,
        _LAST_DRIVER_ROUND,
        _ROUND14_PRIORITY,
        coverage_order,
    )

    order = coverage_order()
    assert sorted(order) == sorted(REGISTRY)
    all_tags = set().union(*(REGISTRY[n].tags for n in REGISTRY))
    covered = set().union(*(REGISTRY[n].tags for n in order))
    assert covered == all_tags

    # freeze literals are an exact subset of the live registry
    assert _DRIVER_CHECKED_R1_R13 <= set(REGISTRY), (
        "frozen checked-set contains deregistered names"
    )
    assert set(_LAST_DRIVER_ROUND) <= set(REGISTRY), (
        "last-round map contains deregistered names"
    )

    never = {
        n
        for n in REGISTRY
        if n not in _DRIVER_CHECKED_R1_R13 and n not in _ROUND14_PRIORITY
    }
    k = len(never)
    assert set(order[:k]) == never, "tier 1 must be exactly the backlog"
    # oracle-backed backlog entries precede rows-only ones
    seen_rows_only = False
    for n in order[:k]:
        if REGISTRY[n].oracle is None:
            seen_rows_only = True
        else:
            assert not seen_rows_only, f"oracle-backed {n} after rows-only"
    # tier 2 rides immediately behind tier 1, in declared order
    assert tuple(order[k : k + len(_ROUND14_PRIORITY)]) == _ROUND14_PRIORITY
    # the entire round-14 evidence plan must fit the ~50-query sample
    assert k + len(_ROUND14_PRIORITY) <= 50, (
        "round-14 priority tier no longer fits the driver sample"
    )
    # tier 3 rotates least-recently-checked first: within the tier-3
    # region the recorded last-round values must be non-decreasing
    tier3 = order[k + len(_ROUND14_PRIORITY) :]
    rounds_seq = [_LAST_DRIVER_ROUND.get(n, 0) for n in tier3]
    assert rounds_seq == sorted(rounds_seq), (
        "tier 3 must be ordered oldest-evidence-first"
    )
    # every query in the frozen set has a recorded last round
    assert set(_LAST_DRIVER_ROUND) >= _DRIVER_CHECKED_R1_R13


def test_contract_shape():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 10
