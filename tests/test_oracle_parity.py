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


def test_coverage_order_round6_prefix_contract():
    """Round-6 ordering contract (VERDICT r5 items 1-2): the driver samples
    a ~50-query PREFIX of queries(), so the prefix must spend its rows on
    (tier 1) queries with no driver CORRECTNESS row in any of r1-r5 —
    the never-sampled live interval join plus anything new this round —
    then (tier 2) the stale rows-only backlog (now partly self-checking
    with oracles) and the round-5 marquee plan rewrites needing a second
    consecutive green row. The full order still enumerates the entire
    registry with every tag covered."""
    from ppdb_parser_spark.queries.registry import (
        _DRIVER_CHECKED_R1_R5,
        _ROUND6_PRIORITY,
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
        if n not in _DRIVER_CHECKED_R1_R5 and n not in _ROUND6_PRIORITY
    }
    k = len(never)
    # the one query without any r1-r5 row must sit in tier 1
    assert "stream_left_interval_join_live" in never
    assert set(order[:k]) == never, "tier 1 must be exactly the backlog"
    # oracle-backed backlog entries precede rows-only ones
    seen_rows_only = False
    for n in order[:k]:
        if REGISTRY[n].oracle is None:
            seen_rows_only = True
        else:
            assert not seen_rows_only, f"oracle-backed {n} after rows-only"
    # tier 2 rides immediately behind tier 1, in declared order
    assert tuple(order[k : k + len(_ROUND6_PRIORITY)]) == _ROUND6_PRIORITY
    # the entire round-6 evidence plan must fit the ~50-query sample:
    # every stale rows-only query and every marquee re-cert earns a row
    assert k + len(_ROUND6_PRIORITY) <= 50, (
        "round-6 priority tier no longer fits the driver sample"
    )
    # the A3/F4 conversions are now oracle-backed (self-checking form) —
    # their driver rows will be hash checks, not rows-only
    for n in ("agg_approx_distinct", "agg_approx_percentile", "sample_orders"):
        assert REGISTRY[n].oracle is not None, f"{n} lost its oracle"


def test_contract_shape():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 10
