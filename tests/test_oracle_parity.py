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


def test_coverage_order_front_loads_all_tags():
    """The driver samples a PREFIX of queries() (50 entries in round 1);
    the emitted order must cover every §2 operator tag well inside that
    window, with the round-1-red queries guaranteed a driver row."""
    from ppdb_parser_spark.queries.registry import coverage_order

    order = coverage_order()
    assert sorted(order) == sorted(REGISTRY)
    all_tags = set().union(*(REGISTRY[n].tags for n in order))
    covered: set[str] = set()
    for i, n in enumerate(order):
        covered |= set(REGISTRY[n].tags)
        if covered == all_tags:
            assert i + 1 <= 48, f"tag cover needs {i + 1} queries (> 48)"
            break
    assert covered == all_tags
    assert set(order[:3]) == {
        "agg_pivot_status",
        "ppdb_parse_stats",
        "ppdb_collect_nested",
    }


def test_contract_shape():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 10
