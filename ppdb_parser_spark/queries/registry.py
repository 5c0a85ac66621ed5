"""Query registry: the engine's catalogued operator surface.

Every operator from SURVEY.md §2 lands here as a named query with

- ``fn(spark, sf_dir) -> DataFrame`` — the PySpark implementation, and
- ``oracle`` — equivalent ANSI SQL for the DuckDB oracle (``None`` for
  genuinely non-SQL-expressible ops → driver runs a rows-only check).

``__spark_entry__.py`` exposes this registry verbatim; tests iterate it;
``bench.py`` times a headline subset. Column names are part of the contract:
the driver sorts columns by name before hashing, so Spark aliases and SQL
``AS`` names must match exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = ()  # SURVEY.md §2 operator ids this query covers
    bench: bool = False  # include in bench.py's headline set


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] | list[str] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags), bench)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
