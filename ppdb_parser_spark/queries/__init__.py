"""Query library: importing this package populates the registry."""

from . import (  # noqa: F401
    aggregates,
    dedup,
    ppdb,
    relational,
    scalars,
    similarity,
    text_analysis,
    windows,
)
from .registry import REGISTRY, oracle_sql, queries

__all__ = ["REGISTRY", "queries", "oracle_sql"]
