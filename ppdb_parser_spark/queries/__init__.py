"""Query library: importing this package populates the registry."""

from . import ppdb, relational  # noqa: F401
from .registry import REGISTRY, oracle_sql, queries

__all__ = ["REGISTRY", "queries", "oracle_sql"]
