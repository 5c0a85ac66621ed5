"""Query library: importing this package populates the registry."""

from . import (  # noqa: F401
    advanced,
    aggregates,
    analytics,
    dedup,
    governance,
    lookup,
    multimodal,
    patterns,
    pipeline,
    ppdb,
    relational,
    scalars,
    similarity,
    sketches,
    sources_io,
    streaming_queries,
    subqueries,
    text_analysis,
    timeseries,
    training_data,
    udf_surface,
    windows,
)
from .registry import REGISTRY, oracle_sql, queries

__all__ = ["REGISTRY", "queries", "oracle_sql"]
