"""ppdb_parser_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mauryquijada/ppdb-parser (PPDB-style gzipped
``|||``-delimited text databases), extended with LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) and Structured
Streaming, all designed for 100 TB scale.

The public API is deliberately the PySpark DataFrame API plus:

- :mod:`ppdb_parser_spark.operators.ppdb` — the PPDB parse kernel,
- :mod:`ppdb_parser_spark.queries` — the registered, oracle-checked query
  library (the SURVEY.md §2 inventory),
- :func:`ppdb_parser_spark.session.get_spark` — the tuned session factory.
"""

from .session import get_spark

__all__ = ["get_spark"]
