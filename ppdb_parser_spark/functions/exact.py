"""Order-independent ("exact") floating aggregates for oracle parity.

Why this exists: Spark and DuckDB both sum doubles in whatever order their
partitioning produces, so two correct engines disagree in the last few ulps
— enough to break an order-insensitive *value-hash* comparison. The fixture
measures (`l_extendedprice`, `l_discount`, `o_totalprice`, `events.value`,
…) all live on a fixed decimal grid (cents / basis points), so the sums are
exactly representable if accumulated as integers.

Pattern: scale each row value to the grid, ``round``-cast to ``long``,
sum as a 64-bit integer (associative, order-independent), then divide back
once. Both engines then produce *bit-identical* doubles. Overflow bound:
per aggregation group, ``n_rows × max|value| × scale`` must stay below
2^63 ≈ 9.2e18 — e.g. 1e4-magnitude values at scale=1e6 are safe to ~9e8
rows per group; beyond that (full 100 TB groups) switch the accumulator to
``DECIMAL(38,0)`` on both engines or pre-aggregate per partition. The same
expression is mirrored in the oracle SQL:

    CAST(SUM(CAST(ROUND(expr * 10000) AS BIGINT)) AS BIGINT) / 10000.0

This is an engine-level determinism technique, not a benchmark trick: the
scaled sum compiles to the same two-phase partial/final HashAggregate as a
plain ``sum`` and costs the same at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 1e4 grid: exact for values with <= 4 decimal places (price * (1-discount)
#: style expressions over cent-grid inputs).
DEFAULT_SCALE = 10_000


def money_sum(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """Order-independent SUM for decimal-grid doubles. Returns double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * scale).cast("long")) / float(scale)


def money_sum_sql(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """SQL mirror of :func:`money_sum`, valid in BOTH DuckDB and Spark SQL.

    The inner cast back to BIGINT neutralizes DuckDB's SUM(BIGINT)→HUGEINT
    widening; the outer CAST AS DOUBLE neutralizes Spark SQL parsing
    ``10000.0`` as a DECIMAL literal (BIGINT/DECIMAL→DECIMAL there, while
    DuckDB's division already yields DOUBLE)."""
    return (
        f"CAST(CAST(SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) AS BIGINT)"
        f" / {scale}.0 AS DOUBLE)"
    )


