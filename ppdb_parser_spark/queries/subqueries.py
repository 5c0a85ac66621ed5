"""Scalar- and existential-subquery query shapes (SURVEY.md §2 F2/J5/A1
via the SQL entry point, §3.3).

These run through ``spark.sql`` deliberately: correlated scalar subqueries
and NOT EXISTS are *rewritten by Catalyst* (decorrelation) into the same
aggregate/join operators the DataFrame queries build by hand — the
operator surface under test is the rewrite, not the join itself. Each
query's SQL text is valid in BOTH Spark SQL and DuckDB, so the oracle runs
the *identical* statement and the comparison checks the two engines'
decorrelation + execution end-to-end.

Determinism notes (oracle hash-exactness):
- ``l_quantity`` is integral (1..50, verified against the fixture), so
  ``AVG`` sums doubles that are exactly representable — order-independent
  on both engines.
- Money comparisons go through the integer-cents grid
  (``functions/exact.py``) so thresholds never sit on an ulp boundary.
- DuckDB widens SUM(BIGINT) to HUGEINT; every summed BIGINT is cast back
  before division, mirroring ``money_sum_sql``.

At 100 TB: each decorrelated plan is exactly the hand-written one — the
Q17 shape becomes a per-key aggregate shuffled on the same key as its
probe join (one exchange, reused), Q22's NOT EXISTS a broadcast-able
anti join, Q11's HAVING threshold one scalar broadcast — so the SQL
surface inherits the scale properties of the underlying operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.exact import money_sum_sql
from ..sources.tables import register_views
from .registry import query

# --------------------------------------------------------------------------
# TPC-H Q17 shape: lineitems far below their part's average order quantity
# (slow movers), per brand. Correlated scalar subquery — Catalyst
# decorrelates into a per-partkey aggregate joined back on l_partkey.
# --------------------------------------------------------------------------
_SMALL_QTY_SQL = f"""
    SELECT p_brand,
           COUNT(*) AS n_small,
           {money_sum_sql("l_extendedprice")} AS sum_price
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_quantity < 0.5 * (
        SELECT AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY p_brand
"""


@query(
    "sub_correlated_avg_qty",
    oracle=_SMALL_QTY_SQL,
    tags=("F2", "A1", "J2", "S6"),
)
def sub_correlated_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SMALL_QTY_SQL)


# --------------------------------------------------------------------------
# TPC-H Q22 shape: above-average-balance customers who never placed an
# URGENT order ("rich but unhurried"), per market segment. Uncorrelated
# scalar subquery (one broadcast scalar) + correlated NOT EXISTS
# (decorrelated to a left anti join on o_custkey). Every fixture customer
# has ≥1 order, so the existential carries a predicate to stay
# non-degenerate (5 / 75 / 937 rows at sf0.001/0.01/0.1).
# --------------------------------------------------------------------------
_IDLE_RICH_SQL = f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_idle,
           {money_sum_sql("c_acctbal", scale=100)} AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(ROUND(c2.c_acctbal * 100) AS BIGINT)) AS BIGINT)
               / COUNT(*) / 100.0
        FROM customer c2 WHERE c2.c_acctbal > 0.0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY c_mktsegment
"""


@query(
    "sub_exists_idle_rich",
    oracle=_IDLE_RICH_SQL,
    tags=("F2", "J5", "A1", "S6"),
)
def sub_exists_idle_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_IDLE_RICH_SQL)


# --------------------------------------------------------------------------
# TPC-H Q11 shape: parts whose revenue exceeds 1.5× the mean per-part
# revenue (scale-free, unlike a fixed share — the fixture's revenue is
# near-uniform per part: max share ≈ 1.9× mean at every sf). Two scalar
# subqueries against a shared CTE; the threshold comparison stays on the
# integer-cents grid (2·rev_u·n > 3·total_u — no division, no ulps).
# --------------------------------------------------------------------------
_IMPORTANT_PARTS_SQL = """
    WITH pr AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                           AS BIGINT)) AS BIGINT) AS rev_u
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey,
           CAST(rev_u / 10000.0 AS DOUBLE) AS revenue
    FROM pr
    WHERE rev_u * 2 * (SELECT COUNT(*) FROM pr)
          > 3 * (SELECT CAST(SUM(rev_u) AS BIGINT) FROM pr)
    ORDER BY rev_u DESC, l_partkey
    LIMIT 20
"""


@query(
    "sub_having_revenue_share",
    oracle=_IMPORTANT_PARTS_SQL,
    tags=("A1", "F2", "O1", "O2", "S6"),
)
def sub_having_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_IMPORTANT_PARTS_SQL)


# --------------------------------------------------------------------------
# ANSI NOT IN with NULLs — the classic three-valued-logic trap: if the
# subquery result contains ANY NULL, `x NOT IN (...)` is never TRUE, so
# the correct answer is zero rows from the null-polluted variant while the
# NULL-free variant returns the real complement. Spark plans the null-
# polluted side as a null-aware anti join (BroadcastNestedLoopJoin with
# the NAAJ marker); both engines must agree on BOTH variants.
# --------------------------------------------------------------------------
@query(
    "subq_not_in_nulls",
    oracle="""
    WITH polluted AS (
      -- customer keys of large-balance customers, plus a NULL (nullif on
      -- an always-matching sentinel row)
      SELECT nullif(c_custkey, 0) AS k FROM customer WHERE c_acctbal > 5000
         OR c_custkey = 0
    ),
    clean AS (SELECT k FROM polluted WHERE k IS NOT NULL)
    SELECT
      CAST((SELECT COUNT(*) FROM customer
            WHERE c_custkey NOT IN (SELECT k FROM polluted)) AS BIGINT)
        AS n_not_in_polluted,
      CAST((SELECT COUNT(*) FROM customer
            WHERE c_custkey NOT IN (SELECT k FROM clean)) AS BIGINT)
        AS n_not_in_clean,
      CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_total
    """,
    tags=("J5", "F2", "X3"),
)
def subq_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH polluted AS (
          SELECT nullif(c_custkey, 0) AS k FROM customer
          WHERE c_acctbal > 5000 OR c_custkey = 0
        ),
        clean AS (SELECT k FROM polluted WHERE k IS NOT NULL)
        SELECT
          CAST((SELECT COUNT(*) FROM customer
                WHERE c_custkey NOT IN (SELECT k FROM polluted)) AS BIGINT)
            AS n_not_in_polluted,
          CAST((SELECT COUNT(*) FROM customer
                WHERE c_custkey NOT IN (SELECT k FROM clean)) AS BIGINT)
            AS n_not_in_clean,
          CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_total
        """
    )


# --------------------------------------------------------------------------
# LATERAL subquery join (Spark ≥ 3.2 / DuckDB both support the syntax):
# per nation, the top-2 customers by account balance via a correlated
# LATERAL (ORDER BY ... LIMIT 2) — the "top-n per key expressed as a
# subquery" SQL surface. Catalyst rewrites it to the same window/limit
# machinery W1 builds by hand (DomainJoin → window), so the operator
# under test is the lateral decorrelation. Identical statement runs on
# both engines; cents-grid balance + c_custkey tiebreak keep the LIMIT
# deterministic.
# --------------------------------------------------------------------------
_LATERAL_SQL = """
        SELECT n_name, t.c_custkey, t.bal_cents
        FROM nation,
             LATERAL (
               SELECT c_custkey,
                      CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
               FROM customer
               WHERE c_nationkey = n_nationkey
               ORDER BY bal_cents DESC, c_custkey
               LIMIT 2
             ) AS t
"""


@query(
    "sub_lateral_topn",
    oracle=_LATERAL_SQL,
    tags=("S6", "J2", "O2", "W1"),
)
def sub_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)
