"""Core relational query surface (SURVEY.md §2.1 S2/S6, §2.3 F1–F3,
§2.4 J1–J6/J9, §2.7 O1–O4).

Conventions shared by every query in the registry:

- Every computed column is aliased identically in the Spark plan and the
  oracle SQL (driver hashes with name-sorted columns).
- Computed integers are cast to ``long`` on the Spark side because DuckDB
  widens integer expressions to BIGINT.
- Floating aggregates over decimal-grid measures use the order-independent
  integer-scaled sum (`functions/exact.py`) so both engines emit
  bit-identical doubles.
- Any LIMIT / top-k carries a total-order tie-break so both engines select
  the same rows.

Scale notes (100 TB): every join below either broadcasts a dimension
(nation/region/part: explicitly hinted) or shuffles on the natural join key
where both sides are large (lineitem⋈orders on orderkey). Aggregations are
plain hash aggregates with map-side partials. No driver-side loops, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import money_sum, money_sum_sql
from ..operators.topk import global_topk_ranked
from ..sources.tables import load_table
from .registry import query

REVENUE = money_sum_sql("l_extendedprice * (1 - l_discount)")


# --------------------------------------------------------------------------
# Flagship: 4-way join + aggregate + global window rank + top-k.
# Covers S2, F1, J1, J2, A1, W1, O2 in one query (SURVEY.md §7.1).
# --------------------------------------------------------------------------
@query(
    "flagship",
    oracle=f"""
    WITH rev AS (
      SELECT n_name,
             strftime(o_orderdate, '%Y-%m') AS order_month,
             {REVENUE} AS revenue,
             COUNT(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    )
    SELECT * FROM (
      SELECT rev.*,
             ROW_NUMBER() OVER (ORDER BY revenue DESC, n_name, order_month) AS rk
      FROM rev
    ) WHERE rk <= 10
    """,
    tags=("S2", "F1", "J1", "J2", "A1", "W1", "O2"),
    bench=True,
)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name", F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
        )
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    # top-k FIRST (TakeOrderedAndProject: per-partition heaps, no global
    # sort, no single-partition WindowExec over the full aggregate), THEN
    # rank only the 10 survivors — see operators/topk.py.
    return global_topk_ranked(
        rev,
        [F.desc("revenue"), F.asc("n_name"), F.asc("order_month")],
        10,
        anchor="n_name",
    )


# --------------------------------------------------------------------------
# F1/F2: projection + compound predicate, pushed into the parquet scan.
# --------------------------------------------------------------------------
@query(
    "filter_project",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority,
           o_totalprice * 0.9 AS discounted
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 100000
    """,
    tags=("F1", "F2"),
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000)
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        # deliberately unrounded: the double product is bit-identical across
        # engines, while ROUND(·, 2) on a 3-decimal grid is not (half-up vs
        # binary-value rounding disagree on exact .xx5 boundaries)
        (F.col("o_totalprice") * 0.9).alias("discounted"),
    )


# --------------------------------------------------------------------------
# F3: CASE WHEN conditional expression + aggregate over the derived class.
# --------------------------------------------------------------------------
@query(
    "case_when",
    oracle=f"""
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
                ELSE 'low' END AS priority_class,
           COUNT(*) AS n_orders,
           {money_sum_sql("o_totalprice")} AS total_price
    FROM orders GROUP BY 1
    """,
    tags=("F3", "A1"),
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cls = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("low")
    )
    return o.groupBy(cls.alias("priority_class")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum("o_totalprice").alias("total_price"),
    )


# --------------------------------------------------------------------------
# J1: broadcast equi join — the "dictionary lookup" verb of the reference,
# re-expressed as fact ⋈ broadcast(dim).
# --------------------------------------------------------------------------
@query(
    "broadcast_join",
    oracle=f"""
    SELECT p_brand,
           {money_sum_sql("l_quantity")} AS sum_qty,
           {REVENUE} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    tags=("J1", "A1"),
    bench=True,
)
def broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# J2: large-large shuffle join chain up the star schema to region.
# --------------------------------------------------------------------------
@query(
    "region_revenue",
    oracle=f"""
    SELECT r_name, {REVENUE} AS revenue, COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("J2", "A1"),
    bench=True,
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# J3: left outer join — unmatched customers kept with zeroed measures.
# --------------------------------------------------------------------------
@query(
    "left_join_coverage",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_custkey) AS n_customers,
           COUNT(o_orderkey) AS n_orders,
           {money_sum_sql("COALESCE(o_totalprice, 0)")} AS total_price
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
    tags=("J3", "A1", "A2"),
)
def left_join_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            money_sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias(
                "total_price"
            ),
        )
    )


# --------------------------------------------------------------------------
# J4: left semi join — EXISTS semantics ("has at least one big order").
# --------------------------------------------------------------------------
@query(
    "semi_join",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    GROUP BY n_name
    """,
    tags=("J4",),
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    big = o.filter(F.col("o_totalprice") > 200000)
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --------------------------------------------------------------------------
# J5: left anti join — NOT EXISTS ("customers with no orders at all").
# --------------------------------------------------------------------------
@query(
    "anti_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    GROUP BY c_mktsegment
    """,
    tags=("J5",),
)
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --------------------------------------------------------------------------
# J6: self join — co-occurring line pairs within an order.
# --------------------------------------------------------------------------
@query(
    "self_join_pairs",
    oracle="""
    SELECT a.l_returnflag AS flag_a, b.l_returnflag AS flag_b,
           COUNT(*) AS n_pairs
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    GROUP BY 1, 2
    """,
    tags=("J6",),
)
def self_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
        )
        .groupBy(
            F.col("a.l_returnflag").alias("flag_a"),
            F.col("b.l_returnflag").alias("flag_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --------------------------------------------------------------------------
# J9: cross join (small × small).
# --------------------------------------------------------------------------
@query(
    "cross_join",
    oracle="""
    SELECT r_name, n_name,
           CASE WHEN n_regionkey = r_regionkey THEN 1 ELSE 0 END AS is_home
    FROM region CROSS JOIN nation
    """,
    tags=("J9", "F3"),
)
def cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name",
        "n_name",
        F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_home"),
    )


# --------------------------------------------------------------------------
# O1/O2: global sort + deterministic top-k (TakeOrderedAndProject shape).
# --------------------------------------------------------------------------
@query(
    "order_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("O1", "O2"),
)
def order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# O3: union of schema-aligned relations (the "concatenate packs" verb).
# --------------------------------------------------------------------------
@query(
    "union_parties",
    oracle=f"""
    SELECT kind, n_name, COUNT(*) AS n_parties,
           {money_sum_sql("acctbal")} AS total_acctbal
    FROM (
      SELECT 'customer' AS kind, c_nationkey AS nationkey, c_acctbal AS acctbal
      FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_nationkey AS nationkey, s_acctbal AS acctbal
      FROM supplier
    ) JOIN nation ON nationkey = n_nationkey
    GROUP BY kind, n_name
    """,
    tags=("O3", "A1"),
)
def union_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        c.unionByName(s)
        .join(F.broadcast(n), F.col("nationkey") == n.n_nationkey)
        .groupBy("kind", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_parties"),
            money_sum("acctbal").alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# O4: intersect / except set semantics.
# --------------------------------------------------------------------------
@query(
    "intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("O4",),
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "except_custkeys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    """,
    tags=("O4",),
)
def except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who ordered but never above the threshold (EXCEPT DISTINCT)."""
    o = load_table(spark, sf_dir, "orders")
    all_ck = o.select(F.col("o_custkey").alias("custkey"))
    big_ck = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    return all_ck.subtract(big_ck)
