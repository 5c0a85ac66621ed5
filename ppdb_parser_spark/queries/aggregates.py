"""Aggregation-completeness queries (SURVEY.md §2.5 A1–A7).

The TPC-H-Q1-shaped ``agg_pricing_summary`` is the headline hash-aggregate;
rollup/cube/grouping-sets go through both the DataFrame API and the SQL
entry point (§3.3). Sums stay on the exact integer grid (see
``functions/exact.py``); ``sum_charge`` is a 6-decimal product so it scales
by 1e6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import money_sum, money_sum_sql
from ..sources.tables import load_table, register_views
from .registry import query


# --------------------------------------------------------------------------
# A1 (full shape): TPC-H Q1-style pricing summary.
# --------------------------------------------------------------------------
@query(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {money_sum_sql("l_quantity")} AS sum_qty,
           {money_sum_sql("l_extendedprice")} AS sum_base_price,
           {money_sum_sql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
           {money_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 1_000_000)} AS sum_charge,
           {money_sum_sql("l_quantity")} / COUNT(*) AS avg_qty,
           {money_sum_sql("l_discount")} / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1", "F2"),
    bench=True,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum("l_quantity").alias("sum_qty"),
        money_sum("l_extendedprice").alias("sum_base_price"),
        money_sum(disc_price).alias("sum_disc_price"),
        money_sum(charge, 1_000_000).alias("sum_charge"),
        (money_sum("l_quantity") / cnt).alias("avg_qty"),
        (money_sum("l_discount") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


# --------------------------------------------------------------------------
# A2: exact distinct counts (multiple in one aggregate → Spark expand).
# --------------------------------------------------------------------------
@query(
    "agg_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("A2",),
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# A3: approximate distinct (HLL). The raw estimate is engine-specific, so the
# query is SELF-CHECKING: it emits the exact count plus a boolean asserting
# the HLL estimate landed within 3× its configured relative standard
# deviation. DuckDB's oracle computes the exact side and a literal TRUE — a
# drifting estimator flips the boolean and fails the driver's hash check,
# turning the former rows-only query into a real correctness signal.
# --------------------------------------------------------------------------
@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_3rsd
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("A3",),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    rsd = 0.02
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=rsd).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    ).select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 3 * rsd * F.col("exact_parts")
        ).alias("within_3rsd"),
    )


# --------------------------------------------------------------------------
# A5: rollup with grouping_id.
# --------------------------------------------------------------------------
@query(
    "agg_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           GROUPING(r_name, n_name) AS gid,
           COUNT(*) AS n_customers,
           {money_sum_sql("c_acctbal")} AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("A5",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_customers"),
            money_sum("c_acctbal").alias("sum_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# A5: cube.
# --------------------------------------------------------------------------
@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           {money_sum_sql("l_quantity")} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("A5",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        money_sum("l_quantity").alias("sum_qty"),
    )


# --------------------------------------------------------------------------
# A5 via the SQL entry point: GROUPING SETS (§3.3 — ANTLR → same Catalyst
# pipeline; also exercises S6 view registration).
# --------------------------------------------------------------------------
@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {money_sum_sql("o_totalprice")} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("A5", "S6"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {money_sum_sql("o_totalprice")} AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --------------------------------------------------------------------------
# A6: pivot (conditional aggregation spread over columns).
# --------------------------------------------------------------------------
@query(
    "agg_pivot_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS n_open,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS n_finished,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS n_pending
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("A6",),
)
def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("n_finished"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("n_pending"),
    )


# --------------------------------------------------------------------------
# A6: filtered aggregation (sum over CASE) — revenue split by return status.
# --------------------------------------------------------------------------
@query(
    "agg_filtered",
    oracle=f"""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           {money_sum_sql("CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END")}
             AS returned_value,
           {money_sum_sql("CASE WHEN l_returnflag <> 'R' THEN l_extendedprice ELSE 0 END")}
             AS kept_value,
           COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned
    FROM lineitem GROUP BY 1
    """,
    tags=("A6", "X2"),
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    is_r = F.col("l_returnflag") == "R"
    return li.groupBy(
        F.year("l_shipdate").cast("long").alias("ship_year")
    ).agg(
        money_sum(F.when(is_r, F.col("l_extendedprice")).otherwise(0.0)).alias(
            "returned_value"
        ),
        money_sum(F.when(~is_r, F.col("l_extendedprice")).otherwise(0.0)).alias(
            "kept_value"
        ),
        F.count(F.when(is_r, F.lit(1))).alias("n_returned"),
    )


# --------------------------------------------------------------------------
# A7: exact median / percentiles (interpolating, on grid values).
# --------------------------------------------------------------------------
@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           median(l_quantity) AS med_qty,
           quantile_cont(l_quantity, 0.25) AS p25_qty,
           quantile_cont(l_quantity, 0.75) AS p75_qty,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("A7",),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.percentile("l_quantity", 0.25).alias("p25_qty"),
        F.percentile("l_quantity", 0.75).alias("p75_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


# --------------------------------------------------------------------------
# A7 (approx variant): percentile_approx. Estimates are engine-specific, so
# like agg_approx_distinct this is SELF-CHECKING: KLL/GK with accuracy=1000
# bounds rank error by n/1000, which at any tested SF keeps the approximate
# median well inside 2% of the exact value; the emitted boolean asserts that
# and DuckDB's oracle emits the exact median plus literal TRUE. Prices sit on
# the cents grid, so an even-count median sits on the half-cent grid: emit it
# as BIGINT half-cents (×200) — immune to the one-ulp interpolation
# differences raw doubles could carry across engines.
# --------------------------------------------------------------------------
@query(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(median(l_extendedprice) * 200) AS BIGINT)
               AS exact_median_halfcents,
           TRUE AS within_2pct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("A7", "A3"),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median"),
        F.median("l_extendedprice").alias("exact_median"),
    ).select(
        "l_returnflag",
        F.round(F.col("exact_median") * 200)
        .cast("long")
        .alias("exact_median_halfcents"),
        (
            F.abs(F.col("approx_median") - F.col("exact_median"))
            <= 0.02 * F.col("exact_median")
        ).alias("within_2pct"),
    )


# --------------------------------------------------------------------------
# A1/X3: fixed-width histogram of order totals, bucketed with INTEGER
# division on the cents grid (a double `floor(x/w)` can misbucket a value
# sitting exactly on a boundary when the two engines' doubles differ by an
# ulp; BIGINT cents `div` cannot). One map + one hash aggregate — at
# 100 TB this is a pure map-side-combine shape, ~n_buckets rows out.
# --------------------------------------------------------------------------
@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 5000000 AS BIGINT)
             AS bucket,
           CAST(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 5000000 AS BIGINT)
                * 50000.0 AS DOUBLE) AS bucket_lo,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS sum_price
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("A1", "X3"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    bucket = F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT) div 5000000")
    return (
        o.select(
            bucket.alias("bucket"),
            (bucket * 50000.0).alias("bucket_lo"),
            cents.alias("__cents"),
        )
        .groupBy("bucket", "bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("__cents") / 100.0).alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# Data profiling in ONE scan (A1/X1 composite): per-column null count,
# distinct count and min/max, unpivoted to a (column, metric) relation.
# The whole profile is a single aggregate pass — never one job per column
# (the naive profiler shape that dies first at 100 TB); min/max of the
# money column ride the cents grid so the doubles hash identically.
# --------------------------------------------------------------------------
@query(
    "profile_columns",
    oracle="""
    SELECT 'c_custkey' AS col_name,
           CAST(COUNT(*) - COUNT(c_custkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
           CAST(MIN(c_custkey) AS BIGINT) AS min_v,
           CAST(MAX(c_custkey) AS BIGINT) AS max_v
    FROM customer
    UNION ALL
    SELECT 'c_nationkey',
           CAST(COUNT(*) - COUNT(c_nationkey) AS BIGINT),
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
           CAST(MIN(c_nationkey) AS BIGINT),
           CAST(MAX(c_nationkey) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'c_acctbal_cents',
           CAST(COUNT(*) - COUNT(c_acctbal) AS BIGINT),
           CAST(COUNT(DISTINCT c_acctbal) AS BIGINT),
           CAST(MIN(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT),
           CAST(MAX(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment',
           CAST(COUNT(*) - COUNT(c_mktsegment) AS BIGINT),
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
           NULL, NULL
    FROM customer
    """,
    tags=("A1", "A2", "X1", "O3"),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    n = F.count(F.lit(1))
    agg = c.agg(
        (n - F.count("c_custkey")).alias("nn_custkey"),
        F.countDistinct("c_custkey").alias("nd_custkey"),
        F.min("c_custkey").cast("long").alias("mn_custkey"),
        F.max("c_custkey").cast("long").alias("mx_custkey"),
        (n - F.count("c_nationkey")).alias("nn_nationkey"),
        F.countDistinct("c_nationkey").alias("nd_nationkey"),
        F.min("c_nationkey").cast("long").alias("mn_nationkey"),
        F.max("c_nationkey").cast("long").alias("mx_nationkey"),
        (n - F.count("c_acctbal")).alias("nn_acctbal"),
        F.countDistinct("c_acctbal").alias("nd_acctbal"),
        F.min(cents).alias("mn_acctbal"),
        F.max(cents).alias("mx_acctbal"),
        (n - F.count("c_mktsegment")).alias("nn_mktsegment"),
        F.countDistinct("c_mktsegment").alias("nd_mktsegment"),
    )
    row = F.struct
    return agg.select(
        F.explode(
            F.array(
                row(
                    F.lit("c_custkey").alias("col_name"),
                    F.col("nn_custkey").cast("long").alias("n_nulls"),
                    F.col("nd_custkey").cast("long").alias("n_distinct"),
                    F.col("mn_custkey").alias("min_v"),
                    F.col("mx_custkey").alias("max_v"),
                ),
                row(
                    F.lit("c_nationkey").alias("col_name"),
                    F.col("nn_nationkey").cast("long").alias("n_nulls"),
                    F.col("nd_nationkey").cast("long").alias("n_distinct"),
                    F.col("mn_nationkey").alias("min_v"),
                    F.col("mx_nationkey").alias("max_v"),
                ),
                row(
                    F.lit("c_acctbal_cents").alias("col_name"),
                    F.col("nn_acctbal").cast("long").alias("n_nulls"),
                    F.col("nd_acctbal").cast("long").alias("n_distinct"),
                    F.col("mn_acctbal").alias("min_v"),
                    F.col("mx_acctbal").alias("max_v"),
                ),
                row(
                    F.lit("c_mktsegment").alias("col_name"),
                    F.col("nn_mktsegment").cast("long").alias("n_nulls"),
                    F.col("nd_mktsegment").cast("long").alias("n_distinct"),
                    F.lit(None).cast("long").alias("min_v"),
                    F.lit(None).cast("long").alias("max_v"),
                ),
            )
        ).alias("m")
    ).select("m.*")
