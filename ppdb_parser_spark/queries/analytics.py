"""Classic analytic query shapes over the star schema and event stream:
TPC-H-style shipping priority / local-supplier volume / promo share, and a
window-based signup→purchase funnel. All pure built-ins, all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import money_sum, money_sum_sql
from ..sources.tables import load_table
from .registry import query

REVENUE = money_sum_sql("l_extendedprice * (1 - l_discount)")


# --------------------------------------------------------------------------
# Q3 shape: top-10 undelivered orders by revenue for one market segment.
# --------------------------------------------------------------------------
@query(
    "analytics_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {REVENUE} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("J2", "A1", "O2", "F2"),
)
def analytics_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q5 shape: revenue from sales where supplier and customer share a nation
# ("local supplier volume"), per nation.
# --------------------------------------------------------------------------
@query(
    "analytics_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {REVENUE} AS revenue, COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("J2", "A1"),
    bench=True,
)
def analytics_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q14 shape: promo revenue share — ratio of two exact sums (deterministic
# double division).
# --------------------------------------------------------------------------
@query(
    "analytics_promo_share",
    oracle=f"""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           {money_sum_sql("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
             AS promo_revenue,
           {REVENUE} AS total_revenue,
           {money_sum_sql("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
             / {REVENUE} AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
    tags=("J1", "A6", "X1"),
)
def analytics_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(0.0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            money_sum(promo).alias("promo_revenue"),
            money_sum(disc).alias("total_revenue"),
            (money_sum(promo) / money_sum(disc)).alias("promo_share"),
        )
    )


# --------------------------------------------------------------------------
# Q18 shape: large-quantity orders — HAVING-filtered aggregate driving a
# semi join back into the fact chain.
# --------------------------------------------------------------------------
@query(
    "analytics_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING {money_sum_sql("l_quantity", 100)} > 120
    )
    SELECT c_mktsegment,
           COUNT(DISTINCT o_orderkey) AS n_orders,
           {money_sum_sql("o_totalprice")} AS total_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_mktsegment
    """,
    tags=("A1", "J4", "A2"),
)
def analytics_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(money_sum("l_quantity", 100).alias("qty"))
        .filter(F.col("qty") > 120)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            money_sum("o_totalprice").alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# Funnel: users whose first signup is later followed by a purchase —
# per-user min-timestamps compared, conversion counts per cohort day.
# --------------------------------------------------------------------------
@query(
    "analytics_signup_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup'
                 THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS first_signup_us,
             MIN(CASE WHEN event_type = 'purchase'
                 THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS first_purchase_us
      FROM events GROUP BY user_id
    )
    SELECT (first_signup_us // 86400000000) AS cohort_day,
           COUNT(*) AS n_signed_up,
           COUNT(CASE WHEN first_purchase_us > first_signup_us THEN 1 END)
             AS n_converted
    FROM per_user
    WHERE first_signup_us IS NOT NULL
    GROUP BY 1
    """,
    tags=("W3", "A6", "X2"),
)
def analytics_signup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_us",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
        ),
    )
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts_us"))).alias(
            "first_signup_us"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts_us"))).alias(
            "first_purchase_us"
        ),
    )
    return (
        per_user.filter(F.col("first_signup_us").isNotNull())
        .groupBy(
            F.floor(F.col("first_signup_us") / 86_400_000_000).alias("cohort_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_signed_up"),
            F.count(
                F.when(
                    F.col("first_purchase_us") > F.col("first_signup_us"), F.lit(1)
                )
            ).alias("n_converted"),
        )
    )


# --------------------------------------------------------------------------
# Q22 shape: high-balance customers gone dormant (no orders since
# 2000-01-01 — every fixture customer has SOME order), grouped by segment. Two classic subquery forms in
# one oracle — a scalar subquery (the positive-balance average) and NOT
# EXISTS (no orders) — while the Spark plan is their de-correlated shape:
# a broadcast 1-row aggregate + a left anti join. The above-average test
# runs as an exact integer comparison on the cents grid
# (bal_cents * n > sum_cents), immune to float-boundary flips.
# --------------------------------------------------------------------------
_SEGS = "('MACHINERY', 'AUTOMOBILE', 'BUILDING')"


@query(
    "analytics_lost_opportunity",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           {money_sum_sql("c_acctbal", 100)} AS total_bal
    FROM customer c
    WHERE c_mktsegment IN {_SEGS}
      AND CAST(ROUND(c_acctbal * 100) AS BIGINT) *
          (SELECT COUNT(*) FROM customer c2
           WHERE c2.c_mktsegment IN {_SEGS} AND c2.c_acctbal > 0)
        > (SELECT CAST(SUM(CAST(ROUND(c2.c_acctbal * 100) AS BIGINT)) AS BIGINT)
           FROM customer c2
           WHERE c2.c_mktsegment IN {_SEGS} AND c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
    tags=("A1", "J5", "F2"),
)
def analytics_lost_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    segs = ["MACHINERY", "AUTOMOBILE", "BUILDING"]
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(segs)
    )
    bal_cents = F.round(F.col("c_acctbal") * 100).cast("long")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal_cents).alias("sum_cents"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    rich = (
        c.crossJoin(F.broadcast(pos))
        .filter(bal_cents * F.col("n_pos") > F.col("sum_cents"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
        )
        .select("o_custkey")
    )
    no_orders = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return no_orders.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        money_sum("c_acctbal", 100).alias("total_bal"),
    )


# --------------------------------------------------------------------------
# Cohort retention: users grouped by first-activity week, counted in each
# subsequent activity week — the canonical product-analytics matrix.
# Scale shape: the per-user first-event aggregate is one user-keyed
# exchange; the (user, week) activity relation is distinct-collapsed
# map-side before its exchange; the cohort join broadcasts the (small)
# per-user firsts at local scale and hash-joins at cluster scale.
# --------------------------------------------------------------------------
@query(
    "analytics_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS DATE)
               AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
      FROM events
    )
    SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(datediff('day', f.cohort_week, a.wk) / 7 AS BIGINT)
             AS weeks_since,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("A2", "A1", "J2", "X2", "W3"),
)
def analytics_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_wk")
    )
    activity = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("wk")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort_wk") / 7).cast("long").alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )


# --------------------------------------------------------------------------
# Rolling 7-day active users (WAU per day), EXACT distinct. The
# scale-correct shape is map-side window expansion — each distinct
# (day, user) row contributes itself to the 7 target days it covers via
# an in-row sequence explode (bounded 7× fan-out, plain hash aggregate)
# — NOT a day×activity range join (BNLJ risk) and NOT a collect_set
# window (state grows with users). The trailing partial windows past the
# last observed day are cut by an in-plan 1-row max broadcast.
# --------------------------------------------------------------------------
@query(
    "analytics_rolling_wau",
    oracle="""
    WITH du AS (
      SELECT DISTINCT
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
             user_id
      FROM events
    ),
    mx AS (SELECT MAX(d) AS md FROM du),
    ex AS (
      SELECT CAST(unnest(generate_series(CAST(d AS TIMESTAMP),
                                         CAST(d AS TIMESTAMP) + INTERVAL 6 DAY,
                                         INTERVAL 1 DAY)) AS DATE) AS day,
             user_id
      FROM du
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
    FROM ex, mx WHERE day <= md GROUP BY 1
    """,
    tags=("A2", "A1", "X2", "X4"),
)
def analytics_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("d"), "user_id"
    ).distinct()
    mx = du.agg(F.max("d").alias("md"))
    ex = du.select(
        F.explode(
            F.expr("sequence(d, date_add(d, 6), interval 1 day)")
        ).alias("day"),
        "user_id",
    )
    return (
        ex.crossJoin(F.broadcast(mx))
        .filter(F.col("day") <= F.col("md"))
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )


# --------------------------------------------------------------------------
# RFM segmentation: per-customer recency / frequency / monetary quartiles
# (ntile windows with full tie-breaks), rolled up to segment counts.
# Scale shape: one customer-keyed aggregate; three global ntile windows
# over the (small) per-customer relation — at extreme customer counts the
# ntile boundary computation would swap to approx quantile cutpoints, a
# documented trade (the window form is the exact, oracle-checkable one).
# --------------------------------------------------------------------------
@query(
    "analytics_rfm_segments",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT custkey,
             ntile(4) OVER (ORDER BY last_order DESC, custkey) AS r_q,
             ntile(4) OVER (ORDER BY frequency DESC, custkey) AS f_q,
             ntile(4) OVER (ORDER BY monetary_cents DESC, custkey) AS m_q
      FROM per_cust
    )
    SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
           CAST(m_q AS BIGINT) AS m_q,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY 1, 2, 3
    """,
    tags=("W2", "A1", "X2"),
)
def analytics_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "monetary_cents"
        ),
    )
    scored = per_cust.select(
        "custkey",
        F.ntile(4)
        .over(Window.orderBy(F.desc("last_order"), F.asc("custkey")))
        .alias("r_q"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("frequency"), F.asc("custkey")))
        .alias("f_q"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("monetary_cents"), F.asc("custkey")))
        .alias("m_q"),
    )
    return (
        scored.groupBy(
            F.col("r_q").cast("long").alias("r_q"),
            F.col("f_q").cast("long").alias("f_q"),
            F.col("m_q").cast("long").alias("m_q"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


# --------------------------------------------------------------------------
# Market-basket co-occurrence: top part pairs by co-order count — the
# same candidate-pair join shape as the dedup family (equi-join on the
# grouping key, pair-ordered, hash aggregate; never a cross join). At
# 100 TB the per-order item lists are bounded (basket size), so the
# pair fan-out is Σ items_per_order² with a small constant — the shape
# scales linearly in orders.
# --------------------------------------------------------------------------
@query(
    "analytics_market_basket",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS n_co
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, CAST(n_co AS BIGINT) AS n_co
    FROM pairs
    ORDER BY n_co DESC, part_a, part_b
    LIMIT 10
    """,
    tags=("J6", "A1", "O2"),
)
def analytics_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(
            F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_co"))
    )
    return pairs.orderBy(
        F.desc("n_co"), F.asc("part_a"), F.asc("part_b")
    ).limit(10)


# --------------------------------------------------------------------------
# Q7 shape: bilateral trade flows — revenue between two specific nations
# by (supplier nation, customer nation, year). Six-relation join; both
# nation dims broadcast, the fact-side joins shuffle on their natural keys
# (l_orderkey / o_custkey / l_suppkey — all uniform), and the grid-exact
# revenue sum keeps the aggregate order-independent.
# --------------------------------------------------------------------------
@query(
    "analytics_trade_flows",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(o_orderdate) AS INT) AS order_year,
           COUNT(*) AS n_lineitems,
           {REVENUE} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
      AND n1.n_nationkey < 4 AND n2.n_nationkey < 4
    GROUP BY 1, 2, 3
    """,
    tags=("J1", "J2", "A1", "X2"),
)
def analytics_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("s_nk") < 4)
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("c_nk") < 4)
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("s_nk"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("c_nk"))
        .filter(F.col("s_nk") != F.col("c_nk"))
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("o_orderdate").cast("int").alias("order_year"),
    ).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
    )


# --------------------------------------------------------------------------
# Q8 shape: market share — NATION_0's share of ASIA-customer revenue per
# order year. Fact joins shuffle on natural keys; nation/region dims
# broadcast; the share is a conditional grid-exact sum over the same
# aggregate pass (no second scan, no self-join).
# --------------------------------------------------------------------------
@query(
    "analytics_market_share",
    oracle=f"""
    WITH base AS (
      SELECT year(o_orderdate) AS order_year,
             n1.n_name AS supp_nation,
             l_extendedprice * (1 - l_discount) AS rev
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    )
    SELECT CAST(order_year AS INT) AS order_year,
           {money_sum_sql("rev")} AS total_revenue,
           {money_sum_sql("CASE WHEN supp_nation = 'NATION_0' THEN rev ELSE 0 END")}
             AS nation_revenue,
           CAST(SUM(CAST(ROUND((CASE WHEN supp_nation = 'NATION_0' THEN rev
                                     ELSE 0 END) * 10000) AS BIGINT)) AS BIGINT)
             / CAST(SUM(CAST(ROUND(rev * 10000) AS BIGINT)) AS BIGINT)
             AS market_share
    FROM base
    GROUP BY order_year
    """,
    tags=("J1", "J2", "A1", "A6", "X2"),
)
def analytics_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    base = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("s_nk"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("c_nk"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("c_rk") == F.col("r_regionkey"),
        )
        .select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            "supp_nation",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_0", F.col("rev")).otherwise(0.0)
    nat_grid = F.sum(F.round(nat * 10_000).cast("long"))
    tot_grid = F.sum(F.round(F.col("rev") * 10_000).cast("long"))
    return base.groupBy("order_year").agg(
        money_sum(F.col("rev")).alias("total_revenue"),
        money_sum(nat).alias("nation_revenue"),
        (nat_grid / tot_grid).alias("market_share"),
    )


# --------------------------------------------------------------------------
# Q19 shape: disjunctive multi-branch predicate join (discounted revenue
# for three OR'd brand/size/quantity envelopes). The join key stays the
# plain equi key — the OR lives in a post-join filter Catalyst can still
# push partially (per-branch part filters reach the dim scan) — and the
# aggregate is a single grid-exact global sum.
# --------------------------------------------------------------------------
_Q19_BRANCHES_SQL = """(
      (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 5 AND l_quantity <= 25)
      OR (p_brand = 'Brand#15' AND p_size BETWEEN 10 AND 30
          AND l_quantity >= 10 AND l_quantity <= 35)
      OR (p_type = 'PROMO' AND p_size BETWEEN 1 AND 40
          AND l_quantity >= 20)
    )"""


@query(
    "analytics_disjunctive_join",
    oracle=f"""
    SELECT COUNT(*) AS n_lineitems,
           {money_sum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE {_Q19_BRANCHES_SQL}
    """,
    tags=("J2", "F2", "F3", "A1"),
)
def analytics_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    b1 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(5, 25)
    )
    b2 = (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    )
    b3 = (
        (F.col("p_type") == "PROMO")
        & F.col("p_size").between(1, 40)
        & (F.col("l_quantity") >= 20)
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .filter(b1 | b2 | b3)
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Ordered-sequence funnel (view -> click -> purchase): the product-
# analytics staple. Stage k's entry time is the user's FIRST qualifying
# event strictly after their stage-(k-1) entry and inside a 24 h
# conversion window (the selectivity that makes a funnel a funnel:
# 150 -> 60 -> 25 users at sf0.01) — three per-user min
# aggregates chained by strictly-after joins, every shuffle on user_id
# (at 100 TB the three stages co-partition; nothing global). Timestamps
# compare as epoch microseconds (bigint), the repo's events convention.
# --------------------------------------------------------------------------
def _funnel_epoch_us(col: str):
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {col})"
    )


@query(
    "analytics_event_funnel",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events
    ),
    s1 AS (
      SELECT user_id, MIN(ts_us) AS t1 FROM ev
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts_us) AS t2
      FROM ev e JOIN s1 ON e.user_id = s1.user_id AND e.ts_us > s1.t1
                        AND e.ts_us <= s1.t1 + 86400000000
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts_us) AS t3
      FROM ev e JOIN s2 ON e.user_id = s2.user_id AND e.ts_us > s2.t2
                        AND e.ts_us <= s2.t2 + 86400000000
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS stage, 'view' AS event_type,
             COUNT(*) AS n_users,
             CAST(SUM(t1) AS BIGINT) AS entry_us_sum
      FROM s1
      UNION ALL
      SELECT 2, 'click', COUNT(*), CAST(SUM(t2) AS BIGINT) FROM s2
      UNION ALL
      SELECT 3, 'purchase', COUNT(*), CAST(SUM(t3) AS BIGINT) FROM s3
    )
    """,
    tags=("A1", "J2", "W1", "X2"),
)
def analytics_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", _funnel_epoch_us("ts").alias("ts_us")
    )
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("ts_us") > F.col("t1"))
            & (F.col("ts_us") <= F.col("t1") + F.lit(86_400_000_000))
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("ts_us") > F.col("t2"))
            & (F.col("ts_us") <= F.col("t2") + F.lit(86_400_000_000))
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )

    def _stage(df, n, name, tcol):
        return df.agg(
            F.lit(n).alias("stage"),
            F.lit(name).alias("event_type"),
            F.count(F.lit(1)).alias("n_users"),
            F.sum(tcol).cast("long").alias("entry_us_sum"),
        )

    return (
        _stage(s1, 1, "view", "t1")
        .unionByName(_stage(s2, 2, "click", "t2"))
        .unionByName(_stage(s3, 3, "purchase", "t3"))
    )


# --------------------------------------------------------------------------
# Pearson correlation between event-type series, hash-exact. The moment
# sums (Sx, Sy, Sxy, Sxx, Syy over per-(user, day) cent totals) are pure
# int64 — order-independent — and the final
#   corr = (n·Sxy − Sx·Sy) / (sqrt(n·Sxx − Sx²) · sqrt(n·Syy − Sy²))
# uses only IEEE-754 correctly-rounded ops (×, /, sqrt) on those exact
# integers, so the rounded-6 value is bit-identical cross-engine — the
# same discipline as ts_interpolate's "fixed expression tree over exact
# inputs" rule. Engine built-ins (F.corr / DuckDB corr()) are NOT used:
# their streaming update order is engine-internal and not reproducible.
# Overflow bound: n·Sxy ≤ cells · (cells · maxcents²) ≈ 5e16 at sf0.1 —
# inside int64; at larger SFs the cell grain moves to (user, day, hour).
# Scale: one cell aggregate (map-side combining), a self-join of the
# ≤(types × cells) cell table on the cell key, one 10-row fold.
# --------------------------------------------------------------------------
_CORR_ORACLE = """
    WITH cells AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_no,
             event_type,
             SUM(CAST(floor(value * 100) AS BIGINT)) AS v
      FROM events GROUP BY 1, 2, 3
    ),
    paired AS (
      SELECT a.event_type AS t1, b.event_type AS t2, a.v AS x, b.v AS y
      FROM cells a JOIN cells b
        ON a.user_id = b.user_id AND a.day_no = b.day_no
       AND a.event_type < b.event_type
    ),
    m AS (
      SELECT t1, t2, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM paired GROUP BY t1, t2
    )
    SELECT t1, t2, CAST(n AS BIGINT) AS n_cells,
           round((n * sxy - sx * sy)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr
    FROM m WHERE n >= 2 AND n * sxx > sx * sx AND n * syy > sy * sy
"""


@query("analytics_corr_pairs", oracle=_CORR_ORACLE, tags=("A1", "J6", "X3"))
def analytics_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "user_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
            " div 86400000000"
        ).alias("day_no"),
        "event_type",
    ).agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("v"))
    a, b = cells.alias("a"), cells.alias("b")
    paired = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.day_no") == F.col("b.day_no"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("t1"),
        F.col("b.event_type").alias("t2"),
        F.col("a.v").alias("x"),
        F.col("b.v").alias("y"),
    )
    m = paired.groupBy("t1", "t2").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return m.filter(
        (F.col("n") >= 2)
        & (F.col("n") * F.col("sxx") > F.col("sx") * F.col("sx"))
        & (F.col("n") * F.col("syy") > F.col("sy") * F.col("sy"))
    ).select(
        "t1",
        "t2",
        F.col("n").cast("long").alias("n_cells"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
                * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
            ),
            6,
        ).alias("corr"),
    )


# --------------------------------------------------------------------------
# Lag-1 autocorrelation of the daily revenue series per event type —
# the same exact-int64-moments + correctly-rounded-IEEE-tail discipline
# as analytics_corr_pairs, with the pairing produced by a lag window
# over the day index instead of a key join. The missing-day guard uses
# the day arithmetic itself (day_no - lag(day_no) = 1) so gaps break
# pairs instead of silently pairing across them.
# --------------------------------------------------------------------------
_AUTOCORR_ORACLE = """
    WITH daily AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_no,
             SUM(CAST(floor(value * 100) AS BIGINT)) AS v
      FROM events GROUP BY 1, 2
    ),
    paired AS (
      SELECT event_type, v AS y,
             lag(v) OVER (PARTITION BY event_type ORDER BY day_no) AS x,
             day_no - lag(day_no) OVER (PARTITION BY event_type
                                        ORDER BY day_no) AS gap
      FROM daily
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM paired WHERE gap = 1 GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           round((n * sxy - sx * sy)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
             AS autocorr_lag1
    FROM m WHERE n >= 2 AND n * sxx > sx * sx AND n * syy > sy * sy
"""


@query(
    "analytics_autocorr_lag1",
    oracle=_AUTOCORR_ORACLE,
    tags=("A1", "W3", "X3", "X2"),
)
def analytics_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
            " div 86400000000"
        ).alias("day_no"),
    ).agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("v"))
    w = Window.partitionBy("event_type").orderBy("day_no")
    paired = daily.select(
        "event_type",
        F.col("v").alias("y"),
        F.lag("v").over(w).alias("x"),
        (F.col("day_no") - F.lag("day_no").over(w)).alias("gap"),
    ).filter(F.col("gap") == 1)
    m = paired.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return m.filter(
        (F.col("n") >= 2)
        & (F.col("n") * F.col("sxx") > F.col("sx") * F.col("sx"))
        & (F.col("n") * F.col("syy") > F.col("sy") * F.col("sy"))
    ).select(
        "event_type",
        F.col("n").cast("long").alias("n_pairs"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
                * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
            ),
            6,
        ).alias("autocorr_lag1"),
    )
