"""Window-function queries (SURVEY.md §2.6 W2–W4) and the custom join
operators J7/J8 exercised through them.

Determinism conventions on top of the module-wide ones:

- Every window ORDER BY carries a unique tie-break column (suppkey /
  event_id / orderkey) so rank-position functions (ntile, row_number) pick
  identical rows in both engines.
- Running/sliding float sums go through cents-scaled integers inside the
  window (DuckDB evaluates moving windows with segment trees, i.e. a
  different addition order than Spark's running accumulation — integer
  sums are associative, doubles are not).
- Event timestamps are compared as epoch microseconds (bigint), computed
  timezone-independently on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.joins import asof_join, band_join
from ..sources.tables import load_table
from .registry import query

#: TZ-independent epoch-microseconds for a TIMESTAMP_NTZ column.
def _epoch_us(col: str):
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {col})"
    )


_EPOCH_US_SQL = "epoch_us(CAST({col} AS TIMESTAMP))"


# --------------------------------------------------------------------------
# W2: ranking family over suppliers per nation.
# --------------------------------------------------------------------------
@query(
    "window_rank_family",
    oracle="""
    SELECT s_suppkey, n_name,
           s_acctbal,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           NTILE(4)       OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WINDOW w AS (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey)
    """,
    tags=("W2", "J1"),
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "s_suppkey",
            "n_name",
            "s_acctbal",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
        )
    )


# --------------------------------------------------------------------------
# W3: lag/lead analytics over the event stream (per-user inter-arrival).
# --------------------------------------------------------------------------
@query(
    "window_lag_lead",
    oracle=f"""
    SELECT event_id, user_id, event_type,
           {_EPOCH_US_SQL.format(col="ts")} AS ts_us,
           LAG({_EPOCH_US_SQL.format(col="ts")})
             OVER w AS prev_ts_us,
           {_EPOCH_US_SQL.format(col="ts")} - LAG({_EPOCH_US_SQL.format(col="ts")})
             OVER w AS gap_us,
           LEAD(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("W3", "X2"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn("ts_us", _epoch_us("ts"))
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.lag("ts_us").over(w).alias("prev_ts_us"),
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


# --------------------------------------------------------------------------
# W3b: value-position family — first/last/nth over an explicit full frame.
# --------------------------------------------------------------------------
@query(
    "window_value_family",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice)  OVER w AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("W3", "W4"),
)
def window_value_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


# --------------------------------------------------------------------------
# W4a: running (unbounded-preceding) sum — cents-exact inside the frame.
# --------------------------------------------------------------------------
@query(
    "window_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) / 100.0 AS running_total,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_so_far
    FROM orders
    """,
    tags=("W4",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return o.select(
        "o_orderkey",
        "o_custkey",
        (F.sum(cents).over(w) / 100.0).alias("running_total"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_so_far"),
    )


# --------------------------------------------------------------------------
# W4b: rangeBetween frame — per-user event activity in the trailing 10 min.
# --------------------------------------------------------------------------
@query(
    "window_range_frame",
    oracle=f"""
    SELECT event_id, user_id,
           {_EPOCH_US_SQL.format(col="ts")} AS ts_us,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY {_EPOCH_US_SQL.format(col="ts")}
                      RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
                AS BIGINT) / 100.0 AS trailing_10m_value,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY {_EPOCH_US_SQL.format(col="ts")}
                      RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing_10m_events
    FROM events
    """,
    tags=("W4", "X2"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn("ts_us", _epoch_us("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts_us"))
        .rangeBetween(-600_000_000, 0)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return e.select(
        "event_id",
        "user_id",
        "ts_us",
        (F.sum(cents).over(w) / 100.0).alias("trailing_10m_value"),
        F.count(F.lit(1)).over(w).cast("long").alias("trailing_10m_events"),
    )


# --------------------------------------------------------------------------
# J8: as-of join — latest 'click' at-or-before each 'purchase', per user.
# Oracle uses DuckDB's native ASOF LEFT JOIN; the engine uses the
# union+window operator (operators/joins.py).
#
# Duplicate-timestamp determinism: DuckDB's ASOF leaves the pick among
# right rows tied on ts UNSPECIFIED, while the engine's window tie-break
# picks the min payload struct — so BOTH sides pre-reduce the right
# relation to MIN(event_id) per (user_id, ts). On fixtures with unique
# per-user timestamps this is a no-op; with simultaneous events it pins
# one well-defined answer instead of hash-parity luck.
# --------------------------------------------------------------------------
@query(
    "asof_purchase_click",
    oracle=f"""
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           {_EPOCH_US_SQL.format(col="p.ts")} AS purchase_ts_us,
           c.click_ts_us AS click_ts_us,
           c.click_id AS click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
        SELECT user_id, ts, MIN(event_id) AS click_id,
               {_EPOCH_US_SQL.format(col="ts")} AS click_ts_us
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ) c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("J8",),
    bench=True,
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .withColumn("purchase_ts_us", _epoch_us("ts"))
        .select(
            F.col("event_id").alias("purchase_id"), "user_id", "ts", "purchase_ts_us"
        )
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("click_id"))
        .withColumn("click_ts_us", _epoch_us("ts"))
        .select("user_id", "click_ts_us", "click_id")
    )
    joined = asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_on="purchase_ts_us",
        right_on="click_ts_us",
        right_cols=["click_ts_us", "click_id"],
        how="left",
    )
    return joined.select(
        "purchase_id", "user_id", "purchase_ts_us", "click_ts_us", "click_id"
    )


# --------------------------------------------------------------------------
# J7: range/banded join — customers bucketed into irregular acctbal bands.
# Oracle is the plain theta join; the engine never executes a BNLJ.
# --------------------------------------------------------------------------
_BANDS = [
    ("deep_debt", -1000.0, -250.0),
    ("debt", -250.0, 0.0),
    ("low", 0.0, 1500.0),
    ("mid", 1500.0, 4500.0),
    ("high", 4500.0, 8000.0),
    ("top", 8000.0, 10000.0),
]
_BANDS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)


@query(
    "range_join_bands",
    oracle=f"""
    SELECT band,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS sum_acctbal
    FROM customer
    JOIN (SELECT * FROM (VALUES {_BANDS_SQL}) AS b(band, lo, hi))
      ON c_acctbal >= lo AND c_acctbal < hi
    GROUP BY band
    """,
    tags=("J7",),
)
def range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bands = spark.createDataFrame(_BANDS, "band string, lo double, hi double")
    joined = band_join(c, "c_acctbal", bands, bucket_width=500.0)
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum(cents) / 100.0).alias("sum_acctbal"),
    )


# --------------------------------------------------------------------------
# W2b: cume_dist — tie-aware cumulative distribution (exact rational).
# --------------------------------------------------------------------------
@query(
    "window_cume_dist",
    oracle="""
    SELECT p_partkey, p_brand, p_size,
           CUME_DIST() OVER (PARTITION BY p_brand ORDER BY p_size) AS size_cume
    FROM part
    """,
    tags=("W2",),
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.asc("p_size"))
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.cume_dist().over(w).alias("size_cume"),
    )


# --------------------------------------------------------------------------
# J8 forward: earliest purchase at-or-after each click (conversion lag).
# Same tagged-union + running-first window plan as the backward as-of —
# one user_id shuffle, no BNLJ; DuckDB's forward ASOF (l.ts <= r.ts) is
# the oracle.
# --------------------------------------------------------------------------
@query(
    "asof_click_next_purchase",
    oracle=f"""
    SELECT c.event_id AS click_id,
           c.user_id AS user_id,
           {_EPOCH_US_SQL.format(col="c.ts")} AS click_ts_us,
           p.purchase_id AS purchase_id,
           p.purchase_ts_us AS purchase_ts_us,
           p.purchase_ts_us - {_EPOCH_US_SQL.format(col="c.ts")} AS wait_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (
        SELECT user_id, ts, MIN(event_id) AS purchase_id,
               {_EPOCH_US_SQL.format(col="ts")} AS purchase_ts_us
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    ) p ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
    tags=("J8", "W3"),
)
def asof_click_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import asof_join_forward

    e = load_table(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .withColumn("click_ts_us", _epoch_us("ts"))
        .select(F.col("event_id").alias("click_id"), "user_id", "click_ts_us")
    )
    # Same duplicate-ts pre-reduction as asof_purchase_click (see above):
    # MIN(event_id) per (user_id, ts) makes the DuckDB ASOF pick
    # well-defined instead of fixture-invariant-dependent.
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("purchase_id"))
        .withColumn("purchase_ts_us", _epoch_us("ts"))
        .select(
            "user_id",
            "purchase_id",
            "purchase_ts_us",
        )
    )
    joined = asof_join_forward(
        clicks,
        purchases,
        by=["user_id"],
        left_on="click_ts_us",
        right_on="purchase_ts_us",
        right_cols=["purchase_id", "purchase_ts_us"],
        how="left",
    )
    return joined.select(
        "click_id",
        "user_id",
        "click_ts_us",
        "purchase_id",
        "purchase_ts_us",
        (F.col("purchase_ts_us") - F.col("click_ts_us")).alias("wait_us"),
    )
