"""Time-series / hypertable-style queries over `events` (SURVEY.md §2.6
W3/W4, §2.8 X2 — the batch rollup family a TimescaleDB-style user expects).

Gap-filling is the operation that distinguishes a time-series rollup from a
plain GROUP BY: empty buckets must appear (count 0) and carry-forward
(LOCF) must bridge them. The bucket calendar is generated IN-PLAN with
``sequence()`` from a 1-row min/max aggregate — no driver-side date math,
so the same plan works on a 100 TB event log: the calendar is a tiny
broadcast side, the only big shuffle is the per-(type, hour) partial
aggregate, and LOCF is a partitioned (never global) window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# --------------------------------------------------------------------------
# Hourly gap-fill + LOCF: every (event_type, hour) slot of the observed
# span appears, missing slots get n_events = 0 and carry the last observed
# hourly sum forward. Sums are cents-exact (functions/exact.py pattern) so
# the LOCF'd doubles are bit-identical across engines.
# --------------------------------------------------------------------------
_FILLED_CTE = """
    hourly AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sv
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS d0,
             date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS d1
      FROM events
    ),
    cal AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 HOUR)) AS h FROM span
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    filled AS (
      SELECT t.event_type, c.h, hr.n, hr.sv
      FROM cal c CROSS JOIN types t
      LEFT JOIN hourly hr ON hr.event_type = t.event_type AND hr.h = c.h
    )
"""

_GAPFILL_ORACLE = f"""
    WITH {_FILLED_CTE}
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:00') AS hour,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(sv, 0.0) AS DOUBLE) AS sum_value,
           CAST(COALESCE(
             last_value(sv IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ), 0.0) AS DOUBLE) AS locf_value
    FROM filled
"""


def filled_hourly_frame(ev: DataFrame) -> DataFrame:
    """The gap-filled frame both rollups share: every (event_type, hour)
    slot of the observed span, with NULL n/sv for empty slots. Takes the
    events DataFrame directly so scale experiments can feed synthetic
    unions through the identical plan."""
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("sv"),
    )
    span = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("d0"),
        F.date_trunc("hour", F.max("ts")).alias("d1"),
    )
    cal = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = ev.select("event_type").distinct()
    return cal.crossJoin(types).join(hourly, ["event_type", "h"], "left")


def _filled_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return filled_hourly_frame(load_table(spark, sf_dir, "events"))


@query(
    "ts_gapfill_locf",
    oracle=_GAPFILL_ORACLE,
    tags=("X2", "W3", "J3", "A1"),
    bench=True,
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    filled = _filled_hourly(spark, sf_dir)
    locf_w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("sv", F.lit(0.0)).cast("double").alias("sum_value"),
        F.coalesce(
            F.last("sv", ignorenulls=True).over(locf_w), F.lit(0.0)
        ).cast("double").alias("locf_value"),
    )


# --------------------------------------------------------------------------
# Linear interpolation across gaps: empty hours get
#   prev + (next - prev) * (t - t_prev) / (t_next - t_prev)
# between the nearest observed hours (carry at the boundaries). Every
# operand is either a cents-grid double or an integer hour index, and the
# expression trees are mirrored token-for-token on both engines — IEEE 754
# doubles make a fixed expression tree bit-deterministic, so this hashes
# exactly even though it is "float math" (only reduction ORDER is
# engine-dependent, and there is no reduction here).
# --------------------------------------------------------------------------
_INTERP_ORACLE = f"""
    WITH {_FILLED_CTE},
    idx AS (
      SELECT event_type, h, sv,
             date_diff('hour', TIMESTAMP '1970-01-01 00:00:00', h) AS t
      FROM filled
    ),
    w AS (
      SELECT event_type, h, sv, t,
        last_value(sv IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY h
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN sv IS NOT NULL THEN t END IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY h
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(sv IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY h
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN sv IS NOT NULL THEN t END IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY h
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM idx
    )
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:00') AS hour,
           CAST(CASE WHEN sv IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS observed,
           CAST(CASE
             WHEN sv IS NOT NULL THEN sv
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv)
                  * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
           END AS DOUBLE) AS interp_value
    FROM w
"""


@query("ts_interpolate", oracle=_INTERP_ORACLE, tags=("X2", "W3", "W4", "J3"))
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    filled = _filled_hourly(spark, sf_dir)
    idx = filled.withColumn(
        "t",
        F.expr("timestampdiff(HOUR, TIMESTAMP_NTZ'1970-01-01 00:00:00', h)"),
    )
    base = Window.partitionBy("event_type").orderBy("h")
    wp = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_t = F.when(F.col("sv").isNotNull(), F.col("t"))
    pv = F.last("sv", ignorenulls=True).over(wp)
    pt = F.last(obs_t, ignorenulls=True).over(wp)
    nv = F.first("sv", ignorenulls=True).over(wn)
    nt = F.first(obs_t, ignorenulls=True).over(wn)
    interp = (
        F.when(F.col("sv").isNotNull(), F.col("sv"))
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(
            pv + (nv - pv)
            * ((F.col("t") - pt).cast("double") / (nt - pt).cast("double"))
        )
    )
    return idx.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        F.when(F.col("sv").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("observed"),
        interp.cast("double").alias("interp_value"),
    )


# --------------------------------------------------------------------------
# TPC-H Q17-style correlated scalar subquery: revenue from "small-quantity"
# lineitems, where small = below 20% of that part's own average quantity.
# The 0.2*avg threshold is evaluated as an EXACT integer comparison
# (5 * qty * n < sum_qty — quantities are integral), so no float boundary
# can flip between engines. The oracle keeps the textbook correlated-
# subquery form; the Spark plan is the de-correlated join Catalyst would
# produce anyway: one per-part aggregate joined back — two shuffles on
# l_partkey, broadcast part filter, no per-row subquery execution.
# --------------------------------------------------------------------------
_SMALL_QTY_ORACLE = """
    SELECT p.p_brand,
           COUNT(*) AS n_small,
           CAST(CAST(SUM(CAST(ROUND(l.l_extendedprice * 10000) AS BIGINT))
                AS BIGINT) / 10000.0 / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#13', 'Brand#22', 'Brand#25')
      AND 5 * CAST(ROUND(l.l_quantity) AS BIGINT)
            * (SELECT COUNT(*) FROM lineitem l2
               WHERE l2.l_partkey = l.l_partkey)
          < (SELECT CAST(SUM(CAST(ROUND(l2.l_quantity) AS BIGINT)) AS BIGINT)
             FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p.p_brand
"""


@query(
    "analytics_small_qty_revenue",
    oracle=_SMALL_QTY_ORACLE,
    tags=("A1", "J1", "F2"),
)
def analytics_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import money_sum

    li = load_table(spark, sf_dir, "lineitem")
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin("Brand#13", "Brand#22", "Brand#25"))
        .select("p_partkey", "p_brand")
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.round("l_quantity").cast("long")).alias("sum_q"),
        F.count(F.lit(1)).alias("n_q"),
    )
    sel = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .join(per_part, "l_partkey")
        .filter(
            F.round("l_quantity").cast("long") * 5 * F.col("n_q")
            < F.col("sum_q")
        )
    )
    return sel.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_small"),
        (money_sum("l_extendedprice") / 7.0).cast("double").alias("avg_yearly"),
    )


# --------------------------------------------------------------------------
# Daily OHLC resample (the financial-rollup shape): open/close are the
# values at the earliest/latest event of each (event_type, day), selected
# with min_by/max_by over a zero-padded (epoch_us, event_id) string key —
# total order, unique, and identically collatable in both engines (DuckDB
# 1.0 arg_min/arg_max cannot take struct keys). high/low are plain min/max
# on the cents-grid value. One hash aggregate, no window, no second pass.
# --------------------------------------------------------------------------
_OHLC_ORACLE = """
    WITH keyed AS (
      SELECT event_type,
             strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d')
               AS day,
             value,
             lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 16, '0')
               || '-' || lpad(CAST(event_id AS VARCHAR), 12, '0') AS k
      FROM events
    )
    SELECT event_type, day,
           arg_min(value, k) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, k) AS close,
           COUNT(*) AS n_events
    FROM keyed GROUP BY event_type, day
"""


@query("ts_ohlc_daily", oracle=_OHLC_ORACLE, tags=("X2", "A1", "A7"))
def ts_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    epoch_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
    )
    k = F.concat(
        F.lpad(epoch_us.cast("string"), 16, "0"),
        F.lit("-"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    keyed = ev.select(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "value",
        k.alias("k"),
    )
    return keyed.groupBy("event_type", "day").agg(
        F.min_by("value", "k").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "k").alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# ts_ewma_dyadic — exponentially weighted moving average with α = 1/2 on
# a dyadic integer grid. True EWMA is a sequential recurrence (not
# window-expressible without pow(), whose float rounding is not
# ulp-stable cross-engine); the dyadic 8-tap truncation makes it exact:
# weight 2^(7-k) for the k-th lag, so numerator and present-weight
# denominator are pure int64 sums of lag() columns and the result is one
# integer division. Truncation error of the dropped tail is ≤ 2^-8 of
# the weight mass — below the output grid. One shuffle (the per-user
# window sort); at scale this is the standard time-series layout:
# partition by series key, sort within partition — no global sort.
# --------------------------------------------------------------------------
_EWMA_TAPS = 8

_EWMA_TERMS_SQL = " + ".join(
    f"COALESCE(lag(vmilli, {k}) OVER w * {1 << (_EWMA_TAPS - 1 - k)}, 0)"
    for k in range(_EWMA_TAPS)
)
_EWMA_DEN_SQL = " + ".join(
    f"(CASE WHEN lag(vmilli, {k}) OVER w IS NOT NULL"
    f" THEN {1 << (_EWMA_TAPS - 1 - k)} ELSE 0 END)"
    for k in range(_EWMA_TAPS)
)

_EWMA_ORACLE = f"""
    WITH purchases AS (
      SELECT user_id, event_id,
             CAST(floor(value * 1000) AS BIGINT) AS vmilli
      FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id, event_id, vmilli,
           ({_EWMA_TERMS_SQL}) * 1000 // ({_EWMA_DEN_SQL}) AS ewma_micro
    FROM purchases
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""


@query("ts_ewma_dyadic", oracle=_EWMA_ORACLE, tags=("W3", "X3", "W4"))
def ts_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # vmilli >= 0 is LOAD-BEARING for cross-engine parity: the final
    # `_num div _den` uses Spark's `div` (truncate toward zero) while
    # the oracle uses DuckDB `//` (floor) — identical only for
    # non-negative numerators. The fixture's `value` is non-negative;
    # enforce in-plan (ADVICE r9 latent) instead of diverging silently
    # on a rebased fixture.
    vm = F.floor(F.col("value") * 1000).cast("long")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.when(
            F.assert_true(
                vm >= 0,
                "ewma dyadic precondition: value < 0 makes Spark `div` "
                "(truncate) disagree with DuckDB `//` (floor) — rebase "
                "values or switch both engines to floor division",
            ).isNull(),
            vm,
        ).alias("vmilli"),
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    num = sum(
        F.coalesce(F.lag("vmilli", k).over(w) * (1 << (_EWMA_TAPS - 1 - k)), F.lit(0))
        for k in range(_EWMA_TAPS)
    )
    den = sum(
        F.when(
            F.lag("vmilli", k).over(w).isNotNull(),
            F.lit(1 << (_EWMA_TAPS - 1 - k)),
        ).otherwise(F.lit(0))
        for k in range(_EWMA_TAPS)
    )
    return (
        purchases.withColumn("_num", (num * 1000).cast("long"))
        .withColumn("_den", den.cast("long"))
        .select(
            "user_id",
            "event_id",
            "vmilli",
            F.expr("_num div _den").alias("ewma_micro"),
        )
    )


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE): a month spine generated by
# LINEAR recursion (one row per step — no path explosion; Spark's UNION
# ALL-only recursion is safe exactly for this acyclic shape) left-joined
# to monthly order aggregates. DuckDB's native recursive CTE is the
# oracle. Cyclic closures (dup groups) deliberately stay on the
# driver-loop operator: UNION-dedup recursion is unsupported and UNION ALL
# on a cyclic graph never terminates.
# --------------------------------------------------------------------------
@query(
    "ts_recursive_month_spine",
    oracle="""
    WITH RECURSIVE bounds AS (
      SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
             CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
      FROM orders
    ),
    months(m) AS (
      SELECT lo FROM bounds
      UNION ALL
      SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months, bounds
      WHERE m < hi
    ),
    agg AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               / 100.0 AS total_price
      FROM orders GROUP BY 1
    )
    SELECT strftime(months.m, '%Y-%m') AS month,
           CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
           COALESCE(total_price, 0.0) AS total_price
    FROM months LEFT JOIN agg ON months.m = agg.m
    """,
    tags=("X2", "A1", "J3", "S6"),
)
def ts_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
          SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
                 CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
          FROM orders_v
        ),
        months(m) AS (
          SELECT lo FROM bounds
          UNION ALL
          SELECT add_months(m, 1) FROM months, bounds WHERE m < hi
        ),
        agg AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                 COUNT(*) AS n_orders,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   / 100.0 AS total_price
          FROM orders_v GROUP BY 1
        )
        SELECT date_format(months.m, 'yyyy-MM') AS month,
               CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(total_price, 0.0) AS DOUBLE) AS total_price
        FROM months LEFT JOIN agg ON months.m = agg.m
        """
    )


# --------------------------------------------------------------------------
# ts_anomaly_argmax — per-(series, day) most-deviant event with an EXACT
# integer z-test. z² = (n·v − S1)² / (n·S2 − S1²) needs no float sqrt:
# the 4σ verdict cross-multiplies to dev² > 16·(n·S2 − S1²) on int64
# (4σ sits at ~p70 of the fixture's per-day argmax z's, 2.4–6.0 on its
# heavy-tailed values — a threshold that actually discriminates)
# (v in cents; bounds hold to n ≈ 30k rows/group — the day grouping is
# the operative guard; larger groups move to (day, hour) or wider cents).
# One window shuffle on (event_type, day); the argmax rides the same
# exchange via row_number. This is the metric-monitoring op of a
# recurring pipeline: per series per day, the worst point and whether it
# statistically deviates — deterministic, no sampling, no floats.
# --------------------------------------------------------------------------
_ANOM_ORACLE = """
    WITH v AS (
      SELECT event_type, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_no,
             CAST(floor(value * 100) AS BIGINT) AS vcents
      FROM events
    ),
    stats AS (
      SELECT *,
             COUNT(*) OVER w AS n,
             SUM(vcents) OVER w AS s1,
             SUM(vcents * vcents) OVER w AS s2
      FROM v
      WINDOW w AS (PARTITION BY event_type, day_no)
    ),
    ranked AS (
      SELECT *, abs(n * vcents - s1) AS dev,
             row_number() OVER (PARTITION BY event_type, day_no
                                ORDER BY abs(n * vcents - s1) DESC,
                                         event_id) AS rk
      FROM stats
    )
    SELECT event_type, CAST(day_no AS BIGINT) AS day_no,
           CAST(n AS BIGINT) AS n_events,
           event_id, vcents, CAST(dev AS BIGINT) AS dev,
           dev * dev > 16 * (n * s2 - s1 * s1) AS is_outlier
    FROM ranked WHERE rk = 1 AND n >= 2
"""


@query("ts_anomaly_argmax", oracle=_ANOM_ORACLE, tags=("W2", "W4", "X2", "X3"))
def ts_anomaly_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
            " div 86400000000"
        ).alias("day_no"),
        F.floor(F.col("value") * 100).cast("long").alias("vcents"),
    )
    w = Window.partitionBy("event_type", "day_no")
    stats = v.select(
        "*",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("vcents").over(w).alias("s1"),
        F.sum(F.col("vcents") * F.col("vcents")).over(w).alias("s2"),
    ).withColumn("dev", F.abs(F.col("n") * F.col("vcents") - F.col("s1")))
    ranked = stats.withColumn(
        "rk",
        F.row_number().over(
            w.orderBy(F.col("dev").desc(), F.col("event_id"))
        ),
    )
    return ranked.filter((F.col("rk") == 1) & (F.col("n") >= 2)).select(
        "event_type",
        F.col("day_no").cast("long"),
        F.col("n").cast("long").alias("n_events"),
        "event_id",
        "vcents",
        F.col("dev").cast("long"),
        (
            F.col("dev") * F.col("dev")
            > 16 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
        ).alias("is_outlier"),
    )
