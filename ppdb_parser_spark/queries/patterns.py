"""Composite OLAP patterns (pyspark guide §Common OLAP patterns): unpivot,
SCD2/MERGE-INTO emulation, and nested-array explosion — each a named,
oracle-checked recipe built purely from engine primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import money_sum, money_sum_sql
from ..operators.ppdb import parse_ppdb_clean
from ..sources.ppdb_pack import ensure_pack, lines_values_sql
from ..sources.tables import load_table
from ..sources.text import read_text_lines
from .registry import query


# --------------------------------------------------------------------------
# Unpivot (melt): wide per-status sums → long (status, measure) rows.
# --------------------------------------------------------------------------
@query(
    "pattern_unpivot",
    oracle=f"""
    WITH wide AS (
      SELECT o_orderpriority,
             {money_sum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END")} AS open_value,
             {money_sum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")} AS finished_value,
             {money_sum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END")} AS pending_value
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status, value FROM wide
    UNPIVOT (value FOR status IN (open_value, finished_value, pending_value))
    """,
    tags=("A6", "F1"),
)
def pattern_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        money_sum(
            F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")).otherwise(0.0)
        ).alias("open_value"),
        money_sum(
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)
        ).alias("finished_value"),
        money_sum(
            F.when(F.col("o_orderstatus") == "P", F.col("o_totalprice")).otherwise(0.0)
        ).alias("pending_value"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["open_value", "finished_value", "pending_value"],
        variableColumnName="status",
        valueColumnName="value",
    )


# --------------------------------------------------------------------------
# SCD2 / MERGE INTO emulation (no Delta in v1): apply an updates batch to a
# dimension — close changed rows, insert new versions, keep unchanged —
# via anti-join + union, entirely set-based.
# Updates batch (deterministic): customers with acctbal > 7500 move to
# segment 'PLATINUM'.
# --------------------------------------------------------------------------
@query(
    "pattern_scd2_merge",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, 'PLATINUM' AS new_segment
      FROM customer WHERE c_acctbal > 7500
    ),
    unchanged AS (
      SELECT c.c_custkey, c.c_mktsegment AS segment, TRUE AS is_current,
             0 AS version
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
    ),
    closed AS (
      SELECT c.c_custkey, c.c_mktsegment AS segment, FALSE AS is_current,
             0 AS version
      FROM customer c JOIN updates u ON u.c_custkey = c.c_custkey
    ),
    inserted AS (
      SELECT u.c_custkey, u.new_segment AS segment, TRUE AS is_current,
             1 AS version
      FROM updates u
    )
    SELECT c_custkey, segment, is_current, CAST(version AS BIGINT) AS version
    FROM (SELECT * FROM unchanged UNION ALL SELECT * FROM closed
          UNION ALL SELECT * FROM inserted)
    """,
    tags=("J5", "O3", "F3"),
)
def pattern_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    updates = c.filter(F.col("c_acctbal") > 7500).select(
        "c_custkey", F.lit("PLATINUM").alias("new_segment")
    )
    unchanged = c.join(updates, "c_custkey", "left_anti").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit(True).alias("is_current"),
        F.lit(0).cast("long").alias("version"),
    )
    closed = c.join(updates, "c_custkey").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit(False).alias("is_current"),
        F.lit(0).cast("long").alias("version"),
    )
    inserted = updates.select(
        "c_custkey",
        F.col("new_segment").alias("segment"),
        F.lit(True).alias("is_current"),
        F.lit(1).cast("long").alias("version"),
    )
    return unchanged.unionByName(closed).unionByName(inserted)


# --------------------------------------------------------------------------
# P4/X4: explode parsed alignment pairs into rows — per (src,tgt) offset
# distribution across the pack (nested array → relational).
# --------------------------------------------------------------------------
@query(
    "ppdb_alignment_explode",
    oracle=f"""
    WITH raw AS (SELECT value FROM {lines_values_sql()} r),
    split_lines AS (
      SELECT str_split(value, ' ||| ') AS p, len(str_split(value, ' ||| ')) AS n
      FROM raw
    ),
    aligns AS (
      SELECT trim(p[5]) AS align FROM split_lines
      WHERE n IN (5, 6) AND trim(p[5]) <> ''
    ),
    pairs AS (
      SELECT try_cast(split_part(a, '-', 1) AS BIGINT) AS src,
             try_cast(split_part(a, '-', 2) AS BIGINT) AS tgt
      FROM aligns, unnest(str_split(align, ' ')) AS t(a)
    )
    SELECT src - tgt AS offset, COUNT(*) AS n_pairs
    FROM pairs GROUP BY 1
    """,
    tags=("P4", "X4"),
)
def ppdb_alignment_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = parse_ppdb_clean(read_text_lines(spark, ensure_pack() + "/*.txt.gz"))
    pairs = parsed.filter(F.col("alignment").isNotNull()).select(
        F.explode("alignment").alias("pair")
    )
    return pairs.groupBy(
        (F.col("pair.src").cast("long") - F.col("pair.tgt").cast("long")).alias(
            "offset"
        )
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


# --------------------------------------------------------------------------
# Point-in-time dimensional lookup (the SCD2 read-side): validity
# intervals are derived per customer with a window lead over their order
# history (valid_from = o_orderdate, valid_to = next order's date, open
# tail = current), then events join their user's interval covering the
# event time. The join is an equi join on the user key with a range
# predicate — per-user interval counts bound the fan-out, never a BNLJ.
# --------------------------------------------------------------------------
@query(
    "pattern_scd2_pointintime",
    oracle="""
    WITH iv AS (
      SELECT o_custkey, o_orderpriority,
             CAST(o_orderdate AS TIMESTAMP) AS vf,
             lead(CAST(o_orderdate AS TIMESTAMP))
               OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS vt
      FROM orders
    )
    SELECT iv.o_orderpriority AS effective_priority,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e
    JOIN iv ON e.user_id = iv.o_custkey
           AND CAST(e.ts AS TIMESTAMP) >= iv.vf
           AND (iv.vt IS NULL OR CAST(e.ts AS TIMESTAMP) < iv.vt)
    GROUP BY 1
    """,
    tags=("J7", "W3", "X2", "A2"),
)
def pattern_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    iv = o.select(
        "o_custkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("timestamp").alias("vf"),
        F.lead(F.col("o_orderdate").cast("timestamp")).over(w).alias("vt"),
    )
    ts = F.col("ts").cast("timestamp")
    j = e.join(
        iv,
        (F.col("user_id") == F.col("o_custkey"))
        & (ts >= F.col("vf"))
        & (F.col("vt").isNull() | (ts < F.col("vt"))),
    )
    return j.groupBy(
        F.col("o_orderpriority").alias("effective_priority")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
