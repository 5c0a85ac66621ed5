"""Scalar function surface (SURVEY.md §2.8 X1–X6).

Row-level function batteries over the fixture tables, one query per family.
Cross-engine float discipline: transcendental results (ln/exp) are rounded
to 8 decimals — their true values are continuous, so the probability of a
rounding-boundary straddle is ~1e-8/value, while sqrt/pow on small integer
grids are IEEE-exact and stay unrounded. Derived ints are cast to long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load_table
from .registry import query


# --------------------------------------------------------------------------
# X1: string functions over part.
# --------------------------------------------------------------------------
@query(
    "scalar_strings",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           CAST(length(p_name) AS BIGINT) AS name_len,
           substring(p_type, 1, 5) AS type_prefix,
           concat_ws('|', p_brand, p_type) AS brand_type,
           CAST(levenshtein(p_brand, 'Brand#33') AS BIGINT) AS brand_dist,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_first_word,
           replace(p_name, ' ', '_') AS name_snake,
           CAST(instr(p_type, 'ED') AS BIGINT) AS ed_pos,
           CAST(len(str_split(p_type, ' ')) AS BIGINT) AS type_words
    FROM part
    """,
    tags=("X1",),
)
def scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#33")).cast("long").alias(
            "brand_dist"
        ),
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_first_word"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.instr(F.col("p_type"), "ED").cast("long").alias("ed_pos"),
        F.size(F.split("p_type", " ")).cast("long").alias("type_words"),
    )


# --------------------------------------------------------------------------
# X2: date/time functions over orders.
# --------------------------------------------------------------------------
@query(
    "scalar_dates",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(day(o_orderdate) AS BIGINT) AS order_day,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow_sun1,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS BIGINT)
             AS days_to_y2k,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day
    FROM orders
    """,
    tags=("X2",),
)
def scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("order_year"),
        F.quarter(d).cast("long").alias("order_quarter"),
        F.month(d).cast("long").alias("order_month"),
        F.dayofmonth(d).cast("long").alias("order_day"),
        F.dayofweek(d).cast("long").alias("dow_sun1"),  # Spark: 1=Sunday
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(
            F.lit("2000-01-01").cast("timestamp_ntz"), d
        ).cast("long").alias("days_to_y2k"),
        F.expr("timestampadd(DAY, 30, o_orderdate)").alias("due_date"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_day"),
    )


# --------------------------------------------------------------------------
# X3: math functions over a deterministic lineitem sample.
# --------------------------------------------------------------------------
@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25) AS qty_dev,
           floor(l_extendedprice) AS price_floor,
           ceil(l_extendedprice) AS price_ceil,
           round(ln(l_extendedprice), 8) AS price_ln,
           sqrt(l_quantity) AS qty_sqrt,
           pow(l_quantity, 2) AS qty_sq,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
    FROM lineitem
    WHERE l_orderkey % 97 = 0
    """,
    tags=("X3", "F4"),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 97 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.round(F.log("l_extendedprice"), 8).alias("price_ln"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
    )


# --------------------------------------------------------------------------
# X4: array functions incl. higher-order lambdas, over document tokens.
# --------------------------------------------------------------------------
@query(
    "scalar_arrays",
    oracle="""
    SELECT doc_id,
           CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
           list_contains(str_split(text, ' '), 'spark') AS has_spark,
           array_to_string(list_slice(str_split(text, ' '), 1, 3), ' ') AS first3,
           CAST(len(list_filter(str_split(text, ' '), x -> length(x) > 4)) AS BIGINT)
             AS n_long_tokens,
           CAST(list_aggregate(list_transform(str_split(text, ' '), x -> length(x)),
                               'sum') AS BIGINT) AS total_token_chars,
           list_sort(str_split(text, ' '))[1] AS alpha_first
    FROM documents
    """,
    tags=("X4",),
)
def scalar_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).cast("long").alias(
            "n_long_tokens"
        ),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_token_chars"),
        F.element_at(F.array_sort(toks), 1).alias("alpha_first"),
    )


# --------------------------------------------------------------------------
# X6: JSON extraction from events.props — both the path API and the typed
# from_json API on the Spark side, one scalar answer for the oracle.
# --------------------------------------------------------------------------
@query(
    "scalar_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                 THEN 1 END) AS n_high
    FROM events GROUP BY event_type
    """,
    tags=("X6",),
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k_path = F.get_json_object("props", "$.k").cast("long")
    k_typed = F.from_json(
        "props", T.StructType([T.StructField("k", T.LongType())])
    ).getField("k")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k_path).alias("sum_k"),
        F.max(k_typed).cast("long").alias("max_k"),
        F.count(F.when(k_path > 50, F.lit(1))).alias("n_high"),
    )


# --------------------------------------------------------------------------
# NULL-handling battery: coalesce / nullif / null-safe equality over the
# left-join shape that actually produces NULLs.
# --------------------------------------------------------------------------
@query(
    "scalar_null_handling",
    oracle="""
    SELECT c_custkey,
           COALESCE(o_orderkey, -1) AS order_or_sentinel,
           NULLIF(c_mktsegment, 'BUILDING') AS segment_nullified,
           (o_orderkey IS NOT DISTINCT FROM NULL) AS has_no_order,
           CASE WHEN o_totalprice IS NULL THEN 'none'
                WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS order_class
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 150000) o
           ON c_custkey = o_custkey AND o_orderkey % 7 = 0
    """,
    tags=("F3", "J3", "X3"),
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderkey % 7 == 0),
        "left",
    )
    return joined.select(
        "c_custkey",
        F.coalesce(F.col("o_orderkey"), F.lit(-1)).alias("order_or_sentinel"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias(
            "segment_nullified"
        ),
        F.col("o_orderkey").eqNullSafe(F.lit(None)).alias("has_no_order"),
        F.when(F.col("o_totalprice").isNull(), "none")
        .when(F.col("o_totalprice") > 200000, "big")
        .otherwise("small")
        .alias("order_class"),
    )


# --------------------------------------------------------------------------
# X1 regex battery: extract / extract-all / count / replace / match over
# document text. Patterns stay inside the Java-regex ∩ RE2 common subset
# (simple character classes and \b word boundaries) so both engines agree
# on the language, not just the answers.
# --------------------------------------------------------------------------
@query(
    "scalar_regex",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '[aeiou]{2,}', 0) AS first_vowel_run,
           CAST(len(regexp_extract_all(text, '[aeiou]{2,}')) AS BIGINT)
             AS n_vowel_runs,
           CAST(len(regexp_extract_all(text, '\b[a-z]{7,}\b')) AS BIGINT)
             AS n_long_words,
           CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
             AS n_consonant_chars,
           CAST(CASE WHEN regexp_matches(text, '\bthe\b') THEN 1 ELSE 0 END
                AS BIGINT) AS has_the
    FROM documents
    """,
    tags=("X1",),
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"[aeiou]{2,}", 0).alias("first_vowel_run"),
        F.size(F.regexp_extract_all("text", F.lit(r"[aeiou]{2,}"), 0))
        .cast("long").alias("n_vowel_runs"),
        F.size(F.regexp_extract_all("text", F.lit(r"\b[a-z]{7,}\b"), 0))
        .cast("long").alias("n_long_words"),
        F.length(F.regexp_replace("text", r"[aeiou]", "")).cast("long").alias(
            "n_consonant_chars"
        ),
        F.when(F.col("text").rlike(r"\bthe\b"), F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("has_the"),
    )


# --------------------------------------------------------------------------
# X3 bitwise battery: AND/OR/XOR, shifts and popcount over event ids —
# the hash/partition/bucket arithmetic every distributed keying scheme
# leans on, checked bit-exact cross-engine.
# --------------------------------------------------------------------------
@query(
    "scalar_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 4096 AS with_flag,
           xor(event_id, 1431655765) AS xored,
           event_id << 3 AS shifted_up,
           event_id >> 2 AS shifted_down,
           CAST(bit_count(event_id) AS BIGINT) AS popcount
    FROM events WHERE event_id < 1000
    """,
    tags=("X3",),
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return ev.select(
        "event_id",
        F.expr("event_id & 255").alias("low_byte"),
        F.expr("event_id | 4096").alias("with_flag"),
        F.expr("event_id ^ 1431655765").alias("xored"),
        F.expr("shiftleft(event_id, 3)").alias("shifted_up"),
        F.expr("shiftright(event_id, 2)").alias("shifted_down"),
        F.bit_count("event_id").cast("long").alias("popcount"),
    )


# --------------------------------------------------------------------------
# X6b: Spark 4 VariantType — semi-structured round-trip. JSON is built
# in-plan (to_json of a nested struct), parsed to a VARIANT, and fields
# come back out through typed variant_get JSON paths (nested object,
# array index, and a try_variant_get miss → NULL). The oracle exercises
# DuckDB's independent JSON path engine on identically-built JSON, so
# path semantics are cross-checked, not round-tripped.
# --------------------------------------------------------------------------
@query(
    "scalar_variant",
    oracle="""
    WITH j AS (
      SELECT o_orderkey,
             to_json(struct_pack(
               k := o_orderkey,
               price := o_totalprice,
               nested := struct_pack(s := o_orderstatus),
               tags := [o_orderpriority]
             )) AS js
      FROM orders
    )
    SELECT o_orderkey,
           CAST(json_extract(js, '$.k') AS BIGINT) AS k_back,
           CAST(json_extract(js, '$.price') AS DOUBLE) AS price_back,
           json_extract_string(js, '$.nested.s') AS status_back,
           json_extract_string(js, '$.tags[0]') AS tag0,
           CAST(NULL AS BIGINT) AS missing_field
    FROM j
    """,
    tags=("X6", "U6"),
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    j = o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("k"),
                F.col("o_totalprice").alias("price"),
                F.struct(F.col("o_orderstatus").alias("s")).alias("nested"),
                F.array(F.col("o_orderpriority")).alias("tags"),
            )
        ).alias("js"),
    )
    v = j.select("o_orderkey", F.parse_json("js").alias("v"))
    return v.select(
        "o_orderkey",
        F.variant_get("v", "$.k", "long").alias("k_back"),
        F.variant_get("v", "$.price", "double").alias("price_back"),
        F.variant_get("v", "$.nested.s", "string").alias("status_back"),
        F.variant_get("v", "$.tags[0]", "string").alias("tag0"),
        F.try_variant_get("v", "$.not_there", "long").alias("missing_field"),
    )


# --------------------------------------------------------------------------
# X3b: ANSI-safe arithmetic — try_divide / try_multiply overflow /
# try_cast all yield NULL instead of raising, the behavior a robust
# 100 TB pipeline wants for dirty numeric columns. The oracle re-derives
# each NULL condition explicitly (DuckDB has TRY_CAST but no try_divide /
# overflow-to-NULL arithmetic).
# --------------------------------------------------------------------------
@query(
    "scalar_try_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity = 1 THEN NULL
                ELSE l_extendedprice / (l_quantity - 1) END AS safe_unit_price,
           CASE WHEN l_orderkey + 1 >= 2 THEN NULL
                ELSE (l_orderkey + 1) * 9223372036854775807 END AS overflow_mul,
           TRY_CAST(l_returnflag AS BIGINT) AS flag_as_int,
           TRY_CAST(CASE WHEN l_linenumber = 1 THEN '12x'
                         ELSE CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) END
                    AS BIGINT) AS qty_as_int
    FROM lineitem
    """,
    tags=("X3", "F3"),
)
def scalar_try_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - 1
        ).alias("safe_unit_price"),
        F.try_multiply(
            F.col("l_orderkey") + 1, F.lit(9223372036854775807)
        ).alias("overflow_mul"),
        F.col("l_returnflag").try_cast("long").alias("flag_as_int"),
        F.when(F.col("l_linenumber") == 1, F.lit("12x"))
        .otherwise(F.col("l_quantity").cast("long").cast("string"))
        .try_cast("long")
        .alias("qty_as_int"),
    )
