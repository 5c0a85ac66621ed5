"""Source/sink queries (SURVEY.md §2.1 S3/S5): CSV and JSON-lines scans
with explicit schemas, and the parquet sink round-trip (partitioned write →
read-back). Oracles are VALUES relations built from the same deterministic
row-generator functions, so the scan+parse path itself is hash-checked."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import money_sum, money_sum_sql
from ..operators.ppdb import parse_ppdb_clean
from ..sources import files as FS
from ..sources.ppdb_pack import ensure_pack, lines_values_sql, pack_dir
from ..sources.text import read_text_lines
from .registry import query


def _csv_values_sql() -> str:
    rows = ", ".join(f"('{s}', {q}, {p})" for s, q, p in FS.csv_rows())
    return f"(SELECT * FROM (VALUES {rows}) AS c(sku, qty, price))"


def _json_values_sql() -> str:
    rows = ", ".join(
        f"({r['id']}, {len(r['tags'])}, {r['score']})" for r in FS.json_rows()
    )
    return f"(SELECT * FROM (VALUES {rows}) AS j(id, n_tags, score))"


# --------------------------------------------------------------------------
# S3a: CSV scan with explicit schema → aggregate.
# --------------------------------------------------------------------------
@query(
    "src_csv_scan",
    oracle=f"""
    SELECT CAST(qty % 3 AS BIGINT) AS qty_mod3,
           COUNT(*) AS n_items,
           {money_sum_sql("price", 100)} AS total_price
    FROM {_csv_values_sql()} c
    GROUP BY 1
    """,
    tags=("S3", "A1"),
)
def src_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = FS.read_csv_items(spark)
    return df.groupBy((F.col("qty") % 3).cast("long").alias("qty_mod3")).agg(
        F.count(F.lit(1)).alias("n_items"),
        money_sum("price", 100).alias("total_price"),
    )


# --------------------------------------------------------------------------
# S3b: JSON-lines scan with explicit nested schema (array field).
# --------------------------------------------------------------------------
@query(
    "src_json_scan",
    oracle=f"""
    SELECT id, n_tags, CAST(ROUND(score * 100) AS BIGINT) AS score_cents
    FROM {_json_values_sql()} j
    """,
    tags=("S3", "X4"),
)
def src_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = FS.read_json_docs(spark)
    return df.select(
        "id",
        F.size("tags").cast("long").alias("n_tags"),
        F.round(F.col("score") * 100).cast("long").alias("score_cents"),
    )


def _cache_dir(name: str) -> str:
    return os.path.join(os.path.dirname(pack_dir()), name)


# --------------------------------------------------------------------------
# S2b/S5b: ORC round-trip — second columnar format, same pushdown story.
# --------------------------------------------------------------------------
@query(
    "snk_orc_roundtrip",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           {money_sum_sql("o_totalprice")} AS sum_price
    FROM orders WHERE o_totalprice > 150000
    GROUP BY o_orderstatus
    """,
    tags=("S2", "S5"),
)
def snk_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    out = _cache_dir("orders_orc_v1")
    load_table(spark, sf_dir, "orders").write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return (
        back.filter(F.col("o_totalprice") > 150000)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# S5c: JSON-lines sink round-trip (schema carried explicitly on re-read).
# --------------------------------------------------------------------------
@query(
    "snk_json_roundtrip",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
    tags=("S3", "S5"),
)
def snk_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from ..sources.tables import load_table

    out = _cache_dir("docs_json_v1")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    docs.write.mode("overwrite").json(out)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = spark.read.schema(schema).json(out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# S5: parquet sink round-trip — parse the gzip pack, write parquet
# partitioned by lhs (the reference's "parse once, serialize, reload"
# lifecycle done the Spark way), read it back and aggregate. The oracle is
# the same VALUES parse, proving the sink+scan is lossless.
# --------------------------------------------------------------------------
@query(
    "snk_parquet_roundtrip",
    oracle=f"""
    WITH raw AS (SELECT value FROM {lines_values_sql()} r),
    split_lines AS (
      SELECT str_split(value, ' ||| ') AS p, len(str_split(value, ' ||| ')) AS n
      FROM raw
    )
    SELECT trim(p[1]) AS lhs, COUNT(*) AS n_rules,
           COUNT(DISTINCT trim(p[2])) AS n_phrases
    FROM split_lines WHERE n IN (5, 6)
    GROUP BY 1
    """,
    tags=("S5", "S1"),
)
def snk_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = os.path.join(os.path.dirname(pack_dir()), "ppdb_parquet_v1")
    parsed = parse_ppdb_clean(read_text_lines(spark, ensure_pack() + "/*.txt.gz"))
    # partitionBy(lhs): downstream per-LHS queries prune partitions at scan
    parsed.write.mode("overwrite").partitionBy("lhs").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("lhs").agg(
        F.count(F.lit(1)).alias("n_rules"),
        F.countDistinct("phrase").alias("n_phrases"),
    )


# --------------------------------------------------------------------------
# S2/S5 partition pruning: query ONE lhs partition of the partitioned
# parquet sink — the directory filter must reach the scan as a
# PartitionFilter (asserted in tests/test_plan_shapes.py), so the engine
# reads 1/6th of the files. This is the scan-side payoff of the
# partitionBy(lhs) sink above.
# --------------------------------------------------------------------------
@query(
    "snk_partition_pruned",
    oracle=f"""
    WITH raw AS (SELECT value FROM {lines_values_sql()} r),
    split_lines AS (
      SELECT str_split(value, ' ||| ') AS p, len(str_split(value, ' ||| ')) AS n
      FROM raw
    )
    SELECT trim(p[2]) AS phrase, COUNT(*) AS n_rules
    FROM split_lines WHERE n IN (5, 6) AND trim(p[1]) = '[NP]'
    GROUP BY 1
    """,
    tags=("S2", "S5", "F2"),
)
def snk_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = os.path.join(os.path.dirname(pack_dir()), "ppdb_parquet_v1")
    parsed = parse_ppdb_clean(read_text_lines(spark, ensure_pack() + "/*.txt.gz"))
    parsed.write.mode("overwrite").partitionBy("lhs").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.filter(F.col("lhs") == "[NP]")
        .groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("n_rules"))
    )


# --------------------------------------------------------------------------
# S1 via the custom Python DataSource (Spark 4 connector API): the gzip
# pack read through spark.read.format("ppdbpack") — one InputPartition
# per shard, lines produced on executors — then the SAME parse kernel and
# the SAME VALUES oracle as the built-in text scan. Proves a user can add
# a first-class format Spark lacks without leaving Python.
# --------------------------------------------------------------------------
@query(
    "src_custom_datasource",
    oracle=f"""
    WITH raw AS (SELECT value FROM {lines_values_sql()} r),
    split_lines AS (
      SELECT str_split(value, ' ||| ') AS p, len(str_split(value, ' ||| ')) AS n
      FROM raw
    )
    SELECT trim(p[1]) AS lhs, COUNT(*) AS n_rules,
           COUNT(DISTINCT trim(p[2])) AS n_phrases
    FROM split_lines WHERE n IN (5, 6)
    GROUP BY 1
    """,
    tags=("S1", "P1"),
)
def src_custom_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.custom_datasource import register

    register(spark)
    lines = (
        spark.read.format("ppdbpack")
        .option("path", ensure_pack())
        .load()
        .select("value")
    )
    parsed = parse_ppdb_clean(lines)
    return parsed.groupBy("lhs").agg(
        F.count(F.lit(1)).alias("n_rules"),
        F.countDistinct("phrase").alias("n_phrases"),
    )


# --------------------------------------------------------------------------
# S5/J2 at scale: bucketed co-located join. Both sides are written
# bucketBy(join key) + sortBy once, and the repeated join then plans with
# NO shuffle exchange on either side — the 100 TB answer for recurring
# lineitem⋈orders joins (pay the shuffle once at write time; every
# subsequent join is exchange-free). The oracle computes the same
# cents-exact aggregate over the plain join; the no-Exchange plan shape
# is asserted in tests/test_bucketed_join.py (with broadcast disabled —
# at fixture scale Catalyst broadcasts the small side, which bypasses
# buckets; the bucketed SMJ is the large–large shape).
# --------------------------------------------------------------------------
@query(
    "snk_bucketed_join",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           {money_sum_sql("l_extendedprice")} AS total_extprice
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("S5", "S2", "J2", "A1"),
)
def snk_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import shutil

    from ..sources.tables import load_table

    # sf-tagged table names: the driver (sf0.01) and the local test suite
    # (sf0.001) must not read each other's buckets
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    li_t, o_t = f"li_bkt_{tag}", f"o_bkt_{tag}"

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    # in-memory catalog: a previous session's table dirs can survive while
    # the metadata doesn't — clear both before (re)writing
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for t in (li_t, o_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable(li_t)
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable(o_t)

    joined = spark.table(li_t).join(
        spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey")
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        money_sum("l_extendedprice").alias("total_extprice"),
    )


# --------------------------------------------------------------------------
# S3c: PERMISSIVE scan of a dirty CSV — malformed rows quarantine into a
# corrupt-record column (P6 discipline at the source layer); good rows
# aggregate normally, corrupt rows are counted and sampled. Oracle derives
# the identical split from the same pure-function fixture generator.
# --------------------------------------------------------------------------
def _dirty_csv_values_sql() -> str:
    from ..sources.files import dirty_csv_rows

    rows = ", ".join(
        f"('{sku}', {'NULL' if bad else qty_text}, {price_text}, "
        f"{'TRUE' if bad else 'FALSE'})"
        for sku, qty_text, price_text, bad in dirty_csv_rows()
    )
    return f"(SELECT * FROM (VALUES {rows}) AS c(sku, qty, price, is_bad))"


@query(
    "src_csv_permissive",
    oracle=f"""
    SELECT CAST(COUNT(*) FILTER (WHERE NOT is_bad) AS BIGINT) AS n_good,
           CAST(COUNT(*) FILTER (WHERE is_bad) AS BIGINT) AS n_corrupt,
           CAST(SUM(qty) FILTER (WHERE NOT is_bad) AS BIGINT) AS total_qty,
           MIN(CASE WHEN is_bad THEN sku END) AS first_bad_sku
    FROM {_dirty_csv_values_sql()} c
    """,
    tags=("S3", "P6", "A6"),
)
def src_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = FS.read_csv_items_permissive(spark)
    bad = F.col("_corrupt").isNotNull()
    return df.agg(
        F.count(F.when(~bad, 1)).alias("n_good"),
        F.count(F.when(bad, 1)).alias("n_corrupt"),
        F.sum(F.when(~bad, F.col("qty"))).cast("long").alias("total_qty"),
        F.min(F.when(bad, F.split(F.col("_corrupt"), ",").getItem(0))).alias(
            "first_bad_sku"
        ),
    )


# --------------------------------------------------------------------------
# Z-order layout keys — the lakehouse multi-column data-skipping pattern:
# interleave the low 16 bits of two join/filter keys into one 32-bit
# Morton key; sorting/partitioning the table by it keeps BOTH key ranges
# narrow inside every file, so min/max footer stats prune scans on either
# column (what Delta/Iceberg OPTIMIZE ZORDER does). The query audits that
# locality claim: per 64-bucket z-range, row count and the SPAN of each
# key — spans ~1/8 of the domain per bucket instead of the full domain a
# single-column sort would leave on the second key. Pure integer bit
# math → bit-identical cross-engine → full hash oracle.
# --------------------------------------------------------------------------
def _z_spark(a: F.Column, b: F.Column) -> F.Column:
    z = F.lit(0).cast("long")
    for i in range(16):
        z = (
            z
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def _z_sql(a: str, b: str) -> str:
    return " + ".join(
        f"((({a} >> {i}) & 1) << {2 * i}) + ((({b} >> {i}) & 1) << {2 * i + 1})"
        for i in range(16)
    )


@query(
    "snk_zorder_layout",
    oracle=f"""
    WITH keys AS (
      SELECT l_orderkey & 65535 AS ka, l_partkey & 65535 AS kb,
             ({_z_sql("l_orderkey & 65535", "l_partkey & 65535")}) AS zkey
      FROM lineitem
    )
    SELECT zkey >> 26 AS zbucket,
           COUNT(*) AS n_rows,
           MAX(ka) - MIN(ka) AS ka_span,
           MAX(kb) - MIN(kb) AS kb_span
    FROM keys GROUP BY 1
    """,
    tags=("S5", "X3", "A1"),
)
def snk_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    ka = F.col("l_orderkey").bitwiseAND(F.lit(65535))
    kb = F.col("l_partkey").bitwiseAND(F.lit(65535))
    keys = li.select(
        ka.alias("ka"), kb.alias("kb"), _z_spark(ka, kb).alias("zkey")
    )
    return keys.groupBy(
        F.shiftright(F.col("zkey"), 26).alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.max("ka") - F.min("ka")).alias("ka_span"),
        (F.max("kb") - F.min("kb")).alias("kb_span"),
    )
