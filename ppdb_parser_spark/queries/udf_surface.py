"""Python-boundary surface (SURVEY.md §2.11 U1–U5): scalar pandas UDF,
grouped-agg pandas UDF, applyInPandas (grouped map), mapInPandas
(partition iterator), and a Python UDTF.

Each query routes real work through the Arrow boundary but keeps the math
on integers / fixed rationals, so the result is oracle-checkable — the
check proves the Arrow transfer itself is lossless, not just that the
formula agrees. (Rule of the engine: UDFs are the slow path — these exist
to cover the API surface and as templates for genuinely custom logic like
model scoring; everything expressible stays in built-ins.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load_table
from .registry import query


# --------------------------------------------------------------------------
# U1: vectorized scalar pandas UDF — cents conversion (Arrow round-trip of
# doubles → exact int64).
# --------------------------------------------------------------------------
@query(
    "udf_scalar_cents",
    oracle="""
    SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS value_cents
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("U1", "U6"),
)
def udf_scalar_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.LongType())
    def cents(v: pd.Series) -> pd.Series:
        # floor(x + 0.5) = half-AWAY-from-zero for the non-negative fixture
        # values — matches SQL ROUND; pandas .round() is half-to-even and
        # would disagree on exact .5 boundaries (e.g. 0.125 * 100)
        import numpy as np

        return np.floor(v * 100 + 0.5).astype("int64")

    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return e.select("event_id", cents(F.col("value")).alias("value_cents"))


# --------------------------------------------------------------------------
# U2: grouped-aggregate pandas UDF — integer-exact sum of cents per group
# (int64 accumulation in numpy: order-independent).
# --------------------------------------------------------------------------
@query(
    "udf_grouped_agg_sum",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events GROUP BY event_type
    """,
    tags=("U2", "U6"),
)
def udf_grouped_agg_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.LongType(), F.PandasUDFType.GROUPED_AGG)  # type: ignore[arg-type]
    def total_cents(v: pd.Series) -> int:
        # half-away-from-zero (values non-negative), matching SQL ROUND
        import numpy as np

        return int(np.floor(v * 100 + 0.5).astype("int64").sum())

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        total_cents(F.col("value")).alias("total_cents")
    )


# --------------------------------------------------------------------------
# U3: applyInPandas grouped map — per-group min-max normalization
# (rational arithmetic on fixed inputs → deterministic doubles).
# --------------------------------------------------------------------------
@query(
    "udf_grouped_map_minmax",
    oracle="""
    SELECT event_id, event_type,
           round((value - mn) / nullif(mx - mn, 0), 6) AS value_norm
    FROM (
      SELECT event_id, event_type, value,
             MIN(value) OVER (PARTITION BY event_type) AS mn,
             MAX(value) OVER (PARTITION BY event_type) AS mx
      FROM events
    )
    """,
    tags=("U3", "U6"),
)
def udf_grouped_map_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    def minmax(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["value"].min(), pdf["value"].max()
        span = mx - mn
        norm = (pdf["value"] - mn) / span if span != 0 else pd.Series(
            [float("nan")] * len(pdf), index=pdf.index
        )
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "value_norm": norm.round(6),
            }
        )

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return e.groupBy("event_type").applyInPandas(
        minmax, schema="event_id long, event_type string, value_norm double"
    )


# --------------------------------------------------------------------------
# U4: mapInPandas partition iterator — per-batch derived columns.
# --------------------------------------------------------------------------
@query(
    "udf_map_partitions_bucket",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor(value / 50) AS BIGINT) AS value_bucket,
           CAST(length(event_type) AS BIGINT) AS type_len
    FROM events
    """,
    tags=("U4", "U6"),
)
def udf_map_partitions_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "user_id": pdf["user_id"],
                    "value_bucket": np.floor(pdf["value"] / 50).astype("int64"),
                    "type_len": pdf["event_type"].str.len().astype("int64"),
                }
            )

    e = load_table(spark, sf_dir, "events")
    return e.mapInPandas(
        bucketize,
        schema="event_id long, user_id long, value_bucket long, type_len long",
    )


# --------------------------------------------------------------------------
# U5: Python UDTF — one row in, one row per token out (rule-expansion
# shape); oracle is unnest + generate_subscripts.
# --------------------------------------------------------------------------
@query(
    "udtf_explode_types",
    oracle="""
    SELECT p_partkey,
           unnest(str_split(p_type, ' ')) AS word,
           CAST(generate_subscripts(str_split(p_type, ' '), 1) - 1 AS BIGINT) AS word_idx
    FROM part WHERE p_partkey % 10 = 0
    """,
    tags=("U5",),
)
def udtf_explode_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="p_partkey bigint, word string, word_idx bigint")
    class ExplodeWords:
        def eval(self, p_partkey: int, p_type: str):
            for i, w in enumerate(p_type.split(" ")):
                yield p_partkey, w, i

    spark.udtf.register("explode_words", ExplodeWords)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    p.select("p_partkey", "p_type").createOrReplaceTempView("udtf_part_input")
    return spark.sql(
        "SELECT t.p_partkey, t.word, t.word_idx "
        "FROM udtf_part_input, LATERAL explode_words(p_partkey, p_type) t"
    )


# --------------------------------------------------------------------------
# U1 (Spark 4 Arrow-optimized Python UDF): same cents conversion through
# `udf(..., useArrow=True)` — row-wise Python logic with Arrow transfer
# instead of pickle, the migration path for legacy @udf code that can't be
# vectorized. Kept distinct from the pandas_udf twin so both transports
# stay covered.
# --------------------------------------------------------------------------
@query(
    "udf_arrow_scalar",
    oracle="""
    SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS value_cents
    FROM events WHERE event_type = 'signup'
    """,
    tags=("U1", "U6"),
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(returnType=T.LongType(), useArrow=True)
    def cents(v: float) -> int:
        # math.floor(x + 0.5) = half-away-from-zero for non-negative
        # values, matching the oracle's SQL ROUND; Python round() is
        # half-to-even and differs on exact .5 boundaries
        import math

        return math.floor(v * 100 + 0.5)

    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    return e.select("event_id", cents(F.col("value")).alias("value_cents"))


# --------------------------------------------------------------------------
# U4 (Arrow-native): mapInArrow — the zero-pandas batch transform. The
# batch arrives as a pyarrow RecordBatch and leaves as one; no
# Series/DataFrame materialization at all, the cheapest Python boundary
# Spark offers. Used here for the cents projection over purchases.
# --------------------------------------------------------------------------
@query(
    "udf_map_in_arrow",
    oracle="""
    SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS value_cents
    FROM events WHERE event_type = 'view'
    """,
    tags=("U4", "U6"),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def to_cents(batches):
        for batch in batches:
            cents = pc.cast(
                # half_towards_infinity = half-away-from-zero, matching the
                # oracle's SQL ROUND (pyarrow's default is half_to_even)
                pc.round(
                    pc.multiply(batch.column("value"), pa.scalar(100.0)),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("event_id"), cents],
                names=["event_id", "value_cents"],
            )

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select("event_id", "value")
    )
    return e.mapInArrow(to_cents, schema="event_id long, value_cents long")


# --------------------------------------------------------------------------
# U5 (Spark 4 polymorphic UDTF): output schema computed at ANALYSIS time
# from a literal argument — split_fixed(value, 6) emits part0..part5
# columns because the planner calls analyze() with the constant 6. This is
# the dynamic-schema table function the static-returnType UDTF above
# can't express.
# --------------------------------------------------------------------------
from ..sources.ppdb_pack import lines_values_sql as _lines_values_sql


@query(
    "udtf_polymorphic_split",
    oracle=f"""
    WITH raw AS (SELECT value FROM {_lines_values_sql()} r),
    s AS (SELECT str_split(value, ' ||| ') AS p FROM raw)
    SELECT CASE WHEN len(p) >= 1 THEN trim(p[1]) END AS part0,
           CASE WHEN len(p) >= 2 THEN trim(p[2]) END AS part1,
           CASE WHEN len(p) >= 3 THEN trim(p[3]) END AS part2,
           CASE WHEN len(p) >= 4 THEN trim(p[4]) END AS part3,
           CASE WHEN len(p) >= 5 THEN trim(p[5]) END AS part4,
           CASE WHEN len(p) >= 6 THEN trim(p[6]) END AS part5
    FROM s
    """,
    tags=("U5", "P1"),
)
def udtf_polymorphic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    from ..sources.ppdb_pack import ensure_pack
    from ..sources.text import read_text_lines

    @udtf
    class SplitFixed:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"part{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            parts = text.split(" ||| ")
            yield tuple(
                parts[i].strip() if i < len(parts) else None for i in range(n)
            )

    spark.udtf.register("split_fixed", SplitFixed)
    lines = read_text_lines(spark, ensure_pack() + "/*.txt.gz")
    lines.createOrReplaceTempView("udtf_lines_input")
    return spark.sql(
        "SELECT t.* FROM udtf_lines_input, LATERAL split_fixed(value, 6) t"
    )
