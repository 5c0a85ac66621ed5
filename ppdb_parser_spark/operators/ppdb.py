"""PPDB parse kernel (SURVEY.md §2.2 P1–P6) — the reference's core
competency, re-expressed as a single declarative column pipeline.

Input: a DataFrame with one string column (default ``value``), one PPDB rule
per row:

    LHS ||| PHRASE ||| PARAPHRASE ||| FEATURES ||| ALIGNMENT [||| ENTAILMENT]

Output schema (SURVEY.md §1.3)::

    lhs string · phrase string · paraphrase string ·
    features map<string,double> · ppdb2score double ·
    alignment array<struct<src:int,tgt:int>> · entailment string ·
    n_fields int (diagnostic) · is_valid boolean

Everything is built-in ``pyspark.sql.functions`` — no UDFs, so the whole
parse stays inside WholeStageCodegen and scales linearly with input tasks.
At 100 TB the binding constraint is gzip non-splittability (1 file = 1
task); `sources/ppdb_pack.py` writes many-shard packs and the re-shard
pattern is parse → write partitioned parquet (S5) once, query forever.

``try_cast``/``try_element_at`` are used instead of plain casts: Spark 4
runs ANSI mode by default, where failed casts and missing map keys raise
instead of yielding NULL, and a malformed line must quarantine, not crash
(P6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ` ||| ` as a Java regex.
DELIM_RE = r" \|\|\| "

ENTAILMENT_ENUM = (
    "Equivalence",
    "ForwardEntailment",
    "ReverseEntailment",
    "Exclusion",
    "Independent",
    "OtherRelated",
)


def _features_map(col_name: str) -> Column:
    """P2: ``"k1=v1 k2=v2"`` → ``map<string,double>`` (non-numeric values →
    NULL value, key kept — the open feature set stays queryable)."""
    return F.when(F.trim(F.col(col_name)) == "", F.expr("map()")).otherwise(
        F.expr(
            f"transform_values(str_to_map(trim({col_name}), ' ', '='),"
            " (k, v) -> try_cast(v AS DOUBLE))"
        )
    )


def _alignment_array(col_name: str) -> Column:
    """P4: ``"0-0 1-0"`` → ``array<struct<src:int,tgt:int>>``."""
    return F.expr(
        f"transform(split(trim({col_name}), ' '),"
        " x -> named_struct("
        "   'src', try_cast(split_part(x, '-', 1) AS INT),"
        "   'tgt', try_cast(split_part(x, '-', 2) AS INT)))"
    )


def parse_ppdb(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """P1–P5: split, type and promote every PPDB field. Keeps all rows;
    ``is_valid`` marks parseable ones (P6 quarantine predicate)."""
    parts = F.split(F.col(value_col), DELIM_RE)
    n = F.size(parts)
    valid = n.isin(5, 6)

    df = lines.select(
        F.col(value_col).alias("_raw_line"),
        parts.alias("_parts"),
        n.cast("int").alias("n_fields"),
        valid.alias("is_valid"),
    )
    get = lambda i: F.col("_parts").getItem(i)  # noqa: E731
    validc = F.col("is_valid")  # the original `valid` refers to the dropped input col
    df = (
        df.withColumn("lhs", F.when(validc, F.trim(get(0))))
        .withColumn("phrase", F.when(validc, F.trim(get(1))))
        .withColumn("paraphrase", F.when(validc, F.trim(get(2))))
        .withColumn("__feat_raw__", F.when(validc, get(3)).otherwise(F.lit("")))
        .withColumn("__align_raw__", F.when(validc, get(4)).otherwise(F.lit("")))
        .withColumn("features", _features_map("__feat_raw__"))
        .withColumn(
            "ppdb2score",
            F.expr("try_element_at(features, 'PPDB2.0Score')"),
        )
        .withColumn(
            "alignment",
            F.when(
                F.trim(F.col("__align_raw__")) != "",
                _alignment_array("__align_raw__"),
            ),
        )
        .withColumn(
            # try_element_at (1-based) instead of getItem: ANSI mode raises
            # on out-of-bounds array access, and 5-field (PPDB-1.0) lines
            # have no 6th element.
            "entailment",
            F.when(
                F.trim(
                    F.try_element_at(F.col("_parts"), F.lit(6))
                ).isin(*ENTAILMENT_ENUM),
                F.trim(F.try_element_at(F.col("_parts"), F.lit(6))),
            ),
        )
        .drop("_parts", "__feat_raw__", "__align_raw__")
    )
    return df


def parse_ppdb_clean(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """The good-rows projection in the canonical §1.3 schema."""
    return (
        parse_ppdb(lines, value_col)
        .filter(F.col("is_valid"))
        .select(
            "lhs",
            "phrase",
            "paraphrase",
            "features",
            "ppdb2score",
            "alignment",
            "entailment",
        )
    )


def quarantine(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """P6: the rejected rows, with the raw line kept for forensics."""
    return (
        parse_ppdb(lines, value_col)
        .filter(~F.col("is_valid"))
        .select(F.col("_raw_line").alias("corrupt_line"), "n_fields")
    )
