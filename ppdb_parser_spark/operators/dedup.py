"""Deduplication operators for LLM-data pipelines (SURVEY.md §2.7 O5–O6 +
north-star dedup family: exact, n-gram Jaccard, SimHash, MinHash-LSH).

Scale shapes:

- exact: hash-aggregate on a content fingerprint — one shuffle keyed by the
  hash, no skew (md5 is uniform).
- shingle Jaccard: candidate generation via an equi join on shared shingles
  (only pairs sharing ≥1 shingle are materialized), then exact refinement.
  At 100 TB the candidate join is the bottleneck → cap fan-out by dropping
  ubiquitous shingles (document-frequency ceiling) exactly like a
  stopword filter; the LSH variants below are the sub-quadratic path.
- SimHash: per-token 60-bit hashes → per-bit majority vote → one 60-bit
  signature per doc. Pure integer bit arithmetic (md5-derived), identical
  in both engines → strong oracle despite being a "sketch".
- MinHash-LSH: pyspark.ml MinHashLSH with fixed seed; approximate →
  rows-only driver check, Jaccard-threshold property asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import exploded_tokens

#: Number of SimHash bits (60 = 15 hex chars, safely inside int64).
SIMHASH_BITS = 60


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: one row per distinct content with the
    canonical (min) id and the duplicate count."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def word_shingles(df: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    from pyspark.sql import Window

    toks = exploded_tokens(df, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy("pos")
    cols = [F.col("token")] + [F.lead("token", i).over(w) for i in range(1, n)]
    return (
        toks.withColumn("shingle", F.concat_ws(" ", *cols))
        .filter(F.size(F.split(F.col("shingle"), " ")) == n)
        .select(id_col, "shingle")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All document pairs with shingle-Jaccard ≥ threshold (exact).

    candidate pairs = equi join on shared shingles (never a cross join);
    jaccard = |A∩B| / (|A|+|B|-|A∩B|) — an int/int rational, so the
    threshold comparison is deterministic cross-engine.
    """
    sh = word_shingles(df, n, id_col, text_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )


def _token_hash60(token_col: str = "token") -> F.Column:
    """First 15 hex chars of md5 → 60-bit integer (identical both engines:
    Spark conv(hex,16,10); DuckDB CAST('0x'||hex AS BIGINT))."""
    return F.conv(F.substring(F.md5(F.col(token_col)), 1, 15), 16, 10).cast("long")


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit SimHash per document from distinct-token md5 hashes.

    Per bit b: vote = Σ_tokens (2·bit_b(h) − 1); signature bit b is 1 iff
    vote > 0. Implemented as token×bit explode → two hash aggregates —
    ~60·|tokens| intermediate rows, all integer ops, fully parallel.
    """
    toks = (
        exploded_tokens(df, id_col, text_col)
        .select(id_col, "token")
        .distinct()
        .withColumn("h", _token_hash60())
    )
    bits = toks.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b"),
        "h",
    ).withColumn(
        # F.shiftright only takes a literal shift → SQL expr for col-by-col
        "vote",
        F.expr("(shiftright(h, b) % 2) * 2 - 1"),
    )
    votes = bits.groupBy(id_col, "b").agg(F.sum("vote").alias("v"))
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )
