"""The reference's headline verb re-expressed at corpus scale (SURVEY.md
§2.4 J1 + L3): paraphrase lookup of document tokens against the parsed
PPDB relation, and fuzzy string-similarity join with a pre-filter.

In the reference this is ``dict.get(phrase)`` in a Python loop; here the
corpus side is unbounded and the dictionary side is the broadcast build
side, so lookup throughput scales with corpus partitions and never
shuffles the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ppdb import parse_ppdb_clean
from ..operators.text_analysis import exploded_tokens
from ..sources.ppdb_pack import ensure_pack, lines_values_sql
from ..sources.tables import load_table
from ..sources.text import read_text_lines
from .registry import query

_PARSED_CTE = f"""
    raw AS (SELECT value FROM {lines_values_sql()} r),
    split_lines AS (
      SELECT str_split(value, ' ||| ') AS p, len(str_split(value, ' ||| ')) AS n
      FROM raw
    ),
    rules AS (
      SELECT DISTINCT trim(p[2]) AS phrase, trim(p[3]) AS paraphrase
      FROM split_lines WHERE n IN (5, 6)
    )
"""


# --------------------------------------------------------------------------
# J1 (the dict.get analog): document tokens ⋈ broadcast(ppdb) — how many
# tokens of each document have at least one known paraphrase, and the
# total expansion fan-out if all were substituted.
# --------------------------------------------------------------------------
@query(
    "lookup_paraphrase_coverage",
    oracle=f"""
    WITH {_PARSED_CTE},
    toks AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents
    ),
    hits AS (
      SELECT doc_id, token, COUNT(*) AS n_paraphrases
      FROM toks JOIN rules ON token = phrase
      GROUP BY doc_id, token
    )
    SELECT doc_id,
           COUNT(*) AS n_covered_tokens,
           CAST(SUM(n_paraphrases) AS BIGINT) AS total_expansions
    FROM hits GROUP BY doc_id
    """,
    tags=("J1", "S1", "P1", "A1"),
    bench=True,
)
def lookup_paraphrase_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    rules = (
        parse_ppdb_clean(read_text_lines(spark, ensure_pack() + "/*.txt.gz"))
        .select("phrase", "paraphrase")
        .distinct()
    )
    toks = exploded_tokens(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "token"
    )
    hits = (
        toks.join(F.broadcast(rules), toks.token == rules.phrase)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("n_paraphrases"))
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_covered_tokens"),
        F.sum("n_paraphrases").cast("long").alias("total_expansions"),
    )


# --------------------------------------------------------------------------
# J4/J5 over the lookup: out-of-vocabulary report — tokens with no rule.
# --------------------------------------------------------------------------
@query(
    "lookup_oov_tokens",
    oracle=f"""
    WITH {_PARSED_CTE},
    toks AS (
      SELECT DISTINCT unnest(str_split(text, ' ')) AS token FROM documents
    )
    SELECT token FROM toks
    WHERE NOT EXISTS (SELECT 1 FROM rules WHERE phrase = token)
    """,
    tags=("J5", "J1"),
)
def lookup_oov_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    rules = (
        parse_ppdb_clean(read_text_lines(spark, ensure_pack() + "/*.txt.gz"))
        .select("phrase")
        .distinct()
    )
    toks = (
        exploded_tokens(load_table(spark, sf_dir, "documents"))
        .select("token")
        .distinct()
    )
    return toks.join(F.broadcast(rules), toks.token == rules.phrase, "left_anti")


# --------------------------------------------------------------------------
# L3: string-similarity join — phrases fuzzy-matched to document tokens
# with an equi pre-filter (same first char + length band) before the
# levenshtein refinement, so the candidate space is banded, not O(n·m).
# --------------------------------------------------------------------------
@query(
    "fuzzy_phrase_match",
    oracle=f"""
    WITH {_PARSED_CTE},
    phrases AS (
      SELECT DISTINCT phrase FROM rules
      WHERE len(str_split(phrase, ' ')) = 1 AND length(phrase) >= 4
    ),
    toks AS (
      SELECT DISTINCT unnest(str_split(text, ' ')) AS token FROM documents
    ),
    cands AS (
      SELECT token, phrase FROM toks JOIN phrases
        ON (substr(token, 1, 1) = substr(phrase, 1, 1)
            OR substr(token, length(token), 1) = substr(phrase, length(phrase), 1))
       AND abs(length(token) - length(phrase)) <= 1
       AND token <> phrase
    )
    SELECT token, phrase,
           CAST(levenshtein(token, phrase) AS BIGINT) AS edit_dist
    FROM cands
    WHERE levenshtein(token, phrase) <= 2
    """,
    tags=("L3", "J7", "X1"),
)
def fuzzy_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    rules = parse_ppdb_clean(
        read_text_lines(spark, ensure_pack() + "/*.txt.gz")
    )
    phrases = (
        rules.select("phrase")
        .filter((F.size(F.split("phrase", " ")) == 1) & (F.length("phrase") >= 4))
        .distinct()
    )
    toks = (
        exploded_tokens(load_table(spark, sf_dir, "documents"))
        .select("token")
        .distinct()
    )
    cands = toks.join(
        F.broadcast(phrases),
        (
            (F.substring("token", 1, 1) == F.substring("phrase", 1, 1))
            | (
                F.substring(F.col("token"), -1, 1)
                == F.substring(F.col("phrase"), -1, 1)
            )
        )
        & (F.abs(F.length("token") - F.length("phrase")) <= 1)
        & (F.col("token") != F.col("phrase")),
    )
    return cands.filter(
        F.levenshtein(F.col("token"), F.col("phrase")) <= 2
    ).select(
        "token",
        "phrase",
        F.levenshtein(F.col("token"), F.col("phrase")).cast("long").alias(
            "edit_dist"
        ),
    )


# --------------------------------------------------------------------------
# F4: seeded Bernoulli sampling. The RNG stream is engine-specific, so the
# query is SELF-CHECKING: it folds the sample into one row carrying the
# exact population count plus booleans asserting (a) the sampled fraction
# sits within 6σ binomial bounds of p=0.1 and (b) every sampled key exists
# in the population (subset soundness via left-anti count == 0). DuckDB's
# oracle computes the exact count and literal TRUEs — a broken sampler
# (wrong fraction, fabricated rows) flips a boolean and fails the hash
# check. Reproducibility (same seed ⇒ same rows) stays test-asserted.
# --------------------------------------------------------------------------
@query(
    "sample_orders",
    oracle="""
    SELECT COUNT(*) AS n_total,
           TRUE AS frac_ok,
           TRUE AS sample_is_subset
    FROM orders
    """,
    tags=("F4",),
)
def sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = 0.1
    o = load_table(spark, sf_dir, "orders")
    sample = o.sample(fraction=p, seed=42).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    totals = o.agg(F.count("*").alias("n_total"))
    stats = sample.join(
        o.select("o_orderkey").withColumn("__pop", F.lit(1)),
        "o_orderkey",
        "left",
    ).agg(
        F.count("*").alias("n_sampled"),
        F.sum(F.when(F.col("__pop").isNull(), 1).otherwise(0)).alias(
            "n_orphans"
        ),
    )
    # 1-row × 1-row join: broadcast, effectively free.
    return totals.crossJoin(F.broadcast(stats)).select(
        "n_total",
        (
            F.abs(F.col("n_sampled") - p * F.col("n_total"))
            <= 6 * F.sqrt(p * (1 - p) * F.col("n_total"))
        ).alias("frac_ok"),
        (F.coalesce(F.col("n_orphans"), F.lit(0)) == 0).alias(
            "sample_is_subset"
        ),
    )
