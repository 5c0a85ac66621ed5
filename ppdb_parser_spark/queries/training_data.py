"""Training-data governance family: benchmark decontamination,
deterministic mixture sampling, train/val/test splitting, and a
Gopher-style quality-rule suite (SURVEY.md §2.9 north-star scope — the
corpus-build steps that sit AROUND dedup in a real LLM data pipeline).

Every query here is hash-oracle-able because randomness is replaced by
content hashing: membership decisions are ``md5(salt || doc_id)`` bucket
comparisons, which both engines compute byte-identically (lowercase hex,
lexicographic compare). That is also the 100 TB-correct design — a
hash-bucket split is reproducible across reruns, cluster sizes, and
partitionings, unlike ``rand()``-based sampling, and it shuffles nothing:
the sample/split decision is a narrow per-row map evaluated at the scan.

Quality rules follow the Gopher/MassiveText shape (Rae et al. 2021,
arXiv:2112.11446 §A1.1): doc-length bounds, mean-word-length band,
stopword floor, repetition ceiling. Thresholds are cross-multiplied to
integer comparisons (``sum_len * 10 >= 45 * n`` instead of a float mean)
so both engines decide each rule on exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as DD
from ..operators.text_analysis import STOPWORDS
from ..sources.tables import load_table
from .registry import query

_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)


def _bucket(salt: str) -> F.Column:
    """First 16 bits of md5(salt || doc_id) as a 4-char lowercase hex
    string — the deterministic substitute for rand() everywhere in this
    module. Mirrored token-for-token in the oracles."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))), 1, 4
    )


_BUCKET_SQL = "substring(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 4)"


# --------------------------------------------------------------------------
# Benchmark decontamination: hold out an eval slice (md5 bucket < ~5%),
# flag every training document sharing ANY 8-gram with it. The eval
# shingle set is tiny relative to the corpus → broadcast left-semi join;
# at 100 TB the contamination probe stays one broadcast + one narrow
# scan-side explode, no shuffle of the corpus.
# --------------------------------------------------------------------------
_EVAL_MAX = "0ccc"  # 0x0ccc / 0x10000 ≈ 4.99 % of doc_ids
_NGRAM = 8

_DECONTAMINATE_ORACLE = f"""
    WITH flagged AS (
      SELECT doc_id, lang, str_split(text, ' ') AS t,
             {_BUCKET_SQL.format(salt='eval:')} < '{_EVAL_MAX}' AS is_eval
      FROM documents
    ),
    sh AS (
      SELECT doc_id, is_eval,
             unnest(list_distinct([array_to_string(t[i:i+{_NGRAM}-1], ' ')
                                   for i in range(1, len(t)-{_NGRAM}+2)])) AS g
      FROM flagged WHERE len(t) >= {_NGRAM}
    ),
    ev AS (SELECT DISTINCT g FROM sh WHERE is_eval),
    contaminated AS (
      SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (g) WHERE NOT s.is_eval
    )
    SELECT f.lang,
           COUNT(*) AS n_train,
           CAST(COUNT(c.doc_id) AS BIGINT) AS n_contaminated,
           CAST(COUNT(*) - COUNT(c.doc_id) AS BIGINT) AS n_clean
    FROM flagged f LEFT JOIN contaminated c USING (doc_id)
    WHERE NOT f.is_eval
    GROUP BY f.lang
"""


@query(
    "pipeline_decontaminate",
    oracle=_DECONTAMINATE_ORACLE,
    tags=("J4", "J3", "A1", "X1"),
    bench=True,
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_eval = _bucket("eval:") < _EVAL_MAX
    # (doc_id, shingle), per-doc distinct; min_partitions parallelizes the
    # shingling map over the single-file local fixture scan
    sh = DD.word_shingles(
        docs, n=_NGRAM, min_partitions=spark.sparkContext.defaultParallelism
    )
    sh_flagged = sh.withColumn("is_eval", is_eval)
    eval_shingles = (
        sh_flagged.filter("is_eval").select("shingle").distinct()
    )
    contaminated = (
        sh_flagged.filter(~F.col("is_eval"))
        .join(F.broadcast(eval_shingles), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = docs.filter(~is_eval).select("doc_id", "lang")
    return (
        train.join(contaminated, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.count("hit").alias("n_contaminated"),
            (F.count(F.lit(1)) - F.count("hit")).alias("n_clean"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic stratified mixture sampling: per-language keep rates
# (the "data mixture" knob of a corpus build) applied as hash-bucket
# thresholds. No shuffle: the decision is a per-row map; the only
# exchange is the final per-language report aggregate.
# --------------------------------------------------------------------------
_MIX_RATES = {"en": "8000", "de": "c000"}  # 50 %, 75 %; default 25 %
_MIX_DEFAULT = "4000"

_MIXTURE_ORACLE = f"""
    WITH sampled AS (
      SELECT lang, n_chars FROM documents
      WHERE {_BUCKET_SQL.format(salt='mix:')} <
            CASE lang WHEN 'en' THEN '8000' WHEN 'de' THEN 'c000'
                      ELSE '4000' END
    )
    SELECT lang, COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sampled
    FROM sampled GROUP BY lang
"""


@query("pipeline_mixture_sample", oracle=_MIXTURE_ORACLE, tags=("F4", "F3", "A1"))
def pipeline_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    threshold = F.when(F.col("lang") == "en", F.lit(_MIX_RATES["en"])).when(
        F.col("lang") == "de", F.lit(_MIX_RATES["de"])
    ).otherwise(F.lit(_MIX_DEFAULT))
    return (
        docs.filter(_bucket("mix:") < threshold)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("chars_sampled"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic train/val/test split (80/10/10 by hash bucket) with a
# per-split integrity report. Hash-bucket splits survive re-partitioning
# and incremental corpus growth (a doc's split never changes when other
# docs arrive) — the property rand()-splits lack.
# --------------------------------------------------------------------------
_SPLIT_ORACLE = f"""
    WITH b AS (
      SELECT lang, n_chars, {_BUCKET_SQL.format(salt='split:')} AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 'cccc' THEN 'train'
                WHEN bucket < 'e666' THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM b GROUP BY 1
"""


@query(
    "pipeline_train_split",
    oracle=_SPLIT_ORACLE,
    tags=("F4", "F3", "A2", "A1"),
)
def pipeline_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = _bucket("split:")
    split = (
        F.when(bucket < "cccc", "train")
        .when(bucket < "e666", "val")
        .otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


# --------------------------------------------------------------------------
# Gopher-style quality-rule suite: four integer-exact per-document rules,
# reported as per-language pass counts. Entirely narrow HOF math over the
# token array — at scale this is a map-only stage fused into the scan.
#   r_len:     ≥ 25 tokens
#   r_wordlen: mean word length ≥ 4.5  (sum_len * 10 ≥ 45 * n)
#   r_stop:    ≥ 5 % stopwords         (n_stop * 20 ≥ n)
#   r_rep:     distinct/total ≥ 1/3    (d * 3 ≥ n)
# --------------------------------------------------------------------------
_QUALITY_RULES_ORACLE = f"""
    WITH m AS (
      SELECT lang,
             len(str_split(text, ' ')) AS n,
             len(list_distinct(str_split(text, ' '))) AS d,
             list_aggregate(list_transform(str_split(text, ' '),
                                           x -> length(x)), 'sum') AS sl,
             len(list_filter(str_split(text, ' '),
                             x -> x IN ({_STOP_SQL}))) AS n_stop
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(COUNT(*) FILTER (n >= 25) AS BIGINT) AS pass_len,
           CAST(COUNT(*) FILTER (sl * 10 >= 45 * n) AS BIGINT) AS pass_wordlen,
           CAST(COUNT(*) FILTER (n_stop * 20 >= n) AS BIGINT) AS pass_stop,
           CAST(COUNT(*) FILTER (d * 3 >= n) AS BIGINT) AS pass_rep,
           CAST(COUNT(*) FILTER (n >= 25 AND sl * 10 >= 45 * n
                                 AND n_stop * 20 >= n AND d * 3 >= n)
                AS BIGINT) AS pass_all
    FROM m GROUP BY lang
"""


@query(
    "text_quality_rules",
    oracle=_QUALITY_RULES_ORACLE,
    tags=("X4", "A6", "A1"),
)
def text_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    d = F.size(F.array_distinct(toks))
    sl = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    m = docs.select(
        "lang",
        (n >= 25).alias("r_len"),
        (sl * 10 >= 45 * n).alias("r_wordlen"),
        (n_stop * 20 >= n).alias("r_stop"),
        (d * 3 >= n).alias("r_rep"),
    )

    def _passes(col: str) -> F.Column:
        return F.count_if(F.col(col)).cast("long")

    return m.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        _passes("r_len").alias("pass_len"),
        _passes("r_wordlen").alias("pass_wordlen"),
        _passes("r_stop").alias("pass_stop"),
        _passes("r_rep").alias("pass_rep"),
        F.count_if(
            F.col("r_len") & F.col("r_wordlen") & F.col("r_stop") & F.col("r_rep")
        )
        .cast("long")
        .alias("pass_all"),
    )
