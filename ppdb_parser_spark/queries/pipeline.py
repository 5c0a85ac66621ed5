"""The end-to-end training-data curation pipeline as ONE declarative
lineage (the north-star composition: SURVEY.md §2.9 operators chained the
way a real 100 TB corpus build chains them):

    quality filter  →  exact dedup (content hash, keep min id)
                    →  near-dup removal (word-bigram Jaccard ≥ 0.5 via
                       AllPairs/PPJoin prefix filtering — EXACT, uncapped;
                       keep the smaller id of each pair)
                    →  curated per-document stats

Each stage reuses the SAME operator the standalone queries check
(`quality_score`, md5 grouping, `jaccard_pairs_prefix`), so the pipeline's
oracle is the composition of already-verified fragments. Catalyst sees one
plan: the quality filter prunes before any shuffle, the content-hash dedup
is one fingerprint-partitioned window, the Jaccard candidate join runs on the
already-reduced survivor set — exactly the stage ordering that minimizes
shuffled bytes at scale (filter early, dedup cheap-exact before
expensive-near). The near-dup stage is the prefix-filtered exact join
(operators/dedup.py jaccard_pairs_prefix): unlike the round-2 df-capped
variant it makes NO semantic compromise — the oracle below is the plain
uncapped Jaccard — while still killing the df² candidate bombs (measured
0.09× shuffle bytes vs the naive candidate join, BASELINE_HISTORY.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as DD
from ..operators import text_analysis as TA
from ..sources.tables import load_table
from .registry import query

_STOP_SQL = ", ".join(f"'{s}'" for s in TA.STOPWORDS)

_QUALITY_MIN = 0.55
_JACCARD_MIN = 0.5

_CURATION_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, lang, text,
             len(str_split(text, ' ')) AS n_tok,
             len(list_distinct(str_split(text, ' '))) AS n_uniq,
             len(list_filter(str_split(text, ' '), x -> x IN ({_STOP_SQL})))
               AS n_stop
      FROM documents
    ),
    q AS (
      SELECT doc_id, lang, text, n_tok,
             least(n_tok / 100.0, 1.0) * 0.4
               + (n_uniq / n_tok) * 0.4
               + least(n_stop / 5.0, 1.0) * 0.2 AS quality
      FROM t
    ),
    qf AS (SELECT * FROM q WHERE quality >= {_QUALITY_MIN}),
    fp AS (SELECT *, md5(text) AS f FROM qf),
    keep AS (SELECT f, MIN(doc_id) AS keep_id FROM fp GROUP BY f),
    ex AS (
      SELECT fp.* FROM fp JOIN keep ON fp.f = keep.f AND fp.doc_id = keep.keep_id
    ),
    pos_toks AS (
      SELECT doc_id,
             unnest(str_split(text, ' ')) AS token,
             generate_subscripts(str_split(text, ' '), 1) AS pos
      FROM ex
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             token || ' ' || lead(token) OVER (PARTITION BY doc_id ORDER BY pos)
               AS shingle
      FROM pos_toks
    ),
    shn AS (SELECT doc_id, shingle FROM sh WHERE shingle IS NOT NULL
            AND len(str_split(shingle, ' ')) = 2),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM shn GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM shn a JOIN shn b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    drops AS (
      SELECT DISTINCT id_b
      FROM inter
      JOIN sizes sa ON inter.id_a = sa.doc_id
      JOIN sizes sb ON inter.id_b = sb.doc_id
      WHERE n_common / (sa.n_shingles + sb.n_shingles - n_common)
              >= {_JACCARD_MIN}
    )
    SELECT e.doc_id, e.lang, e.quality, CAST(e.n_tok AS BIGINT) AS n_tokens
    FROM ex e LEFT JOIN drops d ON e.doc_id = d.id_b
    WHERE d.id_b IS NULL
"""


# bench=False since round 6: the v1/v2 A/B served its purpose (v2 is
# strictly faster with identical coverage — 3.5s vs 5.9s at sf0.1), so v1
# stays registered + oracle-checked but no longer spends headline bench
# budget re-measuring a superseded composition (VERDICT r5 item 5).
@query(
    "pipeline_corpus_curation",
    oracle=_CURATION_ORACLE,
    tags=("L6", "O5", "O6", "W2", "J5", "A1"),
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curate_documents(load_table(spark, sf_dir, "documents"))


def curate_documents(docs: DataFrame) -> DataFrame:
    """The full curation lineage on an arbitrary documents frame (doc_id,
    lang, text) — the query above binds it to the fixture table; scale
    experiments feed key-shifted unions through the identical plan."""
    quality = TA.quality_score(docs).select("doc_id", "quality")
    qdocs = (
        docs.join(quality, "doc_id")
        .filter(F.col("quality") >= _QUALITY_MIN)
        .withColumn("f", F.md5("text"))
    )
    # keep-min-id per content hash as ONE exchange: a row_number window on
    # the fingerprint replaces the groupBy + self-join (which shuffled the
    # same data twice and tripped Spark's trivially-true-predicate warning
    # on the derived-frame f == f condition).
    exact_survivors = (
        qdocs.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("f").orderBy("doc_id")),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "text", "quality")
    )
    # Near-dup candidates via the prefix filter (AllPairs/PPJoin): exact
    # uncapped Jaccard semantics with the df² candidate bombs pruned by
    # rarest-shingle prefixes + the positional filter — the 100 TB path
    # (0.09× shuffle bytes vs the naive candidate join, BASELINE_HISTORY.md).
    pairs = DD.jaccard_pairs_prefix(
        exact_survivors, threshold=_JACCARD_MIN, n=2
    )
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    curated = exact_survivors.join(drops, "doc_id", "left_anti")
    return curated.select(
        "doc_id",
        "lang",
        "quality",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# Context-window packing (the training-batch builder): documents are
# packed per language, in deterministic doc_id order, into 2048-token
# windows by cutting a running token count at capacity boundaries —
# bin = floor((cumsum - n_tokens) / C) is the standard one-pass
# approximation of greedy sequence packing (each doc lands in the bin its
# START offset falls in). Pure window + aggregate: shuffles once on the
# partition key, no Python, no driver loop; at corpus scale the partition
# key would be (lang, shard) to bound per-task state, same algebra.
# --------------------------------------------------------------------------
_PACK_CAPACITY = 2048

_PACK_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      FROM toks
    ),
    binned AS (
      SELECT lang, n_tokens,
             (running - n_tokens) // {_PACK_CAPACITY} AS bin_id
      FROM cum
    )
    SELECT lang, CAST(bin_id AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tokens) AS BIGINT) * 1.0 / {_PACK_CAPACITY} AS fill_ratio
    FROM binned
    GROUP BY lang, bin_id
"""


@query(
    "pipeline_pack_windows",
    oracle=_PACK_ORACLE,
    tags=("L4", "W4", "A1"),
)
def pipeline_pack_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = toks.withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_CAPACITY
        ),
    )
    return binned.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.sum("n_tokens").cast("long") * 1.0 / _PACK_CAPACITY).alias(
            "fill_ratio"
        ),
    )


# --------------------------------------------------------------------------
# Curriculum stratification: per-language quality quartiles (ntile over a
# fully tie-broken ordering — quality doubles are bit-identical across
# engines because the scoring expression tree is mirrored, and doc_id
# breaks exact ties), aggregated to per-stratum stats. This is the
# "sample harder buckets later" curriculum-building step; partitioned by
# lang so no global window exists.
# --------------------------------------------------------------------------
_QUARTILE_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(str_split(text, ' ')) AS n_tok,
             len(list_distinct(str_split(text, ' '))) AS n_uniq,
             len(list_filter(str_split(text, ' '), x -> x IN ({_STOP_SQL})))
               AS n_stop
      FROM documents
    ),
    q AS (
      SELECT doc_id, lang, n_tok,
             least(n_tok / 100.0, 1.0) * 0.4
               + (n_uniq / n_tok) * 0.4
               + least(n_stop / 5.0, 1.0) * 0.2 AS quality
      FROM t
    ),
    strat AS (
      SELECT lang, quality, n_tok,
             ntile(4) OVER (PARTITION BY lang ORDER BY quality, doc_id)
               AS quartile
      FROM q
    )
    SELECT lang, CAST(quartile AS BIGINT) AS quartile,
           COUNT(*) AS n_docs,
           MIN(quality) AS min_quality,
           MAX(quality) AS max_quality,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM strat GROUP BY lang, quartile
"""


@query("pipeline_quality_quartiles", oracle=_QUARTILE_ORACLE, tags=("W2", "L6", "A1"))
def pipeline_quality_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    q = TA.quality_score(docs).select("doc_id", "lang", "quality")
    n_tok = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    strat = (
        q.join(n_tok, "doc_id")
        .withColumn(
            "quartile",
            F.ntile(4).over(
                Window.partitionBy("lang").orderBy("quality", "doc_id")
            ),
        )
    )
    return strat.groupBy("lang", "quartile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("quality").alias("min_quality"),
        F.max("quality").alias("max_quality"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
    ).select(
        "lang",
        F.col("quartile").cast("long").alias("quartile"),
        "n_docs",
        "min_quality",
        "max_quality",
        "total_tokens",
    )


# --------------------------------------------------------------------------
# RAG-ingest composition: quality-gate the corpus (Gopher rules) →
# overlapping W=32/S=24 token chunks built in-row → exact chunk dedup on
# the md5 chunk fingerprint (min (doc,chunk) survives) → route each
# surviving chunk to one of 8 index shards (md5-derived — the IVF cell
# stand-in that stays portable across engines) → per-shard ingest stats.
# One lineage: map → explode → fingerprint agg → shard agg; the only
# exchanges are the dedup and shard aggregates, both uniform md5 keys.
# --------------------------------------------------------------------------
@query(
    "pipeline_rag_ingest",
    oracle="""
    WITH kept AS (
      SELECT doc_id, str_split(text, ' ') AS t, len(str_split(text, ' ')) AS n
      FROM documents
      WHERE len(str_split(text, ' ')) >= 25
        AND list_aggregate(list_transform(str_split(text, ' '),
                                          x -> length(x)), 'sum') * 10
              >= 45 * len(str_split(text, ' '))
        AND len(list_filter(str_split(text, ' '),
                            x -> x IN ('the','a','of','and','to','in','is',
                                       'it','on','for'))) * 20
              >= len(str_split(text, ' '))
        AND len(list_distinct(str_split(text, ' '))) * 3
              >= len(str_split(text, ' '))
    ),
    chunks AS (
      SELECT doc_id, n,
             unnest(range(0, 1 + (GREATEST(n - 32, 0) + 23) // 24)) AS chunk_id
      FROM kept
    ),
    toks AS (
      SELECT doc_id,
             unnest(t) AS tok, generate_subscripts(t, 1) AS i
      FROM kept
    ),
    chunk_text AS (
      SELECT c.doc_id, c.chunk_id,
             string_agg(tok, ' ' ORDER BY i) AS body,
             CAST(COUNT(*) AS BIGINT) AS n_tok
      FROM chunks c JOIN toks t
        ON t.doc_id = c.doc_id
       AND t.i >= c.chunk_id * 24 + 1 AND t.i <= c.chunk_id * 24 + 32
      GROUP BY 1, 2
    ),
    dedup AS (
      SELECT md5(body) AS fp, MIN(n_tok) AS n_tok,
             COUNT(*) AS n_copies
      FROM chunk_text GROUP BY 1
    )
    SELECT ascii(substr(fp, 1, 1)) % 8 AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_copies - 1) AS BIGINT) AS n_dups_removed
    FROM dedup GROUP BY 1
    """,
    tags=("L4", "O5", "F4", "A1", "X4"),
)
def pipeline_rag_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..queries.training_data import gopher_pass_all

    docs = load_table(spark, sf_dir, "documents").filter(gopher_pass_all())
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    w, s = 32, 24
    n_chunks = 1 + F.floor(
        (F.greatest(n - w, F.lit(0)) + (s - 1)) / s
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.concat_ws(" ", F.slice(toks, i * s + 1, w)).alias("body"),
            F.least(F.lit(w), n - i * s).cast("long").alias("n_tok"),
        ),
    )
    chunk_rows = docs.select(F.explode(chunks).alias("c")).select(
        F.md5(F.col("c.body")).alias("fp"), F.col("c.n_tok").alias("n_tok")
    )
    dedup = chunk_rows.groupBy("fp").agg(
        F.min("n_tok").alias("n_tok"), F.count(F.lit(1)).alias("n_copies")
    )
    return dedup.groupBy(
        (F.ascii(F.substring(F.col("fp"), 1, 1)) % 8).alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum(F.col("n_copies") - 1).cast("long").alias("n_dups_removed"),
    )


# --------------------------------------------------------------------------
# In-engine OLS quality regression (operators/regression.py): fit lexical
# diversity on (mean word length, token count) with ONE exact int64
# aggregation, solve the normal equations with Cramer's rule — the SAME
# SQL expression text spliced into both engines — and score through a
# broadcast 1-row coefficient context. No ML library, no iteration, no
# collect; the distributed cost is one 9-sum aggregate + one narrow
# projection pass.
# --------------------------------------------------------------------------
def _regression_oracle() -> str:
    from ..operators.regression import CRAMER_SQL as CR

    return f"""
    WITH feats AS MATERIALIZED (
      SELECT lang,
             CAST(floor((len(text) - (len(str_split(text, ' ')) - 1))
                        * 1000.0 / len(str_split(text, ' '))) AS BIGINT) AS f1,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS f2,
             CAST(floor(len(list_distinct(str_split(text, ' ')))
                        * 1000.0 / len(str_split(text, ' '))) AS BIGINT) AS y
      FROM documents
    ),
    sums AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(SUM(f1) AS DOUBLE) AS s1,
             CAST(SUM(f2) AS DOUBLE) AS s2,
             CAST(SUM(f1 * f1) AS DOUBLE) AS s11,
             CAST(SUM(f1 * f2) AS DOUBLE) AS s12,
             CAST(SUM(f2 * f2) AS DOUBLE) AS s22,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(f1 * y) AS DOUBLE) AS s1y,
             CAST(SUM(f2 * y) AS DOUBLE) AS s2y
      FROM feats
    ),
    coefs AS (
      SELECT {CR['det0']} / {CR['det']} AS b0,
             {CR['det1']} / {CR['det']} AS b1,
             {CR['det2']} / {CR['det']} AS b2
      FROM sums
    ),
    resid AS (
      SELECT f.lang,
             CAST(round(c.b0 + c.b1 * f.f1 + c.b2 * f.f2 - f.y)
                  AS BIGINT) AS rq,
             c.b0, c.b1, c.b2
      FROM feats f CROSS JOIN coefs c
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(abs(rq)) AS BIGINT) AS sum_abs_resid_milli,
           round(CAST(SUM(abs(rq)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mae_milli,
           round(min(b0), 6) AS b0_6,
           round(min(b1), 6) AS b1_6,
           round(min(b2), 6) AS b2_6
    FROM resid
    GROUP BY lang
    """


@query(
    "pipeline_quality_regression",
    oracle=_regression_oracle(),
    tags=("A1", "J1", "X3", "U6"),
    bench=True,
)
def pipeline_quality_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed OLS fit + score in one declarative plan. The Cramer
    solve runs on the 1-row sums aggregate INSIDE the plan (F.expr of the
    shared CRAMER_SQL text), so Spark and DuckDB execute bit-identical
    double arithmetic on bit-identical integer sums; residuals re-grid to
    integer per-mille, keeping the per-lang MAE reduction exact."""
    from ..operators.regression import ols_fit_2f, ols_score_residual_milli

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("long")
    feats = docs.select(
        "lang",
        F.floor(
            (F.length("text") - (n_tok - F.lit(1)))
            * F.lit(1000.0)
            / n_tok
        ).cast("long").alias("f1"),
        n_tok.alias("f2"),
        F.floor(
            F.size(F.array_distinct(toks)).cast("long")
            * F.lit(1000.0)
            / n_tok
        ).cast("long").alias("y"),
    )
    coefs = ols_fit_2f(feats)
    scored = feats.crossJoin(F.broadcast(coefs)).withColumn(
        "rq",
        ols_score_residual_milli(F.col("f1"), F.col("f2"), F.col("y")),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.abs(F.col("rq"))).cast("long").alias("sum_abs_resid_milli"),
        F.round(
            F.sum(F.abs(F.col("rq"))).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mae_milli"),
        F.round(F.min("b0"), 6).alias("b0_6"),
        F.round(F.min("b1"), 6).alias("b1_6"),
        F.round(F.min("b2"), 6).alias("b2_6"),
    )


def _regression_by_lang_oracle() -> str:
    from ..operators.regression import CRAMER_SQL as CR

    return f"""
    WITH feats AS MATERIALIZED (
      SELECT lang,
             CAST(floor((len(text) - (len(str_split(text, ' ')) - 1))
                        * 1000.0 / len(str_split(text, ' '))) AS BIGINT) AS f1,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS f2,
             CAST(floor(len(list_distinct(str_split(text, ' ')))
                        * 1000.0 / len(str_split(text, ' '))) AS BIGINT) AS y
      FROM documents
    ),
    sums AS (
      SELECT lang,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(SUM(f1) AS DOUBLE) AS s1,
             CAST(SUM(f2) AS DOUBLE) AS s2,
             CAST(SUM(f1 * f1) AS DOUBLE) AS s11,
             CAST(SUM(f1 * f2) AS DOUBLE) AS s12,
             CAST(SUM(f2 * f2) AS DOUBLE) AS s22,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(f1 * y) AS DOUBLE) AS s1y,
             CAST(SUM(f2 * y) AS DOUBLE) AS s2y
      FROM feats GROUP BY lang
    ),
    coefs AS (
      SELECT lang,
             {CR['det0']} / {CR['det']} AS b0,
             {CR['det1']} / {CR['det']} AS b1,
             {CR['det2']} / {CR['det']} AS b2
      FROM sums
    ),
    resid AS (
      SELECT f.lang,
             CAST(round(c.b0 + c.b1 * f.f1 + c.b2 * f.f2 - f.y)
                  AS BIGINT) AS rq,
             c.b0, c.b1, c.b2
      FROM feats f JOIN coefs c ON f.lang = c.lang
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(abs(rq)) AS BIGINT) AS sum_abs_resid_milli,
           round(CAST(SUM(abs(rq)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mae_milli,
           round(min(b0), 6) AS b0_6,
           round(min(b1), 6) AS b1_6,
           round(min(b2), 6) AS b2_6
    FROM resid
    GROUP BY lang
    """


@query(
    "pipeline_quality_regression_by_lang",
    oracle=_regression_by_lang_oracle(),
    tags=("A1", "J1", "X3", "U6"),
)
def pipeline_quality_regression_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Grouped model fitting: ONE aggregation fits an independent OLS
    model per language (operators/regression.ols_fit_2f_by — the sums
    shuffle is keyed, so a million groups cost the same single exchange),
    then each document scores against ITS group's coefficients via a
    broadcast equi join on the tiny coefficient relation. Demonstrates
    the fit-N-models-in-one-pass shape a per-domain corpus pipeline
    needs; per-lang MAE shows the grouped fits beating the global model
    on their own groups by construction."""
    from ..operators.regression import ols_fit_2f_by, ols_score_residual_milli

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("long")
    feats = docs.select(
        "lang",
        F.floor(
            (F.length("text") - (n_tok - F.lit(1)))
            * F.lit(1000.0)
            / n_tok
        ).cast("long").alias("f1"),
        n_tok.alias("f2"),
        F.floor(
            F.size(F.array_distinct(toks)).cast("long")
            * F.lit(1000.0)
            / n_tok
        ).cast("long").alias("y"),
    )
    coefs = ols_fit_2f_by(feats, ["lang"])
    scored = feats.join(F.broadcast(coefs), "lang").withColumn(
        "rq",
        ols_score_residual_milli(F.col("f1"), F.col("f2"), F.col("y")),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.abs(F.col("rq"))).cast("long").alias("sum_abs_resid_milli"),
        F.round(
            F.sum(F.abs(F.col("rq"))).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mae_milli"),
        F.round(F.min("b0"), 6).alias("b0_6"),
        F.round(F.min("b1"), 6).alias("b1_6"),
        F.round(F.min("b2"), 6).alias("b2_6"),
    )


def _classifier_oracle() -> str:
    from ..operators.regression import CRAMER_SQL as CR
    from ..operators.regression import LOGIT_SQL as LG
    from .training_data import _GOPHER_PASS_SQL

    return f"""
    WITH feats AS MATERIALIZED (
      SELECT lang,
             CAST(floor((len(text) - (len(str_split(text, ' ')) - 1))
                        * 1000.0 / len(str_split(text, ' '))) AS BIGINT) AS f1,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS f2,
             CAST(CASE WHEN {_GOPHER_PASS_SQL} THEN 1 ELSE 0 END
                  AS BIGINT) AS y
      FROM documents
    ),
    sums AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(SUM(f1) AS DOUBLE) AS s1,
             CAST(SUM(f2) AS DOUBLE) AS s2,
             CAST(SUM(f1 * f1) AS DOUBLE) AS s11,
             CAST(SUM(f1 * f2) AS DOUBLE) AS s12,
             CAST(SUM(f2 * f2) AS DOUBLE) AS s22,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(f1 * y) AS DOUBLE) AS s1y,
             CAST(SUM(f2 * y) AS DOUBLE) AS s2y
      FROM feats
    ),
    step1_rhs AS (
      SELECT n, s1, s2, s11, s12, s22,
             (4 * (sy - n / 2)) AS sy,
             (4 * (s1y - s1 / 2)) AS s1y,
             (4 * (s2y - s2 / 2)) AS s2y
      FROM sums
    ),
    coefs1 AS (
      SELECT {CR['det0']} / {CR['det']} AS b0,
             {CR['det1']} / {CR['det']} AS b1,
             {CR['det2']} / {CR['det']} AS b2
      FROM step1_rhs
    ),
    rows0 AS (
      SELECT f.f1, f.f2, f.y, c.b0, c.b1, c.b2
      FROM feats f CROSS JOIN coefs1 c
    ),
    rows1 AS (SELECT *, {LG['z']} AS z FROM rows0),
    rows2 AS (SELECT *, {LG['s']} AS s FROM rows1),
    rows3 AS (
      SELECT *, {LG['wq']} AS wq, {LG['vq']} AS vq FROM rows2
    ),
    wsums AS (
      SELECT CAST(SUM(wq) AS DOUBLE) AS n,
             CAST(SUM(wq * f1) AS DOUBLE) AS s1,
             CAST(SUM(wq * f2) AS DOUBLE) AS s2,
             CAST(SUM(wq * f1 * f1) AS DOUBLE) AS s11,
             CAST(SUM(wq * f1 * f2) AS DOUBLE) AS s12,
             CAST(SUM(wq * f2 * f2) AS DOUBLE) AS s22,
             CAST(SUM(vq) AS DOUBLE) AS sy,
             CAST(SUM(vq * f1) AS DOUBLE) AS s1y,
             CAST(SUM(vq * f2) AS DOUBLE) AS s2y
      FROM rows3
    ),
    coefs AS (
      SELECT {CR['det0']} / {CR['det']} AS b0,
             {CR['det1']} / {CR['det']} AS b1,
             {CR['det2']} / {CR['det']} AS b2
      FROM wsums
    ),
    scored0 AS (
      SELECT f.lang, f.f1, f.f2, f.y, c.b0, c.b1, c.b2
      FROM feats f CROSS JOIN coefs c
    ),
    scored AS (
      SELECT *, {LG['z']} AS z FROM scored0
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(y) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN z >= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pred_pass,
           CAST(SUM(CASE WHEN (z >= 0) = (y = 1) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(floor(SUM(CASE WHEN (z >= 0) = (y = 1) THEN 1 ELSE 0 END)
                      * 1000.0 / count(*)) AS BIGINT) AS acc_milli,
           round(min(b0), 6) AS b0_6,
           round(min(b1), 6) AS b1_6,
           round(min(b2), 6) AS b2_6
    FROM scored
    GROUP BY lang
    """


@query(
    "pipeline_quality_classifier",
    oracle=_classifier_oracle(),
    tags=("A1", "J1", "X3", "U6"),
)
def pipeline_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap-proxy quality classifier: two-step Newton/IRLS logistic fit
    (operators/regression.logit_fit_2f) predicting the EXPENSIVE Gopher
    quality gate from two cheap lexical features — the standard curation
    trick of screening 100 TB with a 2-feature linear score and reserving
    the full gate for the survivors. Distributed cost: two 9-sum
    map-side-combinable aggregations (the Cramer solves run in-plan on
    the 1-row aggregates) + one broadcast-scored scan; the per-row IRLS
    weights quantize onto a 2^20 integer grid and sum as DECIMAL(38,0),
    so fit and metrics are exact order-independent arithmetic — the same
    cross-engine hash-oracle discipline as the OLS family (shared
    expression texts: CRAMER_SQL + LOGIT_SQL)."""
    from ..operators.regression import LOGIT_SQL, logit_fit_2f
    from .training_data import gopher_pass_all

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("long")
    feats = docs.select(
        "lang",
        F.floor(
            (F.length("text") - (n_tok - F.lit(1)))
            * F.lit(1000.0)
            / n_tok
        ).cast("long").alias("f1"),
        n_tok.alias("f2"),
        gopher_pass_all().cast("long").alias("y"),
    )
    coefs = logit_fit_2f(feats)
    scored = feats.crossJoin(F.broadcast(coefs)).withColumn(
        "z", F.expr(LOGIT_SQL["z"])
    )
    pred = F.col("z") >= F.lit(0.0)
    hit = pred == (F.col("y") == F.lit(1))
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("y").cast("long").alias("n_pass"),
        F.sum(pred.cast("long")).cast("long").alias("n_pred_pass"),
        F.sum(hit.cast("long")).cast("long").alias("n_correct"),
        F.floor(
            F.sum(hit.cast("long")) * F.lit(1000.0) / F.count(F.lit(1))
        ).cast("long").alias("acc_milli"),
        F.round(F.min("b0"), 6).alias("b0_6"),
        F.round(F.min("b1"), 6).alias("b1_6"),
        F.round(F.min("b2"), 6).alias("b2_6"),
    )


# --------------------------------------------------------------------------
# Corpus datacard: the per-language reporting artifact a training-data
# pipeline publishes with every corpus release (counts, token budget,
# length median, exact-dup rate, quality mass). One hash aggregate over
# one scan; every emitted number rides an integer grid — median of
# integer token counts lands on the half-integer grid (×2 as BIGINT),
# per-doc quality (a pinned-expression double, identical cross-engine)
# rounds onto a 1e-6 grid BEFORE the sum so the aggregate is an exact
# int64 reduction, immune to float summation order.
# --------------------------------------------------------------------------
from .text_analysis import _STOP_SQL as _DC_STOP_SQL  # noqa: E402


@query(
    "pipeline_corpus_datacard",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, text,
             len(str_split(text, ' ')) AS n_tok,
             len(list_distinct(str_split(text, ' '))) AS n_uniq,
             len(list_filter(str_split(text, ' '),
                             x -> x IN ({_DC_STOP_SQL}))) AS n_stop
      FROM documents
    ),
    q AS (
      SELECT lang, n_tok, text,
             CAST(round((least(n_tok / 100.0, 1.0) * 0.4
                         + (n_uniq / n_tok) * 0.4
                         + least(n_stop / 5.0, 1.0) * 0.2) * 1000000.0)
                  AS BIGINT) AS q_micro
      FROM t
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(round(median(n_tok) * 2) AS BIGINT) AS med_tokens_x2,
           COUNT(DISTINCT md5(text)) AS n_distinct_texts,
           CAST(SUM(q_micro) AS BIGINT) AS quality_sum_micro
    FROM q
    GROUP BY lang
    """,
    tags=("A1", "A2", "A7", "L6"),
)
def pipeline_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    len_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    uniq_term = F.size(F.array_distinct(toks)) / n_tok
    stop_term = F.least(
        F.size(F.filter(toks, lambda t: t.isin(*TA.STOPWORDS))) / F.lit(5.0),
        F.lit(1.0),
    )
    q_micro = F.round(
        (len_term * 0.4 + uniq_term * 0.4 + stop_term * 0.2) * 1_000_000.0
    ).cast("long")
    return (
        docs.select(
            "lang",
            n_tok.alias("n_tok"),
            F.md5("text").alias("h"),
            q_micro.alias("q_micro"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.round(F.median("n_tok") * 2).cast("long").alias("med_tokens_x2"),
            F.countDistinct("h").alias("n_distinct_texts"),
            F.sum("q_micro").cast("long").alias("quality_sum_micro"),
        )
    )
