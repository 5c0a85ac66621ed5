"""Text-analysis queries over `documents` (SURVEY.md §2.9 + north-star
text ops: token stats, quality scoring, language-ID, fingerprinting,
sentiment, TF-IDF, language routing).

Oracle twins re-express the same token-stream relational algebra in DuckDB
(str_split + unnest + joins on inline VALUES lexicons built from the same
Python constants — single source of truth in operators/text_analysis.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text_analysis as TA
from ..sources.tables import load_table
from .registry import REGISTRY as _REG, query

_STOP_SQL = ", ".join(f"'{s}'" for s in TA.STOPWORDS)


# --------------------------------------------------------------------------
# Token counting + ratios (per document; exact int/int rationals).
# --------------------------------------------------------------------------
@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS n_distinct,
           CAST(len(list_filter(str_split(text, ' '), t -> t IN ({_STOP_SQL})))
                AS BIGINT) AS n_stopwords,
           len(list_filter(str_split(text, ' '), t -> t IN ({_STOP_SQL})))
             / len(str_split(text, ' ')) AS stopword_ratio,
           len(list_distinct(str_split(text, ' ')))
             / len(str_split(text, ' ')) AS unique_ratio,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
    tags=("X1", "X4", "L6"),
    bench=True,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TA.token_stats(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Quality scoring (fixed-weight composite; fixed evaluation order).
# --------------------------------------------------------------------------
@query(
    "text_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(str_split(text, ' ')) AS n_tok,
             len(list_distinct(str_split(text, ' '))) AS n_uniq,
             len(list_filter(str_split(text, ' '), x -> x IN ({_STOP_SQL}))) AS n_stop
      FROM documents
    )
    SELECT doc_id, lang,
           least(n_tok / 100.0, 1.0) AS len_term,
           n_uniq / n_tok AS uniq_term,
           least(n_stop / 5.0, 1.0) AS stop_term,
           least(n_tok / 100.0, 1.0) * 0.4
             + (n_uniq / n_tok) * 0.4
             + least(n_stop / 5.0, 1.0) * 0.2 AS quality
    FROM t
    """,
    tags=("L6", "F3"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TA.quality_score(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Language-ID: marker-hit argmax (explode ⋈ broadcast profile → window).
# --------------------------------------------------------------------------
@query(
    "text_langid",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, t.tok AS token
      FROM documents, unnest(str_split(text, ' ')) AS t(tok)
    ),
    hits AS (
      SELECT doc_id, cand_lang, COUNT(*) AS n_hits
      FROM toks JOIN {TA.markers_values_sql()} m ON token = marker
      GROUP BY doc_id, cand_lang
    ),
    best AS (
      SELECT doc_id, cand_lang AS pred_lang, n_hits FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY n_hits DESC, cand_lang) AS rk
        FROM hits
      ) WHERE rk = 1
    )
    SELECT d.doc_id AS doc_id, d.lang AS lang,
           COALESCE(b.pred_lang, 'und') AS pred_lang,
           COALESCE(b.n_hits, 0) AS marker_hits
    FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
    """,
    tags=("L6", "J1", "W1"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TA.lang_id(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Document fingerprinting (md5 of normalized text — identical hex both
# engines) + per-lang distinct-content rollup.
# --------------------------------------------------------------------------
@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
    tags=("L7", "X1"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TA.fingerprint(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Sentiment: broadcast-lexicon polarity sum (all-integer).
# --------------------------------------------------------------------------
@query(
    "text_sentiment",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, t.tok AS token
      FROM documents, unnest(str_split(text, ' ')) AS t(tok)
    ),
    agg AS (
      SELECT doc_id, SUM(polarity) AS polarity_sum, COUNT(*) AS n_sentiment_tokens
      FROM toks JOIN {TA.lexicon_values_sql()} lx ON token = word
      GROUP BY doc_id
    )
    SELECT d.doc_id AS doc_id, d.lang AS lang,
           CAST(COALESCE(a.polarity_sum, 0) AS BIGINT) AS polarity_sum,
           COALESCE(a.n_sentiment_tokens, 0) AS n_sentiment_tokens
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """,
    tags=("L5", "J1"),
)
def text_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TA.sentiment(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# TF-IDF: top-5 characteristic tokens per document.
# --------------------------------------------------------------------------
@query(
    "text_tfidf_top5",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t.tok AS token
      FROM documents, unnest(str_split(text, ' ')) AS t(tok)
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.doc_freq,
             tf.tf * round(ln(CAST(n.n_docs AS DOUBLE) / df.doc_freq), 8) AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tf, doc_freq, tfidf, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, token) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
    tags=("L4", "A1", "W1"),
    bench=True,
)
def text_tfidf_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scored = TA.tf_idf(d)
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
    )


# --------------------------------------------------------------------------
# L6: language routing — filter + per-partition counts (write-side
# partitionBy is exercised in the sink tests).
# --------------------------------------------------------------------------
@query(
    "text_lang_route",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE lang IN ('en', 'fr', 'es')
    GROUP BY lang, source
    """,
    tags=("L6", "A1"),
)
def text_lang_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("lang").isin("en", "fr", "es"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# --------------------------------------------------------------------------
# Token counting, BPE-ish: regex word/punct tokens plus a subword estimate
# (ceil(len/4) pieces per word — the classic chars-per-token heuristic for
# LLM budget accounting). Pure regexp + integer arithmetic on both engines.
# --------------------------------------------------------------------------
_TOKEN_RE = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"


@query(
    "text_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS BIGINT)
             AS n_regex_tokens,
           CAST(list_aggregate(
                  list_transform(regexp_extract_all(text, '{_TOKEN_RE}'),
                                 t -> (length(t) + 3) // 4),
                  'sum') AS BIGINT) AS n_subword_est,
           CAST(len(list_filter(regexp_extract_all(text, '{_TOKEN_RE}'),
                                t -> t ~ '^[0-9]+$')) AS BIGINT) AS n_numeric
    FROM documents
    """,
    tags=("X1", "X4", "L4"),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # Spark SQL string literals process backslash escapes ('\s' -> 's'),
    # unlike DuckDB's — escape for the expr() path only
    spark_re = _TOKEN_RE.replace("\\", "\\\\")
    toks = F.expr(f"regexp_extract_all(text, '{spark_re}', 0)")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_regex_tokens"),
        F.aggregate(
            F.transform(toks, lambda t: ((F.length(t) + 3) / 4).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_subword_est"),
        F.size(
            F.filter(toks, lambda t: t.rlike("^[0-9]+$"))
        ).cast("long").alias("n_numeric"),
    )


# --------------------------------------------------------------------------
# Unigram log-probability scoring — the perplexity-style quality filter of
# a corpus build (docs whose tokens are improbable under the corpus's own
# unigram LM are boilerplate/garbage candidates). Fully relational: token
# explode → corpus unigram counts (one hash aggregate) → in-plan 1-row
# total (cross-join broadcast, zero driver jobs) → per-doc mean log10
# probability. Float note: log10 values are continuous (no fixture mass on
# 1e-6 grid boundaries), so round(·, 6) after the mean is cross-engine
# stable — the same argument the cosine family uses.
# At 100 TB: the unigram table is the only sizable shuffle (vocab-keyed,
# uniform); the per-doc aggregate is doc-keyed; nothing is collected.
# --------------------------------------------------------------------------
_UNIGRAM_ORACLE = """
    WITH toks AS (
      SELECT doc_id, lang, unnest(str_split(text, ' ')) AS token
      FROM documents
    ),
    freq AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
    tot AS (SELECT SUM(c) AS t FROM freq)
    SELECT toks.doc_id AS doc_id, any_value(toks.lang) AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(SUM(log10(c / t)) / COUNT(*), 6) AS mean_logprob
    FROM toks JOIN freq USING (token), tot
    GROUP BY toks.doc_id
"""


@query(
    "text_unigram_logprob",
    oracle=_UNIGRAM_ORACLE,
    tags=("L4", "A1", "J2", "X3"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    j = toks.join(freq, "token").crossJoin(F.broadcast(total))
    return j.groupBy("doc_id").agg(
        F.first("lang").alias("lang"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.sum(F.log10(F.col("c") / F.col("t"))) / F.count(F.lit(1)), 6)
        .alias("mean_logprob"),
    )


# --------------------------------------------------------------------------
# Gopher-style repetition signals (Rae et al. 2021 A1.1): most-frequent
# token/bigram occupancy + duplicated-trigram mass, plus the pass flag a
# curation pipeline would filter on. One in-row gram build → single explode
# → pure aggregation cascade (no joins; every key uniform).
# --------------------------------------------------------------------------
@query(
    "text_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(str_split(text, ' ')) AS tok,
             generate_subscripts(str_split(text, ' '), 1) AS i
      FROM documents
    ),
    seq AS (
      SELECT doc_id, tok,
             lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY i) AS t1,
             lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY i) AS t2
      FROM toks
    ),
    grams AS (
      SELECT doc_id, '1' AS kind, tok AS gram FROM seq
      UNION ALL
      SELECT doc_id, '2', tok || ' ' || t1 FROM seq WHERE t1 IS NOT NULL
      UNION ALL
      SELECT doc_id, '3', tok || ' ' || t1 || ' ' || t2 FROM seq
      WHERE t2 IS NOT NULL
    ),
    counts AS (
      SELECT doc_id, kind, gram, COUNT(*) AS c FROM grams GROUP BY ALL
    ),
    per_kind AS (
      SELECT doc_id, kind,
             CAST(SUM(c) AS BIGINT) AS total,
             CAST(MAX(c) AS BIGINT) AS top,
             CAST(COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS dup
      FROM counts GROUP BY ALL
    ),
    wide AS (
      SELECT doc_id,
             MAX(CASE WHEN kind = '1' THEN total END) AS n_tokens,
             CAST(MAX(CASE WHEN kind = '1' THEN top END) AS DOUBLE)
               / MAX(CASE WHEN kind = '1' THEN total END) AS top_token_frac,
             CAST(MAX(CASE WHEN kind = '2' THEN top END) AS DOUBLE)
               / MAX(CASE WHEN kind = '2' THEN total END) AS top_bigram_frac,
             CAST(MAX(CASE WHEN kind = '3' THEN dup END) AS DOUBLE)
               / MAX(CASE WHEN kind = '3' THEN total END) AS dup_trigram_frac
      FROM per_kind GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, top_token_frac, top_bigram_frac,
           dup_trigram_frac,
           (top_token_frac <= 0.20 AND top_bigram_frac <= 0.10
            AND dup_trigram_frac <= 0.60) AS pass_repetition
    FROM wide
    """,
    tags=("L6", "X4", "A1", "F3"),
    bench=True,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    rep = TA.repetition_stats(load_table(spark, sf_dir, "documents"))
    return rep.select(
        "doc_id",
        "n_tokens",
        "top_token_frac",
        "top_bigram_frac",
        "dup_trigram_frac",
        (
            (F.col("top_token_frac") <= 0.20)
            & (F.col("top_bigram_frac") <= 0.10)
            & (F.col("dup_trigram_frac") <= 0.60)
        ).alias("pass_repetition"),
    )


#: Winnowing CTE body (k=4, w=5) shared by `text_winnow_fp` and
#: `dedup_winnow_match` — the DuckDB re-expression of
#: TA.winnow_fingerprints: lead-window k-grams, md5-prefix hashes,
#: sliding MIN of each of the n_grams-w+1 windows, distinct.
WINNOW_FP_SQL = """
    toks AS (
      SELECT doc_id,
             unnest(str_split(text, ' ')) AS tok,
             generate_subscripts(str_split(text, ' '), 1) AS i
      FROM documents
    ),
    seq AS (
      SELECT doc_id, i, tok,
             lead(tok, 1) OVER win AS t1,
             lead(tok, 2) OVER win AS t2,
             lead(tok, 3) OVER win AS t3
      FROM toks
      WINDOW win AS (PARTITION BY doc_id ORDER BY i)
    ),
    kg AS (
      SELECT doc_id, i,
             substr(md5(tok || ' ' || t1 || ' ' || t2 || ' ' || t3),
                    1, 16) AS h,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_grams,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS rn
      FROM seq WHERE t3 IS NOT NULL
    ),
    wins AS (
      SELECT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY rn
                          ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS wmin,
             rn, n_grams
      FROM kg
    ),
    winnow_fp AS (
      SELECT DISTINCT doc_id, wmin AS fingerprint
      FROM wins WHERE rn <= GREATEST(n_grams - 4, 1)
    )
"""


# --------------------------------------------------------------------------
# Winnowed fingerprints (SIGMOD'03 / MOSS): guaranteed-coverage sampled
# k-gram hashes. In-row gram build -> one doc-keyed exchange -> window MIN.
# --------------------------------------------------------------------------
@query(
    "text_winnow_fp",
    oracle=f"""
    WITH {WINNOW_FP_SQL}
    SELECT doc_id, fingerprint FROM winnow_fp
    """,
    tags=("L7", "W4", "X1"),
)
def text_winnow_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TA.winnow_fingerprints(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# TextRank (Mihalcea & Tarau, EMNLP 2004): corpus keyword scores =
# weighted PageRank over the token adjacency graph. Fixed 3 iterations
# unroll into one static join→aggregate lineage (operators/graph.pagerank);
# grid-exact arithmetic makes the ITERATIVE computation hash-green — not
# rows-only — against a fully unrolled SQL oracle.
# --------------------------------------------------------------------------
_PR_RESID = repr(1.0 - 0.85)  # exact double repr so both engines share bits
_PR_ITER_SQL = """
    c{i} AS (
      SELECT f.dst AS node,
             CAST(SUM(CAST(round(p.rank * f.frac * 1000000000000.0)
                           AS BIGINT)) AS BIGINT) AS cg
      FROM frac f JOIN pr{prev} p ON f.src = p.node GROUP BY 1
    ),
    pr{i} AS (
      SELECT nodes.node,
             round({resid} / nn
                   + 0.85 * (COALESCE(cg, 0) / 1000000000000.0), 9) AS rank
      FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node, n
    )
"""


@query(
    "text_textrank",
    oracle=(
        """
    WITH toks AS (
      SELECT doc_id,
             unnest(str_split(text, ' ')) AS tok,
             generate_subscripts(str_split(text, ' '), 1) AS i
      FROM documents
    ),
    seq AS (
      SELECT doc_id, tok,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
      FROM toks
    ),
    dcnt AS (
      SELECT tok AS a, nxt AS b, COUNT(*) AS c
      FROM seq WHERE nxt IS NOT NULL AND tok <> nxt
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT src, dst, CAST(SUM(c) AS DOUBLE) AS w FROM (
        SELECT a AS src, b AS dst, c FROM dcnt
        UNION ALL
        SELECT b AS src, a AS dst, c FROM dcnt
      ) GROUP BY 1, 2
    ),
    wdeg AS (SELECT src, SUM(w) AS wdeg FROM edges GROUP BY 1),
    frac AS (
      SELECT e.src, e.dst, e.w / d.wdeg AS frac
      FROM edges e JOIN wdeg d USING (src)
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM nodes),
    pr0 AS (SELECT node, round(1.0 / nn, 9) AS rank FROM nodes, n),
    """
        + ",\n".join(
            _PR_ITER_SQL.format(i=i, prev=i - 1, resid=_PR_RESID)
            for i in (1, 2, 3)
        )
        + """
    SELECT node AS token, rank AS textrank FROM pr3
    """
    ),
    tags=("A1", "J2", "W3", "X4"),
)
def text_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents")
    toks = TA.tokens()
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    dcnt = (
        docs.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    edges = (
        dcnt.select(F.col("a").alias("src"), F.col("b").alias("dst"), "c")
        .unionByName(
            dcnt.select(F.col("b").alias("src"), F.col("a").alias("dst"), "c")
        )
        .groupBy("src", "dst")
        .agg(F.sum("c").cast("double").alias("w"))
    )
    pr = pagerank(edges, n_iterations=3, damping=0.85)
    return pr.select(F.col("node").alias("token"), F.col("rank").alias("textrank"))


# --------------------------------------------------------------------------
# CCNet-style LM quality scoring (Wenzek et al. 2020): every document
# scored by avg bigram NLL / perplexity under an add-one-smoothed bigram
# model trained in-plan on the lang='en' reference slice. The iterative-
# looking "train + score" is ONE declarative lineage: reference counts are
# aggregates, scoring is a uniform-keyed join of the doc-bigram stream.
# --------------------------------------------------------------------------
@query(
    "text_bigram_ppl",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(str_split(text, ' ')) AS tok,
             generate_subscripts(str_split(text, ' '), 1) AS i
      FROM documents
    ),
    seq AS (
      SELECT doc_id, tok AS prev,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS w
      FROM toks
    ),
    bg AS (SELECT doc_id, prev, w FROM seq WHERE w IS NOT NULL),
    refdocs AS (SELECT doc_id FROM documents WHERE lang = 'en'),
    c2 AS (
      SELECT prev, w, CAST(COUNT(*) AS BIGINT) AS c2
      FROM bg JOIN refdocs USING (doc_id) GROUP BY 1, 2
    ),
    c1 AS (SELECT prev, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
    v AS (
      SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS vv
      FROM toks JOIN refdocs USING (doc_id)
    ),
    sc AS (
      SELECT bg.doc_id,
             round(ln((COALESCE(c2.c2, 0) + 1.0)
                      / (COALESCE(c1.c1, 0) + v.vv)), 8) AS logp
      FROM bg LEFT JOIN c2 USING (prev, w) LEFT JOIN c1 USING (prev), v
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_bigrams,
             -(CAST(SUM(CAST(round(logp * 100000000.0) AS BIGINT))
                    AS BIGINT) / 100000000.0) / COUNT(*) AS avg_nll
      FROM sc GROUP BY 1
    )
    SELECT doc_id, n_bigrams, avg_nll, round(exp(avg_nll), 6) AS ppl
    FROM agg
    """,
    tags=("L6", "A1", "J2", "X3"),
)
def text_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TA.bigram_perplexity(docs, ref_filter=F.col("lang") == "en")


# --------------------------------------------------------------------------
# Inverted index build + positional phrase search — the reference's lookup
# structure expressed relationally. The index is one token-keyed aggregate
# over the (doc, pos, token) stream; phrase search intersects two posting
# streams on (doc, adjacent positions) — the classic positional-index
# AND-query, never a regex scan over raw text.
# --------------------------------------------------------------------------
@query(
    "text_inverted_index",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(str_split(text, ' ')) AS token,
             generate_subscripts(str_split(text, ' '), 1) - 1 AS pos
      FROM documents
    )
    SELECT token,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq,
           CAST(COUNT(*) AS BIGINT) AS n_postings,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM toks GROUP BY token
    """,
    tags=("A1", "A2", "X4", "L4"),
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = TA.exploded_tokens(docs)
    return toks.groupBy("token").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count(F.lit(1)).alias("n_postings"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


_PHRASES = [("table", "hash"), ("order", "fast"), ("window", "join")]
_PHRASES_SQL = ", ".join(f"('{a}', '{b}')" for a, b in _PHRASES)


@query(
    "text_phrase_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(str_split(text, ' ')) AS token,
             generate_subscripts(str_split(text, ' '), 1) - 1 AS pos
      FROM documents
    ),
    phrases AS (SELECT * FROM (VALUES {_PHRASES_SQL}) AS p(w1, w2))
    SELECT p.w1 || ' ' || p.w2 AS phrase, t1.doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM phrases p
    JOIN toks t1 ON t1.token = p.w1
    JOIN toks t2 ON t2.doc_id = t1.doc_id
     AND t2.pos = t1.pos + 1 AND t2.token = p.w2
    GROUP BY 1, 2
    """,
    tags=("J1", "J7", "A1", "L4"),
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = TA.exploded_tokens(docs)
    phrases = spark.createDataFrame(_PHRASES, "w1 string, w2 string")
    t1 = toks.select(
        F.col("doc_id"), F.col("pos").alias("p1"), F.col("token").alias("tk1")
    )
    t2 = toks.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("p2"),
        F.col("token").alias("tk2"),
    )
    return (
        t1.join(F.broadcast(phrases), F.col("tk1") == F.col("w1"))
        .join(
            t2,
            (F.col("d2") == F.col("doc_id"))
            & (F.col("p2") == F.col("p1") + 1)
            & (F.col("tk2") == F.col("w2")),
        )
        .groupBy(
            F.concat_ws(" ", F.col("w1"), F.col("w2")).alias("phrase"),
            "doc_id",
        )
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


# --------------------------------------------------------------------------
# PMI collocations (pointwise mutual information; Church & Hanks 1990 —
# public): association score for adjacent token pairs,
# pmi = round(ln(c(a,b) · N_bigrams / (cl(a) · cr(b))), 8), where cl/cr
# are the pair's left/right marginals over the bigram stream (so the
# probabilities are a proper joint/marginal family and Σ is consistent).
# Pure aggregates + two marginal joins; N is a 1-row broadcast.
# --------------------------------------------------------------------------
@query(
    "text_pmi_collocations",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(str_split(text, ' ')) AS tok,
             generate_subscripts(str_split(text, ' '), 1) AS i
      FROM documents
    ),
    seq AS (
      SELECT doc_id, tok AS a,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS b
      FROM toks
    ),
    bg AS (SELECT a, b FROM seq WHERE b IS NOT NULL),
    pair AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab FROM bg GROUP BY 1, 2),
    la AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS c_a FROM bg GROUP BY 1),
    rb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c_b FROM bg GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM bg)
    SELECT pair.a AS w1, pair.b AS w2, c_ab,
           round(ln(c_ab * nn / (c_a * c_b)), 8) AS pmi
    FROM pair JOIN la USING (a) JOIN rb USING (b), n
    WHERE c_ab >= 5
    """,
    tags=("A1", "J2", "X3", "L4"),
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = TA.tokens()
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    bg = docs.select(F.explode(pairs).alias("p")).select(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    )
    pair = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    la = bg.groupBy("a").agg(F.count(F.lit(1)).alias("c_a"))
    rb = bg.groupBy("b").agg(F.count(F.lit(1)).alias("c_b"))
    n_row = bg.agg(F.count(F.lit(1)).cast("double").alias("nn"))
    return (
        pair.join(la, "a")
        .join(rb, "b")
        .crossJoin(F.broadcast(n_row))
        .filter(F.col("c_ab") >= 5)
        .select(
            F.col("a").alias("w1"),
            F.col("b").alias("w2"),
            "c_ab",
            F.round(
                F.log(
                    F.col("c_ab") * F.col("nn") / (F.col("c_a") * F.col("c_b"))
                ),
                8,
            ).alias("pmi"),
        )
    )


# --------------------------------------------------------------------------
# Exact heavy hitters via sketch-then-verify (operators/sketch.py): a
# bounded-memory Misra-Gries candidate pass per partition (coverage
# guarantee: supersets every global θ-heavy hitter), then exact counts of
# ONLY the candidates — so the result equals the naive full-histogram
# GROUP BY/HAVING row-for-row while shuffling candidate values instead of
# one record per token occurrence. The oracle IS the naive plan.
# --------------------------------------------------------------------------
@query(
    "text_heavy_hitters",
    oracle="""
    WITH t AS (
      SELECT unnest(str_split(text, ' ')) AS value FROM documents
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t
            WHERE value IS NOT NULL)
    SELECT t.value,
           CAST(count(*) AS BIGINT) AS freq,
           CAST(min(tot.n) AS BIGINT) AS n
    FROM t CROSS JOIN tot
    WHERE t.value IS NOT NULL
    GROUP BY t.value
    HAVING count(*) * 30 >= min(tot.n)
    """,
    tags=("A1", "U4", "L4"),
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    return heavy_hitters(toks, "tok", theta=30)


# --------------------------------------------------------------------------
# BM25 retrieval scoring (Robertson & Zaragoza 2009; Lucene idf form):
# the scoring pass of a distributed grep — corpus stats in one 1-row
# broadcast, narrow per-row term math, TakeOrderedAndProject. Floats are
# pinned (literals 1.2/0.25/0.75/2.2 parse to identical doubles; ln on
# the 1e-9 grid; one left-associated term sum), so the top-k is
# value-hash exact.
# --------------------------------------------------------------------------
_BM25_TERMS = ("query", "stream", "merge")


def bm25_scored_sql() -> str:
    """The BM25 per-document scoring SQL (no order/limit) — shared by the
    text_bm25_topk oracle and the hybrid-RRF fusion oracle in
    queries/similarity.py."""
    stats_df = ",\n             ".join(
        f"SUM(CASE WHEN list_contains(str_split(text, ' '), '{t}') "
        f"THEN 1 ELSE 0 END) AS df_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    terms = " + ".join(
        f"""(round(ln(1.0 + ((n_docs - df_{i} + 0.5) / (df_{i} + 0.5))), 9)
         * (CAST(len(list_filter(str_split(text, ' '), x -> x = '{t}'))
                 AS DOUBLE) * 2.2)
         / (CAST(len(list_filter(str_split(text, ' '), x -> x = '{t}'))
                 AS DOUBLE)
            + 1.2 * (0.25 + 0.75 * (CAST(len(str_split(text, ' '))
                                         AS DOUBLE)
                                    / (CAST(total_tok AS DOUBLE)
                                       / n_docs)))))"""
        for i, t in enumerate(_BM25_TERMS)
    )
    return f"""
    WITH stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS total_tok,
             {stats_df}
      FROM documents
    )
    SELECT doc_id, lang, round({terms}, 6) AS bm25
    FROM documents, stats
    """


def _bm25_oracle() -> str:
    return f"""
    {bm25_scored_sql()}
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
    """


@query(
    "text_bm25_topk",
    oracle=_bm25_oracle(),
    tags=("L4", "O2", "X1", "A1"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return TA.bm25_topk(
        load_table(spark, sf_dir, "documents"), terms=_BM25_TERMS, k=10
    )


# --------------------------------------------------------------------------
# BM25 served from a PERSISTED inverted index — the text counterpart of
# the ANN build/search splits: postings (term, doc_id, tf) partitioned by
# term-hash bucket (a q-term search prunes the scan to ≤ q of 16
# partition dirs, then term row-group stats) + per-doc lengths, both
# maintained through the appendable-index commit path (base segment once,
# each accepted batch as its own retry-safe seg= partition). Corpus stats
# (N, total tokens, per-term df) are tiny aggregates at search time, so
# appends need no stats invalidation. Retrieval semantics: candidates =
# docs containing ≥1 query term (the inverted-index contract); the oracle
# is the exhaustive scorer restricted to the same candidate set — scoring
# math is the SAME expression as text_bm25_topk (shared
# _bm25_score_expr), so the value grid is identical.
# --------------------------------------------------------------------------
_BM25_IDX_DELTA = 100  # the repo-wide 100-doc ingest-batch convention


def _postings_appended(spark: SparkSession, sf_dir: str):
    """Load (building/appending as needed) the shared positional
    inverted-index artifacts: the postings relation (term-bucket
    partitioned) and the per-doc stats — ONE index pair serving BM25
    ranking AND positional phrase queries."""
    import pyarrow.parquet as pq

    from .similarity import (
        _index_dir,
        _load_appended_index,
        _source_fingerprint,
    )

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    c0 = n - _BM25_IDX_DELTA
    docs = load_table(spark, sf_dir, "documents")
    fp = _source_fingerprint(sf_dir, "documents")

    def _slice(lo: int | None) -> DataFrame:
        cond = (
            F.col("doc_id") < c0 if lo is None else F.col("doc_id") >= lo
        )
        return docs.filter(cond)

    postings = _load_appended_index(
        spark,
        _index_dir(sf_dir, f"invpost_b{TA.BM25_BUCKETS}"),
        fp,
        c0,
        n - 1,
        lambda: TA.inverted_postings(_slice(None)),
        lambda lo: TA.inverted_postings(_slice(lo)),
        extra_part_cols=("bucket",),
    )
    docstats = _load_appended_index(
        spark,
        _index_dir(sf_dir, "bm25docs"),
        fp,
        c0,
        n - 1,
        lambda: TA.bm25_docstats(_slice(None)),
        lambda lo: TA.bm25_docstats(_slice(lo)),
    )
    return postings, docstats


def _bm25_indexed_oracle() -> str:
    match = " OR ".join(
        f"list_contains(tk, '{t}')" for t in _BM25_TERMS
    )
    stats_df = ",\n             ".join(
        f"SUM(CASE WHEN list_contains(tk, '{t}') THEN 1 ELSE 0 END)"
        f" AS df_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    terms = " + ".join(
        f"""(round(ln(1.0 + ((n_docs - df_{i} + 0.5) / (df_{i} + 0.5))), 9)
         * (CAST(len(list_filter(tk, x -> x = '{t}')) AS DOUBLE) * 2.2)
         / (CAST(len(list_filter(tk, x -> x = '{t}')) AS DOUBLE)
            + 1.2 * (0.25 + 0.75 * (CAST(len(tk) AS DOUBLE)
                                    / (CAST(total_tok AS DOUBLE)
                                       / n_docs)))))"""
        for i, t in enumerate(_BM25_TERMS)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, lang, str_split(text, ' ') AS tk FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(len(tk)) AS BIGINT) AS total_tok,
             {stats_df}
      FROM toks
    ),
    cand AS (SELECT doc_id, lang, tk FROM toks WHERE {match})
    SELECT doc_id, lang, round({terms}, 6) AS bm25
    FROM cand, stats
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
    """


@query(
    "text_bm25_indexed_topk",
    oracle=_bm25_indexed_oracle(),
    tags=("L4", "O2", "X1", "A1", "S5"),
    bench=True,
)
def text_bm25_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    postings, docstats = _postings_appended(spark, sf_dir)
    return TA.bm25_topk_from_index(
        postings, docstats, terms=_BM25_TERMS, k=10
    )


# --------------------------------------------------------------------------
# Phrase search served from the SAME positional postings artifact the
# BM25 path reads (one appendable index, two query classes — the real
# search-engine shape): adjacency per document is one array_intersect of
# the two words' sorted position arrays, after the bucket/term-pruned
# postings scan. No token re-scan, no position explode; the only
# exchange is the doc-keyed join of the two word lists, sized by the
# words' document frequency. Oracle = the full-scan text_phrase_search
# SQL verbatim — the index path must emit exactly the live-scan rows.
# --------------------------------------------------------------------------
@query(
    "text_phrase_indexed",
    oracle=_REG["text_phrase_search"].oracle,
    tags=("L4", "J1", "A1", "X4", "S5"),
)
def text_phrase_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    postings, _ = _postings_appended(spark, sf_dir)
    return TA.phrase_hits_from_index(postings, tuple(_PHRASES))


# --------------------------------------------------------------------------
# BATCH BM25 from the same postings index: all queries in one
# bucket/term-pruned scan + ONE (query_id, doc) aggregate + one window —
# the ivf_batch_topk rule (never m per-query plans) applied to text
# retrieval. All queries share one arity so every score is the same
# left-associated 3-term IEEE sum shape, mirrored per query in the
# oracle's UNION ALL branches.
# --------------------------------------------------------------------------
_BM25_BATCH = {
    "qA": ("query", "stream", "merge"),
    "qB": ("table", "hash", "join"),
    "qC": ("order", "fast", "window"),
}


def _bm25_batch_oracle() -> str:
    branches = []
    for qid, terms in sorted(_BM25_BATCH.items()):
        match = " OR ".join(f"list_contains(tk, '{t}')" for t in terms)
        stats_df = ",\n               ".join(
            f"SUM(CASE WHEN list_contains(tk, '{t}') THEN 1 ELSE 0 END)"
            f" AS df_{i}"
            for i, t in enumerate(terms)
        )
        score = " + ".join(
            f"""(round(ln(1.0 + ((n_docs - df_{i} + 0.5) / (df_{i} + 0.5))), 9)
           * (CAST(len(list_filter(tk, x -> x = '{t}')) AS DOUBLE) * 2.2)
           / (CAST(len(list_filter(tk, x -> x = '{t}')) AS DOUBLE)
              + 1.2 * (0.25 + 0.75 * (CAST(len(tk) AS DOUBLE)
                                      / (CAST(total_tok AS DOUBLE)
                                         / n_docs)))))"""
            for i, t in enumerate(terms)
        )
        branches.append(
            f"""
      SELECT '{qid}' AS query_id, doc_id, lang,
             round({score}, 6) AS bm25
      FROM (SELECT doc_id, lang, tk FROM toks WHERE {match}),
           (SELECT COUNT(*) AS n_docs,
                   CAST(SUM(len(tk)) AS BIGINT) AS total_tok,
                   {stats_df}
            FROM toks)"""
        )
    union = "\n      UNION ALL".join(branches)
    return f"""
    WITH toks AS (
      SELECT doc_id, lang, str_split(text, ' ') AS tk FROM documents
    ),
    scored AS ({union})
    SELECT query_id, doc_id, lang, bm25, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY bm25 DESC, doc_id) AS rk
      FROM scored
    ) WHERE rk <= 10
    """


@query(
    "text_bm25_batch_topk",
    oracle=_bm25_batch_oracle(),
    tags=("L4", "O2", "W1", "A1", "S5"),
)
def text_bm25_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    postings, docstats = _postings_appended(spark, sf_dir)
    return TA.bm25_batch_from_index(postings, docstats, _BM25_BATCH, k=10)


# --------------------------------------------------------------------------
# Dyadic entropy bound — a repetitiveness signal from the token-frequency
# DISTRIBUTION (complementary to text_repetition's positional n-gram
# fractions; low token entropy ≈ CCNet/RefinedWeb-style boilerplate).
# True Shannon entropy needs log2 of arbitrary rationals (not ulp-stable
# cross-engine); the dyadic surrogate replaces log2 with floor_log2 via
# the bin()-length identity both engines share —
#   S = n·flog2(n) − Σ_tok c·flog2(c),   flog2(x) = length(bin(x)) − 1
# — an integer within n bits of n·H, monotone enough to rank repetitive
# docs. Output: the 50 lowest-entropy docs (centibits/token grid, total
# order). Scale: one (doc,token) count aggregate + one per-doc rollup —
# both map-side combining; no joins.
# --------------------------------------------------------------------------
@query(
    "text_entropy_bound",
    oracle="""
    WITH counts AS (
      SELECT doc_id, token, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS token
            FROM documents)
      GROUP BY doc_id, token
    ),
    per_doc AS (
      SELECT doc_id, SUM(c) AS n,
             SUM(c * (length(bin(c)) - 1)) AS sum_term
      FROM counts GROUP BY doc_id
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST((n * (length(bin(n)) - 1) - sum_term) * 100 // n AS BIGINT)
             AS ent_cbits
    FROM per_doc
    ORDER BY ent_cbits ASC, doc_id
    LIMIT 50
    """,
    tags=("L6", "A1", "X3", "O2"),
)
def text_entropy_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    flog2 = lambda col: F.length(F.bin(col)) - 1  # noqa: E731
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * flog2(F.col("c"))).alias("sum_term"),
    )
    return (
        per_doc.select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            F.expr("(n * (length(bin(n)) - 1) - sum_term) * 100 div n")
            .cast("long")
            .alias("ent_cbits"),
        )
        .orderBy(F.col("ent_cbits").asc(), F.col("doc_id"))
        .limit(50)
    )
