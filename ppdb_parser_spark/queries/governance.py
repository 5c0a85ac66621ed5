"""Corpus-governance extensions: Bloom-filter decontamination, exact
substring-span dedup, and DSIR-style importance reweighting (SURVEY.md
§2.9 — the corpus-build steps a 100 TB training-data pipeline runs
between raw scan and shard manifest).

Everything here is hash-oracle-exact by construction:

- randomness → content hashing (the ``md5(salt || id)`` bucket idiom
  from queries/training_data.py);
- integer hashing → the 60-bit md5-prefix idiom both engines compute
  byte-identically (Spark ``conv(substr(md5(x),1,15),16,10)``, DuckDB
  ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)`` — same contract as
  operators/dedup.py:_token_hash60);
- ratios → integer cross-multiplication or integer division on a fixed
  grid, never float rounding.

Scale notes are per-query; the common theme is that every structure a
probe side touches (Bloom word table, bucket-weight table) is O(constant)
or O(vocabulary-bucket) sized — broadcastable no matter how large the
corpus grows — so the corpus side stays a narrow scan + one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup as DD
from ..session import shuffle_width
from ..sources.tables import load_table
from .registry import query
from .training_data import _bucket_sql, _EVAL_MAX, _GOPHER_PASS_SQL, _bucket, gopher_pass_all

# --------------------------------------------------------------------------
# Shared hashing idioms (mirrored token-for-token in the oracles below).
# --------------------------------------------------------------------------


def _md5_int60(col: F.Column) -> F.Column:
    """First 15 hex chars of md5 → non-negative 60-bit integer, identical
    in both engines (see operators/dedup.py:_token_hash60)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


_MD5_INT60_SQL = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


# --------------------------------------------------------------------------
# pipeline_decontaminate_bloom — Bloom-filter benchmark decontamination.
#
# pipeline_decontaminate (training_data.py) broadcasts the *exact* eval
# 8-gram set. That is right while the eval suite is small, but a
# decontamination pass against a large held-out corpus (or a union of
# many benchmarks) can't broadcast millions of shingle strings. The
# 100 TB answer is the classic one: build a Bloom filter over the eval
# shingles, SIZED to the eval-shingle count and target FPR by
# ``recommend_bloom_bits`` below, and broadcast THAT; the corpus side
# probes k positions per shingle with integer ops only. Bloom filters
# are deterministic, so the whole query — including its false positives
# — is hash-oracle-exact, and the query's output quantifies the price:
# per language, docs flagged by the Bloom probe vs the exact semi-join
# (bloom ⊇ exact; no false negatives by construction).
# --------------------------------------------------------------------------


def recommend_bloom_bits(n_items: int, target_fpr: float = 0.01) -> tuple[int, int]:
    """Size a decontamination Bloom filter: (m_bits, k_hashes) for
    ``n_items`` eval shingles at ``target_fpr``. Standard optima
    m = -n·ln(p)/ln(2)², k = (m/n)·ln(2) — rounded up / to nearest ≥ 1.

    This encodes the BASELINE_HISTORY.md "bloomscale" lesson as an assertable
    rule: the round-8 fixture's fixed m=2^16 saturated at 16× eval
    growth (kn/m ≈ 9 → FPR → 1). Since round 10 the rule is
    LOAD-BEARING, not advisory: ``_B_M``/``_B_SEEDS`` below are derived
    from it (~10–14 bits/item for 1–0.1 % FPR — a ~100× compression of
    the exact shingle-string set, not a constant). The word-table
    layout and probe plan in pipeline_decontaminate_bloom are unchanged
    by m. (Lives here, not in queries/sketches.py, because sketches
    imports this module; re-exported there for its historical path.)
    """
    import math as _math

    if n_items <= 0:
        raise ValueError("n_items must be positive")
    if not 0.0 < target_fpr < 1.0:
        raise ValueError("target_fpr must be in (0, 1)")
    m = _math.ceil(-n_items * _math.log(target_fpr) / (_math.log(2) ** 2))
    k = max(1, round((m / n_items) * _math.log(2)))
    return m, k


_B_NGRAM = 8
#: Sizing point (static, documented — the driver gate needs module-level
#: oracle SQL): the bloomscale smoke's 16× fresh-vocab rung measured
#: 195,645 distinct eval shingles at sf0.1 (BASELINE_HISTORY.md round-8 row) —
#: the LARGEST eval set any committed fixture produces → n = 200k.
#: The FPR the report's flag columns care about is DOC-level: a doc is
#: falsely flagged if ANY of its distinct shingles false-positives, so
#: the per-shingle target is the union bound ``doc_target / shingles
#: per doc`` — 0.01 / ~47 (measured avg 47.1, p99 92 distinct 8-gram
#: shingles per sf0.1 document) ≈ 2e-4. (Sizing to a naive per-shingle
#: 1% left 33% of 16×-rung train docs falsely flagged — measured before
#: this correction.) n=200k @ 2e-4 → m = 3,545,485 bits in ≤ 59,092
#: int64 words (~470 KB broadcast — still a ~40× compression of the
#: 16× exact shingle-string set), k = 12. A production snapshot
#: recomputes (m, k) per eval suite + corpus shingle profile with the
#: same two-line derivation.
_B_M, _B_K = recommend_bloom_bits(200_000, 0.0002)
_B_WORD = 60  # bits packed per int64 word (0..59 keeps shifts sign-free)
_B_SEEDS = tuple(range(_B_K))  # k hash functions
_B_SEEDS_SQL = "[" + ", ".join(str(s) for s in _B_SEEDS) + "]"

_B_POS_SQL = (
    "(" + _MD5_INT60_SQL.format(x="'bloom' || CAST({s} AS VARCHAR) || ':' || g")
    + f" % {_B_M})"
)

_DECON_BLOOM_ORACLE = f"""
    WITH docs AS (
      SELECT doc_id, lang, str_split(text, ' ') AS t,
             {_bucket_sql('eval:')} < '{_EVAL_MAX}' AS is_eval
      FROM documents
    ),
    sh AS (
      SELECT doc_id, is_eval,
             unnest(list_distinct([array_to_string(t[i:i+{_B_NGRAM}-1], ' ')
                                   for i in range(1, len(t)-{_B_NGRAM}+2)])) AS g
      FROM docs WHERE len(t) >= {_B_NGRAM}
    ),
    ev AS (SELECT DISTINCT g FROM sh WHERE is_eval),
    bloom AS (
      SELECT p // {_B_WORD} AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(p % {_B_WORD} AS INTEGER)) AS bits
      FROM (SELECT {_B_POS_SQL.format(s='s')} AS p
            FROM ev, (SELECT unnest({_B_SEEDS_SQL}) AS s))
      GROUP BY p // {_B_WORD}
    ),
    trainsh AS (SELECT doc_id, g FROM sh WHERE NOT is_eval),
    probe AS (
      SELECT doc_id, g, {_B_POS_SQL.format(s='s')} AS p
      FROM trainsh, (SELECT unnest({_B_SEEDS_SQL}) AS s)
    ),
    hits AS (
      SELECT doc_id, g, COUNT(*) AS k
      FROM probe JOIN bloom ON probe.p // {_B_WORD} = bloom.word
      WHERE ((bits >> CAST(p % {_B_WORD} AS INTEGER)) & 1) = 1
      GROUP BY doc_id, g
    ),
    bloomdocs AS (SELECT DISTINCT doc_id FROM hits WHERE k = {len(_B_SEEDS)}),
    exactdocs AS (SELECT DISTINCT t.doc_id FROM trainsh t JOIN ev USING (g)),
    train AS (SELECT doc_id, lang FROM docs WHERE NOT is_eval)
    SELECT lang,
           COUNT(*) AS n_train,
           CAST(COUNT(b.doc_id) AS BIGINT) AS n_bloom_flagged,
           CAST(COUNT(e.doc_id) AS BIGINT) AS n_exact_flagged,
           CAST(COUNT(b.doc_id) - COUNT(e.doc_id) AS BIGINT) AS n_false_pos
    FROM train
    LEFT JOIN bloomdocs b USING (doc_id)
    LEFT JOIN exactdocs e USING (doc_id)
    GROUP BY lang
"""


def _bloom_pos(shingle: F.Column, seed: int) -> F.Column:
    return _md5_int60(F.concat(F.lit(f"bloom{seed}:"), shingle)) % _B_M


def _bloom_pos_explode_sql() -> str:
    """The k-seed Bloom position explode as ONE selectExpr string
    (round 16): the Column-builder form cost ~200 py4j round trips per
    call site — ~0.45 s of plan-construction wall per bloom query
    across its two sites (profiled). Parses to the same expressions as
    ``_bloom_pos`` (md5-int60 of 'bloom<seed>:'||shingle, mod m);
    positions — and therefore the bloom table and every flag — are
    unchanged (oracle hash-exact)."""
    ps = ", ".join(
        f"cast(conv(substring(md5(concat('bloom{s}:', shingle)), 1, 15),"
        f" 16, 10) as bigint) % {_B_M}"
        for s in _B_SEEDS
    )
    return f"explode(array({ps})) as p"


def decontaminate_bloom_report(
    docs: DataFrame, min_partitions: int | None = None
) -> DataFrame:
    """Frame-parameterized body of pipeline_decontaminate_bloom (so the
    scale smoke can feed it grown corpora).

    Round 15 (guide §1.2 — don't recompute what a dictionary can hold):
    the Bloom probe and the exact-membership flag are pure functions of
    the SHINGLE, so both are computed once per DISTINCT shingle and
    joined back to the (doc, shingle) occurrence stream — the
    minhash-dictionary pattern. The old plan probed per occurrence:
    k=12 md5 positions per train (doc, shingle) row (~12·|occurrences|
    md5 calls, then a |occurrences·k|-row join stream into a
    (doc, shingle)-keyed count), all of which collapses to
    12·|distinct train shingles| md5s and a vocab-sized aggregate.
    Flag VALUES are identical — same bloom table, same positions, same
    all-k-bits rule — so the oracle (false positives included) is
    unchanged."""
    sh = DD.word_shingles(
        docs, n=_B_NGRAM, min_partitions=min_partitions
    ).withColumn("is_eval", _bucket("eval:") < _EVAL_MAX)

    # one aggregate derives the whole vocabulary with per-corpus
    # presence; feeds the bloom build, the probe, and the flag join.
    # Explicit shingle-keyed repartition before the cut (round 15,
    # guide §2.5): without it AQE coalesces the vocabulary's few-MB
    # exchange to one partition, and when the planner broadcasts the
    # occurrence side of the flag join (narrower byte estimate), the
    # whole per-doc flag aggregate's partial pass runs on that single
    # probe task — the same single-task trap root-caused in
    # operators/dedup._mh_fp_and_dict. A user partition count is
    # AQE-exempt; at scale the shingle-keyed exchange is the flag
    # join's own shuffle, reused.
    nparts = min_partitions or shuffle_width(docs.sparkSession)
    vocab = (
        sh.groupBy("shingle")
        .agg(
            F.max(F.col("is_eval").cast("int")).alias("in_eval"),
            F.max((~F.col("is_eval")).cast("int")).alias("in_train"),
        )
        .repartition(nparts, F.col("shingle"))
        .localCheckpoint(eager=False)
    )
    eval_sh = vocab.filter(F.col("in_eval") == 1).select("shingle")
    # Fixed-size Bloom word table: ≤ ceil(m / 60) rows however large the
    # eval set — THE broadcastable decontamination structure at scale.
    bloom_words = (
        eval_sh.selectExpr(_bloom_pos_explode_sql())
        .select(
            F.expr(f"p div {_B_WORD}").alias("word"),
            F.expr(f"shiftleft(cast(1 as bigint), cast(p % {_B_WORD} as int))").alias(
                "one_bit"
            ),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(one_bit)").alias("bits"))
    )

    train_vocab = vocab.filter(F.col("in_train") == 1).select(
        "shingle", "in_eval"
    )
    # per-SHINGLE Bloom probe: k positions, inner-join the word table
    # (a missing word is a miss), flagged iff all k bits are set
    bloom_flagged = (
        train_vocab.selectExpr("shingle", _bloom_pos_explode_sql())
        .select(
            "shingle",
            F.expr(f"p div {_B_WORD}").alias("word"),
            F.expr(f"cast(p % {_B_WORD} as int)").alias("bit"),
        )
        .join(F.broadcast(bloom_words), "word")
        .filter(F.expr("(shiftright(bits, bit) & 1) = 1"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") == len(_B_SEEDS))
        .select("shingle", F.lit(1).alias("bloom"))
    )
    flags = train_vocab.join(bloom_flagged, "shingle", "left")

    # ONE pass over the train occurrence stream attaches both flags
    doc_flags = (
        sh.filter(~F.col("is_eval"))
        .select("doc_id", "shingle")
        .join(flags, "shingle")
        .groupBy("doc_id")
        .agg(
            F.max("bloom").alias("bloom_hit"),
            F.when(F.max("in_eval") == 1, F.lit(1)).alias("exact_hit"),
        )
    )
    train = docs.filter(_bucket("eval:") >= _EVAL_MAX).select("doc_id", "lang")
    return (
        train.join(doc_flags, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.count("bloom_hit").alias("n_bloom_flagged"),
            F.count("exact_hit").alias("n_exact_flagged"),
            (F.count("bloom_hit") - F.count("exact_hit")).alias("n_false_pos"),
        )
    )


@query(
    "pipeline_decontaminate_bloom",
    oracle=_DECON_BLOOM_ORACLE,
    tags=("J1", "J4", "A1", "X3"),
    bench=True,
)
def pipeline_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontaminate_bloom_report(
        load_table(spark, sf_dir, "documents"),
        min_partitions=spark.sparkContext.defaultParallelism,
    )


# --------------------------------------------------------------------------
# dedup_substring_spans — exact duplicated-substring mass per document.
#
# The span-level complement of document-level near-dup (Lee et al. 2022,
# arXiv:2107.06499, "Deduplicating Training Data Makes Language Models
# Better" — their ExactSubstr pass): a span duplicated ACROSS documents
# is memorization fuel even when the documents as wholes are distinct.
# Suffix arrays don't distribute; the Spark-native equivalent is the
# rolling n-gram span table: every 12-token span (stride 1, distinct per
# doc), one shuffle on the span to count distinct carrying docs, then a
# windowed count re-keyed per doc — no self-join of the span table.
# Output: every doc carrying ≥1 cross-doc duplicated span, with its
# duplicated-span mass in integer basis points.
#
# Scale: span cardinality ~ token count, so the one exchange is ~corpus
# sized — same cost class as the winnow/minhash shuffles; at 100 TB the
# span key becomes xxhash64-int64 (collision-safe at these densities)
# instead of the md5-friendly raw string the oracle shares, and
# boilerplate mega-spans (df in the millions) get the same df-cap the
# prefix-Jaccard tier documents.
# --------------------------------------------------------------------------
_SPAN_N = 12

_SUBSTRING_SPANS_ORACLE = f"""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(t[i:i+{_SPAN_N}-1], ' ')
                                   for i in range(1, len(t)-{_SPAN_N}+2)])) AS g
      FROM (SELECT doc_id, str_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= {_SPAN_N}
    ),
    spans AS (
      SELECT doc_id, COUNT(*) OVER (PARTITION BY g) AS n_docs
      FROM sh
    )
    SELECT doc_id,
           COUNT(*) AS n_spans,
           CAST(COUNT(CASE WHEN n_docs >= 2 THEN 1 END) AS BIGINT) AS n_dup_spans,
           CAST(COUNT(CASE WHEN n_docs >= 2 THEN 1 END) * 10000 AS BIGINT)
             // COUNT(*) AS dup_bp
    FROM spans
    GROUP BY doc_id
    HAVING COUNT(CASE WHEN n_docs >= 2 THEN 1 END) > 0
"""


@query(
    "dedup_substring_spans",
    oracle=_SUBSTRING_SPANS_ORACLE,
    tags=("O6", "A1", "X4", "W4"),
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = DD.word_shingles(
        docs, n=_SPAN_N, min_partitions=spark.sparkContext.defaultParallelism
    )
    # One shuffle: window over the span key counts carrying docs (rows are
    # distinct per doc), then the per-doc rollup rides the same exchange.
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    dup = F.when(F.col("n_docs") >= 2, 1)
    return (
        sh.withColumn("n_docs", n_docs)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count(dup).alias("n_dup_spans"),
            F.expr(
                "cast(count(case when n_docs >= 2 then 1 end) * 10000 as bigint)"
                " div count(1)"
            ).alias("dup_bp"),
        )
        .filter(F.col("n_dup_spans") > 0)
    )


# --------------------------------------------------------------------------
# pipeline_decontaminate_semantic — embedding-space decontamination.
#
# The semantic complement of the n-gram decontaminators above/below
# (pipeline_decontaminate: exact 8-gram probe; _bloom: the same probe
# through a sized Bloom filter): a train document that PARAPHRASES an
# eval document shares no 8-gram and sails through both, but its
# embedding sits within cosine τ of the eval embedding. Same eval slice
# convention (md5 bucket, salt "eval:", < _EVAL_MAX ≈ 5%) keyed on
# vec_id (= doc_id for the embeddings fixture), so the three
# decontamination tiers are directly comparable. Per-language report
# over the train side plus an md5 manifest of the contaminated ids —
# the counts alone would hash-collide across wrong flag assignments
# that preserve totals.
#
# Plan/scale notes on the operator
# (operators/similarity.py::semantic_decontaminate): eval collects to
# ONE broadcast row (bounded seeds-row idiom), train is a narrow
# per-row EXISTS map — no shuffle beyond the final report aggregate.
# --------------------------------------------------------------------------
_SEMDECON_T = 0.35

_SEMDECON_ORACLE = f"""
    WITH qflat AS MATERIALIZED (
      SELECT vec_id,
             CAST(round(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT) AS qx,
             i
      FROM (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
    ),
    norms AS MATERIALIZED (
      SELECT vec_id,
             round(sqrt(CAST(CAST(SUM(qx * qx) AS BIGINT) AS DOUBLE))
                   / 10000000.0, 6) AS nrm
      FROM qflat GROUP BY vec_id
    ),
    flags AS (
      SELECT vec_id,
             {_bucket_sql('eval:', 'vec_id')}
               < '{_EVAL_MAX}' AS is_eval
      FROM embeddings
    ),
    pairdots AS (
      SELECT ft.vec_id AS tid, fe.vec_id AS eid,
             CAST(SUM(a.qx * b.qx) AS BIGINT) AS dg
      FROM flags ft
      JOIN flags fe ON fe.is_eval AND NOT ft.is_eval
      JOIN qflat a ON a.vec_id = ft.vec_id
      JOIN qflat b ON b.vec_id = fe.vec_id AND b.i = a.i
      GROUP BY 1, 2
    ),
    contaminated AS (
      SELECT DISTINCT p.tid AS vec_id
      FROM pairdots p
      JOIN norms na ON p.tid = na.vec_id
      JOIN norms nb ON p.eid = nb.vec_id
      WHERE round((CAST(p.dg AS DOUBLE) / 100000000000000.0)
                  / (na.nrm * nb.nrm), 6) >= {_SEMDECON_T}
    ),
    train AS (
      SELECT f.vec_id, d.lang
      FROM flags f JOIN documents d ON d.doc_id = f.vec_id
      WHERE NOT f.is_eval
    )
    SELECT t.lang,
           CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST(COUNT(c.vec_id) AS BIGINT) AS n_contaminated,
           CAST(COUNT(*) - COUNT(c.vec_id) AS BIGINT) AS n_clean,
           md5(COALESCE(string_agg(
               CASE WHEN c.vec_id IS NOT NULL
                    THEN CAST(t.vec_id AS VARCHAR) END, ','
               ORDER BY t.vec_id), '')) AS contaminated_md5
    FROM train t LEFT JOIN contaminated c USING (vec_id)
    GROUP BY t.lang
"""


@query(
    "pipeline_decontaminate_semantic",
    oracle=_SEMDECON_ORACLE,
    tags=("L1", "L2", "J1", "J9", "A1", "A4"),
)
def pipeline_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semantic_decontaminate

    emb = load_table(spark, sf_dir, "embeddings")
    is_eval = (
        F.substring(
            F.md5(F.concat(F.lit("eval:"), F.col("vec_id").cast("string"))),
            1,
            4,
        )
        < _EVAL_MAX
    )
    flagged = semantic_decontaminate(emb, is_eval, threshold=_SEMDECON_T)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        flagged.join(docs, flagged.vec_id == docs.doc_id)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.count(F.when(F.col("contaminated"), 1)).alias(
                "n_contaminated"
            ),
            (
                F.count(F.lit(1)) - F.count(F.when(F.col("contaminated"), 1))
            ).alias("n_clean"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("contaminated"), F.col("vec_id")
                                )
                            )
                        ),
                        lambda v: v.cast("string"),
                    ),
                    ",",
                )
            ).alias("contaminated_md5"),
        )
    )


# --------------------------------------------------------------------------
# pipeline_decontaminate_jaccard — document-level near-dup decontamination.
#
# The FOURTH decontamination tier, filling the gap between the n-gram
# probes and the embedding tier: exact 8-gram / Bloom (pipeline_
# decontaminate / _bloom) flag literal n-gram overlap, semantic
# (pipeline_decontaminate_semantic) flags paraphrase in embedding space —
# this tier flags WHOLE-DOCUMENT set-level near-duplication (shingle
# Jaccard ≥ τ against ANY eval document): a train doc that is a light
# edit of an eval doc (reordered/substituted words, partial 8-gram decay)
# but not a paraphrase. Same eval-slice convention (md5 bucket, salt
# "eval:", < _EVAL_MAX) so all four tiers are directly comparable.
#
# Spark-first shape: the eval corpus's ids shift above a cutoff and the
# SAME AllPairs/PPJoin prefix machinery as dedup_jaccard_prefix runs in
# two-corpus mode (operators/dedup.py::jaccard_pairs_prefix
# cross_min_id): only cross pairs (train below the cutoff, eval at/above)
# survive the join condition, so the pair aggregate's input is
# Σ df_train·df_eval — proportional to the eval corpus, not the corpus
# square. Per contaminated train doc: match count + max Jaccard (int/int
# division → correctly-rounded double, cross-engine exact).
# --------------------------------------------------------------------------
_XDECON_T = 0.5
_XDECON_SHIFT = 1_000_000_000

_XDECON_ORACLE = f"""
    WITH pos_toks AS (
      SELECT doc_id,
             unnest(str_split(text, ' ')) AS token,
             generate_subscripts(str_split(text, ' '), 1) AS pos
      FROM documents
    ),
    sh_all AS (
      SELECT DISTINCT doc_id,
             token || ' ' || lead(token) OVER (PARTITION BY doc_id ORDER BY pos)
               AS shingle
      FROM pos_toks
    ),
    sh AS (SELECT doc_id, shingle FROM sh_all WHERE shingle IS NOT NULL
           AND len(str_split(shingle, ' ')) = 2),
    flags AS (
      SELECT doc_id, lang,
             {{bucket}} < '{{evmax}}' AS is_eval
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
             COUNT(*) AS n_common
      FROM sh t
      JOIN flags ft ON ft.doc_id = t.doc_id AND NOT ft.is_eval
      JOIN sh e ON e.shingle = t.shingle
      JOIN flags fe ON fe.doc_id = e.doc_id AND fe.is_eval
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT i.train_id, i.eval_id,
             i.n_common / (st.n + se.n - i.n_common) AS jaccard
      FROM inter i
      JOIN sizes st ON st.doc_id = i.train_id
      JOIN sizes se ON se.doc_id = i.eval_id
      WHERE i.n_common / (st.n + se.n - i.n_common) >= {{tau}}
    )
    SELECT j.train_id AS doc_id, f.lang,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           MAX(j.jaccard) AS max_jaccard
    FROM jac j JOIN flags f ON f.doc_id = j.train_id
    GROUP BY 1, 2
""".format(bucket=_bucket_sql('eval:'), evmax=_EVAL_MAX, tau=0.5)


@query(
    "pipeline_decontaminate_jaccard",
    oracle=_XDECON_ORACLE,
    tags=("O6", "J2", "A1", "X1"),
)
def pipeline_decontaminate_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_eval = _bucket("eval:") < _EVAL_MAX
    tagged = docs.select(
        F.when(is_eval, F.col("doc_id") + _XDECON_SHIFT)
        .otherwise(F.col("doc_id"))
        .alias("doc_id"),
        "text",
    )
    pairs = DD.jaccard_pairs_prefix(
        tagged,
        threshold=_XDECON_T,
        n=2,
        min_partitions=spark.sparkContext.defaultParallelism,
        cross_min_id=_XDECON_SHIFT,
    )
    return (
        pairs.groupBy(F.col("id_a").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.max("jaccard").alias("max_jaccard"),
        )
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "n_matches", "max_jaccard")
    )


# --------------------------------------------------------------------------
# dedup_span_scrub — C4/ExactSubstr-style span REMOVAL with reconstruction.
#
# The scrubbing complement of dedup_substring_spans above: that query
# REPORTS duplicated-span mass; this one actually deletes every cross-doc
# duplicated 12-token span from all but its canonical (min doc_id)
# carrier and rebuilds the surviving text — the operation C4
# (arXiv:1910.10683 §2.2, three-sentence span rule) and Lee et al.'s
# ExactSubstr apply before training. Output is total over documents:
# (doc_id, n_tok, n_removed, scrub_md5) — md5 of the reconstructed text
# rather than the text itself keeps the driver artifact compact while
# still pinning every byte of the reconstruction.
#
# Plan/scale notes live on the operator (operators/dedup.py::span_scrub):
# one span-key window + one (doc_id, pos) anti join, position expansion
# only on the duplicated mass.
# --------------------------------------------------------------------------
_SCRUB_N = 12

_SPAN_SCRUB_ORACLE = f"""
    WITH base AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    occ AS (
      SELECT doc_id,
             struct_extract(s, 'start') AS start,
             struct_extract(s, 'g') AS g
      FROM (
        SELECT doc_id,
               unnest([{{'start': i,
                         'g': array_to_string(t[i:i+{_SCRUB_N}-1], ' ')}}
                       for i in range(1, len(t)-{_SCRUB_N}+2)]) AS s
        FROM base WHERE len(t) >= {_SCRUB_N}
      )
    ),
    marked AS (
      SELECT doc_id, start,
             MIN(doc_id) OVER (PARTITION BY g) AS owner
      FROM occ
    ),
    cov AS (
      SELECT DISTINCT doc_id, start + d AS pos
      FROM (SELECT doc_id, start FROM marked WHERE doc_id <> owner)
      CROSS JOIN (SELECT unnest(range(0, {_SCRUB_N})) AS d)
    ),
    toks AS (
      SELECT doc_id, unnest(t) AS token,
             unnest(range(1, len(t) + 1)) AS pos
      FROM base
    ),
    kept AS (
      SELECT k.doc_id, k.pos, k.token
      FROM toks k LEFT JOIN cov c ON c.doc_id = k.doc_id AND c.pos = k.pos
      WHERE c.doc_id IS NULL
    ),
    agg AS (
      SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS scrub_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(len(b.t) AS BIGINT) AS n_tok,
           CAST(len(b.t) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
           md5(COALESCE(a.scrub_text, '')) AS scrub_md5
    FROM base b LEFT JOIN agg a USING (doc_id)
"""


@query(
    "dedup_span_scrub",
    oracle=_SPAN_SCRUB_ORACLE,
    tags=("O6", "W4", "J5", "A4", "X4"),
    bench=True,
)
def dedup_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = DD.span_scrub(
        docs,
        n=_SCRUB_N,
        min_partitions=spark.sparkContext.defaultParallelism,
    )
    return scrubbed.select(
        "doc_id",
        "n_tok",
        "n_removed",
        F.md5("scrub_text").alias("scrub_md5"),
    )


# --------------------------------------------------------------------------
# dedup_span_scrub_intra — intra-document repeated-span removal.
#
# The in-document sibling of dedup_span_scrub above (RefinedWeb §"line
# dedup" / C4's repeated-content rules, at n-gram granularity): within
# each document every 3-token span keeps only its FIRST occurrence,
# later occurrences are deleted, text is rebuilt. n=3 here (not the
# cross-doc 12): intra-doc boilerplate repeats at short range, and the
# fixture's synthetic docs carry plentiful repeated trigrams while a
# repeated 12-gram within one doc is vanishingly rare — the cross-doc
# and intra-doc rules deliberately probe different n regimes.
# --------------------------------------------------------------------------
_SCRUB_INTRA_N = 3

_SPAN_SCRUB_INTRA_ORACLE = f"""
    WITH base AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    occ AS (
      SELECT doc_id,
             struct_extract(s, 'start') AS start,
             struct_extract(s, 'g') AS g
      FROM (
        SELECT doc_id,
               unnest([{{'start': i,
                         'g': array_to_string(t[i:i+{_SCRUB_INTRA_N}-1], ' ')}}
                       for i in range(1, len(t)-{_SCRUB_INTRA_N}+2)]) AS s
        FROM base WHERE len(t) >= {_SCRUB_INTRA_N}
      )
    ),
    marked AS (
      SELECT doc_id, start,
             MIN(start) OVER (PARTITION BY doc_id, g) AS first_start
      FROM occ
    ),
    cov AS (
      SELECT DISTINCT doc_id, start + d AS pos
      FROM (SELECT doc_id, start FROM marked WHERE start <> first_start)
      CROSS JOIN (SELECT unnest(range(0, {_SCRUB_INTRA_N})) AS d)
    ),
    toks AS (
      SELECT doc_id, unnest(t) AS token,
             unnest(range(1, len(t) + 1)) AS pos
      FROM base
    ),
    kept AS (
      SELECT k.doc_id, k.pos, k.token
      FROM toks k LEFT JOIN cov c ON c.doc_id = k.doc_id AND c.pos = k.pos
      WHERE c.doc_id IS NULL
    ),
    agg AS (
      SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS scrub_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(len(b.t) AS BIGINT) AS n_tok,
           CAST(len(b.t) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
           md5(COALESCE(a.scrub_text, '')) AS scrub_md5
    FROM base b LEFT JOIN agg a USING (doc_id)
"""


@query(
    "dedup_span_scrub_intra",
    oracle=_SPAN_SCRUB_INTRA_ORACLE,
    tags=("O6", "W4", "J5", "A4", "X4"),
)
def dedup_span_scrub_intra(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = DD.span_scrub_intra(
        docs,
        n=_SCRUB_INTRA_N,
        min_partitions=spark.sparkContext.defaultParallelism,
    )
    return scrubbed.select(
        "doc_id",
        "n_tok",
        "n_removed",
        F.md5("scrub_text").alias("scrub_md5"),
    )


# --------------------------------------------------------------------------
# pipeline_scrub_cascade — the two scrubbers composed into one lineage.
#
# Stage 0: intra-document scrub (n=3, first occurrence kept) — remove
# in-doc boilerplate FIRST so it cannot manufacture cross-doc span
# collisions; stage 1: cross-document scrub (n=12, min-id canonical)
# on the REBUILT text; stage 2: per-language report over both stages —
# doc/token counts, per-stage removed mass, docs scrubbed to empty,
# distinct final texts (the exact-dedup collapse the scrubbed corpus
# feeds), plus an md5 manifest of per-doc total removals so a wrong
# flag assignment that preserves the sums still hash-fails.
#
# The point of the query (beyond the report): the scrub operators
# compose — stage 1 consumes stage 0's reconstructed text column, not
# the original relation, and the DuckDB oracle chains the same two CTE
# pipelines end-to-end.
# --------------------------------------------------------------------------
_CASCADE_ORACLE = f"""
    WITH base1 AS (
      SELECT doc_id, lang, str_split(text, ' ') AS t FROM documents
    ),
    occ1 AS (
      SELECT doc_id,
             struct_extract(s, 'start') AS start,
             struct_extract(s, 'g') AS g
      FROM (
        SELECT doc_id,
               unnest([{{'start': i,
                         'g': array_to_string(t[i:i+{_SCRUB_INTRA_N}-1], ' ')}}
                       for i in range(1, len(t)-{_SCRUB_INTRA_N}+2)]) AS s
        FROM base1 WHERE len(t) >= {_SCRUB_INTRA_N}
      )
    ),
    marked1 AS (
      SELECT doc_id, start,
             MIN(start) OVER (PARTITION BY doc_id, g) AS first_start
      FROM occ1
    ),
    cov1 AS (
      SELECT DISTINCT doc_id, start + d AS pos
      FROM (SELECT doc_id, start FROM marked1 WHERE start <> first_start)
      CROSS JOIN (SELECT unnest(range(0, {_SCRUB_INTRA_N})) AS d)
    ),
    toks1 AS (
      SELECT doc_id, unnest(t) AS token,
             unnest(range(1, len(t) + 1)) AS pos
      FROM base1
    ),
    kept1 AS (
      SELECT k.doc_id, k.pos, k.token
      FROM toks1 k LEFT JOIN cov1 c ON c.doc_id = k.doc_id AND c.pos = k.pos
      WHERE c.doc_id IS NULL
    ),
    stage1 AS MATERIALIZED (
      SELECT b.doc_id, b.lang,
             CAST(len(b.t) AS BIGINT) AS n_tok0,
             CAST(len(b.t) - COALESCE(a.n_kept, 0) AS BIGINT) AS intra_removed,
             COALESCE(a.text1, '') AS text1
      FROM base1 b LEFT JOIN (
        SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS text1,
               COUNT(*) AS n_kept
        FROM kept1 GROUP BY doc_id
      ) a USING (doc_id)
    ),
    base2 AS (
      SELECT doc_id, lang, n_tok0, intra_removed,
             str_split(text1, ' ') AS t
      FROM stage1
    ),
    occ2 AS (
      SELECT doc_id,
             struct_extract(s, 'start') AS start,
             struct_extract(s, 'g') AS g
      FROM (
        SELECT doc_id,
               unnest([{{'start': i,
                         'g': array_to_string(t[i:i+{_SCRUB_N}-1], ' ')}}
                       for i in range(1, len(t)-{_SCRUB_N}+2)]) AS s
        FROM base2 WHERE len(t) >= {_SCRUB_N}
      )
    ),
    marked2 AS (
      SELECT doc_id, start,
             MIN(doc_id) OVER (PARTITION BY g) AS owner
      FROM occ2
    ),
    cov2 AS (
      SELECT DISTINCT doc_id, start + d AS pos
      FROM (SELECT doc_id, start FROM marked2 WHERE doc_id <> owner)
      CROSS JOIN (SELECT unnest(range(0, {_SCRUB_N})) AS d)
    ),
    toks2 AS (
      SELECT doc_id, unnest(t) AS token,
             unnest(range(1, len(t) + 1)) AS pos
      FROM base2
    ),
    kept2 AS (
      SELECT k.doc_id, k.pos, k.token
      FROM toks2 k LEFT JOIN cov2 c ON c.doc_id = k.doc_id AND c.pos = k.pos
      WHERE c.doc_id IS NULL
    ),
    stage2 AS (
      SELECT b.doc_id, b.lang, b.n_tok0, b.intra_removed,
             CAST(len(b.t) - COALESCE(a.n_kept, 0) AS BIGINT) AS cross_removed,
             COALESCE(a.text2, '') AS text2
      FROM base2 b LEFT JOIN (
        SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS text2,
               COUNT(*) AS n_kept
        FROM kept2 GROUP BY doc_id
      ) a USING (doc_id)
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok0) AS BIGINT) AS sum_tok0,
           CAST(SUM(intra_removed) AS BIGINT) AS sum_intra_removed,
           CAST(SUM(cross_removed) AS BIGINT) AS sum_cross_removed,
           CAST(COUNT(CASE WHEN text2 = '' THEN 1 END) AS BIGINT)
             AS n_empty_after,
           CAST(COUNT(DISTINCT text2) AS BIGINT) AS n_distinct_texts,
           md5(string_agg(
               CAST(doc_id AS VARCHAR) || ':'
                 || CAST(intra_removed + cross_removed AS VARCHAR),
               ',' ORDER BY doc_id)) AS removal_md5
    FROM stage2
    GROUP BY lang
"""


@query(
    "pipeline_scrub_cascade",
    oracle=_CASCADE_ORACLE,
    tags=("O5", "O6", "A1", "A2", "A4", "J5", "W4", "X1"),
)
def pipeline_scrub_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mp = spark.sparkContext.defaultParallelism
    # span_scrub references its input in three branches (occ/toks/base)
    # and the report joins it a fourth time — without a cut point the
    # whole intra window+anti-join lineage recomputes ~4x per run
    # (ADVICE r11; the surv1/surv2 convention in
    # pipeline_corpus_curation_v3)
    intra = DD.span_scrub_intra(
        docs, n=_SCRUB_INTRA_N, min_partitions=mp
    ).localCheckpoint(eager=True)
    cross = DD.span_scrub(
        intra.select("doc_id", F.col("scrub_text").alias("text")),
        n=_SCRUB_N,
    )
    joined = (
        intra.select(
            "doc_id",
            F.col("n_tok").alias("n_tok0"),
            F.col("n_removed").alias("intra_removed"),
        )
        .join(
            cross.select(
                "doc_id",
                F.col("n_removed").alias("cross_removed"),
                F.col("scrub_text").alias("text2"),
            ),
            "doc_id",
        )
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok0").alias("sum_tok0"),
        F.sum("intra_removed").alias("sum_intra_removed"),
        F.sum("cross_removed").alias("sum_cross_removed"),
        F.count(F.when(F.col("text2") == "", 1)).alias("n_empty_after"),
        F.countDistinct("text2").alias("n_distinct_texts"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "doc_id",
                                (
                                    F.col("intra_removed")
                                    + F.col("cross_removed")
                                ).alias("tot"),
                            )
                        )
                    ),
                    lambda s: F.concat(
                        s["doc_id"].cast("string"),
                        F.lit(":"),
                        s["tot"].cast("string"),
                    ),
                ),
                ",",
            )
        ).alias("removal_md5"),
    )


# --------------------------------------------------------------------------
# pipeline_dsir_weights — hashed-n-gram importance reweighting (DSIR).
#
# Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169) scores raw documents by how target-like their hashed
# n-gram features are. The float log-likelihood-ratio of the paper is
# replaced by an integer-grid ratio so the score is hash-exact across
# engines: per bucket b (60-bit md5 hash of the unigram mod 4096),
# w(b) = (cnt_target(b)+1) * 1e6 div (cnt_raw(b)+1) — the same
# add-one-smoothed target/raw contrast, monotone in the paper's ratio,
# on exact integers. A document's score is the sum of w over its token
# multiset; the query returns the top 50 raw docs (total order:
# score desc, doc_id asc).
#
# Scale: the bucket-weight table is O(4096) rows whatever the corpus
# size — broadcast; the corpus side is one narrow tokenize map + one
# per-doc aggregate. The only wide exchange is the bucket-count
# aggregate, which map-side-combines down to ≤ 4096 rows per task.
# Overflow bound: (cnt_target+1) * SCALE must stay inside int64 — at
# SCALE=1e6 that is ~9e12 tokens per bucket (~4e16 corpus tokens at
# 4096 buckets); past that, drop SCALE a decade (the weights are only
# compared, so the grid is free) — under ANSI mode an overflow raises
# rather than wrapping, in both engines identically.
# --------------------------------------------------------------------------
_DSIR_BUCKETS = 4096
_DSIR_SCALE = 1_000_000
_DSIR_TOPK = 50

_DSIR_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, lang,
             ({_GOPHER_PASS_SQL} AND lang = 'en') AS is_target,
             unnest(str_split(text, ' ')) AS token
      FROM documents
    ),
    bucketed AS (
      SELECT doc_id, is_target,
             ({_MD5_INT60_SQL.format(x='token')} % {_DSIR_BUCKETS}) AS b
      FROM toks
    ),
    w AS (
      SELECT b,
             (COUNT(CASE WHEN is_target THEN 1 END) + 1) * {_DSIR_SCALE}
               // (COUNT(CASE WHEN NOT is_target THEN 1 END) + 1) AS wt
      FROM bucketed GROUP BY b
    ),
    scored AS (
      SELECT doc_id, COUNT(*) AS n_tokens, SUM(wt) AS score
      FROM bucketed JOIN w USING (b)
      WHERE NOT is_target
      GROUP BY doc_id
    )
    SELECT s.doc_id, d.lang,
           n_tokens, CAST(score AS BIGINT) AS score
    FROM scored s JOIN documents d ON s.doc_id = d.doc_id
    ORDER BY score DESC, s.doc_id ASC
    LIMIT {_DSIR_TOPK}
"""


def dsir_weights_report(docs: DataFrame) -> DataFrame:
    """Frame-parameterized body of pipeline_dsir_weights (shared with the
    dsirscale smoke)."""
    toks = docs.select(
        "doc_id",
        "lang",
        (gopher_pass_all() & (F.col("lang") == "en")).alias("is_target"),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    ).withColumn("b", _md5_int60(F.col("token")) % _DSIR_BUCKETS)

    weights = toks.groupBy("b").agg(
        F.expr(
            f"(count(case when is_target then 1 end) + 1) * {_DSIR_SCALE}"
            " div (count(case when not is_target then 1 end) + 1)"
        ).alias("wt")
    )
    scored = (
        toks.filter(~F.col("is_target"))
        .join(F.broadcast(weights), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("wt").alias("score"),
        )
    )
    return scored.select("doc_id", "lang", "n_tokens", "score").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(_DSIR_TOPK)


@query(
    "pipeline_dsir_weights",
    oracle=_DSIR_ORACLE,
    tags=("A6", "J1", "A1", "X3", "F4"),
)
def pipeline_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_weights_report(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# govern_luhn_scan — checksum-validated numeric-PII classification.
#
# A PII scrubber that masks every digit run destroys useful numbers; real
# pipelines classify first — a digit run that passes the Luhn checksum
# (ISO/IEC 7812, the card-number check digit) is payment-card-shaped and
# gets fully masked, anything else keeps its last 4 for referential
# utility. The checksum is pure digit algebra (double every second digit
# from the right, subtract 9 over 9, sum % 10 == 0), expressible as a
# higher-order fold over the digit array in BOTH engines — no UDF.
# customer.c_name's zero-padded 9-digit account run ("Customer#0000…")
# supplies the fixture's deterministic digit runs (the fixture has no
# phone/card column; the classification algebra is source-agnostic).
#
# Scale: narrow per-row map (regexp + 15-element fold), one aggregate
# exchange on (nation, validity). Nothing here is data-size sensitive.
# --------------------------------------------------------------------------
_LUHN_SUM_SQL = """list_aggregate(list_transform(
        range(1, length(digits) + 1),
        i -> CASE WHEN (length(digits) - i) % 2 = 1
                  THEN CASE WHEN 2 * CAST(substr(digits, i, 1) AS INTEGER) > 9
                            THEN 2 * CAST(substr(digits, i, 1) AS INTEGER) - 9
                            ELSE 2 * CAST(substr(digits, i, 1) AS INTEGER) END
                  ELSE CAST(substr(digits, i, 1) AS INTEGER) END), 'sum')"""

_LUHN_ORACLE = f"""
    WITH d AS (
      SELECT c_nationkey, regexp_replace(c_name, '[^0-9]', '', 'g') AS digits
      FROM customer
    ),
    cls AS (
      SELECT c_nationkey, digits,
             ({_LUHN_SUM_SQL}) % 10 = 0 AS luhn_valid
      FROM d
    )
    SELECT c_nationkey,
           COUNT(*) AS n_customers,
           CAST(COUNT(CASE WHEN luhn_valid THEN 1 END) AS BIGINT)
             AS n_luhn_valid,
           MIN(CASE WHEN luhn_valid
                    THEN repeat('*', length(digits)) END) AS full_mask,
           MIN(CASE WHEN NOT luhn_valid
                    THEN repeat('*', length(digits) - 4)
                         || substr(digits, length(digits) - 3, 4) END)
             AS sample_partial_mask
    FROM cls GROUP BY c_nationkey
"""


def luhn_valid(digits: F.Column) -> F.Column:
    """Luhn checksum validity of a digit-run string column as a pure
    higher-order fold (no UDF). Property-tested against a reference
    Python implementation in tests/test_governance.py."""
    n = F.length(digits)

    def luhn_term(i: F.Column) -> F.Column:
        dgt = digits.substr(i, F.lit(1)).cast("int")
        doubled = F.when(2 * dgt > 9, 2 * dgt - 9).otherwise(2 * dgt)
        return F.when((n - i) % 2 == 1, doubled).otherwise(dgt)

    return (
        F.aggregate(
            F.sequence(F.lit(1), n), F.lit(0), lambda acc, i: acc + luhn_term(i)
        )
        % 10
        == 0
    )


@query("govern_luhn_scan", oracle=_LUHN_ORACLE, tags=("X1", "X4", "A6", "F3"))
def govern_luhn_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    d = cust.select(
        "c_nationkey",
        F.regexp_replace(F.col("c_name"), "[^0-9]", "").alias("digits"),
    )
    digits = F.col("digits")
    n = F.length(digits)
    cls = d.select(
        "c_nationkey",
        "digits",
        luhn_valid(digits).alias("luhn_valid"),
    )
    valid = F.col("luhn_valid")
    return cls.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.count(F.when(valid, 1)).alias("n_luhn_valid"),
        F.min(F.when(valid, F.repeat(F.lit("*"), n))).alias("full_mask"),
        F.min(
            F.when(
                ~valid,
                F.concat(
                    F.repeat(F.lit("*"), n - 4), digits.substr(n - 3, F.lit(4))
                ),
            )
        ).alias("sample_partial_mask"),
    )


# --------------------------------------------------------------------------
# pipeline_drift_tvd — distribution drift between two corpus slices as an
# EXACT integer total-variation distance. The monitoring op a recurring
# corpus build runs between snapshots: bucket a feature (here doc length
# in 16-token bins, capped), count per (lang, bucket) in the eval slice
# vs the train slice, and fold
#     TVD = 1/2 · Σ_b |P_train(b) − P_eval(b)|
# on the common-denominator integer grid: 2·N_t·N_e·TVD =
# Σ_b |c_t(b)·N_e − c_e(b)·N_t| — no floats anywhere; the reported
# drift_bp = that sum · 10000 // (2·N_t·N_e). χ²/KL need logs or
# per-bucket rationals; TVD is the drift metric that folds exactly.
# Scale: two conditional-count aggregates over one scan + a ≤(langs ×
# buckets)-row fold. Nothing data-sized crosses the wire.
# --------------------------------------------------------------------------
_DRIFT_BIN = 16
_DRIFT_CAP = 16  # buckets 0..16 (docs ≥ 256 tokens share the tail bucket)

_DRIFT_ORACLE = f"""
    WITH slices AS (
      SELECT lang,
             {_bucket_sql('eval:')} < '{_EVAL_MAX}' AS is_eval,
             least(len(str_split(text, ' ')) // {_DRIFT_BIN}, {_DRIFT_CAP})
               AS b
      FROM documents
    ),
    counts AS (
      SELECT lang, b,
             COUNT(CASE WHEN NOT is_eval THEN 1 END) AS c_t,
             COUNT(CASE WHEN is_eval THEN 1 END) AS c_e
      FROM slices GROUP BY lang, b
    ),
    totals AS (
      SELECT lang, SUM(c_t) AS n_t, SUM(c_e) AS n_e
      FROM counts GROUP BY lang
    )
    SELECT c.lang,
           CAST(t.n_t AS BIGINT) AS n_train,
           CAST(t.n_e AS BIGINT) AS n_eval,
           CAST(SUM(abs(c.c_t * t.n_e - c.c_e * t.n_t)) * 10000
                // (2 * t.n_t * t.n_e) AS BIGINT) AS drift_bp
    FROM counts c JOIN totals t ON c.lang = t.lang
    GROUP BY c.lang, t.n_t, t.n_e
"""


@query("pipeline_drift_tvd", oracle=_DRIFT_ORACLE, tags=("A6", "A1", "X3", "F4"))
def pipeline_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    slices = docs.select(
        "lang",
        (_bucket("eval:") < _EVAL_MAX).alias("is_eval"),
        F.least(
            F.expr(f"size(split(text, ' ')) div {_DRIFT_BIN}"),
            F.lit(_DRIFT_CAP),
        ).alias("b"),
    )
    counts = slices.groupBy("lang", "b").agg(
        F.count(F.when(~F.col("is_eval"), 1)).alias("c_t"),
        F.count(F.when(F.col("is_eval"), 1)).alias("c_e"),
    )
    totals = counts.groupBy("lang").agg(
        F.sum("c_t").alias("n_t"), F.sum("c_e").alias("n_e")
    )
    return (
        counts.join(F.broadcast(totals), "lang")
        .groupBy("lang", "n_t", "n_e")
        .agg(
            F.expr(
                "cast(sum(abs(c_t * n_e - c_e * n_t)) * 10000"
                " div (2 * n_t * n_e) as bigint)"
            ).alias("drift_bp")
        )
        .select(
            "lang",
            F.col("n_t").cast("long").alias("n_train"),
            F.col("n_e").cast("long").alias("n_eval"),
            "drift_bp",
        )
    )
