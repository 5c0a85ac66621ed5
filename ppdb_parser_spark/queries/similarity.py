"""Similarity-search queries over `embeddings` (SURVEY.md §2.9 L1/L2).

The fixture embeddings are isotropic random vectors (no planted clusters;
max pairwise cosine ≈ 0.5), so thresholds are set at ~0.35 to produce
non-degenerate result sets. Oracle twins compute dot products via
unnest + generate_subscripts joins — order-independent modulo the 1e-6
rounding grid both sides share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as SIM
from ..sources.tables import load_table
from .registry import query

#: dot/norm oracle CTEs against a probe row (vec_id = 0).
_PROBE_SQL = """
    probe AS (
      SELECT unnest(embedding) AS pv, generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id = 0
    ),
    probe_norm AS (
      SELECT sqrt(SUM(CAST(pv AS DOUBLE) * CAST(pv AS DOUBLE))) AS np FROM probe
    ),
    cand AS (
      SELECT vec_id, label,
             unnest(embedding) AS cv, generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id <> 0
    ),
    scored AS (
      SELECT c.vec_id, any_value(c.label) AS label,
             SUM(CAST(c.cv AS DOUBLE) * CAST(p.pv AS DOUBLE)) AS dot,
             sqrt(SUM(CAST(c.cv AS DOUBLE) * CAST(c.cv AS DOUBLE))) AS nc
      FROM cand c JOIN probe p ON c.i = p.i
      GROUP BY c.vec_id
    )
"""


def _probe_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


# --------------------------------------------------------------------------
# L1: exact cosine top-k against a probe vector (brute-force baseline; the
# plan is scan → narrow map → TakeOrderedAndProject, zero shuffles).
# --------------------------------------------------------------------------
@query(
    "sim_cosine_topk",
    oracle=f"""
    WITH {_PROBE_SQL}
    SELECT vec_id, label, round(dot / (nc * np), 6) AS cosine
    FROM scored, probe_norm
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    tags=("L1", "X4", "O2"),
    bench=True,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return SIM.cosine_topk(e, _probe_vector(spark, sf_dir), k=10)


# --------------------------------------------------------------------------
# Embedding near-dup: exact all-pairs cosine ≥ t (the O(n²) correctness
# baseline for L2; the LSH query below is the scale path).
# --------------------------------------------------------------------------
@query(
    "sim_pairwise_cosine",
    oracle="""
    WITH v AS (
      SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id, sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
      FROM v GROUP BY vec_id
    ),
    dots AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             SUM(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot
      FROM v a JOIN v b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots
    JOIN norms na ON dots.id_a = na.vec_id
    JOIN norms nb ON dots.id_b = nb.vec_id
    WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.35
    """,
    tags=("L2", "J9"),
)
def sim_pairwise_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.pairwise_cosine_pairs(e, threshold=0.35)


# --------------------------------------------------------------------------
# L2 at scale: seeded random-hyperplane LSH band join (sub-quadratic
# candidate generation). Approximate recall → rows-only; the precision
# property (every pair truly ≥ t) is asserted in tests vs the exact op.
# --------------------------------------------------------------------------
@query("sim_lsh_pairs", oracle=None, tags=("L2",))
def sim_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.lsh_similarity_join(
        e, threshold=0.35, n_planes=16, n_bands=4, seed=42, dim=64
    )


# --------------------------------------------------------------------------
# Cross-modal join: embedding-space neighbors of a probe joined back to the
# document relation (vec_id ↔ doc_id) — retrieval feeding a relational
# pipeline, the standard RAG-ingest shape.
# --------------------------------------------------------------------------
@query(
    "sim_neighbors_docs",
    oracle="""
    WITH probe AS (
      SELECT unnest(embedding) AS pv, generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id = 0
    ),
    probe_norm AS (
      SELECT sqrt(SUM(CAST(pv AS DOUBLE) * CAST(pv AS DOUBLE))) AS np FROM probe
    ),
    cand AS (
      SELECT vec_id, unnest(embedding) AS cv, generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id <> 0
    ),
    scored AS (
      SELECT c.vec_id,
             SUM(CAST(c.cv AS DOUBLE) * CAST(p.pv AS DOUBLE)) AS dot,
             sqrt(SUM(CAST(c.cv AS DOUBLE) * CAST(c.cv AS DOUBLE))) AS nc
      FROM cand c JOIN probe p ON c.i = p.i
      GROUP BY c.vec_id
    ),
    topk AS (
      SELECT vec_id, round(dot / (nc * np), 6) AS cosine
      FROM scored, probe_norm
      ORDER BY cosine DESC, vec_id LIMIT 20
    )
    SELECT t.vec_id AS doc_id, d.lang AS lang, t.cosine AS cosine,
           CAST(len(str_split(d.text, ' ')) AS BIGINT) AS n_tokens
    FROM topk t JOIN documents d ON t.vec_id = d.doc_id
    """,
    tags=("L1", "L6", "J1"),
)
def sim_neighbors_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    topk = SIM.cosine_topk(e, _probe_vector(spark, sf_dir), k=20).select(
        "vec_id", "cosine"
    )
    docs = load_table(spark, sf_dir, "documents")
    return topk.join(docs, topk.vec_id == docs.doc_id).select(
        "doc_id",
        "lang",
        "cosine",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
