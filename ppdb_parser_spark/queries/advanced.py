"""Advanced / scale-path queries: skew-salted aggregation, IVF-style ANN,
nested collect shapes, map-function battery, statistical aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import money_sum, money_sum_sql
from ..operators.ppdb import parse_ppdb_clean
from .ppdb import _parse_cte as _ppdb_parse_cte
from ..operators.similarity import ivf_topk
from ..operators.skew import salted_agg_sum_count, salted_replicate_join
from ..sources.ppdb_pack import ensure_pack, lines_values_sql
from ..sources.tables import load_table
from ..sources.text import read_text_lines
from .registry import query


# --------------------------------------------------------------------------
# Skew-salted aggregation (§4.3): documents.lang is en-heavy; the salted
# two-phase plan must produce byte-identical results to the plain GROUP BY.
# --------------------------------------------------------------------------
@query(
    "skew_salted_agg",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) / 100.0 AS total_value
    FROM documents GROUP BY lang
    """,
    tags=("A1", "F4"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return salted_agg_sum_count(
        d, "lang", F.col("n_chars").cast("long"), salt_from="doc_id", n_salts=16
    )


# --------------------------------------------------------------------------
# IVF-style ANN (the task's named scale path for similarity search):
# coarse cells seeded by fixed vectors (vec_id 0..7 — deterministic, no
# kmeans iteration), every vector assigned to its argmax-cosine cell, the
# probe searched only in its top-2 cells. Fully relational → the oracle
# runs the identical math; recall vs brute force is test-asserted.
# --------------------------------------------------------------------------
_N_CELLS = 8
_PROBE_ID = 1  # not a seed, so cell search is non-trivial

_IVF_ORACLE = f"""
    WITH seeds AS (
      SELECT vec_id AS cell_id, embedding FROM embeddings WHERE vec_id < {_N_CELLS}
    ),
    vflat AS (
      SELECT vec_id, label, unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    sflat AS (
      SELECT cell_id, unnest(embedding) AS s, generate_subscripts(embedding, 1) AS i
      FROM seeds
    ),
    cell_scores AS (
      SELECT v.vec_id, s.cell_id,
             round(SUM(CAST(v.x AS DOUBLE) * CAST(s.s AS DOUBLE))
                   / (sqrt(SUM(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)))
                      * sqrt(SUM(CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE)))), 6)
               AS cos
      FROM vflat v JOIN sflat s ON v.i = s.i
      GROUP BY v.vec_id, s.cell_id
    ),
    assign AS (
      SELECT vec_id, cell_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY cos DESC, cell_id) AS rk
        FROM cell_scores
      ) WHERE rk = 1
    ),
    probe_cells AS (
      SELECT cell_id FROM (
        SELECT cell_id, ROW_NUMBER() OVER (ORDER BY cos DESC, cell_id) AS rk
        FROM cell_scores WHERE vec_id = {_PROBE_ID}
      ) WHERE rk <= 2
    ),
    candidates AS (
      SELECT a.vec_id FROM assign a JOIN probe_cells p ON a.cell_id = p.cell_id
      WHERE a.vec_id <> {_PROBE_ID}
    ),
    pflat AS (SELECT * FROM vflat WHERE vec_id = {_PROBE_ID}),
    scored AS (
      SELECT v.vec_id, any_value(v.label) AS label,
             round(SUM(CAST(v.x AS DOUBLE) * CAST(p.x AS DOUBLE))
                   / (sqrt(SUM(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)))
                      * sqrt(SUM(CAST(p.x AS DOUBLE) * CAST(p.x AS DOUBLE)))), 6)
               AS cosine
      FROM vflat v JOIN candidates c ON v.vec_id = c.vec_id
      JOIN pflat p ON v.i = p.i
      GROUP BY v.vec_id
    )
    SELECT vec_id, label, cosine FROM scored
    ORDER BY cosine DESC, vec_id LIMIT 5
"""


@query("sim_ivf_topk", oracle=_IVF_ORACLE, tags=("L1", "L2", "W1"), bench=True)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        e, n_cells=_N_CELLS, probe_id=_PROBE_ID, n_probe=2, k=5
    )


# --------------------------------------------------------------------------
# A4 (true nested shape): phrase → array of (paraphrase, score) structs,
# deterministically ordered. The genuinely nested DataFrame shape is still
# built (array_sort over collect_list of structs) and exercised
# un-serialized in tests; only the EMISSION edge flattens to scalars —
# "para:score" entries '|'-joined, scores printf'd at 5 decimals — because
# the driver canonicalizer can't sort nested columns (round-1 crash) and
# JSON float rendering differs cross-engine. With both engines formatting
# the SAME parsed double via C printf, the concat is bit-reproducible, so
# this query now carries a full value-hash oracle (VERDICT r6 item 2)
# instead of the old rows-only check on a JSON column.
# --------------------------------------------------------------------------
@query(
    "ppdb_collect_nested",
    oracle=_ppdb_parse_cte()
    + """
    SELECT phrase,
           CAST(COUNT(*) AS BIGINT) AS n_entries,
           string_agg(paraphrase || ':' || printf('%.5f', ppdb2score),
                      '|' ORDER BY paraphrase, ppdb2score) AS paraphrases_cat
    FROM parsed WHERE ppdb2score IS NOT NULL
    GROUP BY phrase
    """,
    tags=("A4",),
)
def ppdb_collect_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = parse_ppdb_clean(read_text_lines(spark, ensure_pack() + "/*.txt.gz"))
    nested = (
        parsed.filter(F.col("ppdb2score").isNotNull())
        .groupBy("phrase")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("paraphrase", "ppdb2score"))
            ).alias("paraphrases")
        )
    )
    return nested.select(
        "phrase",
        F.size("paraphrases").cast("long").alias("n_entries"),
        F.array_join(
            F.transform(
                "paraphrases",
                lambda p: F.concat_ws(
                    ":",
                    p["paraphrase"],
                    F.format_string("%.5f", p["ppdb2score"]),
                ),
            ),
            "|",
        ).alias("paraphrases_cat"),
    )


# --------------------------------------------------------------------------
# X5 battery: map_filter / map_concat / map_keys / map_values over the
# parsed feature maps, reduced to oracle-able scalars.
# --------------------------------------------------------------------------
_MAP_OPS_ORACLE = f"""
    WITH raw AS (SELECT lhs, feats FROM (
      SELECT trim(str_split(value, ' ||| ')[1]) AS lhs,
             trim(str_split(value, ' ||| ')[4]) AS feats,
             len(str_split(value, ' ||| ')) AS n
      FROM {{values_rel}} r
    ) WHERE n IN (5, 6)),
    kv AS (
      SELECT lhs, split_part(f, '=', 1) AS key,
             try_cast(split_part(f, '=', 2) AS DOUBLE) AS val
      FROM raw, unnest(str_split(feats, ' ')) AS t(f)
      WHERE feats <> ''
    )
    SELECT lhs,
           COUNT(*) AS n_entries,
           COUNT(CASE WHEN val >= 0.5 THEN 1 END) AS n_high,
           COUNT(DISTINCT key) AS n_distinct_keys
    FROM kv GROUP BY lhs
"""


@query(
    "ppdb_map_ops",
    oracle=_MAP_OPS_ORACLE.format(values_rel=lines_values_sql()),
    tags=("X5", "P2"),
)
def ppdb_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = parse_ppdb_clean(read_text_lines(spark, ensure_pack() + "/*.txt.gz"))
    with_maps = parsed.filter(F.size("features") > 0).select(
        "lhs",
        "features",
        F.map_filter("features", lambda k, v: v >= 0.5).alias("high_feats"),
    )
    exploded = with_maps.select(
        "lhs",
        F.size("features").alias("n_entries_row"),
        F.size("high_feats").alias("n_high_row"),
        F.explode(F.map_keys("features")).alias("key"),
    )
    return exploded.groupBy("lhs").agg(
        F.sum(F.lit(1)).cast("long").alias("n_entries"),
        F.countDistinct("key").alias("n_distinct_keys"),
        # n_high: each row contributes n_high_row once; dividing by row's
        # n_entries_row compensates the key-explosion fan-out exactly.
        # round() before the cast — the rational sum can land at N−1e-15
        # and a bare long cast truncates.
        F.round(F.sum(F.col("n_high_row") / F.col("n_entries_row")))
        .cast("long")
        .alias("n_high"),
    )


# --------------------------------------------------------------------------
# Statistical aggregates: stddev/variance/corr/covar (continuous inputs →
# round to absorb accumulation-order ulps).
# --------------------------------------------------------------------------
@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_discount), 8) AS var_disc,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("A7", "X3"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc"),
    )


# --------------------------------------------------------------------------
# Skew-salted JOIN (§4.3, the join-side twin of skew_salted_agg): a
# synthetic hot key folds 10% of parts onto key 0, so ~10% of all
# lineitems share one join key — the shape AQE skew-split handles for
# sort-merge joins and salting handles everywhere (including shuffled
# hash joins and stream-static joins, where AQE cannot re-plan). The dim
# side carries a SHUFFLE_HASH hint so the demo actually exercises the
# shuffle path instead of broadcasting the small fixture dim; results
# must equal the plain equi join (the oracle runs it unsalted).
# --------------------------------------------------------------------------
@query(
    "skew_salted_join",
    oracle=f"""
    WITH f AS (
      SELECT CASE WHEN l_partkey % 10 = 0 THEN 0 ELSE l_partkey END AS hot_key,
             l_returnflag, l_extendedprice
      FROM lineitem
    ),
    d AS (
      SELECT CASE WHEN p_partkey % 10 = 0 THEN 0 ELSE p_partkey END AS hot_key,
             COUNT(*) AS n_parts_in_key
      FROM part GROUP BY 1
    )
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(n_parts_in_key) AS BIGINT) AS parts_weight,
           {money_sum_sql("l_extendedprice")} AS sum_price
    FROM f JOIN d USING (hot_key)
    GROUP BY l_returnflag
    """,
    tags=("J2", "A1"),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    hot = lambda c: F.when(F.col(c) % 10 == 0, F.lit(0)).otherwise(F.col(c))  # noqa: E731
    fact = load_table(spark, sf_dir, "lineitem").select(
        hot("l_partkey").alias("hot_key"), "l_returnflag", "l_extendedprice",
        "l_orderkey", "l_linenumber",
    )
    dim = (
        load_table(spark, sf_dir, "part")
        .groupBy(hot("p_partkey").alias("hot_key"))
        .agg(F.count(F.lit(1)).alias("n_parts_in_key"))
        .hint("shuffle_hash")
    )
    joined = salted_replicate_join(
        fact, dim, "hot_key", salt_from=["l_orderkey", "l_linenumber"], n_salts=8
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_parts_in_key").cast("long").alias("parts_weight"),
        money_sum(F.col("l_extendedprice")).alias("sum_price"),
    )
