"""Query registry: the engine's catalogued operator surface.

Every operator from SURVEY.md §2 lands here as a named query with

- ``fn(spark, sf_dir) -> DataFrame`` — the PySpark implementation, and
- ``oracle`` — equivalent ANSI SQL for the DuckDB oracle (``None`` for
  genuinely non-SQL-expressible ops → driver runs a rows-only check).

``__spark_entry__.py`` exposes this registry verbatim; tests iterate it;
``bench.py`` times a headline subset. Column names are part of the contract:
the driver sorts columns by name before hashing, so Spark aliases and SQL
``AS`` names must match exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = ()  # SURVEY.md §2 operator ids this query covers
    bench: bool = False  # include in bench.py's headline set


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] | list[str] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags), bench)
        return fn

    return deco


# Queries that already earned a driver CORRECTNESS row in rounds 1-4
# (keys of CORRECTNESS_r01.json ∪ r02 ∪ r03 ∪ r04 — all 137 registered
# queries as of the round-4 close; re-frozen 2026-08-13 for round 5).
# The driver prefix is built from the registry MINUS this set, so
# anything new this round earns a row first.
#
# ROUND-6 NOTE: round 5 closed with the never-checked backlog at the
# sample boundary (50 oracle-backed + 1 rows-only live twin). First move
# next round: re-freeze this set to r1∪…∪r5 (the keys of
# CORRECTNESS_r05.json ∪ this set) so new round-6 queries are again
# guaranteed first driver rows.
_DRIVER_CHECKED_R1_R4 = frozenset(
    {
        "agg_approx_distinct", "agg_approx_percentile", "agg_cube",
        "agg_distinct_counts", "agg_filtered", "agg_grouping_sets",
        "agg_percentiles", "agg_pivot_status", "agg_pricing_summary",
        "agg_rollup", "agg_stats", "analytics_large_orders",
        "analytics_local_supplier_volume", "analytics_lost_opportunity",
        "analytics_promo_share", "analytics_shipping_priority",
        "analytics_signup_funnel", "analytics_small_qty_revenue",
        "anti_join", "asof_purchase_click", "broadcast_join", "case_when",
        "cross_join", "dedup_components", "dedup_embedding",
        "dedup_embedding_lsh", "dedup_exact", "dedup_jaccard_bitmap",
        "dedup_jaccard_capped", "dedup_jaccard_pairs",
        "dedup_jaccard_prefix", "dedup_minhash_lsh", "dedup_simhash",
        "dedup_simhash_pairs", "except_custkeys", "filter_project",
        "flagship", "fuzzy_phrase_match", "intersect_nations",
        "left_join_coverage", "lookup_oov_tokens",
        "lookup_paraphrase_coverage", "mm_binary_hash", "mm_decode_meta",
        "mm_img_features", "mm_media_meta", "mm_media_stats",
        "mm_meta_stats", "mm_png_features", "mm_resize", "mm_wav_sample",
        "order_limit", "pattern_scd2_merge", "pattern_unpivot",
        "pipeline_corpus_curation", "pipeline_decontaminate",
        "pipeline_mixture_sample", "pipeline_pack_windows",
        "pipeline_quality_quartiles", "pipeline_train_split",
        "ppdb_alignment_explode", "ppdb_collect_nested",
        "ppdb_collect_paraphrases", "ppdb_entailment_dist",
        "ppdb_feature_keys", "ppdb_map_ops", "ppdb_parse_stats",
        "ppdb_parse_stats_bz2", "ppdb_parse_throughput", "ppdb_quarantine",
        "ppdb_symmetric_pairs", "ppdb_top_paraphrases", "range_join_bands",
        "region_revenue", "sample_orders", "scalar_arrays",
        "scalar_bitwise", "scalar_dates", "scalar_json", "scalar_math",
        "scalar_null_handling", "scalar_regex", "scalar_strings",
        "self_join_pairs", "semi_join", "sim_cosine_topk",
        "sim_ivf_kmeans_topk", "sim_ivf_topk", "sim_lsh_pairs",
        "sim_neighbors_docs", "sim_pairwise_cosine", "skew_salted_agg",
        "snk_json_roundtrip", "snk_orc_roundtrip", "snk_parquet_roundtrip",
        "snk_partition_pruned", "src_csv_scan", "src_custom_datasource",
        "src_json_scan", "stream_dedup_live", "stream_foreach_batch_sink",
        "stream_interval_join_batch", "stream_interval_join_live",
        "stream_session_batch", "stream_session_live",
        "stream_sliding_batch", "stream_sliding_live",
        "stream_stateful_counter", "stream_tumbling_batch",
        "stream_tumbling_live", "text_bpe_token_count", "text_fingerprint",
        "text_lang_route", "text_langid", "text_quality",
        "text_quality_rules", "text_sentiment", "text_tfidf_top5",
        "text_token_stats", "ts_gapfill_locf", "ts_interpolate",
        "ts_ohlc_daily", "udf_arrow_scalar", "udf_grouped_agg_sum",
        "udf_grouped_map_minmax", "udf_map_in_arrow",
        "udf_map_partitions_bucket", "udf_scalar_cents",
        "udtf_explode_types", "udtf_polymorphic_split", "union_parties",
        "window_cume_dist", "window_lag_lead", "window_range_frame",
        "window_rank_family", "window_running_sum", "window_value_family",
    }
)

# Implementation-changed marquee queries needing a driver RE-row under
# the round-5 code: second priority tier, right behind the never-checked
# backlog. Round 5 replaced the prefix join's pair-pruning bound with the
# sound positional form and rebuilt its exchange layout (results
# identical on the fixtures, but the row must re-certify the new plan),
# moved the cosine probe in-plan, and retuned the LSH banding (the two
# rows-only LSH queries emit more pairs under the recall-tuned bands).
_ROUND5_MARQUEE = (
    "dedup_jaccard_prefix",
    "pipeline_corpus_curation",
    "sim_cosine_topk",
    "sim_neighbors_docs",
    "sim_lsh_pairs",
    "dedup_embedding_lsh",
)


def coverage_order() -> list[str]:
    """Registry names ordered so every PREFIX maximizes driver-evidence
    value.

    Tier 1: every registered query that has never received a driver
    CORRECTNESS row in rounds 1-4 (``_DRIVER_CHECKED_R1_R4`` complement),
    oracle-backed entries first — the round-3 late additions (governance
    family + PNG decode) plus anything new this round land here.
    Tier 2: semantics-changed marquee re-checks (``_ROUND5_MARQUEE``).
    Tier 3: greedy set cover over §2 ``tags`` for the remainder, ties
    preferring oracle-backed queries then name order (deterministic).
    """
    remaining = dict(REGISTRY)
    covered: set[str] = set()
    out: list[str] = []
    never_checked = sorted(
        (
            n
            for n in remaining
            if n not in _DRIVER_CHECKED_R1_R4 and n not in _ROUND5_MARQUEE
        ),
        key=lambda n: (remaining[n].oracle is None, n),
    )
    for seed in (*never_checked, *_ROUND5_MARQUEE):
        if seed in remaining:
            out.append(seed)
            covered |= set(remaining.pop(seed).tags)
    while remaining:
        best = min(
            remaining.values(),
            key=lambda s: (
                -len(set(s.tags) - covered),
                s.oracle is None,
                s.name,
            ),
        )
        if not set(best.tags) - covered:
            # nothing adds coverage anymore: append the rest, oracle-backed
            # first, stable by name
            out.extend(
                sorted(
                    remaining,
                    key=lambda n: (remaining[n].oracle is None, n),
                )
            )
            break
        covered |= set(best.tags)
        out.append(best.name)
        del remaining[best.name]
    return out


def queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name].fn for name in coverage_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in coverage_order()
        if REGISTRY[name].oracle is not None
    }
