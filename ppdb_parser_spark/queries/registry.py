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
    #: "scale" (default): the plan must survive 100 TB — enforced by the
    #: global cartesian sweep in tests/test_plan_shapes.py. "oracle-baseline":
    #: an INTENTIONALLY exhaustive (O(n²)) exact twin kept to measure the
    #: recall/precision of its sub-quadratic sibling — never the path a user
    #: should run at scale; its docstring names the sibling.
    tier: str = "scale"


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] | list[str] = (),
    bench: bool = False,
    tier: str = "scale",
) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags), bench, tier)
        return fn

    return deco


# Queries that already earned a driver CORRECTNESS row in rounds 1-13
# (keys of CORRECTNESS_r01.json ∪ … ∪ r13, intersected with the live
# registry; re-frozen 2026-08-16 for round 14). The driver prefix
# is built from the registry MINUS this set, so anything new this round
# earns a row first.
#
# ROUND-15 NOTE: first move next round — regenerate both structures below
# with ``python tools/gen_prefix_freeze.py`` (folds CORRECTNESS_r14.json
# in, bumps _LAST_DRIVER_ROUND), rename to _DRIVER_CHECKED_R1_R14, replace
# _ROUND14_PRIORITY with the next stale/marquee tier, and update
# tests/test_oracle_parity.py::test_coverage_order_round14_prefix_contract.
_DRIVER_CHECKED_R1_R13 = frozenset(
    {
        'agg_approx_distinct', 'agg_approx_percentile', 'agg_cube',
        'agg_distinct_counts', 'agg_filtered', 'agg_grouping_sets',
        'agg_histogram', 'agg_hll_rollup', 'agg_hll_set_ops',
        'agg_hll_sketch', 'agg_percentiles', 'agg_pivot_status',
        'agg_pricing_summary', 'agg_rollup', 'agg_stats',
        'analytics_autocorr_lag1', 'analytics_cohort_retention',
        'analytics_corr_pairs', 'analytics_disjunctive_join',
        'analytics_event_funnel', 'analytics_large_orders',
        'analytics_local_supplier_volume', 'analytics_lost_opportunity',
        'analytics_market_basket', 'analytics_market_share',
        'analytics_promo_share', 'analytics_rfm_segments',
        'analytics_rolling_wau', 'analytics_shipping_priority',
        'analytics_signup_funnel', 'analytics_small_qty_revenue',
        'analytics_trade_flows', 'anti_join',
        'asof_click_next_purchase', 'asof_purchase_click',
        'broadcast_join', 'case_when', 'cross_join',
        'dedup_cluster_report', 'dedup_components',
        'dedup_components_star', 'dedup_containment', 'dedup_embedding',
        'dedup_embedding_checked', 'dedup_embedding_incremental',
        'dedup_embedding_incremental_indexed', 'dedup_embedding_lsh',
        'dedup_exact', 'dedup_jaccard_bitmap', 'dedup_jaccard_capped',
        'dedup_jaccard_incremental', 'dedup_jaccard_pairs',
        'dedup_jaccard_prefix', 'dedup_minhash_incremental',
        'dedup_minhash_lsh', 'dedup_minhash_relational',
        'dedup_semantic', 'dedup_semantic_gemm',
        'dedup_semantic_gemm_h2', 'dedup_semantic_h2',
        'dedup_semantic_incremental', 'dedup_simhash',
        'dedup_simhash_pairs', 'dedup_span_scrub',
        'dedup_span_scrub_intra', 'dedup_substring_spans',
        'dedup_tier_agreement', 'dedup_triangle_count',
        'dedup_winnow_incremental', 'dedup_winnow_match',
        'except_custkeys', 'filter_project', 'flagship',
        'fuzzy_phrase_match', 'govern_luhn_scan', 'govern_pii_mask',
        'intersect_nations', 'left_join_coverage', 'lookup_oov_tokens',
        'lookup_paraphrase_coverage', 'mm_binary_hash',
        'mm_decode_meta', 'mm_dhash', 'mm_dhash_near',
        'mm_img_features', 'mm_media_meta', 'mm_media_stats',
        'mm_meta_stats', 'mm_png_features', 'mm_resize',
        'mm_wav_sample', 'order_limit', 'pattern_scd2_merge',
        'pattern_scd2_pointintime', 'pattern_unpivot',
        'pipeline_chunk_overlap', 'pipeline_corpus_curation',
        'pipeline_corpus_curation_v2', 'pipeline_corpus_curation_v3',
        'pipeline_corpus_datacard', 'pipeline_decontaminate',
        'pipeline_decontaminate_bloom',
        'pipeline_decontaminate_jaccard',
        'pipeline_decontaminate_semantic', 'pipeline_drift_tvd',
        'pipeline_dsir_weights', 'pipeline_mixture_sample',
        'pipeline_mixture_temperature', 'pipeline_mixture_waterfill',
        'pipeline_pack_windows', 'pipeline_quality_classifier',
        'pipeline_quality_gate', 'pipeline_quality_quartiles',
        'pipeline_quality_regression',
        'pipeline_quality_regression_by_lang', 'pipeline_rag_ingest',
        'pipeline_scrub_cascade', 'pipeline_session_dialogues',
        'pipeline_shuffle_shards', 'pipeline_stratified_sample',
        'pipeline_train_split', 'pipeline_weighted_sample',
        'ppdb_alignment_explode', 'ppdb_collect_nested',
        'ppdb_collect_paraphrases', 'ppdb_entailment_dist',
        'ppdb_feature_keys', 'ppdb_map_ops', 'ppdb_parse_stats',
        'ppdb_parse_stats_bz2', 'ppdb_parse_throughput',
        'ppdb_quarantine', 'ppdb_symmetric_pairs',
        'ppdb_top_paraphrases', 'profile_columns', 'range_join_bands',
        'region_revenue', 'sample_orders', 'scalar_arrays',
        'scalar_bitwise', 'scalar_dates', 'scalar_json', 'scalar_math',
        'scalar_null_handling', 'scalar_regex', 'scalar_strings',
        'scalar_try_ops', 'scalar_variant', 'self_join_pairs',
        'semi_join', 'sim_cosine_topk', 'sim_hybrid_rrf',
        'sim_ivf_batch_topk', 'sim_ivf_kmeans_topk',
        'sim_ivf_persist_build', 'sim_ivf_persisted_topk',
        'sim_ivf_topk', 'sim_ivfpq_residual_topk', 'sim_ivfpq_topk',
        'sim_jl_project', 'sim_jl_topk', 'sim_lsh_jl_screened_pairs',
        'sim_lsh_multiprobe_topk', 'sim_lsh_pairs_checked',
        'sim_neighbors_docs', 'sim_pairwise_cosine',
        'sim_pca_top_component', 'sim_pq_encode', 'sim_pq_kmeans_topk',
        'sim_pq_persist_codebook', 'sim_pq_persisted_topk',
        'sim_pq_topk', 'skew_salted_agg', 'skew_salted_join',
        'snk_bucketed_join', 'snk_json_roundtrip', 'snk_orc_roundtrip',
        'snk_parquet_roundtrip', 'snk_partition_pruned',
        'snk_zorder_layout', 'src_csv_permissive', 'src_csv_scan',
        'src_custom_datasource', 'src_json_scan', 'stream_anomaly_live',
        'stream_cms_batch', 'stream_cms_live', 'stream_dedup_live',
        'stream_drift_batch', 'stream_drift_live',
        'stream_foreach_batch_sink', 'stream_hll_batch',
        'stream_hll_live', 'stream_interval_join_batch',
        'stream_interval_join_live', 'stream_left_interval_join_batch',
        'stream_left_interval_join_live', 'stream_session_batch',
        'stream_session_live', 'stream_sliding_batch',
        'stream_sliding_live', 'stream_stateful_counter',
        'stream_static_enrich_batch', 'stream_static_enrich_live',
        'stream_tumbling_batch', 'stream_tumbling_live',
        'sub_correlated_avg_qty', 'sub_exists_idle_rich',
        'sub_having_revenue_share', 'sub_lateral_topn',
        'subq_not_in_nulls', 'text_bigram_ppl', 'text_bm25_topk',
        'text_bpe_token_count', 'text_cms_heavy_hitters',
        'text_entropy_bound', 'text_fingerprint', 'text_heavy_hitters',
        'text_inverted_index', 'text_lang_route', 'text_langid',
        'text_phrase_search', 'text_pmi_collocations', 'text_quality',
        'text_quality_rules', 'text_repetition', 'text_sentiment',
        'text_textrank', 'text_tfidf_top5', 'text_token_stats',
        'text_unigram_logprob', 'text_winnow_fp', 'ts_anomaly_argmax',
        'ts_ewma_dyadic', 'ts_gapfill_locf', 'ts_interpolate',
        'ts_ohlc_daily', 'ts_recursive_month_spine', 'udf_arrow_scalar',
        'udf_grouped_agg_sum', 'udf_grouped_map_minmax',
        'udf_map_in_arrow', 'udf_map_partitions_bucket',
        'udf_scalar_cents', 'udtf_explode_types',
        'udtf_polymorphic_split', 'union_parties', 'window_cume_dist',
        'window_lag_lead', 'window_range_frame', 'window_rank_family',
        'window_running_sum', 'window_value_family'
    }
)

_LAST_DRIVER_ROUND = {
        'agg_approx_distinct': 11, 'agg_approx_percentile': 11,
        'agg_cube': 11, 'agg_distinct_counts': 11, 'agg_filtered': 11,
        'agg_grouping_sets': 9, 'agg_histogram': 10, 'agg_hll_rollup':
        13, 'agg_hll_set_ops': 13, 'agg_hll_sketch': 13,
        'agg_percentiles': 9, 'agg_pivot_status': 9,
        'agg_pricing_summary': 9, 'agg_rollup': 9, 'agg_stats': 9,
        'analytics_autocorr_lag1': 13, 'analytics_cohort_retention': 10,
        'analytics_corr_pairs': 13, 'analytics_disjunctive_join': 10,
        'analytics_event_funnel': 13, 'analytics_large_orders': 9,
        'analytics_local_supplier_volume': 9,
        'analytics_lost_opportunity': 9, 'analytics_market_basket': 11,
        'analytics_market_share': 11, 'analytics_promo_share': 10,
        'analytics_rfm_segments': 10, 'analytics_rolling_wau': 10,
        'analytics_shipping_priority': 12, 'analytics_signup_funnel':
        12, 'analytics_small_qty_revenue': 12, 'analytics_trade_flows':
        10, 'anti_join': 12, 'asof_click_next_purchase': 11,
        'asof_purchase_click': 10, 'broadcast_join': 12, 'case_when':
        12, 'cross_join': 11, 'dedup_cluster_report': 12,
        'dedup_components': 12, 'dedup_components_star': 12,
        'dedup_containment': 10, 'dedup_embedding': 13,
        'dedup_embedding_checked': 12, 'dedup_embedding_incremental':
        13, 'dedup_embedding_incremental_indexed': 13,
        'dedup_embedding_lsh': 12, 'dedup_exact': 12,
        'dedup_jaccard_bitmap': 12, 'dedup_jaccard_capped': 12,
        'dedup_jaccard_incremental': 10, 'dedup_jaccard_pairs': 13,
        'dedup_jaccard_prefix': 11, 'dedup_minhash_incremental': 13,
        'dedup_minhash_lsh': 12, 'dedup_minhash_relational': 12,
        'dedup_semantic': 12, 'dedup_semantic_gemm': 12,
        'dedup_semantic_gemm_h2': 12, 'dedup_semantic_h2': 12,
        'dedup_semantic_incremental': 13, 'dedup_simhash': 13,
        'dedup_simhash_pairs': 12, 'dedup_span_scrub': 11,
        'dedup_span_scrub_intra': 11, 'dedup_substring_spans': 13,
        'dedup_tier_agreement': 12, 'dedup_triangle_count': 12,
        'dedup_winnow_incremental': 13, 'dedup_winnow_match': 10,
        'except_custkeys': 11, 'filter_project': 13, 'flagship': 11,
        'fuzzy_phrase_match': 11, 'govern_luhn_scan': 8,
        'govern_pii_mask': 10, 'intersect_nations': 13,
        'left_join_coverage': 8, 'lookup_oov_tokens': 13,
        'lookup_paraphrase_coverage': 13, 'mm_binary_hash': 13,
        'mm_decode_meta': 12, 'mm_dhash': 10, 'mm_dhash_near': 11,
        'mm_img_features': 8, 'mm_media_meta': 8, 'mm_media_stats': 9,
        'mm_meta_stats': 13, 'mm_png_features': 10, 'mm_resize': 13,
        'mm_wav_sample': 13, 'order_limit': 10, 'pattern_scd2_merge':
        10, 'pattern_scd2_pointintime': 11, 'pattern_unpivot': 13,
        'pipeline_chunk_overlap': 11, 'pipeline_corpus_curation': 10,
        'pipeline_corpus_curation_v2': 12,
        'pipeline_corpus_curation_v3': 12, 'pipeline_corpus_datacard':
        8, 'pipeline_decontaminate': 10, 'pipeline_decontaminate_bloom':
        10, 'pipeline_decontaminate_jaccard': 12,
        'pipeline_decontaminate_semantic': 12, 'pipeline_drift_tvd': 8,
        'pipeline_dsir_weights': 8, 'pipeline_mixture_sample': 10,
        'pipeline_mixture_temperature': 8, 'pipeline_mixture_waterfill':
        8, 'pipeline_pack_windows': 12, 'pipeline_quality_classifier':
        8, 'pipeline_quality_gate': 11, 'pipeline_quality_quartiles':
        13, 'pipeline_quality_regression': 8,
        'pipeline_quality_regression_by_lang': 8, 'pipeline_rag_ingest':
        11, 'pipeline_scrub_cascade': 12, 'pipeline_session_dialogues':
        13, 'pipeline_shuffle_shards': 13, 'pipeline_stratified_sample':
        11, 'pipeline_train_split': 10, 'pipeline_weighted_sample': 13,
        'ppdb_alignment_explode': 13, 'ppdb_collect_nested': 13,
        'ppdb_collect_paraphrases': 10, 'ppdb_entailment_dist': 12,
        'ppdb_feature_keys': 12, 'ppdb_map_ops': 13, 'ppdb_parse_stats':
        10, 'ppdb_parse_stats_bz2': 9, 'ppdb_parse_throughput': 12,
        'ppdb_quarantine': 10, 'ppdb_symmetric_pairs': 10,
        'ppdb_top_paraphrases': 13, 'profile_columns': 12,
        'range_join_bands': 9, 'region_revenue': 13, 'sample_orders':
        12, 'scalar_arrays': 9, 'scalar_bitwise': 9, 'scalar_dates': 9,
        'scalar_json': 10, 'scalar_math': 13, 'scalar_null_handling': 9,
        'scalar_regex': 9, 'scalar_strings': 9, 'scalar_try_ops': 11,
        'scalar_variant': 10, 'self_join_pairs': 9, 'semi_join': 9,
        'sim_cosine_topk': 11, 'sim_hybrid_rrf': 8,
        'sim_ivf_batch_topk': 10, 'sim_ivf_kmeans_topk': 13,
        'sim_ivf_persist_build': 13, 'sim_ivf_persisted_topk': 13,
        'sim_ivf_topk': 11, 'sim_ivfpq_residual_topk': 10,
        'sim_ivfpq_topk': 10, 'sim_jl_project': 10, 'sim_jl_topk': 10,
        'sim_lsh_jl_screened_pairs': 12, 'sim_lsh_multiprobe_topk': 10,
        'sim_lsh_pairs_checked': 12, 'sim_neighbors_docs': 11,
        'sim_pairwise_cosine': 9, 'sim_pca_top_component': 8,
        'sim_pq_encode': 10, 'sim_pq_kmeans_topk': 13,
        'sim_pq_persist_codebook': 13, 'sim_pq_persisted_topk': 13,
        'sim_pq_topk': 10, 'skew_salted_agg': 13, 'skew_salted_join':
        11, 'snk_bucketed_join': 11, 'snk_json_roundtrip': 10,
        'snk_orc_roundtrip': 9, 'snk_parquet_roundtrip': 9,
        'snk_partition_pruned': 13, 'snk_zorder_layout': 13,
        'src_csv_permissive': 12, 'src_csv_scan': 9,
        'src_custom_datasource': 13, 'src_json_scan': 13,
        'stream_anomaly_live': 9, 'stream_cms_batch': 8,
        'stream_cms_live': 8, 'stream_dedup_live': 12,
        'stream_drift_batch': 8, 'stream_drift_live': 8,
        'stream_foreach_batch_sink': 13, 'stream_hll_batch': 8,
        'stream_hll_live': 8, 'stream_interval_join_batch': 9,
        'stream_interval_join_live': 10,
        'stream_left_interval_join_batch': 11,
        'stream_left_interval_join_live': 12, 'stream_session_batch':
        10, 'stream_session_live': 12, 'stream_sliding_batch': 12,
        'stream_sliding_live': 9, 'stream_stateful_counter': 12,
        'stream_static_enrich_batch': 11, 'stream_static_enrich_live':
        11, 'stream_tumbling_batch': 12, 'stream_tumbling_live': 10,
        'sub_correlated_avg_qty': 11, 'sub_exists_idle_rich': 11,
        'sub_having_revenue_share': 12, 'sub_lateral_topn': 8,
        'subq_not_in_nulls': 11, 'text_bigram_ppl': 11,
        'text_bm25_topk': 8, 'text_bpe_token_count': 9,
        'text_cms_heavy_hitters': 8, 'text_entropy_bound': 8,
        'text_fingerprint': 9, 'text_heavy_hitters': 8,
        'text_inverted_index': 11, 'text_lang_route': 9, 'text_langid':
        9, 'text_phrase_search': 11, 'text_pmi_collocations': 11,
        'text_quality': 9, 'text_quality_rules': 10, 'text_repetition':
        11, 'text_sentiment': 12, 'text_textrank': 11,
        'text_tfidf_top5': 9, 'text_token_stats': 9,
        'text_unigram_logprob': 11, 'text_winnow_fp': 11,
        'ts_anomaly_argmax': 8, 'ts_ewma_dyadic': 9, 'ts_gapfill_locf':
        13, 'ts_interpolate': 13, 'ts_ohlc_daily': 13,
        'ts_recursive_month_spine': 11, 'udf_arrow_scalar': 12,
        'udf_grouped_agg_sum': 12, 'udf_grouped_map_minmax': 12,
        'udf_map_in_arrow': 9, 'udf_map_partitions_bucket': 9,
        'udf_scalar_cents': 9, 'udtf_explode_types': 12,
        'udtf_polymorphic_split': 13, 'union_parties': 9,
        'window_cume_dist': 9, 'window_lag_lead': 9,
        'window_range_frame': 9, 'window_rank_family': 9,
        'window_running_sum': 9, 'window_value_family': 9
}

# Round-14 priority tier, sampled right behind the never-checked backlog:
# the stale-evidence marquee cohort VERDICT r13 next-round #2 names — the
# X6 json ops last driver-checked r10 (scalar_json/scalar_variant) and
# the J7/J8/L3 r9-r11 rows (range join, both as-of directions, fuzzy
# string-similarity join) — so each §2 tag that had drifted to 3+ rounds
# of driver silence gets an r14 hash-exact row. The r8 rotation tail (26
# queries) follows immediately via tier 3's oldest-first order, so the
# ~50-row driver sample still clears everything older than r9.
_ROUND14_PRIORITY = (
    "scalar_json",
    "scalar_variant",
    "range_join_bands",
    "asof_purchase_click",
    "asof_click_next_purchase",
    "fuzzy_phrase_match",
)


def coverage_order() -> list[str]:
    """Registry names ordered so every PREFIX maximizes driver-evidence
    value.

    Tier 1: every registered query that has never received a driver
    CORRECTNESS row in rounds 1-13 (``_DRIVER_CHECKED_R1_R13`` complement),
    oracle-backed entries first — anything new this round lands here.
    Tier 2: the round-14 priority tier (``_ROUND14_PRIORITY``): the six
    stale-evidence marquee rows (X6 r10, J7/J8/L3 r9-r11; VERDICT r13
    next-round #2).
    Tier 3: least-recently-driver-checked first (``_LAST_DRIVER_ROUND``
    ascending, oracle-backed before rows-only, then name) — the ~40
    tier-3 slots of each ~50-query driver sample rotate oldest-first, so
    the whole registry re-certifies every ~5-6 rounds instead of the old
    static set-cover order that never re-sampled beyond the prefix
    (ADVICE r6: makes the ledger's stale audit an enforceable bound).

    Every §2 tag is covered because the order enumerates the ENTIRE
    registry; first-coverage-in-prefix stopped mattering once all 69
    operators had hash-exact driver rows (VERDICT r6).
    """
    remaining = dict(REGISTRY)
    out: list[str] = []
    never_checked = sorted(
        (
            n
            for n in remaining
            if n not in _DRIVER_CHECKED_R1_R13 and n not in _ROUND14_PRIORITY
        ),
        key=lambda n: (remaining[n].oracle is None, n),
    )
    for seed in (*never_checked, *_ROUND14_PRIORITY):
        if seed in remaining:
            out.append(seed)
            del remaining[seed]
    out.extend(
        sorted(
            remaining,
            key=lambda n: (
                _LAST_DRIVER_ROUND.get(n, 0),
                remaining[n].oracle is None,
                n,
            ),
        )
    )
    return out


def prefix_tier_sizes() -> tuple[int, int]:
    """(|tier 1|, |tier 2|) of the CURRENT coverage_order() prefix — the
    never-driver-checked backlog and the round priority tier. The
    rotation bound tools/gen_ledger.py enforces derives its window from
    DRIVER_SAMPLE minus these (ADVICE r7: the fixed
    ceil(len/DRIVER_SAMPLE)+1 window undercounts whenever the priority
    tiers occupy prefix slots, because only the remaining tier-3 slots
    actually rotate)."""
    tier1 = sum(
        1
        for n in REGISTRY
        if n not in _DRIVER_CHECKED_R1_R13 and n not in _ROUND14_PRIORITY
    )
    tier2 = sum(1 for n in _ROUND14_PRIORITY if n in REGISTRY)
    return tier1, tier2


def queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name].fn for name in coverage_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in coverage_order()
        if REGISTRY[name].oracle is not None
    }
