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


# Queries that already earned a driver CORRECTNESS row in rounds 1-5
# (keys of CORRECTNESS_r01.json ∪ … ∪ r05 — 187 of the 188 queries registered
# at the round-5 close; re-frozen 2026-08-14 for round 6). The driver
# prefix is built from the registry MINUS this set, so anything new this
# round earns a row first. `stream_left_interval_join_live` is the one
# intentional omission: it has never been sampled, so it stays out of the
# frozen set and lands at the head of the round-6 prefix.
#
# ROUND-7 NOTE: first move next round — fold CORRECTNESS_r06.json's keys
# into this set (rename to _DRIVER_CHECKED_R1_R6), replace
# _ROUND6_PRIORITY with the next round's stale/marquee tier, and update
# tests/test_oracle_parity.py::test_coverage_order_round6_prefix_contract
# accordingly. Round 6 registered 8 new queries (all oracled) + left the
# live left-interval join at the prefix head; all 23 tier-1/2 entries fit
# the ~50-query sample with room for round-7 additions.
_DRIVER_CHECKED_R1_R5 = frozenset(
    {
        'agg_approx_distinct', 'agg_approx_percentile', 'agg_cube',
        'agg_distinct_counts', 'agg_filtered', 'agg_grouping_sets',
        'agg_histogram', 'agg_percentiles', 'agg_pivot_status',
        'agg_pricing_summary', 'agg_rollup', 'agg_stats',
        'analytics_cohort_retention', 'analytics_disjunctive_join',
        'analytics_large_orders', 'analytics_local_supplier_volume',
        'analytics_lost_opportunity', 'analytics_market_basket',
        'analytics_market_share', 'analytics_promo_share',
        'analytics_rfm_segments', 'analytics_rolling_wau',
        'analytics_shipping_priority', 'analytics_signup_funnel',
        'analytics_small_qty_revenue', 'analytics_trade_flows',
        'anti_join', 'asof_click_next_purchase', 'asof_purchase_click',
        'broadcast_join', 'case_when', 'cross_join', 'dedup_components',
        'dedup_containment', 'dedup_embedding',
        'dedup_embedding_checked', 'dedup_embedding_lsh', 'dedup_exact',
        'dedup_jaccard_bitmap', 'dedup_jaccard_capped',
        'dedup_jaccard_incremental', 'dedup_jaccard_pairs',
        'dedup_jaccard_prefix', 'dedup_minhash_lsh',
        'dedup_minhash_relational', 'dedup_simhash',
        'dedup_simhash_pairs', 'dedup_winnow_match', 'except_custkeys',
        'filter_project', 'flagship', 'fuzzy_phrase_match',
        'govern_pii_mask', 'intersect_nations', 'left_join_coverage',
        'lookup_oov_tokens', 'lookup_paraphrase_coverage',
        'mm_binary_hash', 'mm_decode_meta', 'mm_dhash', 'mm_dhash_near',
        'mm_img_features', 'mm_media_meta', 'mm_media_stats',
        'mm_meta_stats', 'mm_png_features', 'mm_resize',
        'mm_wav_sample', 'order_limit', 'pattern_scd2_merge',
        'pattern_scd2_pointintime', 'pattern_unpivot',
        'pipeline_chunk_overlap', 'pipeline_corpus_curation',
        'pipeline_corpus_curation_v2', 'pipeline_decontaminate',
        'pipeline_mixture_sample', 'pipeline_pack_windows',
        'pipeline_quality_gate', 'pipeline_quality_quartiles',
        'pipeline_rag_ingest', 'pipeline_stratified_sample',
        'pipeline_train_split', 'ppdb_alignment_explode',
        'ppdb_collect_nested', 'ppdb_collect_paraphrases',
        'ppdb_entailment_dist', 'ppdb_feature_keys', 'ppdb_map_ops',
        'ppdb_parse_stats', 'ppdb_parse_stats_bz2',
        'ppdb_parse_throughput', 'ppdb_quarantine',
        'ppdb_symmetric_pairs', 'ppdb_top_paraphrases',
        'profile_columns', 'range_join_bands', 'region_revenue',
        'sample_orders', 'scalar_arrays', 'scalar_bitwise',
        'scalar_dates', 'scalar_json', 'scalar_math',
        'scalar_null_handling', 'scalar_regex', 'scalar_strings',
        'scalar_try_ops', 'scalar_variant', 'self_join_pairs',
        'semi_join', 'sim_cosine_topk', 'sim_ivf_kmeans_topk',
        'sim_ivf_topk', 'sim_ivfpq_topk', 'sim_lsh_pairs',
        'sim_lsh_pairs_checked', 'sim_neighbors_docs',
        'sim_pairwise_cosine', 'sim_pq_encode', 'sim_pq_kmeans_topk',
        'sim_pq_topk', 'skew_salted_agg', 'skew_salted_join',
        'snk_bucketed_join', 'snk_json_roundtrip', 'snk_orc_roundtrip',
        'snk_parquet_roundtrip', 'snk_partition_pruned',
        'src_csv_permissive', 'src_csv_scan', 'src_custom_datasource',
        'src_json_scan', 'stream_dedup_live',
        'stream_foreach_batch_sink', 'stream_interval_join_batch',
        'stream_interval_join_live', 'stream_left_interval_join_batch',
        'stream_session_batch', 'stream_session_live',
        'stream_sliding_batch', 'stream_sliding_live',
        'stream_stateful_counter', 'stream_static_enrich_batch',
        'stream_static_enrich_live', 'stream_tumbling_batch',
        'stream_tumbling_live', 'sub_correlated_avg_qty',
        'sub_exists_idle_rich', 'sub_having_revenue_share',
        'subq_not_in_nulls', 'text_bigram_ppl', 'text_bpe_token_count',
        'text_fingerprint', 'text_inverted_index', 'text_lang_route',
        'text_langid', 'text_phrase_search', 'text_pmi_collocations',
        'text_quality', 'text_quality_rules', 'text_repetition',
        'text_sentiment', 'text_textrank', 'text_tfidf_top5',
        'text_token_stats', 'text_unigram_logprob', 'text_winnow_fp',
        'ts_gapfill_locf', 'ts_interpolate', 'ts_ohlc_daily',
        'ts_recursive_month_spine', 'udf_arrow_scalar',
        'udf_grouped_agg_sum', 'udf_grouped_map_minmax',
        'udf_map_in_arrow', 'udf_map_partitions_bucket',
        'udf_scalar_cents', 'udtf_explode_types',
        'udtf_polymorphic_split', 'union_parties', 'window_cume_dist',
        'window_lag_lead', 'window_range_frame', 'window_rank_family',
        'window_running_sum', 'window_value_family'
    }
) - {"stream_left_interval_join_live"}

# Round-6 priority tier, sampled right behind the never-checked backlog:
# (a) the rows-only queries whose last driver row predates round 4 — the
# judge asked for a fresh rows/schema signal on every one of them this
# round (VERDICT r5 item 1) — self-checked A3/F4 conversions first since
# they are now oracle-backed, and (b) the round-5 marquee plan rewrites
# that need a second consecutive green row before their plans are frozen
# (VERDICT r5 item 2).
_ROUND6_PRIORITY = (
    # (a) rows-only backlog / newly self-checking conversions
    "agg_approx_distinct",
    "agg_approx_percentile",
    "sample_orders",
    "dedup_embedding_lsh",
    "dedup_minhash_lsh",
    "ppdb_collect_nested",
    "ppdb_parse_throughput",
    "sim_lsh_pairs",
    "stream_foreach_batch_sink",
    "stream_session_live",
    # (b) marquee re-certs
    "dedup_jaccard_prefix",
    "dedup_minhash_relational",
    "sim_ivfpq_topk",
    "pipeline_corpus_curation_v2",
)


def coverage_order() -> list[str]:
    """Registry names ordered so every PREFIX maximizes driver-evidence
    value.

    Tier 1: every registered query that has never received a driver
    CORRECTNESS row in rounds 1-5 (``_DRIVER_CHECKED_R1_R5`` complement),
    oracle-backed entries first — the never-sampled live interval join
    plus anything new this round land here.
    Tier 2: the round-6 priority tier (``_ROUND6_PRIORITY``): stale
    rows-only queries needing a fresh driver row and round-5 marquee plan
    rewrites needing a second consecutive green row.
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
            if n not in _DRIVER_CHECKED_R1_R5 and n not in _ROUND6_PRIORITY
        ),
        key=lambda n: (remaining[n].oracle is None, n),
    )
    for seed in (*never_checked, *_ROUND6_PRIORITY):
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
