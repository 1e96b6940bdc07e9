"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual implementations live in ``django_indexer_spark.plans``:
``fixture_queries.QUERIES`` (Spark callables) and ``oracles.ORACLES``
(DuckDB SQL twins). See SURVEY.md §2 for the operator inventory each
query covers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from django_indexer_spark.plans.fixture_queries import QUERIES
from django_indexer_spark.plans.oracles import ORACLES

# Driver-budget rotation (round 4): the driver checks ~50 queries per round
# in registry order. Round 3's order put one representative per operator
# family first (CORRECTNESS_r03.json: 49/50 full-pass, 0 fail). This round
# flips it: a cheap driver-green canary leads, then every query that has NO
# driver correctness row yet (cheapest-first by measured sf0.01 wall time,
# so a time-capped budget reaches as many as possible), then queries new
# this round, then the 49 already-checked ones. Union of r3+r4 rows should
# then cover the whole registry.
_CANARY = ["f1_eq_filter"]
_UNCHECKED_R3 = [
    "sample_hash_10pct", "sample_split_assign", "sample_stratified",
    "f5_time_window", "c12_format_2dp", "sample_per_group_cap",
    "text_pii_scrub", "multimodal_meta", "a_argmax_customer", "a_histogram",
    "f3_null_pred", "c16_array_explode", "sample_seeded_shuffle",
    "a_unpivot_measures", "a_cube_matrix", "text_length_buckets",
    "pack_sequences", "j2_prefetch_array", "f11_conditional_unique",
    "j5_semi_in_subquery", "c1_c2_event_decode", "setop_intersect_except",
    "a_ntile_bins", "a_pivot_matrix", "f_lookalike_ids", "a_percentiles",
    "text_vocab_topk", "sample_temperature_mix", "ts_moving_avg",
    "ts_range_window", "ts_retention_cohorts", "t_incremental_stats",
    "a_corr_covar", "curation_pipeline", "a3_approx_distinct",
    "a_rollup_hierarchy", "q3_shipping_priority", "q10_returned_items",
    "sim_centroid_outliers", "ts_sessionize", "ts_funnel",
    "dedup_fuzzy_names", "text_lm_quality", "dedup_decontaminate",
    "text_repetition", "dedup_source_overlap", "text_bm25", "c7_c8_net_usd",
    "sim_rp_recall", "dedup_minhash_estimate", "dedup_lsh_recall",
    "dedup_dup_ngrams", "text_heavy_hitters", "dedup_clusters",
    "graph_pagerank",
]


def _ordered(mapping: dict) -> dict:
    # canonical order comes from the QUERIES registry so queries() and
    # oracle_sql() iterate identically regardless of either dict's own
    # insertion order. Grouping: canary, then every name WITHOUT a driver
    # correctness row in any prior round (cost-ordered where measured,
    # registry-ordered otherwise), then already-checked names — so each
    # round's ~50-query budget lands on fresh queries and the rotation
    # maintains itself as CORRECTNESS_r{N}.json files accumulate.
    seen = _checked_names()
    front = [n for n in _CANARY if n in mapping]
    unseen_pref = [
        n for n in _UNCHECKED_R3
        if n in mapping and n not in seen and n not in front
    ]
    placed = set(front) | set(unseen_pref)
    unseen_rest = [
        n for n in QUERIES if n in mapping and n not in seen and n not in placed
    ]
    placed |= set(unseen_rest)
    rest = [n for n in QUERIES if n in mapping and n not in placed]
    placed |= set(rest)
    extra = [n for n in mapping if n not in placed]
    return {
        n: mapping[n] for n in front + unseen_pref + unseen_rest + rest + extra
    }


def _checked_names() -> frozenset[str]:
    """Names with a driver correctness row in ANY round since the r3
    rebuild (CORRECTNESS_r0{3..}.json live next to this file). r1/r2
    files are ignored — they graded a materially different codebase.
    Falls back to the hardcoded r3 set if no file is readable."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    seen: set[str] = set()
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", p)
        if not m or int(m.group(1)) < 3:
            continue
        try:
            with open(p) as f:
                seen |= set(json.load(f))
        except (OSError, ValueError):
            continue
    return frozenset(seen) if seen else _R3_CHECKED


# The 50 names with a CORRECTNESS_r03.json row (hardcoded, not derived from
# the registry, so queries ADDED after round 3 sort into the unchecked-new
# group rather than silently landing behind the budget horizon).
_R3_CHECKED = frozenset({
    "a3_distinct_by_group", "a4_grouped_stats", "a5_conditional_pivot",
    "a6_guarded_sum", "a9_distinct_projection", "activity_feed_by_type",
    "c3_ts_convert", "c6_decimal_math", "c_date_arithmetic",
    "dedup_embedding_cosine", "dedup_exact", "dedup_minhash_bands",
    "dedup_minhash_pairs", "dedup_ngram_jaccard", "dedup_simhash",
    "f10_prefix_extract", "f1_eq_filter", "f2_in_list", "f4_range_pred",
    "f6_or_null_repair", "f7_json_regex", "f9_suffix_match",
    "j1_fk_chain_revenue", "j4_semi_join", "j6_asof_backward",
    "j6_asof_nearest", "j6_interval_join_count", "j7_anti_join",
    "j8_self_double_fk", "j9_gated_update", "j_salted_skew",
    "o3_keyset_page", "o3_pagination", "o4_top_k", "o5_seeded_sample",
    "q1_pricing_summary", "setop_union_dedup", "sim_ann_lsh",
    "sim_cosine_topk", "sim_ivf_assign", "sim_ivf_search",
    "sim_kmeans_train", "stats_overview", "t3_upsert_last_writer",
    "text_lang_id", "text_metrics", "ts_hourly_rollup",
    "w1_latest_per_user", "w3_rank_leaderboard", "w_running_total",
})


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the /stats endpoint shape, base/api.py:60-89) on
    sf0.001; driver checks rows>0."""
    return QUERIES["stats_overview"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted entries =
    non-SQL-expressible ops, driver records rows-only check)."""
    return _ordered(dict(ORACLES))
