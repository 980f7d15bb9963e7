"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query — the end-to-end
training-corpus pipeline (quality gate -> exact dedup ->
decontamination -> stratified sample -> sequence packing) — on
sf0.001; ``queries()`` exposes every implemented operator from
SURVEY.md §2/§2.10 plus the north-star extensions; ``oracle_sql()``
gives the DuckDB-equivalent SQL for the differential correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from easy_alterator_spark.queries import ORACLES, QUERIES, load_all

load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["pipeline_training_corpus"](spark, "/root/testdata/sf0.001")


# The correctness driver checks the FIRST 50 entries in queries()
# order. Round-5 rotation: CORRECTNESS_r01-r04 cover 142 of the
# registry; the window packs (a) every round-5 NEW query, (b) the 2
# round-5 CHANGED queries (advisor tiebreak fixes), and (c) the 32
# remaining never-driver-checked r4 entries — exactly 50, so the
# union r01-r05 covers every oracle-bearing query registered through
# round 4 plus all round-5 surface. The ENTIRE 192-query registry was
# additionally swept green via tools/driver_sim at BOTH sf0.01 and
# sf0.1 this round (see COVERAGE.md). Everything already driver-green
# trails (order there is cosmetic — _ordered appends the remainder).
_PRIORITY = [
    # --- round-5 new queries (fresh surface first) ---
    "dq_referential_integrity",
    "mine_basket_pairs",
    "shard_rendezvous_resize",
    "events_path_trigrams",
    "graph_khop",
    "dq_freshness",
    "cluster_kmeans",
    "join_time_to_next",
    "stream_latest_by_key",
    "stream_running_totals",
    "sync_partition_checksums",
    "privacy_l_diversity",
    "unpivot_event_stats",
    "stats_chi_square",
    "stats_corr_matrix",
    "events_seasonal_anomaly",
    # --- round-5 changed (advisor fixes: PIT tiebreak, CDC tiebreak) ---
    "join_point_in_time",
    "cdc_merge_upsert",
    # --- the 32 remaining never-driver-checked entries (r01-r04 gap) ---
    "decontaminate_semantic",
    "dedup_blocking_recall",
    "dedup_prefix_filter",
    "dedup_sorted_neighborhood",
    "doc_pack_efficiency",
    "doc_sample_weighted_k",
    "dq_rule_violations",
    "eval_kappa",
    "eval_lang_id_report",
    "events_attribution_first_touch",
    "events_conversion_latency",
    "events_rolling_distinct",
    "events_window_dedup",
    "graph_lpa_communities",
    "graph_pagerank",
    "hierarchy_bom_rollup",
    "index_postings",
    "join_cardinality_estimate",
    "join_range_bucketed",
    "join_skew_salted",
    "multimodal_exact_dedup",
    "multimodal_resize",
    "privacy_erasure_audit",
    "profile_columns",
    "profile_drift_psi",
    "search_eval_metrics",
    "select_pareto_docs",
    "stats_histogram_equidepth",
    "stats_regression_by_group",
    "stream_dedup_exact",
    "stream_view_click_join",
    "stream_window_counts",
    # --- already driver-green; the next ~11 re-verify oldest surface ---
    "pipeline_training_corpus",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_incremental",
    "dedup_cluster_assign",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "decontaminate_ngram",
    "doc_sample_split",
    "doc_pack_sequences",
    "events_sessionize",
    "events_funnel",
    "events_outliers",
    "events_asof_join",
    "events_range_join",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    *[f"q{i:02d}" for i in range(1, 44)],  # name-prefix match below
]


def _ordered(names: list[str]) -> list[str]:
    by_prefix = []
    for p in _PRIORITY:
        for n in names:
            if (n == p or n.startswith(p + "_")) and n not in by_prefix:
                by_prefix.append(n)
    return by_prefix + [n for n in names if n not in by_prefix]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: QUERIES[n] for n in _ordered(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL ops)."""
    return {n: ORACLES[n] for n in _ordered(list(QUERIES)) if n in ORACLES}
