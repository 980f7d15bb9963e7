"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query — the end-to-end
training-corpus pipeline (quality gate -> exact dedup ->
decontamination -> stratified sample -> sequence packing) — on
sf0.001; ``queries()`` exposes every implemented operator from
SURVEY.md §2/§2.10 plus the north-star extensions; ``oracle_sql()``
gives the DuckDB-equivalent SQL for the differential correctness gate.

Coverage: the union of CORRECTNESS_r01-r07 driver stamps covers every
oracle-bearing registry entry (231 of 236; the remaining 5 register
rows-only by design: dedup_simhash, bpe_train_merges, and the three
ddl_* fixture queries whose inputs are DDL text, not the relational
tables). See the rotation note on ``_PRIORITY``.
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
# order. Round-7 rotation: (a) the round-7 CHANGED query
# (eval_lang_id_report — oracle SUM(n)::BIGINT dtype fix; red r4-r6),
# (a') the 17 queries REGISTERED in the first r7 session (interval
# overlap, trigram novelty, the deterministic-sketch family incl. its
# streaming twin, t-closeness, transition matrix, feature hashing,
# bitmap retention, sampled quantiles),
# (a'') the 23 queries REGISTERED in the r7 continuation session
# (KS / Mann-Whitney / Welch / SRM A/B-stats family, RFM segments,
# level-shift changepoint, compaction bins, target encoding,
# nearest-event join, slice scan, calendar-lag ACF, velocity flags,
# user entropy + its bounded-state streaming twin, cohort LTV, Lorenz
# deciles, RAKE scores, dedup impact, Flesch readability, kNN
# auto-labeling, new-vs-returning, weekday profile, DAU/MAU
# stickiness — every one sim-green at sf0.01 AND sf0.1 before its
# commit),
# (b) the 4 queries that gained oracles this round (the multimodal
# decode family — recomputable-bytes oracles replace no_oracle),
# (c) the 4 never-driver-checked round-6 entries, then (d) the
# flagship pipeline as the one re-verify slot. That is exactly 50:
# every slot is a never-driver-stamped entry except the flagship.
# With this window the union r01-r07 stamps EVERY oracle-bearing
# entry in the registry (231 of 236; the other 5 — dedup_simhash,
# bpe_train_merges, ddl_* — are no-oracle by design and are kept OUT
# of the first 50 so no checked slot is burned on a rows-only
# record). The exact 50-entry window re-ran green end-to-end through
# tools/driver_sim (dtype-strict, pandas-fetched like the driver) at
# sf0.01 before the final commit of the session.
_PRIORITY = [
    # --- round-7 changed oracle (driver-red r4-r6, HUGEINT fix) ---
    "eval_lang_id_report",
    # --- round-7 NEW queries ---
    "join_interval_overlap",
    "text_trigram_novelty",
    "sketch_kmv_distinct",
    "sketch_hll_distinct",
    "sketch_countmin_topk",
    "privacy_t_closeness",
    "events_transition_matrix",
    "text_feature_hashing",
    "events_bitmap_retention",
    "sketch_sample_quantiles",
    "stream_hll_distinct",
    "stats_benford",
    "sketch_hll_merge_days",
    "sketch_theta_intersection",
    "sketch_theta_union",
    "events_decayed_counts",
    "events_ntile_quartiles",
    "stats_ks_test",
    "stats_mannwhitney",
    "events_rfm_segments",
    "events_level_shift",
    "layout_compaction_bins",
    "feature_target_encode",
    "join_nearest_event",
    "dq_slice_scan",
    "events_acf",
    "events_velocity_flags",
    "events_user_entropy",
    "stats_srm_check",
    "events_cohort_ltv",
    "events_lorenz_deciles",
    "text_rake_scores",
    "stats_welch_ttest",
    "dedup_impact_report",
    "text_readability",
    "sim_knn_classify",
    "stream_user_entropy",
    "events_new_vs_returning",
    "events_dow_profile",
    "events_stickiness",
    # --- round-7 new oracles (no_oracle -> recomputable-bytes) ---
    "multimodal_image_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    "multimodal_audio_energy",
    # --- never driver-checked (registered round 6) ---
    "events_active_streaks",
    "events_share_of_total",
    "stats_gini",
    "text_zipf_fit",
    # --- re-verify: flagship + heavy operator families ---
    "pipeline_training_corpus",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_incremental",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "decontaminate_ngram",
    "decontaminate_bloom",
    "decontaminate_semantic",
    "doc_sample_split",
    "doc_pack_sequences",
    "eval_kappa",
    "index_postings",
    "search_hybrid_rrf",
    "cluster_kmeans",
    "graph_pagerank",
    "sim_ann_pq",
    "multimodal_exact_dedup",
    # --- re-verify: date-valued outputs (DATE-vs-midnight canon) ---
    "events_gap_fill",
    "events_ohlc_daily",
    "events_retention_cohorts",
    "events_seasonal_anomaly",
    "sync_partition_checksums",
    "pivot_event_counts",
    "unpivot_event_stats",
    "stream_window_counts",
    "q18_date_bucket",
    "q24_tpch_shipping",
    "q26_tpch_large_orders",
    # --- re-verify: r7 asof-carry refactor consumers + r5 tiebreak
    #     fixes + float-canon edge queries ---
    "join_point_in_time",
    "join_time_to_next",
    "cdc_merge_upsert",
    "q15_window_lead",
    "q36_tpch_min_cost_supplier",
    "events_sessionize",
    "stream_sessionize",
    "stats_chi_square",
    "events_funnel",
    "events_asof_join",
    # --- below the fold: everything else already driver-green ---
    "dedup_cluster_assign",
    "dedup_embedding_lsh",
    "events_outliers",
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
