"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query — the end-to-end
training-corpus pipeline (quality gate -> exact dedup ->
decontamination -> stratified sample -> sequence packing) — on
sf0.001; ``queries()`` exposes every implemented operator from
SURVEY.md §2/§2.10 plus the north-star extensions; ``oracle_sql()``
gives the DuckDB-equivalent SQL for the differential correctness gate.

Coverage (stated as of round 9): the union of CORRECTNESS_r01-r08
driver stamps covers all 257 queries that carried oracles through
round 8 (262 registered). Round 9 adds exact oracles to dedup_simhash
(xxhash64 replayed in DuckDB, queries/_xxh64_sql.py) and
bpe_train_merges (chained-CTE merge-loop replay), plus 23 NEW
oracle-bearing queries (queries/evalops.py: classifier evaluation,
k-group experiment stats, GD-trained logistic regression, PCA power
iteration, Holt smoothing, WOE/IV feature screening, CUPED), so 274
of 277 registered queries carry oracles; only the three ddl_* fixture
queries stay rows-only by design (their inputs are DDL text, not the
relational tables).

Rotation policy (the driver checks the FIRST 50 entries of queries()
order each round): every slot goes first to queries that are NEW or
whose code or oracle CHANGED this round, then the flagship as
standing re-verification, then — oldest stamp first — to green
queries whose newest driver stamp has aged the most, so no
oracle-bearing query's latest stamp falls more than a few rounds
behind. The 23 new round-9 queries take the slots that round-8
planning had reserved for the tail of the r02-stale rotation; the 23
displaced r02-stale entries (all green since r02, unchanged since)
lead the r10 window instead.
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
# order. Round-9 rotation (policy in the module docstring):
# (a0) the 23 queries NEW this round (queries/evalops.py) — never
# stamped before, so they outrank every re-verification;
# (a) the 14 queries whose code or oracle CHANGED this round — the
# rank.global_* decompositions (rfm, lorenz, zipf, spearman, ks, mwu),
# the scale-safe graph/recsys variants (degree-oriented triangles,
# capped cooccur), the 1e-12-gridded Dirichlet sum, the +1e-6 nudge
# retrofits (user_entropy + its stream twin, readability), and the two
# NEW oracles (dedup_simhash via the DuckDB xxhash64 replay,
# bpe_train_merges via the merge-loop replay);
# (b) the flagship pipeline as standing re-verification;
# (c) the first 12 of the 33 remaining r02-stale queries (newest
# stamp CORRECTNESS_r02; dedup_simhash, the 34th, is already in (a));
# the last 21 — plus the 2 r03-stale that round-8 planning had slotted
# — are displaced by (a0) and lead the r10 window.
# The 3 ddl_* rows-only entries stay out of the window.
# The full window re-ran green through tools/driver_sim (dtype-strict,
# pandas-fetched like the driver) at sf0.01 before commit.
_PRIORITY = [
    # --- (a0) new this round: queries/evalops.py ---
    "eval_roc_auc",
    "eval_calibration_bins",
    "eval_pr_threshold",
    "eval_lift_cumgains",
    "stats_anova_f",
    "stats_kruskal_wallis",
    "stats_mcnemar",
    "stats_permutation_test",
    "stats_jackknife_mean",
    "ml_logreg_gd",
    "ml_logreg_eval",
    "embedding_pca_power",
    "events_holt_linear",
    "feature_woe_iv",
    "stats_cuped",
    "stats_did",
    "stats_power_mde",
    "stream_holt_linear",
    "stats_sequential_obf",
    "eval_average_precision",
    "eval_brier_decomposition",
    "eval_conformal_coverage",
    "stats_wilson_ci",
    # --- (a) round-9 changed code or oracles ---
    "stats_spearman",
    "stats_ks_test",
    "stats_mannwhitney",
    "events_rfm_segments",
    "events_lorenz_deciles",
    "text_zipf_fit",
    "rec_item_cooccur",
    "graph_triangles",
    "search_lm_dirichlet",
    "events_user_entropy",
    "stream_user_entropy",
    "text_readability",
    "dedup_simhash",
    "bpe_train_merges",
    # --- (b) flagship standing re-verification ---
    "pipeline_training_corpus",
    # --- (c) all remaining r02-stale stamps ---
    "agg_cube",
    "agg_grouping_sets",
    "agg_rollup",
    "corpus_stats",
    "decontaminate_ngram",
    "dedup_cluster_assign",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_incremental",
    "dedup_ngram_jaccard",
    "doc_chunk_split",
    "doc_pack_sequences",
    "doc_sample_split",
    "events_asof_join",
    "events_funnel",
    "events_json_extract",
    "events_latest_by_key",
    "events_outliers",
    "events_range_join",
    "events_rolling_7d",
    "events_sessionize",
    "layout_zorder",
    "stats_quantiles",
    "text_bpe_tokens",
    "text_fingerprint",
    "text_lang_id",
    "text_length_histogram",
    "text_pii_redact",
    "text_quality",
    "text_repetition",
    "text_token_stats",
    "tfidf_top_terms",
    "vocab_topk",
    # --- (d) oldest r03-stale, filling to 50 ---
    "agg_incremental_merge",
    "corpus_entropy",
    # --- below the fold: everything else already driver-green ---
    "eval_lang_id_report",
    "eval_kappa",
    "dedup_exact",
    "dedup_minhash_lsh",
    "decontaminate_bloom",
    "cluster_kmeans",
    "graph_pagerank",
    "sim_ann_ivf",
    "sim_ann_pq",
    "search_hybrid_rrf",
    "search_bm25",
    "index_postings",
    "multimodal_exact_dedup",
    *[f"q{i:02d}" for i in range(1, 44)],  # name-prefix match below
]


def _ordered(names: list[str]) -> list[str]:
    # exact registry names match ONLY themselves; prefix expansion is
    # reserved for shorthand entries like "q01" -> "q01_scan_project"
    # (so e.g. "dedup_simhash" no longer drags dedup_simhash_md5 into
    # a checked window slot)
    registered = set(names)
    by_prefix = []
    for p in _PRIORITY:
        if p in registered:
            if p not in by_prefix:
                by_prefix.append(p)
            continue
        for n in names:
            if n.startswith(p + "_") and n not in by_prefix:
                by_prefix.append(n)
    return by_prefix + [n for n in names if n not in by_prefix]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: QUERIES[n] for n in _ordered(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL ops)."""
    return {n: ORACLES[n] for n in _ordered(list(QUERIES)) if n in ORACLES}
