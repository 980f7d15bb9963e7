"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query — the end-to-end
training-corpus pipeline (quality gate -> exact dedup ->
decontamination -> stratified sample -> sequence packing) — on
sf0.001; ``queries()`` exposes every implemented operator from
SURVEY.md §2/§2.10 plus the north-star extensions; ``oracle_sql()``
gives the DuckDB-equivalent SQL for the differential correctness gate.

Coverage (stated as of round 10): 295 registered queries, 292 with
oracles; the union of CORRECTNESS_r01-r09 driver stamps is green for
all 282 queries that carried oracles through round 9, and the 3 NEW
round-10 queries (events_cusum_changepoint, stats_theilsen_trend,
text_pmi_pairs, stats_mann_kendall, stats_runs_test, eval_mcc,
embedding_matryoshka_eval, stats_bootstrap_poisson,
eval_isotonic_fit, corpus_mix_plan) are oracle-gated and lead this
round's window. Only
the three ddl_* fixture queries stay rows-only by design (their
inputs are DDL text, not the relational tables).

Rotation policy (the driver checks the FIRST 50 entries of queries()
order each round): every slot goes first to queries that are NEW or
whose code or oracle CHANGED this round, then the flagship as
standing re-verification, then — oldest stamp first — to green
queries whose newest driver stamp has aged the most, so no
oracle-bearing query's latest stamp falls more than a few rounds
behind. tests/test_round10_audit.py enforces this structurally: any
oracle-bearing query whose newest stamp is older than K=7 rounds must
sit inside the current 50-slot window or the suite fails.
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
# order. Round-10 rotation (policy in the module docstring):
# (a) the 10 queries NEW this round (events_cusum_changepoint,
# stats_theilsen_trend, text_pmi_pairs, stats_mann_kendall,
# stats_runs_test, eval_mcc, embedding_matryoshka_eval,
# stats_bootstrap_poisson, eval_isotonic_fit, corpus_mix_plan) and
# the 8 whose code or
# oracle CHANGED — events_rolling_7d (signed-event prefix-sum
# decomposition replacing the quadratic sliding RANGE frame, found by
# the r10 hot-user rehearsal), graph_triangles (per-user 256-item cap
# on the upstream pair build, identical in the oracle), the three
# min-max-normalized eval queries (hi = lo degenerate guard pinning
# p6 = 0 on both engines), and the DECIMAL(38)/HUGEINT overflow-proof
# folds (embedding_pca_power's covariance numerator;
# eval_brier_decomposition's three squared sums; ml_logreg_gd/_eval
# share the retrained-on-mtime memo fix);
# (b) the flagship pipeline as standing re-verification;
# (c) the remaining 20 r02-stale queries (newest stamp
# CORRECTNESS_r02 — the tail round-9's new-query burst displaced;
# events_rolling_7d, the 21st, moved to (a) by its change);
# (d) the 11 oldest r03-stale queries (alphabetical within the equal
# stamp age), filling to exactly 50. The 35 r03-stale left over
# (graph_edge_support, privacy_k_anonymity, profile_key_skew,
# q01..q30, split_leakage_guard, text_boilerplate) lead the r11
# window; tests/test_round10_audit.py fails the suite if any of them
# is still out-of-window while stale beyond K=7 rounds.
# The 3 ddl_* rows-only entries stay out of the window.
# The full window re-ran green through tools/driver_sim (dtype-strict,
# pandas-fetched like the driver) at sf0.01 before commit.
_PRIORITY = [
    # --- (a) round-10 NEW queries and changed code or oracles ---
    "events_cusum_changepoint",
    "stats_theilsen_trend",
    "text_pmi_pairs",
    "stats_mann_kendall",
    "stats_runs_test",
    "eval_mcc",
    "embedding_matryoshka_eval",
    "stats_bootstrap_poisson",
    "eval_isotonic_fit",
    "corpus_mix_plan",
    "events_rolling_7d",
    "graph_triangles",
    "eval_calibration_bins",
    "eval_brier_decomposition",
    "eval_conformal_coverage",
    "embedding_pca_power",
    "ml_logreg_gd",
    "ml_logreg_eval",
    # --- (b) flagship standing re-verification ---
    "pipeline_training_corpus",
    # --- (c) the 20 remaining r02-stale stamps ---
    "doc_sample_split",
    "events_asof_join",
    "events_funnel",
    "events_json_extract",
    "events_latest_by_key",
    "events_outliers",
    "events_range_join",
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
    # --- (d) the 11 oldest r03-stale, filling to exactly 50 ---
    "agg_incremental_merge",
    "corpus_entropy",
    "corpus_overlap_minhash",
    "dedup_keep_best",
    "dedup_robust_keep_best",
    "dedup_threshold_sweep",
    "doc_lm_score",
    "doc_nb_classify",
    "embedding_quantize_report",
    "events_anomaly_mad",
    "events_scd2",
    # --- below the fold: the 35 r03-stale that lead the r11 window ---
    "graph_edge_support",
    "privacy_k_anonymity",
    "profile_key_skew",
    *[f"q{i:02d}" for i in range(1, 31)],  # name-prefix match below
    "split_leakage_guard",
    "text_boilerplate",
    # --- then everything else already driver-green ---
    *[f"q{i:02d}" for i in range(31, 44)],
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
