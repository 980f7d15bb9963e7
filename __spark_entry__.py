"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query — the end-to-end
training-corpus pipeline (quality gate -> exact dedup ->
decontamination -> stratified sample -> sequence packing) — on
sf0.001; ``queries()`` exposes every implemented operator from
SURVEY.md §2/§2.10 plus the north-star extensions; ``oracle_sql()``
gives the DuckDB-equivalent SQL for the differential correctness gate.

Coverage (stated as of round 11): 295 registered queries, 292 with
oracles; the union of CORRECTNESS_r01-r10 driver stamps is green for
all 292 oracle-bearing queries (stamp histogram r03:35 r04:41 r06:42
r07:40 r08:42 r09:42 r10:50). Round 11 is an optimization round — no
new queries; the window below re-stamps the 35 r03-stale queries the
r10 verdict slated for this round. Only
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
# order. Round-11 rotation (policy in the module docstring):
# (a) the 35 r03-stale queries (newest stamp CORRECTNESS_r03, age 8 >
# K=7) that the r10 verdict slated to lead this window and that
# tests/test_round10_audit.py::test_rotation_staleness_bounded forces
# in-window: graph_edge_support, privacy_k_anonymity,
# profile_key_skew, q01..q30, split_leakage_guard, text_boilerplate.
# Round 11 is an optimization round (no new queries), so the stale
# cohort leads outright; any query whose CODE changed in the r11
# optimization work is listed in section (b) so its rewrite is
# re-stamped by the driver this round.
# (b) the flagship as standing re-verification, then the 14
# most-rewritten r11 optimization targets (two of them —
# rec_item_cooccur and graph_triangles — also carry the ADVICE-r10
# NULL-item-cap oracle fix, outputs verified bit-identical): the
# remaining changed-this-round queries (pin-only plan changes whose
# outputs are proven identical by the r11 oracle-gate sweeps —
# dedup_minhash_df_pruned, dedup_lsh_recall_audit, the CC/keep_best
# family, the rank-machinery users) don't fit the 50 after the forced
# 35 and are covered by the committed sf0.01 full-gate runs instead.
# Window arithmetic for K=7 (VERDICT r10 task 6): the registry is 295
# (292 oracle-bearing; r11 adds none); with a 50-slot window a full
# sweep is ceil(292/50) = 6 rounds, so the steady-state stamp age is
# ~6 and K=7 is exactly one round of slack — a burst of new/changed
# queries displaces a tail by at most one window before the tripwire
# fires. r12 pre-staging: after this round the oldest cohort is the
# 41 r04 stamps minus the two restamped here (decontaminate_bloom,
# dedup_embedding_lsh_planted — both in (b)); the remaining 39 reach
# age 8 > K at r12 and MUST lead the r12 window (39 + flagship = 40,
# leaving 10 slots for r12's changed queries).
# The 3 ddl_* rows-only entries stay out of the window.
_PRIORITY = [
    # --- (a) the 35 r03-stale queries (tripwire-forced this round) ---
    "graph_edge_support",
    "privacy_k_anonymity",
    "profile_key_skew",
    *[f"q{i:02d}" for i in range(1, 31)],  # name-prefix match below
    "split_leakage_guard",
    "text_boilerplate",
    # --- (b) flagship + the 14 most-rewritten r11 queries ---
    "pipeline_training_corpus",
    "embedding_pca_power",
    "dedup_minhash_lsh",
    "dedup_incremental",
    "search_eval_metrics",
    "stats_bootstrap_poisson",
    "eval_isotonic_fit",
    "graph_triangles",
    "rec_item_cooccur",
    "text_pmi_pairs",
    "doc_lm_score",
    "events_rfm_segments",
    "graph_pagerank",
    "dedup_embedding_lsh_planted",
    "decontaminate_bloom",
    # --- below the fold: everything else already driver-green ---
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
