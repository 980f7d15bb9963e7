"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query — the end-to-end
training-corpus pipeline (quality gate -> exact dedup ->
decontamination -> stratified sample -> sequence packing) — on
sf0.001; ``queries()`` exposes every implemented operator from
SURVEY.md §2/§2.10 plus the north-star extensions; ``oracle_sql()``
gives the DuckDB-equivalent SQL for the differential correctness gate.

Coverage (stated as of round 12): 295 registered queries, 292 with
oracles; the union of CORRECTNESS_r01-r11 driver stamps is green for
all 292 oracle-bearing queries (newest-stamp histogram r04:39 r06:40
r07:40 r08:41 r09:39 r10:43 r11:50). Round 12 is the second
optimization round — no new queries; the window below re-stamps the
39 r04-stale queries the r11 verdict pre-staged for this round, plus
the 3 queries whose plan or oracle text changed in r12. Only the
three ddl_* fixture queries stay rows-only by design (their inputs
are DDL text, not the relational tables).

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
# order. Round-12 rotation (policy in the module docstring):
# (a) the 39 r04-stale queries (newest stamp CORRECTNESS_r04, age
# 8 > K=7) that the r11 verdict's task 8 pre-staged to lead this
# window and that tests/test_round10_audit.py::
# test_rotation_staleness_bounded forces in-window.
# (b) the flagship as standing re-verification, then the 3 queries
# whose code or ORACLE changed in the r12 optimization work:
# embedding_pca_power (groupBy(i,j) partial-combine before the fused
# Arrow stage — plan change, outputs oracle-proven identical at
# sf0.01/sf0.1), and bpe_train_merges + graph_pagerank (oracle CTEs
# marked MATERIALIZED — a DuckDB evaluation-strategy hint; outputs
# verified bit-identical old-vs-new at sf0.001 and sf0.01, and both
# re-stamped here so the driver confirms the new oracle text).
# embedding_pca_power's oracle also carries the hint (verified
# identical the same way).
# (c) the remaining 7 slots go oldest-stamp-first to the r06 cohort
# (age 6; they reach K=7 at r13 and this pre-rotation keeps the
# steady-state sweep ahead of the tripwire): the first 7
# alphabetically of the 40 r06-stale queries.
# Window arithmetic for K=7 (VERDICT r10 task 6): registry 295 (292
# oracle-bearing; r12 adds none); steady-state stamp age ~6, K=7 one
# round of slack. r13 pre-staging: after this round the oldest
# cohort is the 33 remaining r06 stamps (40 minus the 7 restamped
# here) — they reach age 8 > K at r13 and must lead the r13 window
# (33 + flagship = 34, leaving 16 slots for r13's changed queries).
# The 3 ddl_* rows-only entries stay out of the window.
_PRIORITY = [
    # --- (a) the 39 r04-stale queries (tripwire-forced this round) ---
    "corpus_snapshot_diff",
    "dedup_cluster_assign_star",
    "dedup_containment",
    "dedup_edit_distance",
    "dedup_lsh_recall_audit",
    "dedup_semantic",
    "dedup_simhash_md5",
    "doc_chunk_dedup",
    "doc_chunk_overlap",
    "doc_quality_filter",
    "events_dwell_time",
    "events_rolling_median",
    "events_transitions",
    "events_value_ranks",
    "events_winsorize",
    *[f"q{i:02d}" for i in range(31, 44)],  # name-prefix match below
    "search_bm25",
    "search_hybrid_rrf",
    "search_phrase_positional",
    "search_phrase",
    "search_ranked",
    "sim_ann_ivf_probe2",
    "sim_ann_ivf",
    "sim_ann_pq",
    "sim_topk_bruteforce",
    "stream_sessionize",
    "text_collocations",
    # --- (b) flagship + the 3 changed-this-round queries ---
    "pipeline_training_corpus",
    "embedding_pca_power",
    "bpe_train_merges",
    "graph_pagerank",
    # --- (c) 7 oldest-stamp (r06) pre-rotation fillers ---
    "cdc_merge_upsert",
    "cluster_kmeans",
    "decontaminate_semantic",
    "dedup_prefix_filter",
    "dedup_sorted_neighborhood",
    "doc_pack_efficiency",
    "dq_freshness",
    # --- below the fold: everything else already driver-green ---
    *[f"q{i:02d}" for i in range(1, 31)],
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
