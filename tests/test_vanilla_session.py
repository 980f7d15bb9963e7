"""Regression: queries must be correct on ANY session, not just the
tuned one from session.get_spark().

The correctness driver builds its own vanilla SparkSession (ANSI on —
the Spark 4 default — no nanosAsLong, arbitrary timezone) and passes it
to queries(); round 1 lost 7 queries to that coupling. Every registered
query now runs ensure_confs() at entry, and the MinHash permutation
math is overflow-free under ANSI regardless.
"""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE

# the 7 queries that died on the driver's vanilla session in round 1
ROUND1_RED = [
    "q18_date_bucket",
    "q19_dedup_distinct",
    "events_sessionize",
    "events_json_extract",
    "events_asof_join",
    "events_range_join",
    "dedup_minhash_lsh",
]

_BROKEN_CONFS = {
    "spark.sql.ansi.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "false",
    "spark.sql.session.timeZone": "America/New_York",
}


@pytest.fixture()
def vanilla(spark):
    """A session with deliberately hostile confs (reapplied per test)."""
    s = spark.newSession()
    for k, v in _BROKEN_CONFS.items():
        s.conf.set(k, v)
    return s


@pytest.mark.parametrize("name", ROUND1_RED)
def test_round1_red_queries_on_vanilla_session(vanilla, name):
    from easy_alterator_spark.queries import QUERIES, load_all

    load_all()
    # re-break the confs right before the call: each query must defend
    # itself (ensure_confs at entry), not rely on a previous query's
    for k, v in _BROKEN_CONFS.items():
        vanilla.conf.set(k, v)
    df = QUERIES[name](vanilla, SF_SMOKE)
    assert df.count() >= 0
    # and the session was actually fixed up in place
    assert vanilla.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert vanilla.conf.get("spark.sql.ansi.enabled") == "false"


def test_minhash_math_is_overflow_free_under_ansi(spark):
    """The permutation arithmetic itself must survive ANSI mode — no
    dependence on wrap-around long semantics (bounded-operand design in
    operators/dedup.py). Bypasses load_table/ensure_confs on purpose."""
    from easy_alterator_spark.operators.dedup import minhash_dedup_pairs

    s = spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "true")
    docs = s.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different text with other words entirely")],
        "doc_id int, text string",
    )
    pairs = minhash_dedup_pairs(docs, threshold=0.9)
    got = {(r.doc_id_a, r.doc_id_b) for r in pairs.collect()}
    assert s.conf.get("spark.sql.ansi.enabled") == "true"  # untouched
    assert got == {(1, 2)}
