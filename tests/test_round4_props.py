"""Property tests for the round-4 operators: CDC changelog apply vs a
naive in-memory reference, and prefix-filter exactness vs brute force
on random corpora."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # key
        st.integers(min_value=0, max_value=99),  # payload
        st.integers(min_value=0, max_value=20),  # seq
        st.sampled_from(["U", "D"]),
    ),
    max_size=25,
)
base_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=100, max_value=199),
    ),
    max_size=8,
    unique_by=lambda t: t[0],
)


def naive_merge(base, chg):
    """Reference: latest change per key wins — max (seq, v, op)
    lexicographic, mirroring tiebreak_cols=["v", "op"] DESC — deletes
    remove, upserts replace/insert, untouched base survives."""
    latest = {}
    for k, v, seq, op in chg:
        cur = latest.get(k)
        if cur is None or (seq, v, op) > cur:
            latest[k] = (seq, v, op)
    out = {k: (v, "base") for k, v in base}
    for k, (_, v, op) in latest.items():
        if op == "D":
            out.pop(k, None)
        else:
            out[k] = (v, "upsert")
    return out


@pytest.mark.slow  # rehearsal-class (pytest.ini): deterministic twin keeps coverage
class TestApplyChangelogProperties:
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(base=base_rows, chg=ops)
    def test_matches_naive_reference(self, spark, base, chg):
        from easy_alterator_spark.operators.cdc import apply_changelog

        base_df = spark.createDataFrame(
            base or [(999, 0)], "k long, v long"
        )
        chg_df = spark.createDataFrame(
            chg or [(998, 0, 0, "U")], "k long, v long, seq long, op string"
        )
        got = {
            r["k"]: (r["v"], r["src"])
            for r in apply_changelog(
                base_df,
                chg_df,
                ["k"],
                "seq",
                "op",
                tiebreak_cols=["v", "op"],
            ).collect()
        }
        want = naive_merge(base or [(999, 0)], chg or [(998, 0, 0, "U")])
        assert got == want


texts = st.lists(
    st.text(alphabet="abcd ", min_size=1, max_size=18),
    min_size=2,
    max_size=12,
)


@pytest.mark.slow  # rehearsal-class (pytest.ini): deterministic twin keeps coverage
class TestPrefixFilterProperties:
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(docs=texts, t=st.sampled_from([0.5, 0.8, 1.0]))
    def test_exactness_vs_bruteforce(self, spark, docs, t):
        from easy_alterator_spark.operators.dedup import (
            jaccard_pairs,
            prefix_filter_pairs,
        )

        rows = [
            (i, s) for i, s in enumerate(docs) if s.strip()
        ]
        if len(rows) < 2:
            pytest.skip("degenerate corpus")
        df = spark.createDataFrame(rows, "doc_id long, text string")
        exact = sorted(map(tuple, jaccard_pairs(df, t).collect()))
        pruned = sorted(map(tuple, prefix_filter_pairs(df, t).collect()))
        assert pruned == exact
