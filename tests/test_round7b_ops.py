"""Round-7 continuation operators: nonparametric two-sample
statistics (KS, Mann-Whitney U) on hand-computed fixtures.

Value-level semantics on constructed rows; engine-vs-DuckDB parity
for the registered queries runs in test_queries_oracle.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def two_sample(spark):
    # x = [1,2,2,3] (group 'a'), y = [2,3,3,4] (group 'b')
    rows = [(1.0, "a"), (2.0, "a"), (2.0, "a"), (3.0, "a")] + [
        (2.0, "b"),
        (3.0, "b"),
        (3.0, "b"),
        (4.0, "b"),
    ]
    return spark.createDataFrame(rows, "value double, grp string")


class TestKS2Samp:
    def test_hand_computed(self, spark, two_sample):
        from easy_alterator_spark.operators.nonparam import ks_2samp

        # ECDFs at distinct values 1,2,3,4:
        #   F1 = .25,.75,1,1 ; F2 = 0,.25,.75,1 -> D = .5 at value 2
        # integer form: |cum1*n2 - cum2*n1| = 4,8,4,0 -> d_scaled 8
        (row,) = ks_2samp(two_sample, "value", "grp", "a", "b").collect()
        assert (row["n1"], row["n2"], row["d_scaled"]) == (4, 4, 8)
        assert row["d_stat"] == 0.5
        assert row["ks_at"] == 2.0

    def test_identical_samples_give_zero(self, spark, two_sample):
        from easy_alterator_spark.operators.nonparam import ks_2samp

        same = two_sample.withColumn("grp", two_sample["value"] * 0)
        df = same.selectExpr("value", "'a' AS grp").union(
            same.selectExpr("value", "'b' AS grp")
        )
        (row,) = ks_2samp(df, "value", "grp", "a", "b").collect()
        assert row["d_scaled"] == 0 and row["d_stat"] == 0.0

    def test_missing_column_rejected(self, spark, two_sample):
        from easy_alterator_spark.operators.nonparam import ks_2samp

        with pytest.raises(ValueError, match="need columns"):
            ks_2samp(two_sample, "nope", "grp", "a", "b")


class TestMannWhitney:
    def test_hand_computed(self, spark, two_sample):
        from easy_alterator_spark.operators.nonparam import mannwhitney_u

        # combined sorted [1,2,2,2,3,3,3,4]; avg ranks: 1 -> 1,
        # 2 -> 3, 3 -> 6, 4 -> 8. R1 = 1+3+3+6 = 13, U1 = 13-10 = 3,
        # U2 = 16-3 = 13, AUC = 3/16 (independently: pairs x>y plus
        # half-ties = 0 + .5 + .5 + 2 = 3).
        (row,) = mannwhitney_u(two_sample, "value", "grp", "a", "b").collect()
        assert (row["n1"], row["n2"]) == (4, 4)
        assert row["u1_x2"] == 6 and row["u2_x2"] == 26
        assert row["auc"] == 3 / 16

    def test_u1_plus_u2_is_2_n1_n2(self, spark, two_sample):
        from easy_alterator_spark.operators.nonparam import mannwhitney_u

        (row,) = mannwhitney_u(two_sample, "value", "grp", "a", "b").collect()
        assert row["u1_x2"] + row["u2_x2"] == 2 * row["n1"] * row["n2"]

    def test_disjoint_samples_saturate_auc(self, spark):
        from easy_alterator_spark.operators.nonparam import mannwhitney_u

        df = spark.createDataFrame(
            [(10.0, "a"), (11.0, "a"), (1.0, "b"), (2.0, "b")],
            "value double, grp string",
        )
        (row,) = mannwhitney_u(df, "value", "grp", "a", "b").collect()
        assert row["auc"] == 1.0 and row["u1_x2"] == 2 * 4


SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    from easy_alterator_spark.queries import QUERIES, load_all

    load_all()
    return QUERIES


class TestCompactionBins:
    def test_bins_are_contiguous_and_disjoint_per_source(self, spark, queries):
        rows = queries["layout_compaction_bins"](spark, SF).collect()
        by_src = {}
        for r in rows:
            by_src.setdefault(r["source"], []).append(r)
        for src, bins in by_src.items():
            bins.sort(key=lambda r: r["bin"])
            for a, b in zip(bins, bins[1:]):
                # first-fit in doc_id order: later bin = later docs
                assert a["last_doc"] < b["first_doc"], (src, a, b)
            for r in bins:
                assert r["first_doc"] <= r["last_doc"]
                assert r["n_docs"] >= 1 and r["bytes"] >= 1

    def test_bytes_reconcile_with_source_totals(self, spark, queries):
        from easy_alterator_spark.sources import load_table

        got = {
            (r["source"], r["bin"]): r["bytes"]
            for r in queries["layout_compaction_bins"](spark, SF).collect()
        }
        want = {
            r["source"]: r["total"]
            for r in load_table(spark, SF, "documents")
            .groupBy("source")
            .agg(F.sum("n_chars").alias("total"))
            .collect()
        }
        per_src = {}
        for (src, _), b in got.items():
            per_src[src] = per_src.get(src, 0) + b
        assert per_src == want


class TestTargetEncode:
    def test_smoothed_rate_shrinks_toward_global(self, spark, queries):
        rows = queries["feature_target_encode"](spark, SF).collect()
        gpos = sum(r["pos"] for r in rows)
        gcnt = sum(r["cnt"] for r in rows)
        grate = gpos / gcnt
        for r in rows:
            lo, hi = sorted((r["rate_raw"], grate))
            assert lo - 1e-12 <= r["rate_smoothed"] <= hi + 1e-12, r

    def test_smoothing_matches_closed_form(self, spark, queries):
        rows = queries["feature_target_encode"](spark, SF).collect()
        gpos = sum(r["pos"] for r in rows)
        gcnt = sum(r["cnt"] for r in rows)
        for r in rows:
            want = (r["pos"] * gcnt + 20 * gpos) / ((r["cnt"] + 20) * gcnt)
            assert r["rate_smoothed"] == pytest.approx(want, abs=0, rel=0)
