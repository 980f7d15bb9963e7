"""Round-8 feature/analytics queries: hand-computed value semantics on
constructed micro-tables (written as parquet fixtures and run through
the REGISTERED queries, so the full load_table -> query path is what's
tested). Engine-vs-DuckDB parity runs in test_queries_oracle.py; these
tests pin the MATH so a shared Spark/oracle misunderstanding can't
slip through.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from easy_alterator_spark.queries import QUERIES, load_all

load_all()

T0 = datetime(2026, 1, 1, 12, 0, 0)


def _write_events(spark, path, rows):
    """rows: (event_id, day_offset, user_id, event_type, value, props)."""
    df = spark.createDataFrame(
        [
            (eid, T0 + timedelta(days=d, seconds=eid), uid, et, v, pr)
            for (eid, d, uid, et, v, pr) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_docs(spark, path, rows):
    """rows: (doc_id, text, lang, source)."""
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for (i, t, lang, src) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


class TestEwmaSmooth:
    def test_fold_order_and_seed(self, spark, tmp_path):
        # user 1 daily spends 100, 200, 400 cents:
        # seed 100 -> .5*100+.5*200 = 150 -> .5*150+.5*400 = 275
        _write_events(
            spark,
            tmp_path,
            [
                (1, 0, 1, "view", 1.00, "{}"),
                (2, 1, 1, "view", 2.00, "{}"),
                (3, 2, 1, "view", 4.00, "{}"),
            ],
        )
        (row,) = QUERIES["events_ewma_smooth"](spark, str(tmp_path)).collect()
        assert (row["user_id"], row["n_days"]) == (1, 3)
        assert row["ewma_spend"] == 275.0

    def test_single_day_is_identity(self, spark, tmp_path):
        _write_events(spark, tmp_path, [(1, 0, 7, "view", 3.50, "{}")])
        (row,) = QUERIES["events_ewma_smooth"](spark, str(tmp_path)).collect()
        assert row["n_days"] == 1 and row["ewma_spend"] == 350.0


class TestAttributionPositional:
    def test_u_shape_with_remainder(self, spark, tmp_path):
        # user 1 path before first purchase: view, click, view, error,
        # signup (k=5). first/last 400; middles split 200 // 3 = 66
        # with remainder 2 to the EARLIEST middles -> 67, 67, 66.
        # view: 400 + 67 = 467; click 67; error 66; signup 400.
        # user 2: single view touch -> 1000. user 3: no purchase.
        _write_events(
            spark,
            tmp_path,
            [
                (1, 0, 1, "view", 0.0, "{}"),
                (2, 0, 1, "click", 0.0, "{}"),
                (3, 0, 1, "view", 0.0, "{}"),
                (4, 0, 1, "error", 0.0, "{}"),
                (5, 0, 1, "signup", 0.0, "{}"),
                (6, 0, 1, "purchase", 9.99, "{}"),
                (7, 0, 2, "view", 0.0, "{}"),
                (8, 0, 2, "purchase", 1.00, "{}"),
                (9, 0, 3, "view", 0.0, "{}"),
            ],
        )
        out = {
            r["event_type"]: r
            for r in QUERIES["events_attribution_positional"](
                spark, str(tmp_path)
            ).collect()
        }
        assert out["view"]["credit_permille"] == 467 + 1000
        assert out["view"]["touches"] == 3 and out["view"]["users"] == 2
        assert out["click"]["credit_permille"] == 67
        assert out["error"]["credit_permille"] == 66
        assert out["signup"]["credit_permille"] == 400
        # every converting user's path sums to exactly 1000
        assert sum(r["credit_permille"] for r in out.values()) == 2000

    def test_two_touch_split(self, spark, tmp_path):
        _write_events(
            spark,
            tmp_path,
            [
                (1, 0, 1, "view", 0.0, "{}"),
                (2, 0, 1, "click", 0.0, "{}"),
                (3, 0, 1, "purchase", 1.0, "{}"),
            ],
        )
        out = {
            r["event_type"]: r["credit_permille"]
            for r in QUERIES["events_attribution_positional"](
                spark, str(tmp_path)
            ).collect()
        }
        assert out == {"view": 500, "click": 500}


class TestSkewKurtosis:
    def test_hand_computed_moments(self, spark, tmp_path):
        # cents [1,2,3,4,10]: mean 4, devs [-3,-2,-1,0,6]
        # m2 = 50/5 = 10, m3 = 180/5 = 36, m4 = 1394/5 = 278.8
        # g1 = 36/10^1.5 = 1.13841995... -> 1.1384
        # g2 = 278.8/100 - 3 = -0.212
        _write_events(
            spark,
            tmp_path,
            [
                (i, 0, 1, "view", c / 100.0, "{}")
                for i, c in enumerate([1, 2, 3, 4, 10], start=1)
            ],
        )
        (row,) = QUERIES["stats_skew_kurtosis"](spark, str(tmp_path)).collect()
        assert row["n"] == 5
        assert row["skewness"] == 1.1384
        assert row["ex_kurtosis"] == -0.212

    def test_symmetric_sample_zero_skew(self, spark, tmp_path):
        _write_events(
            spark,
            tmp_path,
            [
                (i, 0, 1, "view", c / 100.0, "{}")
                for i, c in enumerate([1, 2, 3, 4, 5], start=1)
            ],
        )
        (row,) = QUERIES["stats_skew_kurtosis"](spark, str(tmp_path)).collect()
        assert row["skewness"] == 0.0
        # uniform {1..5}: m2 = 2, m4 = (16+1+0+1+16)/5 = 6.8
        # g2 = 6.8/4 - 3 = -1.3
        assert row["ex_kurtosis"] == -1.3


class TestSpearman:
    def test_perfect_monotone(self, spark, tmp_path):
        # values strictly increasing with time -> rho = 1.0
        _write_events(
            spark,
            tmp_path,
            [(i, 0, 1, "view", float(i), "{}") for i in range(1, 6)],
        )
        (row,) = QUERIES["stats_spearman"](spark, str(tmp_path)).collect()
        assert row["n"] == 5 and row["spearman_rho"] == 1.0

    def test_perfect_antitone(self, spark, tmp_path):
        _write_events(
            spark,
            tmp_path,
            [(i, 0, 1, "view", float(6 - i), "{}") for i in range(1, 6)],
        )
        (row,) = QUERIES["stats_spearman"](spark, str(tmp_path)).collect()
        assert row["spearman_rho"] == -1.0


class TestTrimmedMean:
    def test_outlier_dropped(self, spark, tmp_path):
        # cents [1..9, 1000]: n=10, k=1 -> drop 1 and 1000,
        # kept sum 2+..+9 = 44, n_kept 8, mean 5.5
        cents = list(range(1, 10)) + [1000]
        _write_events(
            spark,
            tmp_path,
            [
                (i, 0, 1, "view", c / 100.0, "{}")
                for i, c in enumerate(cents, start=1)
            ],
        )
        (row,) = QUERIES["stats_trimmed_mean"](spark, str(tmp_path)).collect()
        assert (row["n"], row["n_kept"], row["kept_sum"]) == (10, 8, 44)
        assert row["trimmed_mean_cents"] == 5.5


class TestRecItemCooccur:
    def test_ranking_and_cosine(self, spark, tmp_path):
        # 6 users with items {1,2}, 5 users with {1,3}:
        # co(1,2)=6, co(1,3)=5; nu: 1->11, 2->6, 3->5
        # cosine(1,2) = 6/sqrt(66) = 0.73854.. -> 0.7385
        # cosine(1,3) = 5/sqrt(55) = 0.67419.. -> 0.6741
        rows = []
        eid = 1
        for u in range(1, 7):
            for k in (1, 2):
                rows.append((eid, 0, u, "view", 0.0, '{"k": %d}' % k))
                eid += 1
        for u in range(7, 12):
            for k in (1, 3):
                rows.append((eid, 0, u, "view", 0.0, '{"k": %d}' % k))
                eid += 1
        _write_events(spark, tmp_path, rows)
        out = QUERIES["rec_item_cooccur"](spark, str(tmp_path)).collect()
        got = {(r["item_a"], r["item_b"]): r for r in out}
        assert set(got) == {(1, 2), (1, 3), (2, 1), (3, 1)}
        assert got[(1, 2)]["rnk"] == 1 and got[(1, 3)]["rnk"] == 2
        assert got[(1, 2)]["co"] == 6 and got[(1, 3)]["co"] == 5
        assert got[(1, 2)]["cosine"] == 0.7385
        assert got[(1, 3)]["cosine"] == 0.6741


class TestGraphTriangles:
    def test_single_triangle(self, spark, tmp_path):
        # users 1-3 each visit items {1,2,3} -> co(1,2)=co(1,3)=co(2,3)=3
        # user 4 visits {1,4} -> co(1,4)=1
        # n_pairs=4, sum_co=10; edge iff co*4 > 10 -> co=3 only.
        # one triangle (1,2,3); nodes 1,2,3 get 1 each, node 4 none.
        rows = []
        eid = 1
        for u in (1, 2, 3):
            for k in (1, 2, 3):
                rows.append((eid, 0, u, "view", 0.0, '{"k": %d}' % k))
                eid += 1
        for k in (1, 4):
            rows.append((eid, 0, 4, "view", 0.0, '{"k": %d}' % k))
            eid += 1
        _write_events(spark, tmp_path, rows)
        out = {
            r["node"]: r["triangles"]
            for r in QUERIES["graph_triangles"](spark, str(tmp_path)).collect()
        }
        assert out == {1: 1, 2: 1, 3: 1}


class TestFeatureLagMatrix:
    def test_lags_rolls_and_label(self, spark, tmp_path):
        _write_events(
            spark,
            tmp_path,
            [
                (1, 0, 1, "view", 1.00, "{}"),
                (2, 1, 1, "view", 2.00, "{}"),
                (3, 2, 1, "view", 4.00, "{}"),
            ],
        )
        rows = sorted(
            QUERIES["feature_lag_matrix"](spark, str(tmp_path)).collect(),
            key=lambda r: r["day"],
        )
        assert [r["spend"] for r in rows] == [100, 200, 400]
        assert [r["lag1_spend"] for r in rows] == [None, 100, 200]
        assert [r["r7_sum"] for r in rows] == [100, 300, 700]
        assert [r["r7_days"] for r in rows] == [1, 2, 3]
        assert [r["next_spend"] for r in rows] == [200, 400, None]


class TestForecastBacktest:
    def test_seasonal_vs_naive(self, spark, tmp_path):
        # daily counts: day i has i events for i in 1..8; day 9 has 5.
        # scored: day 8 (f7=1, f1=7; |8-1|=7, |8-7|=1),
        #         day 9 (f7=2, f1=8; |5-2|=3, |5-8|=3)
        # sae_seasonal=10, sae_naive=4; mae 5.0 and 2.0
        rows = []
        eid = 1
        counts = {i: i for i in range(1, 9)}
        counts[9] = 5
        for d, n in counts.items():
            for _ in range(n):
                rows.append((eid, d, 1, "view", 0.0, "{}"))
                eid += 1
        _write_events(spark, tmp_path, rows)
        (row,) = QUERIES["events_forecast_backtest"](
            spark, str(tmp_path)
        ).collect()
        assert row["n_scored"] == 2
        assert row["sae_seasonal"] == 10 and row["sae_naive"] == 4
        assert row["mae_seasonal"] == 5.0 and row["mae_naive"] == 2.0


class TestHapaxRatio:
    def test_counts_and_ratios(self, spark, tmp_path):
        # source s1: tokens a a b -> n_tokens 3, types 2, hapax 1
        # ttr = floor(2/3 * 1e4)/1e4 = 0.6666
        # herdan = ln(2)/ln(3) = 0.63092.. -> 0.6309
        _write_docs(spark, tmp_path, [(1, "a a b", "en", "s1")])
        (row,) = QUERIES["text_hapax_ratio"](spark, str(tmp_path)).collect()
        assert (row["n_tokens"], row["n_types"], row["hapax"]) == (3, 2, 1)
        assert row["hapax_ratio"] == 0.5
        assert row["ttr"] == 0.6666
        assert row["herdan_c"] == 0.6309

    def test_single_token_source_excluded(self, spark, tmp_path):
        # n_tokens = 1 -> ln(1) = 0 denominator -> row excluded
        _write_docs(
            spark, tmp_path, [(1, "only", "en", "s1"), (2, "a a b", "en", "s2")]
        )
        rows = QUERIES["text_hapax_ratio"](spark, str(tmp_path)).collect()
        assert [r["source"] for r in rows] == ["s2"]


class TestRound8Plans:
    """Physical-plan contracts for the round-8 family — the 100 TB
    shape claims in the docstrings, pinned."""

    SF = "/root/testdata/sf0.001"

    def test_skew_kurtosis_one_aggregate(self, spark):
        from easy_alterator_spark.plans.audit import formatted_plan, join_counts

        plan = formatted_plan(QUERIES["stats_skew_kurtosis"](spark, self.SF))
        jc = join_counts(plan)
        assert all(v == 0 for v in jc.values()), plan
        assert "Window" not in plan, plan

    def test_ewma_no_join_no_window(self, spark):
        # the fold happens inside a projection over per-user arrays —
        # two hash aggregates, zero joins, zero windows
        from easy_alterator_spark.plans.audit import formatted_plan, join_counts

        plan = formatted_plan(QUERIES["events_ewma_smooth"](spark, self.SF))
        jc = join_counts(plan)
        assert all(v == 0 for v in jc.values()), plan
        assert "Window" not in plan, plan

    def test_trimmed_mean_join_free(self, spark):
        from easy_alterator_spark.plans.audit import formatted_plan, join_counts

        plan = formatted_plan(QUERIES["stats_trimmed_mean"](spark, self.SF))
        jc = join_counts(plan)
        assert all(v == 0 for v in jc.values()), plan

    def test_lag_matrix_single_window_pass(self, spark):
        from easy_alterator_spark.plans.audit import formatted_plan, join_counts

        plan = formatted_plan(QUERIES["feature_lag_matrix"](spark, self.SF))
        jc = join_counts(plan)
        assert all(v == 0 for v in jc.values()), plan
        # every feature and the label come from ONE Window node (the
        # formatted plan prints each node twice: tree + detail)
        import re

        assert len(re.findall(r"\(\d+\) Window", plan)) == 1, plan

    def test_hapax_join_free(self, spark):
        from easy_alterator_spark.plans.audit import formatted_plan, join_counts

        plan = formatted_plan(QUERIES["text_hapax_ratio"](spark, self.SF))
        jc = join_counts(plan)
        assert all(v == 0 for v in jc.values()), plan

    def test_rec_cooccur_dims_broadcast_no_cartesian(self, spark):
        from easy_alterator_spark.plans.audit import formatted_plan, join_counts

        plan = formatted_plan(QUERIES["rec_item_cooccur"](spark, self.SF))
        jc = join_counts(plan)
        assert jc["CartesianProduct"] == 0, plan
        # the two item-count lookups must broadcast (dimension-sized)
        assert jc["BroadcastHashJoin"] >= 2, plan

    def test_triangles_no_cartesian(self, spark):
        # the mean-threshold is a one-row broadcast, never a cartesian
        from easy_alterator_spark.plans.audit import formatted_plan, join_counts

        plan = formatted_plan(QUERIES["graph_triangles"](spark, self.SF))
        assert join_counts(plan)["CartesianProduct"] == 0, plan

    def test_attribution_no_cartesian(self, spark):
        from easy_alterator_spark.plans.audit import formatted_plan, join_counts

        plan = formatted_plan(
            QUERIES["events_attribution_positional"](spark, self.SF)
        )
        assert join_counts(plan)["CartesianProduct"] == 0, plan

    def test_spearman_no_cartesian(self, spark):
        from easy_alterator_spark.plans.audit import formatted_plan, join_counts

        plan = formatted_plan(QUERIES["stats_spearman"](spark, self.SF))
        assert join_counts(plan)["CartesianProduct"] == 0, plan

    def test_round8_scans_prune_columns(self, spark):
        """Column pruning on every round-8 scan: dragging `props` or
        `text` into a query that never uses them is a silent 10x at
        100 TB."""
        from easy_alterator_spark.plans.audit import assert_reads_only

        cases = [
            ("stats_skew_kurtosis", "event_type", {"event_type", "value"}),
            ("stats_spearman", "value", {"value", "ts"}),
            ("events_ewma_smooth", "user_id", {"user_id", "ts", "value"}),
            (
                "events_attribution_positional",
                "event_type",
                {"user_id", "ts", "event_id", "event_type"},
            ),
            ("rec_item_cooccur", "props", {"user_id", "props"}),
            ("graph_triangles", "props", {"user_id", "props"}),
            ("feature_lag_matrix", "user_id", {"user_id", "ts", "value"}),
            ("events_forecast_backtest", "event_type", {"event_type", "ts"}),
            (
                "stats_trimmed_mean",
                "event_id",
                {"event_type", "event_id", "value"},
            ),
            ("text_hapax_ratio", "source", {"source", "text"}),
        ]
        from .util import no_pin

        # see tests/util.no_pin — the r11 subtree pins truncate the
        # printed plan; prune auditing needs the unpinned plan
        with no_pin():
            for name, marker, allowed in cases:
                assert_reads_only(
                    QUERIES[name](spark, self.SF), marker, allowed
                )


class TestSurvivalKM:
    def test_curve_and_censoring(self, spark, tmp_path):
        # u1, u3: first event day0, purchase day2 -> t=2, event
        # u2: first day0, censored at global horizon day4 -> t=4
        # KM: t=2: n=3, d=2 -> S = 1/3; t=4: n=1, d=0 -> S stays 1/3
        _write_events(
            spark,
            tmp_path,
            [
                (1, 0, 1, "view", 0.0, "{}"),
                (2, 2, 1, "purchase", 1.0, "{}"),
                (3, 0, 2, "view", 0.0, "{}"),
                (4, 4, 2, "view", 0.0, "{}"),
                (5, 0, 3, "view", 0.0, "{}"),
                (6, 2, 3, "purchase", 1.0, "{}"),
            ],
        )
        rows = {
            r["t"]: r
            for r in QUERIES["events_survival_km"](spark, str(tmp_path)).collect()
        }
        assert set(rows) == {2, 4}
        assert (rows[2]["n_risk"], rows[2]["events"]) == (3, 2)
        assert rows[2]["survival"] == 0.3333
        assert (rows[4]["n_risk"], rows[4]["events"]) == (1, 0)
        assert rows[4]["survival"] == 0.3333

    def test_exhausted_risk_set_pins_zero(self, spark, tmp_path):
        # every user purchases at t=1 -> d = n -> survival exactly 0.0
        _write_events(
            spark,
            tmp_path,
            [
                (1, 0, 1, "view", 0.0, "{}"),
                (2, 1, 1, "purchase", 1.0, "{}"),
                (3, 0, 2, "view", 0.0, "{}"),
                (4, 1, 2, "purchase", 1.0, "{}"),
            ],
        )
        (row,) = QUERIES["events_survival_km"](spark, str(tmp_path)).collect()
        assert (row["t"], row["n_risk"], row["events"]) == (1, 2, 2)
        assert row["survival"] == 0.0


class TestSourceLogOdds:
    def test_counts_lift_and_z(self, spark, tmp_path):
        import math

        # s1: "x x y", s2: "y z" -> for (s1, x): ya=2 na=3 yb=0 nb=2
        # V=3; lift = 2*2 - 0*3 = 4
        _write_docs(
            spark, tmp_path, [(1, "x x y", "en", "s1"), (2, "y z", "en", "s2")]
        )
        out = {
            (r["source"], r["term"]): r
            for r in QUERIES["text_source_log_odds"](
                spark, str(tmp_path)
            ).collect()
        }
        r = out[("s1", "x")]
        assert (r["y_source"], r["y_rest"], r["lift"], r["rnk"]) == (2, 0, 4, 1)
        delta = math.log(3 / (3 + 3 - 2 - 1)) - math.log(1 / (2 + 3 - 0 - 1))
        z = delta / math.sqrt(1 / 3 + 1 / 1)
        assert r["z_score"] == math.floor(z * 1e4 + 1e-6) / 1e4
        # y appears in both at equal count; lift negative for s1 (its
        # overall rate is lower there: 1*2 - 1*3 = -1) -> rank 2
        assert out[("s1", "y")]["lift"] == -1
        assert out[("s1", "y")]["rnk"] == 2


class TestInterarrival:
    def test_gaps_mean_cv(self, spark, tmp_path):
        # events at seconds 0, 10, 30 -> gaps 10, 20
        # mean 15.0; cv = sqrt(2*500 - 900)/30 = 10/30 -> 0.3333
        _write_events(
            spark,
            tmp_path,
            [
                (0, 0, 1, "view", 0.0, "{}"),
                (10, 0, 1, "view", 0.0, "{}"),
                (30, 0, 2, "view", 0.0, "{}"),
            ],
        )
        (row,) = QUERIES["events_interarrival"](spark, str(tmp_path)).collect()
        assert (row["n_gaps"], row["sum_gap_s"]) == (2, 30)
        assert row["mean_gap_s"] == 15.0
        assert row["cv"] == 0.3333


class TestSourceOverlap:
    def test_jaccard(self, spark, tmp_path):
        # s1 vocab {a,b,c}, s2 vocab {b,c,d} -> inter 2, union 4
        _write_docs(
            spark,
            tmp_path,
            [(1, "a b c", "en", "s1"), (2, "b c d b", "en", "s2")],
        )
        (row,) = QUERIES["corpus_source_overlap"](spark, str(tmp_path)).collect()
        assert (row["source_a"], row["source_b"]) == ("s1", "s2")
        assert (row["inter"], row["vocab_a"], row["vocab_b"]) == (2, 3, 3)
        assert row["jaccard"] == 0.5


class TestTrendingItems:
    def test_rank_shift(self, spark, tmp_path):
        # horizon day13. last-7 = days 7..13, prev-7 = days 0..6.
        # item 1: 5 now (days 8,9,10,11,13), 1 prev (day 3)
        # item 2: 2 now (days 9,10), 3 prev (days 2,3,4)
        rows, eid = [], 1
        for d in (8, 9, 10, 11, 13):
            rows.append((eid, d, 1, "view", 0.0, '{"k": 1}')); eid += 1
        rows.append((eid, 3, 1, "view", 0.0, '{"k": 1}')); eid += 1
        for d in (9, 10):
            rows.append((eid, d, 2, "view", 0.0, '{"k": 2}')); eid += 1
        for d in (2, 3, 4):
            rows.append((eid, d, 2, "view", 0.0, '{"k": 2}')); eid += 1
        _write_events(spark, tmp_path, rows)
        out = {
            r["item"]: r
            for r in QUERIES["events_trending_items"](
                spark, str(tmp_path)
            ).collect()
        }
        assert (out[1]["n_now"], out[1]["n_prev"]) == (5, 1)
        assert (out[1]["rank_now"], out[1]["rank_prev"], out[1]["rank_delta"]) \
            == (1, 2, 1)
        assert (out[2]["n_now"], out[2]["n_prev"]) == (2, 3)
        assert (out[2]["rank_now"], out[2]["rank_prev"], out[2]["rank_delta"]) \
            == (2, 1, -1)


class TestRound8bPlans:
    SF = "/root/testdata/sf0.001"

    def test_no_cartesians_anywhere(self, spark):
        from easy_alterator_spark.plans.audit import formatted_plan, join_counts

        for name in (
            "events_survival_km",
            "text_source_log_odds",
            "corpus_source_overlap",
            "events_trending_items",
        ):
            plan = formatted_plan(QUERIES[name](spark, self.SF))
            assert join_counts(plan)["CartesianProduct"] == 0, (name, plan)

    def test_interarrival_join_free(self, spark):
        from easy_alterator_spark.plans.audit import formatted_plan, join_counts

        plan = formatted_plan(QUERIES["events_interarrival"](spark, self.SF))
        assert all(v == 0 for v in join_counts(plan).values()), plan

    def test_log_odds_rollups_broadcast(self, spark):
        from easy_alterator_spark.plans.audit import formatted_plan, join_counts

        plan = formatted_plan(QUERIES["text_source_log_odds"](spark, self.SF))
        jc = join_counts(plan)
        # source totals + global one-row join must broadcast (the
        # formatted plan prints each node twice: tree + detail, so one
        # physical BNLJ node counts as 2)
        assert jc["BroadcastHashJoin"] >= 1, plan
        assert jc["BroadcastNestedLoopJoin"] <= 2, plan

    def test_batch2_scans_prune_columns(self, spark):
        from easy_alterator_spark.plans.audit import assert_reads_only

        cases = [
            ("events_survival_km", "user_id", {"user_id", "ts", "event_type"}),
            ("text_source_log_odds", "source", {"source", "text"}),
            ("events_interarrival", "event_id",
             {"event_type", "ts", "event_id"}),
            ("corpus_source_overlap", "source", {"source", "text"}),
            ("events_trending_items", "props", {"props", "ts"}),
        ]
        from .util import no_pin

        # see tests/util.no_pin — the r11 subtree pins truncate the
        # printed plan; prune auditing needs the unpinned plan
        with no_pin():
            for name, marker, allowed in cases:
                assert_reads_only(
                    QUERIES[name](spark, self.SF), marker, allowed
                )


class TestStreamEwmaTwin:
    SFD = "/root/testdata/sf0.001"

    def test_registered_twin_matches_batch(self, spark):
        got = {
            r["user_id"]: (r["n_days"], r["ewma_spend"])
            for r in QUERIES["stream_ewma_smooth"](spark, self.SFD).collect()
        }
        want = {
            r["user_id"]: (r["n_days"], r["ewma_spend"])
            for r in QUERIES["events_ewma_smooth"](spark, self.SFD).collect()
        }
        assert got == want

    def test_state_accumulates_across_micro_batches(self, spark, tmp_path):
        """The registered twin drains the single-file source in one
        micro-batch; this forces FOUR (maxFilesPerTrigger=1 over a
        4-file split) so the update-mode daily-spend state actually
        evolves across batches, then checks max(spend)-recovery + the
        shared fold still land exactly on the batch rows."""
        from pyspark.sql import functions as F

        from easy_alterator_spark.queries.featureops import (
            _cents,
            _ewma_finish,
        )
        from easy_alterator_spark.sources import load_table
        from easy_alterator_spark.streaming.events import run_to_memory

        src = f"{tmp_path}/events_split"
        ev = load_table(spark, self.SFD, "events").select(
            "user_id", "ts", "value"
        )
        ev.repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .groupBy("user_id", F.col("ts").cast("date").alias("day"))
            .agg(F.sum(_cents()).alias("spend"))
        )
        run_to_memory(
            stream, "multi_batch_ewma_sink", output_mode="update",
            state_partitions=4,
        )
        sink = spark.table("multi_batch_ewma_sink")
        # >1 micro-batch means at least one (user, day) re-emitted
        # with a strictly larger running spend
        re_emits = (
            sink.groupBy("user_id", "day")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert re_emits > 0, "split produced only one micro-batch"
        d = sink.groupBy("user_id", "day").agg(F.max("spend").alias("spend"))
        got = {
            r["user_id"]: (r["n_days"], r["ewma_spend"])
            for r in _ewma_finish(d).collect()
        }
        want = {
            r["user_id"]: (r["n_days"], r["ewma_spend"])
            for r in QUERIES["events_ewma_smooth"](spark, self.SFD).collect()
        }
        assert got == want


class TestLmDirichlet:
    def test_smoothed_score(self, spark, tmp_path):
        import math

        # doc1 "window window shuffle" matches; doc2 "cat" does not.
        # c_total=4, cf(window)=2, cf(shuffle)=1, dl(doc1)=3, mu=2000
        _write_docs(
            spark,
            tmp_path,
            [(1, "window window shuffle", "en", "s1"), (2, "cat", "en", "s1")],
        )
        (row,) = QUERIES["search_lm_dirichlet"](spark, str(tmp_path)).collect()
        assert (row["doc_id"], row["n_terms"]) == (1, 2)
        raw = math.log((2 + 2000 * 2 / 4) / (3 + 2000)) + math.log(
            (1 + 2000 * 1 / 4) / (3 + 2000)
        )
        assert row["score"] == math.floor(raw * 1e4 + 1e-6) / 1e4


class TestVolumeAlerts:
    def test_spike_and_drop(self, spark, tmp_path):
        # 7 days of 10/day, then a 40 (spike: 80 > 3*10) and a 3
        # (drop: 6 < 10; its trailing median is still 10)
        rows, eid = [], 1
        for d in range(7):
            for _ in range(10):
                rows.append((eid, d, 1, "view", 0.0, "{}")); eid += 1
        for _ in range(40):
            rows.append((eid, 7, 1, "view", 0.0, "{}")); eid += 1
        for _ in range(3):
            rows.append((eid, 8, 1, "view", 0.0, "{}")); eid += 1
        _write_events(spark, tmp_path, rows)
        out = sorted(
            QUERIES["dq_volume_alerts"](spark, str(tmp_path)).collect(),
            key=lambda r: r["day"],
        )
        assert len(out) == 2  # days 0-6 lack a full 7-day history
        spike, drop = out
        assert (spike["n"], spike["med7"], spike["spike"], spike["drop_alert"]) \
            == (40, 10, 1, 0)
        assert (drop["n"], drop["med7"], drop["spike"], drop["drop_alert"]) \
            == (3, 10, 0, 1)


class TestDegreeDistribution:
    def test_histogram_and_degenerate_slope(self, spark, tmp_path):
        # triangle fixture: edges (1,2),(1,3),(2,3) -> all degrees 2
        # -> one histogram row; regr_slope over one point is NULL
        rows, eid = [], 1
        for u in (1, 2, 3):
            for k in (1, 2, 3):
                rows.append((eid, 0, u, "view", 0.0, '{"k": %d}' % k)); eid += 1
        for k in (1, 4):
            rows.append((eid, 0, 4, "view", 0.0, '{"k": %d}' % k)); eid += 1
        _write_events(spark, tmp_path, rows)
        (row,) = QUERIES["graph_degree_distribution"](
            spark, str(tmp_path)
        ).collect()
        assert (row["degree"], row["n_nodes"]) == (2, 3)
        assert row["slope"] is None


class TestGrowthAccounting:
    def test_states_and_churn(self, spark, tmp_path):
        # weeks w0..w2 (Mondays). u1 active w0,w1,w2; u2 active w0
        # only; u3 active w0,w2 (gap week -> resurrected at w2).
        # w0: new 3; w1: retained 1 (u1), churned 2 (u2, u3)
        # w2: retained 1 (u1), resurrected 1 (u3), churned 0
        # T0 = 2026-01-01 (Thursday); week starts 2025-12-29.
        rows = [
            (1, 0, 1, "view", 0.0, "{}"),
            (2, 7, 1, "view", 0.0, "{}"),
            (3, 14, 1, "view", 0.0, "{}"),
            (4, 0, 2, "view", 0.0, "{}"),
            (5, 0, 3, "view", 0.0, "{}"),
            (6, 14, 3, "view", 0.0, "{}"),
        ]
        _write_events(spark, tmp_path, rows)
        out = sorted(
            QUERIES["events_growth_accounting"](spark, str(tmp_path)).collect(),
            key=lambda r: r["week"],
        )
        w0, w1, w2 = out
        assert (w0["new_users"], w0["retained"], w0["resurrected"],
                w0["churned"]) == (3, 0, 0, 0)
        assert w0["quick_ratio"] is None
        assert (w1["new_users"], w1["retained"], w1["resurrected"],
                w1["churned"]) == (0, 1, 0, 2)
        assert w1["quick_ratio"] == 0.0
        assert (w2["new_users"], w2["retained"], w2["resurrected"],
                w2["churned"]) == (0, 1, 1, 0)
        # identity: actives(w) = new + retained + resurrected
        assert w2["new_users"] + w2["retained"] + w2["resurrected"] == 2


class TestDailyPercentiles:
    def test_exact_order_statistics(self, spark, tmp_path):
        # one day, cents 1..20: n=20 -> p50 rank ceil(20/2)=10,
        # p95 rank ceil(19)=19, p99 rank ceil(19.8)=20
        _write_events(
            spark,
            tmp_path,
            [
                (i, 0, 1, "view", c / 100.0, "{}")
                for i, c in enumerate(range(1, 21), start=1)
            ],
        )
        (row,) = QUERIES["events_daily_percentiles"](
            spark, str(tmp_path)
        ).collect()
        assert (row["n"], row["p50"], row["p95"], row["p99"]) == (20, 10, 19, 20)

    def test_single_row_day(self, spark, tmp_path):
        _write_events(spark, tmp_path, [(1, 0, 1, "view", 0.42, "{}")])
        (row,) = QUERIES["events_daily_percentiles"](
            spark, str(tmp_path)
        ).collect()
        assert (row["n"], row["p50"], row["p95"], row["p99"]) == (1, 42, 42, 42)


class TestRound8cPlans:
    SF = "/root/testdata/sf0.001"

    def test_batch34_no_cartesians(self, spark):
        from easy_alterator_spark.plans.audit import formatted_plan, join_counts

        for name in (
            "search_lm_dirichlet",
            "graph_degree_distribution",
            "events_growth_accounting",
        ):
            plan = formatted_plan(QUERIES[name](spark, self.SF))
            assert join_counts(plan)["CartesianProduct"] == 0, (name, plan)

    def test_volume_alerts_and_percentiles_join_free(self, spark):
        from easy_alterator_spark.plans.audit import formatted_plan, join_counts

        for name in ("dq_volume_alerts", "events_daily_percentiles"):
            plan = formatted_plan(QUERIES[name](spark, self.SF))
            assert all(v == 0 for v in join_counts(plan).values()), (name, plan)

    def test_batch34_scans_prune_columns(self, spark):
        from easy_alterator_spark.plans.audit import assert_reads_only

        cases = [
            ("search_lm_dirichlet", "doc_id", {"doc_id", "text"}),
            ("dq_volume_alerts", "event_type", {"event_type", "ts"}),
            ("graph_degree_distribution", "props", {"user_id", "props"}),
            ("events_growth_accounting", "user_id", {"user_id", "ts"}),
            (
                "events_daily_percentiles",
                "event_id",
                {"event_id", "ts", "value"},
            ),
        ]
        from .util import no_pin

        # see tests/util.no_pin — the r11 subtree pins truncate the
        # printed plan; prune auditing needs the unpinned plan
        with no_pin():
            for name, marker, allowed in cases:
                assert_reads_only(
                    QUERIES[name](spark, self.SF), marker, allowed
                )


class TestCramersV:
    def test_perfect_association(self, spark, tmp_path):
        # 2x2 with perfect association and equal margins: chi2 = n,
        # V = sqrt(chi2 / (n * min(r-1, c-1))) = 1.0
        rows = []
        eid = 1
        for _ in range(10):
            rows.append((eid, 0, 1, "view", 0.0, '{"k": 1}')); eid += 1
        for _ in range(10):
            rows.append((eid, 0, 1, "click", 0.0, '{"k": 2}')); eid += 1
        _write_events(spark, tmp_path, rows)
        (row,) = QUERIES["stats_cramers_v"](spark, str(tmp_path)).collect()
        assert (row["n"], row["nr"], row["nc"], row["dof"]) == (20, 2, 2, 1)
        assert row["chi2"] == 20.0
        assert row["cramers_v"] == 1.0

    def test_independence_gives_zero(self, spark, tmp_path):
        # uniform 2x2: every cell o = E -> chi2 = 0, V = 0
        rows = []
        eid = 1
        for et in ("view", "click"):
            for k in (1, 2):
                for _ in range(5):
                    rows.append((eid, 0, 1, et, 0.0, '{"k": %d}' % k))
                    eid += 1
        _write_events(spark, tmp_path, rows)
        (row,) = QUERIES["stats_cramers_v"](spark, str(tmp_path)).collect()
        assert row["chi2"] == 0.0 and row["cramers_v"] == 0.0


class TestJsDivergence:
    def test_identical_sources_zero(self, spark, tmp_path):
        _write_docs(
            spark, tmp_path,
            [(1, "a b c", "en", "s1"), (2, "a b c", "en", "s2")],
        )
        (row,) = QUERIES["corpus_js_divergence"](spark, str(tmp_path)).collect()
        assert row["js_divergence"] == 0.0

    def test_disjoint_sources_ln2(self, spark, tmp_path):
        import math

        # disjoint vocabularies -> JS = ln(2) exactly (in nats)
        _write_docs(
            spark, tmp_path,
            [(1, "a a b", "en", "s1"), (2, "c d", "en", "s2")],
        )
        (row,) = QUERIES["corpus_js_divergence"](spark, str(tmp_path)).collect()
        want = math.floor(
            math.floor(math.log(2) * 1e12) / 1e12 * 1e4 + 1e-6
        ) / 1e4
        assert row["js_divergence"] == want  # 0.6931

    def test_half_overlap_hand_value(self, spark, tmp_path):
        import math

        # s1 = {a}, s2 = {a: 1/2, b: 1/2}:
        # JS = 0.5*1*ln(1/0.75) + 0.5*(0.5*ln(0.5/0.75) + 0.5*ln(0.5/0.25))
        _write_docs(
            spark, tmp_path,
            [(1, "a a", "en", "s1"), (2, "a b", "en", "s2")],
        )
        (row,) = QUERIES["corpus_js_divergence"](spark, str(tmp_path)).collect()
        t_a = math.floor(
            (0.5 * 1.0 * math.log(1.0 / 0.75)
             + 0.5 * 0.5 * math.log(0.5 / 0.75)) * 1e12
        )
        t_b = math.floor((0.5 * 0.5 * math.log(0.5 / 0.25)) * 1e12)
        want = math.floor((t_a + t_b) / 1e12 * 1e4 + 1e-6) / 1e4
        assert row["js_divergence"] == want


class TestRankStabilityRbo:
    def test_identical_rankings_give_one(self, spark, tmp_path):
        # same 3 items, same order, both weeks -> every depth overlaps
        # fully; truncated RBO@20 with 3 of 20 slots filled equals
        # (1-p) * sum_{m=1..3} W[m] ... computed from the same integer
        # weights the query uses
        from easy_alterator_spark.queries.featureops import _RBO_W15

        rows, eid = [], 1
        # current week days 8..13; prev week days 1..6 (horizon day 13)
        for d, mult in ((10, 1), (3, 1)):
            for item, cnt in ((1, 3), (2, 2), (3, 1)):
                for _ in range(cnt * mult):
                    rows.append((eid, d, 1, "view", 0.0, '{"k": %d}' % item))
                    eid += 1
        rows.append((eid, 13, 1, "view", 0.0, '{"k": 1}'))
        _write_events(spark, tmp_path, rows)
        (row,) = QUERIES["events_rank_stability_rbo"](
            spark, str(tmp_path)
        ).collect()
        assert row["n_common"] == 3
        want = 0.1 * (_RBO_W15[0] + _RBO_W15[1] + _RBO_W15[2]) / 1e15
        assert row["rbo"] == want

    def test_disjoint_rankings_give_zero_rows(self, spark, tmp_path):
        rows, eid = [], 1
        for _ in range(3):
            rows.append((eid, 10, 1, "view", 0.0, '{"k": 1}')); eid += 1
        for _ in range(3):
            rows.append((eid, 3, 1, "view", 0.0, '{"k": 2}')); eid += 1
        rows.append((eid, 13, 1, "view", 0.0, '{"k": 1}'))
        _write_events(spark, tmp_path, rows)
        (row,) = QUERIES["events_rank_stability_rbo"](
            spark, str(tmp_path)
        ).collect()
        assert row["n_common"] == 0
        assert row["rbo"] is None or row["rbo"] == 0.0


class TestRound8dPlans:
    SF = "/root/testdata/sf0.001"

    def test_batch5_no_cartesians(self, spark):
        # the dimension/one-row cross joins must plan as broadcast
        # nested loops, never CartesianProduct
        from easy_alterator_spark.plans.audit import formatted_plan, join_counts

        for name in (
            "stats_cramers_v",
            "corpus_js_divergence",
            "events_rank_stability_rbo",
        ):
            plan = formatted_plan(QUERIES[name](spark, self.SF))
            assert join_counts(plan)["CartesianProduct"] == 0, (name, plan)

    def test_batch5_scans_prune_columns(self, spark):
        from easy_alterator_spark.plans.audit import assert_reads_only

        cases = [
            ("stats_cramers_v", "props", {"event_type", "props"}),
            ("corpus_js_divergence", "source", {"source", "text"}),
            ("events_rank_stability_rbo", "props", {"props", "ts"}),
        ]
        from .util import no_pin

        # see tests/util.no_pin — the r11 subtree pins truncate the
        # printed plan; prune auditing needs the unpinned plan
        with no_pin():
            for name, marker, allowed in cases:
                assert_reads_only(
                    QUERIES[name](spark, self.SF), marker, allowed
                )


class TestMarkovBacktest:
    def test_temporal_split_and_argmax(self, spark, tmp_path):
        # horizon = day 11 -> train: successor day <= 4, test: > 4.
        # train pairs: view->click x2, click->view x2
        #   -> pred[view] = click, pred[click] = view
        # test pairs: (view->view d5) miss, (view->click d8) hit,
        #   (click->view d9) hit, (view->view d10) miss,
        #   (view->error d11) miss
        days_types = [
            (0, "view"), (1, "click"), (2, "view"), (3, "click"),
            (4, "view"), (5, "view"), (8, "click"), (9, "view"),
            (10, "view"), (11, "error"),
        ]
        _write_events(
            spark,
            tmp_path,
            [
                (i, d, 1, et, 0.0, "{}")
                for i, (d, et) in enumerate(days_types, start=1)
            ],
        )
        out = {
            r["prev_type"]: r
            for r in QUERIES["events_markov_backtest"](
                spark, str(tmp_path)
            ).collect()
        }
        assert set(out) == {"view", "click"}
        v = out["view"]
        assert (v["pred_type"], v["n_test"], v["hits"]) == ("click", 4, 1)
        assert v["accuracy"] == 0.25
        c = out["click"]
        assert (c["pred_type"], c["n_test"], c["hits"]) == ("view", 1, 1)
        assert c["accuracy"] == 1.0


class TestBrownForsythe:
    def test_hand_computed_f(self, spark, tmp_path):
        # group A cents [1,2,3] (median 2): z = [2,0,2]
        # group B cents [1,5,9] (median 5): z = [8,0,8]
        # s1: A=4, B=16; s2: A=8, B=128
        # SSW = (8 - 16/3) + (128 - 256/3) = 8/3 + 128/3 = 136/3
        # SSB = 16/3 + 256/3 - (20^2)/6 = 272/3 - 200/3 = 24
        # F = (SSB/SSW) * (N-k)/(k-1) = (24/(136/3)) * 4 = 2.1176..
        rows = (
            [(i, 0, 1, "view", c / 100.0, "{}")
             for i, c in enumerate([1, 2, 3], start=1)]
            + [(i, 0, 1, "click", c / 100.0, "{}")
               for i, c in enumerate([1, 5, 9], start=4)]
        )
        _write_events(spark, tmp_path, rows)
        (row,) = QUERIES["stats_brown_forsythe"](spark, str(tmp_path)).collect()
        assert (row["k"], row["n_total"]) == (2, 6)
        # with the 1e-3 grid: w3 = floor(8/3*1000)=2666, floor(128/3*1000)
        # = 42666 -> ssw3 = 45332; b3 = floor(16/3*1000)=5333 +
        # floor(256/3*1000)=85333 -> 90666; global term floor(400/6*1000)
        # = 66666 -> ssb3 = 24000
        # F = 24000/45332 * 4 = 2.11769... -> 2.1176
        import math
        f = 24000 / 45332 * 4
        assert row["f_stat"] == math.floor(f * 1e4 + 1e-6) / 1e4

    def test_equal_spreads_near_zero(self, spark, tmp_path):
        # identical distributions in both groups -> SSB = 0 -> F = 0
        rows = (
            [(i, 0, 1, "view", c / 100.0, "{}")
             for i, c in enumerate([1, 2, 3], start=1)]
            + [(i, 0, 1, "click", c / 100.0, "{}")
               for i, c in enumerate([1, 2, 3], start=4)]
        )
        _write_events(spark, tmp_path, rows)
        (row,) = QUERIES["stats_brown_forsythe"](spark, str(tmp_path)).collect()
        assert row["f_stat"] == 0.0
