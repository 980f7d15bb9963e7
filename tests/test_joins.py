"""Bucketized non-equi joins (operators/joins.py): value tests on
constructed edges plus the plan contract that bans the nested loop."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    from easy_alterator_spark.queries import QUERIES, load_all

    load_all()
    return QUERIES


class TestRangeJoinBucketed:
    def _run(self, spark, points, ranges, width):
        from easy_alterator_spark.operators.joins import range_join_bucketed

        p = spark.createDataFrame(points, "pid long, v double")
        r = spark.createDataFrame(ranges, "rid long, lo double, hi double")
        out = range_join_bucketed(p, r, "v", "lo", "hi", bucket_width=width)
        return {(row["pid"], row["rid"]) for row in out.collect()}

    def test_inclusive_bounds_both_ends(self, spark):
        got = self._run(
            spark,
            [(1, 10.0), (2, 20.0), (3, 9.999), (4, 20.001)],
            [(7, 10.0, 20.0)],
            width=4.0,
        )
        assert got == {(1, 7), (2, 7)}

    def test_negative_values_floor_division(self, spark):
        # floor(-0.1/4) = -1, not 0 — a truncating div would lose this
        got = self._run(
            spark, [(1, -0.1), (2, -7.9)], [(7, -8.0, -0.05)], width=4.0
        )
        assert got == {(1, 7), (2, 7)}

    def test_inverted_interval_matches_nothing(self, spark):
        assert self._run(spark, [(1, 5.0)], [(7, 9.0, 1.0)], width=4.0) == set()

    def test_wide_interval_no_duplicate_pairs(self, spark):
        # interval spans 26 buckets; the point owns exactly one, so
        # the pair must appear exactly once
        from easy_alterator_spark.operators.joins import range_join_bucketed

        p = spark.createDataFrame([(1, 50.0)], "pid long, v double")
        r = spark.createDataFrame([(7, 0.0, 100.0)], "rid long, lo double, hi double")
        rows = range_join_bucketed(p, r, "v", "lo", "hi", bucket_width=4.0).collect()
        assert len(rows) == 1

    def test_matches_brute_force_on_random_data(self, spark):
        import random

        rnd = random.Random(42)
        points = [(i, round(rnd.uniform(-100, 100), 3)) for i in range(200)]
        ranges = []
        for i in range(60):
            lo = round(rnd.uniform(-100, 100), 3)
            ranges.append((i, lo, round(lo + rnd.uniform(0, 40), 3)))
        expect = {
            (pid, rid)
            for pid, v in points
            for rid, lo, hi in ranges
            if lo <= v <= hi
        }
        assert self._run(spark, points, ranges, width=7.0) == expect


class TestIntervalOverlapJoin:
    def _run(self, spark, left, right, width):
        from easy_alterator_spark.operators.joins import interval_overlap_join

        ldf = spark.createDataFrame(left, "lid long, llo double, lhi double")
        rdf = spark.createDataFrame(right, "rid long, rlo double, rhi double")
        out = interval_overlap_join(ldf, rdf, "llo", "lhi", "rlo", "rhi", width)
        rows = out.collect()
        pairs = [(r["lid"], r["rid"]) for r in rows]
        assert len(pairs) == len(set(pairs)), "emit-once guard violated"
        return set(pairs)

    def test_many_shared_buckets_emit_once(self, spark):
        # both intervals span 25+ shared buckets -> exactly one row
        got = self._run(
            spark, [(1, 0.0, 100.0)], [(2, 5.0, 95.0)], width=4.0
        )
        assert got == {(1, 2)}

    def test_touching_endpoints_count_as_overlap(self, spark):
        got = self._run(spark, [(1, 0.0, 10.0)], [(2, 10.0, 20.0)], width=4.0)
        assert got == {(1, 2)}

    def test_disjoint_same_bucket_rejected(self, spark):
        # both fall in bucket 0 but don't overlap
        got = self._run(spark, [(1, 0.0, 1.0)], [(2, 2.0, 3.0)], width=100.0)
        assert got == set()

    def test_matches_brute_force_on_random_data(self, spark):
        import random

        rnd = random.Random(7)

        def mk(n):
            out = []
            for i in range(n):
                lo = round(rnd.uniform(-50, 50), 3)
                out.append((i, lo, round(lo + rnd.uniform(0, 30), 3)))
            return out

        left, right = mk(80), mk(80)
        expect = {
            (a, b)
            for a, alo, ahi in left
            for b, blo, bhi in right
            if alo <= bhi and blo <= ahi
        }
        assert self._run(spark, left, right, width=9.0) == expect

    def test_column_name_clash_rejected_up_front(self, spark):
        import pytest

        from easy_alterator_spark.operators.joins import interval_overlap_join

        ldf = spark.createDataFrame([(1, 0.0, 1.0)], "id long, lo double, hi double")
        rdf = spark.createDataFrame([(2, 0.0, 1.0)], "id long, rlo double, rhi double")
        with pytest.raises(ValueError, match="disjoint.*id"):
            interval_overlap_join(ldf, rdf, "lo", "hi", "rlo", "rhi", 1.0)


class TestRangeJoinPlan:
    def test_no_nested_loop_no_cartesian(self, spark, queries):
        from easy_alterator_spark.plans.audit import formatted_plan

        plan = formatted_plan(queries["join_range_bucketed"](spark, SF))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


class TestAsofJoinBackward:
    def _run(self, spark, probes, versions, **kw):
        from easy_alterator_spark.operators.joins import asof_join_backward

        l = spark.createDataFrame(probes, "k long, t timestamp, pid long")
        r = spark.createDataFrame(versions, "k long, vt timestamp, state string, ver long")
        out = asof_join_backward(
            l, r, on="k", left_ts="t", right_ts="vt",
            value_cols=kw.pop("value_cols", ["state"]), **kw
        )
        return {row["pid"]: tuple(row[c] for c in out.columns[3:]) for row in out.collect()}

    def test_latest_predecessor_wins_and_inclusive(self, spark):
        import datetime as dt

        T = dt.datetime
        versions = [
            (1, T(2024, 1, 1), "a", 1),
            (1, T(2024, 1, 5), "b", 2),
            (1, T(2024, 1, 9), "c", 3),
        ]
        probes = [
            (1, T(2024, 1, 4), 100),   # after a, before b -> a
            (1, T(2024, 1, 5), 101),   # exactly at b -> b (inclusive)
            (1, T(2024, 1, 30), 102),  # after all -> c
            (1, T(2023, 1, 1), 103),   # before all -> NULL
            (2, T(2024, 1, 4), 104),   # key with no versions -> NULL
        ]
        got = self._run(spark, probes, versions)
        assert got == {100: ("a",), 101: ("b",), 102: ("c",), 103: (None,), 104: (None,)}

    def test_multiple_value_cols_carried_together(self, spark):
        import datetime as dt

        T = dt.datetime
        got = self._run(
            spark,
            [(1, T(2024, 2, 1), 100)],
            [(1, T(2024, 1, 1), "a", 7)],
            value_cols=["state", "ver"],
        )
        assert got == {100: ("a", 7)}

    def test_same_instant_versions_tiebreak(self, spark):
        import datetime as dt

        T = dt.datetime
        versions = [(1, T(2024, 1, 1), "first", 1), (1, T(2024, 1, 1), "second", 2)]
        got = self._run(
            spark,
            [(1, T(2024, 1, 2), 100)],
            versions,
            value_cols=["state", "ver"],
            right_tiebreak="ver",
        )
        assert got == {100: ("second", 2)}

    def test_backward_tolerance_nulls_out_stale_versions(self, spark):
        """r7: tolerance_seconds in the BACKWARD direction — a version
        older than the tolerance window is too stale to carry."""
        import datetime as dt

        T = dt.datetime
        versions = [(1, T(2024, 1, 1), "a", 1)]
        probes = [
            (1, T(2024, 1, 1, 0, 30), 100),  # 30 min later -> in reach
            (1, T(2024, 1, 2), 101),         # a day later -> stale
        ]
        got = self._run(
            spark, probes, versions, tolerance_seconds=3600.0
        )
        assert got == {100: ("a",), 101: (None,)}

    def test_reserved_vt_value_col_rejected(self, spark):
        import datetime as dt

        import pytest

        T = dt.datetime
        from easy_alterator_spark.operators.joins import asof_join_backward

        l = spark.createDataFrame([(1, T(2024, 1, 1), 1)], "k long, t timestamp, pid long")
        r = spark.createDataFrame([(1, T(2024, 1, 1), "a")], "k long, vt timestamp, __vt string")
        with pytest.raises(ValueError, match="__vt"):
            asof_join_backward(
                l, r, on="k", left_ts="t", right_ts="vt", value_cols=["__vt"]
            )

    def test_matches_brute_force_random(self, spark):
        import datetime as dt
        import random

        T0 = dt.datetime(2024, 1, 1)
        rnd = random.Random(9)
        versions = [
            (rnd.randint(1, 5), T0 + dt.timedelta(hours=rnd.randint(0, 500)), f"s{i}", i)
            for i in range(60)
        ]
        probes = [
            (rnd.randint(1, 6), T0 + dt.timedelta(hours=rnd.randint(0, 500)), i)
            for i in range(120)
        ]
        expect = {}
        for k, t, pid in probes:
            cands = [(vt, ver, st) for vk, vt, st, ver in versions if vk == k and vt <= t]
            expect[pid] = (max(cands)[2], max(cands)[1]) if cands else (None, None)
        got = self._run(
            spark, probes, versions, value_cols=["state", "ver"], right_tiebreak="ver"
        )
        assert got == expect


class TestAsofJoinForward:
    def _run(self, spark, probes, versions, **kw):
        from easy_alterator_spark.operators.joins import asof_join_forward

        l = spark.createDataFrame(probes, "k long, t timestamp, pid long")
        r = spark.createDataFrame(
            versions, "k long, vt timestamp, state string, ver long"
        )
        out = asof_join_forward(
            l, r, on="k", left_ts="t", right_ts="vt",
            value_cols=kw.pop("value_cols", ["state"]), **kw
        )
        return {
            row["pid"]: tuple(row[c] for c in out.columns[3:])
            for row in out.collect()
        }

    def test_earliest_successor_wins_and_inclusive(self, spark):
        import datetime as dt

        T = dt.datetime
        versions = [
            (1, T(2024, 1, 1), "a", 1),
            (1, T(2024, 1, 5), "b", 2),
            (1, T(2024, 1, 9), "c", 3),
        ]
        probes = [
            (1, T(2024, 1, 4), 100),   # before b -> b
            (1, T(2024, 1, 5), 101),   # exactly at b -> b (inclusive)
            (1, T(2023, 1, 1), 102),   # before all -> a
            (1, T(2024, 1, 30), 103),  # after all -> NULL
            (2, T(2024, 1, 4), 104),   # key with no versions -> NULL
        ]
        got = self._run(spark, probes, versions)
        assert got == {
            100: ("b",), 101: ("b",), 102: ("a",), 103: (None,), 104: (None,)
        }

    def test_tolerance_nulls_out_far_successors(self, spark):
        import datetime as dt

        T = dt.datetime
        versions = [(1, T(2024, 1, 10), "far", 1)]
        probes = [(1, T(2024, 1, 1), 100), (1, T(2024, 1, 9), 101)]
        got = self._run(
            spark, probes, versions,
            value_cols=["state", "ver"],
            tolerance_seconds=2 * 86400,
        )
        assert got == {100: (None, None), 101: ("far", 1)}

    def test_same_instant_versions_earliest_tiebreak(self, spark):
        import datetime as dt

        T = dt.datetime
        versions = [
            (1, T(2024, 1, 5), "second", 2),
            (1, T(2024, 1, 5), "first", 1),
        ]
        got = self._run(
            spark,
            [(1, T(2024, 1, 2), 100)],
            versions,
            value_cols=["state", "ver"],
            right_tiebreak="ver",
        )
        assert got == {100: ("first", 1)}

    def test_matches_brute_force_random(self, spark):
        import datetime as dt
        import random

        T0 = dt.datetime(2024, 1, 1)
        rnd = random.Random(11)
        versions = [
            (rnd.randint(1, 5), T0 + dt.timedelta(hours=rnd.randint(0, 500)), f"s{i}", i)
            for i in range(60)
        ]
        probes = [
            (rnd.randint(1, 6), T0 + dt.timedelta(hours=rnd.randint(0, 500)), i)
            for i in range(120)
        ]
        tol = 100 * 3600.0
        expect = {}
        for k, t, pid in probes:
            cands = [
                (vt, ver, st)
                for vk, vt, st, ver in versions
                if vk == k and vt >= t and (vt - t).total_seconds() <= tol
            ]
            expect[pid] = (
                (min(cands)[2], min(cands)[1]) if cands else (None, None)
            )
        got = self._run(
            spark, probes, versions,
            value_cols=["state", "ver"],
            right_tiebreak="ver",
            tolerance_seconds=tol,
        )
        assert got == expect
