"""Pareto frontier (operators/sampling.py::pareto_frontier_2d) and
its global_prefix_max building block: brute-force dominance check on
constructed + randomized data, tie semantics, and the plan contract
that the only global window runs over partition-count rows."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _brute_frontier(points):
    out = []
    for i, (a, b) in enumerate(points):
        dominated = any(
            (ea >= a and eb >= b and (ea > a or eb > b))
            for j, (ea, eb) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((a, b))
    return sorted(out)


class TestGlobalPrefixMax:
    def test_exclusive_running_max_desc(self, spark):
        from easy_alterator_spark.operators.rank import global_prefix_max

        df = spark.createDataFrame(
            [(5, 10.0), (4, 30.0), (3, 20.0), (2, 40.0), (1, 5.0)], "k int, v double"
        )
        got = {
            r["k"]: r["pm"]
            for r in global_prefix_max(
                df, [F.col("k").desc()], "v", "pm", num_partitions=3
            ).collect()
        }
        assert got == {5: None, 4: 10.0, 3: 30.0, 2: 30.0, 1: 40.0}

    def test_matches_sequential_scan_random(self, spark):
        from easy_alterator_spark.operators.rank import global_prefix_max

        rnd = random.Random(3)
        rows = [(i, rnd.uniform(0, 100)) for i in range(500)]
        rnd.shuffle(rows)
        got = {
            r["k"]: r["pm"]
            for r in global_prefix_max(
                spark.createDataFrame(rows, "k int, v double"),
                [F.col("k").desc()],
                "v",
                "pm",
                num_partitions=8,
            ).collect()
        }
        vals = dict(rows)
        run = None
        for k in sorted(vals, reverse=True):
            assert got[k] == run
            run = vals[k] if run is None else max(run, vals[k])


class TestParetoFrontier:
    def _run(self, spark, points, parts=4):
        from easy_alterator_spark.operators.sampling import pareto_frontier_2d

        df = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(points)],
            "id long, a double, b double",
        )
        rows = pareto_frontier_2d(df, "a", "b", num_partitions=parts).collect()
        return sorted((r["a"], r["b"]) for r in rows)

    def test_simple_staircase(self, spark):
        pts = [(1, 9), (2, 7), (3, 5), (2, 6), (1, 1), (3, 4)]
        assert self._run(spark, pts) == _brute_frontier(pts) == [(1, 9), (2, 7), (3, 5)]

    def test_ties_on_both_dims_all_survive(self, spark):
        # two identical maximal points: neither dominates the other
        pts = [(5, 5), (5, 5), (1, 1)]
        assert self._run(spark, pts) == [(5.0, 5.0), (5.0, 5.0)]

    def test_equal_a_lower_b_dominated(self, spark):
        pts = [(5, 5), (5, 4)]
        assert self._run(spark, pts) == [(5.0, 5.0)]

    def test_equal_b_lower_a_dominated(self, spark):
        pts = [(5, 5), (4, 5)]
        assert self._run(spark, pts) == [(5.0, 5.0)]

    def test_matches_brute_force_random(self, spark):
        rnd = random.Random(11)
        # coarse grid so ties and shared a-values actually occur
        pts = [(rnd.randint(0, 30), rnd.randint(0, 30)) for _ in range(400)]
        got = self._run(spark, pts, parts=8)
        expect = sorted(
            [(float(a), float(b)) for a, b in pts if (a, b) in set(_brute_frontier(pts))]
        )
        assert got == expect

    def test_anticorrelated_worst_case_all_on_frontier(self, spark):
        pts = [(i, 100 - i) for i in range(50)]
        assert self._run(spark, pts) == [(float(a), float(b)) for a, b in pts]


class TestParetoPlanShape:
    def test_single_partition_exchange_only_for_offsets(self, spark):
        """The staircase must not fall back to a data-sized global
        window: the only Exchange SinglePartition in the plan feeds
        the one-row-per-partition offsets window, and the data-sized
        relation reaches no empty-partition Window."""
        from easy_alterator_spark.operators.sampling import pareto_frontier_2d
        from easy_alterator_spark.plans.audit import formatted_plan

        df = spark.range(1000).select(
            (F.col("id") % 97).alias("a"), (F.col("id") % 31).cast("double").alias("b")
        )
        plan = formatted_plan(pareto_frontier_2d(df, "a", "b"))
        assert plan.count("SinglePartition") == 1
        # the range shuffle of the group table now executes inside the
        # pinned materialization (rank._range_tagged localCheckpoint,
        # round 9) so the visible plan starts at the checkpointed RDD
        # carrying the __pid tag instead of showing rangepartitioning
        assert "ExistingRDD" in plan and "__pid" in plan
