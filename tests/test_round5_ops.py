"""Round-5 operators: forward as-of join query wiring, k-means
assignment/refinement determinism, partition checksums, and the
drift-gate NULL verdict.

Value-level semantics on constructed rows; engine-vs-DuckDB parity
for the registered queries runs in test_queries_oracle.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    from easy_alterator_spark.queries import QUERIES, load_all

    load_all()
    return QUERIES


class TestNearestAssign:
    def test_ties_go_to_lowest_centroid_id(self, spark):
        from easy_alterator_spark.operators.similarity import nearest_assign

        # v equidistant (same cosine) from both centroids
        vecs = spark.createDataFrame(
            [(10, [1.0, 1.0])], "vec_id long, embedding array<double>"
        )
        cents = spark.createDataFrame(
            [(5, [1.0, 0.0]), (2, [0.0, 1.0])],
            "c_id long, cv array<double>",
        )
        got = nearest_assign(vecs, cents).collect()
        assert [(r["v_id"], r["bucket"]) for r in got] == [(10, 2)]

    def test_keep_vec_carries_the_vector(self, spark):
        from easy_alterator_spark.operators.similarity import nearest_assign

        vecs = spark.createDataFrame(
            [(1, [0.9, 0.1])], "vec_id long, embedding array<double>"
        )
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0])], "c_id long, cv array<double>"
        )
        (row,) = nearest_assign(vecs, cents, keep_vec=True).collect()
        assert row["bucket"] == 0 and list(row["vv"]) == [0.9, 0.1]


class TestRefineCentroidsRounding:
    def test_mean_decimals_snaps_centroid_values(self, spark):
        from easy_alterator_spark.operators.similarity import refine_centroids

        # one bucket; mean of dim0 = (0.1234567 + 0.1234569)/2 = 0.1234568
        vecs = spark.createDataFrame(
            [(1, [0.1234567, 1.0]), (2, [0.1234569, 1.0])],
            "vec_id long, embedding array<double>",
        )
        cents = spark.createDataFrame(
            [(0, [0.5, 1.0])], "c_id long, cv array<double>"
        )
        (row,) = refine_centroids(
            vecs, cents, iters=1, mean_decimals=6
        ).collect()
        assert row["cv"][0] == 0.123457  # rounded to 6 decimals
        assert row["cv"][1] == 1.0


class TestPartitionChecksum:
    def test_checksum_is_order_and_partitioning_independent(self, spark):
        from easy_alterator_spark.operators.corpus_diff import (
            partition_checksum,
        )

        rows = [(i, f"s{i % 3}") for i in range(40)]
        a = spark.createDataFrame(rows, "id long, s string")
        b = spark.createDataFrame(list(reversed(rows)), "id long, s string").repartition(7)
        part = F.col("id") % 2
        ca = {r["part"]: (r["n_rows"], r["checksum"])
              for r in partition_checksum(a, part, ["id", "s"]).collect()}
        cb = {r["part"]: (r["n_rows"], r["checksum"])
              for r in partition_checksum(b, part, ["id", "s"]).collect()}
        assert ca == cb and set(ca) == {0, 1}

    def test_single_row_change_flips_exactly_one_partition(self, spark):
        from easy_alterator_spark.operators.corpus_diff import (
            partition_checksum,
        )

        rows = [(i, "x") for i in range(10)]
        a = spark.createDataFrame(rows, "id long, s string")
        changed = [(i, "y" if i == 4 else "x") for i in range(10)]
        b = spark.createDataFrame(changed, "id long, s string")
        part = F.col("id") % 2
        ca = {r["part"]: r["checksum"]
              for r in partition_checksum(a, part, ["id", "s"]).collect()}
        cb = {r["part"]: r["checksum"]
              for r in partition_checksum(b, part, ["id", "s"]).collect()}
        assert ca[1] == cb[1]  # odd partition untouched
        assert ca[0] != cb[0]  # id=4 lives in the even partition


class TestKhopReachability:
    def _run(self, spark, edges, seeds, hops):
        from easy_alterator_spark.operators.graph import khop_reachability

        e = spark.createDataFrame(edges, "doc_id_a long, doc_id_b long")
        s = spark.createDataFrame([(x,) for x in seeds], "node long")
        return {
            r["node"]: r["min_hop"]
            for r in khop_reachability(e, s, hops).collect()
        }

    def test_path_graph_layers_and_cutoff(self, spark):
        # 1-2-3-4-5 path, seed 1, 3 hops: node 5 is out of reach
        edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
        got = self._run(spark, edges, [1], 3)
        assert got == {1: 0, 2: 1, 3: 2, 4: 3}

    def test_shortest_path_wins_on_rereach(self, spark):
        # diamond: 1-2-4 and 1-3-4 plus long way 2-5-6-4; node 4 is hop 2
        edges = [(1, 2), (1, 3), (2, 4), (3, 4), (2, 5), (5, 6), (6, 4)]
        got = self._run(spark, edges, [1], 3)
        assert got[4] == 2  # not 3 via the long way

    def test_undirected_and_multi_seed(self, spark):
        edges = [(10, 11), (12, 11)]
        got = self._run(spark, edges, [11, 99], 1)
        # 99 is isolated but still reported at hop 0
        assert got == {11: 0, 99: 0, 10: 1, 12: 1}


class TestRendezvousShard:
    def test_movers_land_only_on_the_new_shard(self, spark):
        from easy_alterator_spark.operators.sampling import rendezvous_shard

        d = spark.range(500).withColumnRenamed("id", "doc_id")
        both = rendezvous_shard(
            rendezvous_shard(d, 8, out_col="s8"), 9, out_col="s9"
        ).collect()
        moved = [(r["s8"], r["s9"]) for r in both if r["s8"] != r["s9"]]
        assert moved, "a resize must move some rows"
        assert all(to == 8 for _, to in moved)
        # expected move mass ~ n/9; allow wide slack for a 500-row draw
        assert 500 / 9 * 0.4 <= len(moved) <= 500 / 9 * 1.9

    def test_assignment_is_stable_and_in_range(self, spark):
        from easy_alterator_spark.operators.sampling import rendezvous_shard

        d = spark.range(100).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["shard"] for r in rendezvous_shard(d, 5).collect()}
        b = {r["doc_id"]: r["shard"] for r in rendezvous_shard(d.repartition(7), 5).collect()}
        assert a == b
        assert set(a.values()) <= set(range(5))

    def test_null_position_changes_the_checksum(self, spark):
        from easy_alterator_spark.operators.corpus_diff import (
            partition_checksum,
        )
        from pyspark.sql import functions as F2

        a = spark.createDataFrame([(1, None, "b")], "id long, x string, y string")
        b = spark.createDataFrame([(1, "b", None)], "id long, x string, y string")
        ca = partition_checksum(a, F2.lit(0), ["x", "y"]).collect()[0]
        cb = partition_checksum(b, F2.lit(0), ["x", "y"]).collect()[0]
        assert ca["checksum"] != cb["checksum"]


class TestRound5Guards:
    def test_bad_inputs_rejected_up_front(self, spark):
        import pytest as pt

        from easy_alterator_spark.operators.corpus_diff import (
            partition_checksum,
        )
        from easy_alterator_spark.operators.graph import khop_reachability
        from easy_alterator_spark.operators.joins import (
            asof_join_backward,
            asof_join_forward,
        )
        from easy_alterator_spark.operators.sampling import rendezvous_shard

        d = spark.createDataFrame([(1,)], "doc_id long")
        with pt.raises(ValueError):
            rendezvous_shard(d, 0)
        with pt.raises(ValueError):
            khop_reachability(
                spark.createDataFrame([(1, 2)], "doc_id_a long, doc_id_b long"),
                spark.createDataFrame([(1,)], "node long"),
                hops=-1,
            )
        with pt.raises(ValueError):
            partition_checksum(d, F.lit(0), [])
        l = spark.createDataFrame([(1, None, 1)], "k long, t timestamp, pid long")
        r = spark.createDataFrame([(1, None, "a")], "k long, vt timestamp, state string")
        with pt.raises(ValueError):
            asof_join_forward(l, r, "k", "t", "vt", [])
        with pt.raises(ValueError):
            asof_join_backward(l, r, "k", "t", "vt", [])
