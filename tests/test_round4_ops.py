"""Round-4 operators: CDC changelog merge, one-pass column profile,
capped inverted index, rolling distinct cardinality, salted-join
query plan shape.

Value-level semantics on constructed rows; engine-vs-DuckDB parity
for the registered queries runs in test_queries_oracle.py."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    from easy_alterator_spark.queries import QUERIES, load_all

    load_all()
    return QUERIES


class TestApplyChangelog:
    def _data(self, spark):
        base = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        )
        # k=1: update then delete (delete is latest -> row disappears)
        # k=2: two updates (latest wins)
        # k=4: insert of a new key
        chg = spark.createDataFrame(
            [
                (1, "a2", 1, "U"),
                (1, "a3", 2, "D"),
                (2, "b2", 1, "U"),
                (2, "b3", 2, "U"),
                (4, "d", 1, "U"),
            ],
            "k long, v string, seq long, op string",
        )
        return base, chg

    def test_latest_wins_delete_and_insert(self, spark):
        from easy_alterator_spark.operators.cdc import apply_changelog

        base, chg = self._data(spark)
        out = apply_changelog(base, chg, ["k"], "seq", "op")
        got = {r["k"]: (r["v"], r["src"]) for r in out.collect()}
        assert got == {
            2: ("b3", "upsert"),  # latest update wins
            3: ("c", "base"),  # untouched base row
            4: ("d", "upsert"),  # new key inserted
        }  # k=1 deleted

    def test_shuffled_anti_join_same_result(self, spark):
        from easy_alterator_spark.operators.cdc import apply_changelog

        base, chg = self._data(spark)
        a = apply_changelog(base, chg, ["k"], "seq", "op")
        b = apply_changelog(
            base, chg, ["k"], "seq", "op", broadcast_changelog=False
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_seq_tie_broken_by_key_deterministically(self, spark):
        from easy_alterator_spark.operators.cdc import latest_per_key

        chg = spark.createDataFrame(
            [(1, "x", 5, "U"), (1, "y", 5, "U")],
            "k long, v string, seq long, op string",
        )
        # equal seq: row_number orders by (seq DESC, k ASC) — both rows
        # tie on the full sort key, so Spark picks a partition-stable
        # first; the contract here is just that exactly ONE survives
        assert latest_per_key(chg, ["k"], "seq").count() == 1

    def test_base_side_broadcast_anti_join(self, spark):
        from easy_alterator_spark.operators.cdc import apply_changelog
        from easy_alterator_spark.plans.audit import formatted_plan

        base, chg = self._data(spark)
        plan = formatted_plan(apply_changelog(base, chg, ["k"], "seq", "op"))
        # the 100 TB side must anti-join against a BROADCAST key set
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


class TestColumnProfile:
    def test_exact_profile_values(self, spark):
        from easy_alterator_spark.operators.profile import column_profile

        df = spark.createDataFrame(
            [(1.0, None), (2.5, 5), (2.5, 5), (None, 7)],
            "x double, y int",
        )
        got = {
            r["column_name"]: (
                r["n_nulls"],
                r["n_distinct"],
                r["min_val"],
                r["max_val"],
            )
            for r in column_profile(df, ["x", "y"]).collect()
        }
        assert got == {"x": (1, 2, 1.0, 2.5), "y": (1, 2, 5.0, 7.0)}

    def test_approx_mode_runs_without_expand(self, spark):
        from easy_alterator_spark.operators.profile import column_profile
        from easy_alterator_spark.plans.audit import formatted_plan

        df = spark.range(100).select(
            F.col("id").cast("double").alias("x"), (F.col("id") % 7).alias("y")
        )
        prof = column_profile(df, ["x", "y"], exact_distinct=False)
        got = {r["column_name"]: r["n_distinct"] for r in prof.collect()}
        assert got["x"] == pytest.approx(100, rel=0.1)
        assert got["y"] == pytest.approx(7, rel=0.1)
        # HLL path must not plan the multi-distinct Expand
        assert "Expand" not in formatted_plan(prof)


class TestInvertedIndex:
    def test_cap_and_df(self, spark):
        from easy_alterator_spark.operators.search import build_inverted_index

        docs = spark.createDataFrame(
            [(i, "common " + ("rare" if i == 3 else "x")) for i in range(5)],
            "doc_id long, text string",
        )
        got = {
            r["term"]: (r["df"], r["postings"])
            for r in build_inverted_index(docs, max_postings=2).collect()
        }
        # df counts ALL docs; postings capped to the 2 smallest ids
        assert got["common"] == (5, [0, 1])
        assert got["rare"] == (1, [3])
        assert got["x"] == (4, [0, 1])

    def test_min_df_filters(self, spark):
        from easy_alterator_spark.operators.search import build_inverted_index

        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a")], "doc_id long, text string"
        )
        terms = {
            r["term"] for r in build_inverted_index(docs, min_df=2).collect()
        }
        assert terms == {"a"}

    def test_window_and_group_share_one_exchange(self, spark):
        import re

        from easy_alterator_spark.operators.search import build_inverted_index
        from easy_alterator_spark.plans.audit import formatted_plan
        from easy_alterator_spark.sources import load_table

        idx = build_inverted_index(load_table(spark, SF, "documents"))
        # row_number window (term) + groupBy (term): ONE exchange total
        # (count detail-section nodes — the tree lists each node twice)
        plan = formatted_plan(idx)
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


class TestRollingDistinct:
    def test_trailing_window_counts(self, spark):
        from easy_alterator_spark.operators.timeseries import rolling_distinct

        t0 = datetime.datetime(2024, 1, 1)

        def at(days):
            return t0 + datetime.timedelta(days=days)

        ev = spark.createDataFrame(
            [
                (1, at(0), "a"),
                (1, at(3), "b"),
                (1, at(7), "c"),   # exactly 7d after t0: t0 included
                (1, at(10.5), "a"),  # window [3.5, 10.5]: c,a
                (2, at(0), "z"),
            ],
            "user_id long, ts timestamp, event_type string",
        )
        out = rolling_distinct(ev)
        got = {
            (r["user_id"], r["ts"]): r["n_distinct_7d"] for r in out.collect()
        }
        assert got[(1, at(0))] == 1
        assert got[(1, at(3))] == 2
        assert got[(1, at(7))] == 3  # boundary inclusive, like SQL RANGE
        assert got[(1, at(10.5))] == 2  # b at day 3 aged out of [3.5, 10.5]
        assert got[(2, at(0))] == 1

    def test_frame_is_exact_microseconds(self, spark):
        from easy_alterator_spark.operators.timeseries import rolling_distinct

        t0 = datetime.datetime(2024, 1, 1)
        ev = spark.createDataFrame(
            [
                (1, t0, "a"),
                # one microsecond beyond the 7-day frame: excluded
                (1, t0 + datetime.timedelta(days=7, microseconds=1), "b"),
            ],
            "user_id long, ts timestamp, event_type string",
        )
        got = {
            r["event_type"]: r["n_distinct_7d"]
            for r in rolling_distinct(ev).collect()
        }
        assert got["b"] == 1


class TestSaltedJoinQueryPlan:
    def test_salted_shuffle_join_not_broadcast(self, spark, queries):
        from easy_alterator_spark.plans.audit import formatted_plan, join_counts

        plan = formatted_plan(queries["join_skew_salted"](spark, SF))
        # the contract under test is the skew-resilient shape: a
        # shuffled join keyed on (l_suppkey, __salt), not a broadcast
        assert "__salt" in plan
        jc = join_counts(plan)
        assert jc["BroadcastHashJoin"] == 0
        assert jc["ShuffledHashJoin"] + jc["SortMergeJoin"] >= 1


class TestStreamDedupQuery:
    def test_stream_equals_batch_distinct(self, spark, queries):
        batch = (
            spark.read.parquet(f"{SF}/events.parquet")
            .groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("n_users"))
        )
        got = {
            r["event_type"]: r["n_users"]
            for r in queries["stream_dedup_exact"](spark, SF).collect()
        }
        want = {r["event_type"]: r["n_users"] for r in batch.collect()}
        assert got == want


class TestRecursiveCte:
    def test_bom_rollup_depth_and_membership(self, spark, queries):
        # 8-part tree rooted at 0: node 7's ancestors are 3, 1, 0
        df = spark.createDataFrame(
            [(i, 1.0) for i in range(8)], "p_partkey long, p_retailprice double"
        )
        out = spark.sql(
            """
            WITH RECURSIVE bom(anc, node) AS (
                SELECT p_partkey, p_partkey FROM {p}
                UNION ALL
                SELECT b.anc, c.p_partkey FROM bom b JOIN {p} c
                  ON CAST(FLOOR(c.p_partkey / 2.0) AS BIGINT) = b.node
                 AND c.p_partkey >= 1)
            SELECT anc, COUNT(*) AS n FROM bom GROUP BY anc
            """,
            p=df,
        )
        got = {r["anc"]: r["n"] for r in out.collect()}
        # tree: 0 -> 1 -> {2,3}, 2 -> {4,5}, 3 -> {6,7}
        assert got == {0: 8, 1: 7, 2: 3, 3: 3, 4: 1, 5: 1, 6: 1, 7: 1}

    def test_registered_query_runs(self, spark, queries):
        rows = queries["hierarchy_bom_rollup"](spark, SF).collect()
        assert rows and all(r["subtree_parts"] >= 16 for r in rows)


class TestPrefixFilter:
    def test_equals_bruteforce_on_corpus(self, spark):
        from easy_alterator_spark.operators.dedup import (
            jaccard_pairs,
            prefix_filter_pairs,
        )
        from easy_alterator_spark.sources import load_table

        docs = load_table(spark, SF, "documents")
        exact = sorted(map(tuple, jaccard_pairs(docs, 0.8).collect()))
        pruned = sorted(map(tuple, prefix_filter_pairs(docs, 0.8).collect()))
        assert pruned == exact and len(exact) > 0

    def test_exact_grid_threshold_no_recall_loss(self, spark):
        from easy_alterator_spark.operators.dedup import prefix_filter_pairs

        # 10-token sets sharing 9: jac = 9/11 ≈ 0.818 < 0.9;
        # identical 10-token sets: jac = 1.0. t·s = 0.9·10 sits exactly
        # on the integer grid — the ceil-rounding guard's worst case.
        base = " ".join(f"w{i}" for i in range(10))
        near = " ".join(f"w{i}" for i in range(9)) + " zz"
        docs = spark.createDataFrame(
            [(1, base), (2, base), (3, near)], "doc_id long, text string"
        )
        got = {
            (r["doc_id_a"], r["doc_id_b"]): r["jac"]
            for r in prefix_filter_pairs(docs, 0.9).collect()
        }
        assert got == {(1, 2): 1.0}

    def test_candidate_join_is_equi_not_cartesian(self, spark):
        from easy_alterator_spark.operators.dedup import prefix_filter_pairs
        from easy_alterator_spark.plans.audit import formatted_plan
        from easy_alterator_spark.sources import load_table

        plan = formatted_plan(
            prefix_filter_pairs(load_table(spark, SF, "documents"), 0.9)
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestPageRank:
    def test_star_graph_ranks(self, spark):
        from easy_alterator_spark.operators.graph import pagerank

        # star: 0 connected to 1,2,3 (undirected). Symmetry: leaves
        # equal; center > leaf; total mass = 1 every iteration.
        pairs = spark.createDataFrame(
            [(0, 1), (0, 2), (0, 3)], "doc_id_a long, doc_id_b long"
        )
        got = {r["node"]: r["pr"] for r in pagerank(pairs, iters=10).collect()}
        assert got[1] == got[2] == got[3]
        assert got[0] > got[1]
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-5)

    def test_two_node_fixed_point(self, spark):
        from easy_alterator_spark.operators.graph import pagerank

        # K2: uniform 1/2 is the exact fixed point at any damping
        pairs = spark.createDataFrame([(1, 2)], "doc_id_a long, doc_id_b long")
        got = {r["node"]: r["pr"] for r in pagerank(pairs, iters=3).collect()}
        assert got == {1: 0.5, 2: 0.5}

    def test_checkpoint_path_same_values(self, spark):
        from easy_alterator_spark.operators.graph import pagerank

        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (0, 3)], "doc_id_a long, doc_id_b long"
        )
        plain = sorted(map(tuple, pagerank(pairs, iters=6).collect()))
        ckpt = sorted(
            map(tuple, pagerank(pairs, iters=6, checkpoint_every=2).collect())
        )
        assert plain == ckpt


class TestGlobalRank:
    def test_matches_single_reducer_row_number(self, spark):
        from easy_alterator_spark.operators.rank import global_rank

        df = spark.range(0, 1000).select(
            (F.xxhash64("id") % 977).alias("v"), F.col("id")
        )
        got = {
            (r["v"], r["id"]): r["rank"]
            for r in global_rank(df, ["v", "id"]).collect()
        }
        w = Window.orderBy("v", "id")
        want = {
            (r["v"], r["id"]): r["rank"]
            for r in df.withColumn("rank", F.row_number().over(w)).collect()
        }
        assert got == want

    def test_no_single_partition_window_in_plan(self, spark):
        from easy_alterator_spark.operators.rank import equi_depth_histogram
        from easy_alterator_spark.plans.audit import formatted_plan
        from easy_alterator_spark.sources import load_table

        h = equi_depth_histogram(
            load_table(spark, SF, "lineitem"),
            "l_extendedprice",
            ["l_orderkey", "l_linenumber"],
        )
        plan = formatted_plan(h)
        # the data-sized windows must be keyed; the only empty-frame
        # global window runs over one row per range partition
        for line in plan.splitlines():
            if "Window" in line and "SinglePartition" in line:
                raise AssertionError(f"single-reducer window: {line}")

    def test_ntile_remainder_distribution(self, spark):
        from easy_alterator_spark.operators.rank import equi_depth_histogram

        # 10 rows, k=4 -> NTILE sizes 3,3,2,2
        df = spark.createDataFrame(
            [(float(i), i) for i in range(10)], "v double, id long"
        )
        sizes = {
            r["bucket"]: r["n_rows"]
            for r in equi_depth_histogram(df, "v", ["id"], k=4).collect()
        }
        assert sizes == {1: 3, 2: 3, 3: 2, 4: 2}


class TestFirstTouchAttribution:
    def test_session_first_credited(self, spark, queries):
        import duckdb

        from easy_alterator_spark.queries import ORACLES

        got = sorted(
            map(tuple, queries["events_attribution_first_touch"](spark, SF).collect())
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
        )
        want = sorted(
            map(tuple, con.execute(ORACLES["events_attribution_first_touch"]).fetchall())
        )
        assert got == want and len(got) > 0


class TestClassificationReport:
    def test_hand_computed_report(self, spark):
        from easy_alterator_spark.operators.evalmetrics import (
            classification_report,
        )

        # gold: a,a,a,b,b ; pred: a,a,b,b,c
        df = spark.createDataFrame(
            [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "c")],
            "gold string, pred string",
        )
        got = {
            r["cls"]: (
                r["support"],
                r["pred_total"],
                r["tp"],
                r["precision"],
                r["recall"],
                r["f1"],
            )
            for r in classification_report(df, "gold", "pred").collect()
        }
        # a: tp=2 P=2/2 R=2/3 F1=0.8 ; b: tp=1 P=1/2 R=1/2 F1=0.5
        # c: hallucinated label — support 0, recall 0
        # metrics are floor-grid TRUNCATED to 4 dp (not round-half-up):
        # 2/3 displays as 0.6666, matching the cross-engine floor grid
        assert got["a"] == (3, 2, 2, 1.0, 0.6666, 0.8)
        assert got["b"] == (2, 2, 1, 0.5, 0.5, 0.5)
        assert got["c"] == (0, 1, 0, 0.0, 0.0, 0.0)


class TestDatasetWriter:
    def test_partitioned_sorted_capped_with_manifest(self, spark, tmp_path):
        from easy_alterator_spark.sources.dataset_writer import (
            dataset_manifest,
            write_dataset,
        )

        df = spark.range(0, 1000).select(
            (F.col("id") % 4).alias("part"),
            (F.xxhash64("id") % 1000).alias("v"),
            "id",
        )
        path = str(tmp_path / "ds")
        write_dataset(
            df,
            path,
            partition_by=["part"],
            sort_by=["v"],
            max_records_per_file=100,
        )
        back = spark.read.parquet(path)
        assert back.count() == 1000
        # hive layout
        import os

        assert any(d.startswith("part=") for d in os.listdir(path))
        # file size governance + manifest witnesses the written files
        man = dataset_manifest(spark, path)
        rows = man.collect()
        assert sum(r["n_rows"] for r in rows) == 1000
        assert max(r["n_rows"] for r in rows) <= 100
        # rows are sorted within each file (zone-map contract)
        one = spark.read.parquet(rows[0]["file_path"]).select("v").collect()
        vs = [r["v"] for r in one]
        assert vs == sorted(vs)


class TestEventsDebounce:
    def test_raw_anchored_burst_semantics(self, spark, queries):
        import datetime

        from easy_alterator_spark.queries import QUERIES

        # bursts every 4 min: raw-anchored lag suppresses each event
        # pairwise (every gap = 240s <= 300) so ONLY the first is kept
        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            (i, t0 + datetime.timedelta(minutes=4 * i), 1, "click", 0.0, "{}")
            for i in range(4)
        ] + [(99, t0 + datetime.timedelta(hours=2), 1, "click", 0.0, "{}")]
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        from pyspark.sql import Window as W

        w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        prev = F.lag(F.col("ts").cast("long")).over(w)
        kept = ev.withColumn(
            "__gap", F.col("ts").cast("long") - prev
        ).filter(F.col("__gap").isNull() | (F.col("__gap") > 300))
        ids = sorted(r["event_id"] for r in kept.collect())
        assert ids == [0, 99]
