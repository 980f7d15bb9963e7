"""Round-9 semantics tests: the scale-safe decompositions and the two
new oracles (xxhash64-in-DuckDB, BPE replay) pinned against
hand-computed or independently-computed expectations — the
differential gate cannot catch a bug shared by both engines, so every
device here gets a from-scratch reference (the round-8 lesson).
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from easy_alterator_spark.queries import QUERIES, load_all

load_all()


# ---------------------------------------------------------------------------
# xxhash64 reproduced in DuckDB SQL
# ---------------------------------------------------------------------------


class TestXxh64SqlOracle:
    def _duck_hashes(self, toks):
        from easy_alterator_spark.queries._xxh64_sql import xxh64_word_ctes

        con = duckdb.connect()
        con.execute("CREATE TABLE vocab(w VARCHAR)")
        con.executemany("INSERT INTO vocab VALUES (?)", [(t,) for t in toks])
        sql = f"WITH {xxh64_word_ctes()} SELECT w, hw FROM xf"
        return {w: int(h) for w, h in con.execute(sql).fetchall()}

    def test_matches_spark_xxhash64_all_tail_paths(self, spark):
        # lengths 0..31 cover every (8-byte words, 4-byte chunk,
        # 1..3 tail bytes) combination of the XXH64 short path, with
        # varied printable-ASCII bytes so no byte position is constant
        toks = [
            "".join(chr(0x21 + ((i * 7 + j * 13) % 0x5E)) for j in range(i))
            for i in range(32)
        ] + ["window", "shuffle", "broadcast", "the", "a" * 8, "b" * 16]
        got = self._duck_hashes(toks)
        exp_rows = (
            spark.createDataFrame([(t,) for t in toks], "w string")
            .select("w", F.xxhash64("w", F.lit(0)).alias("h"))
            .collect()
        )
        for r in exp_rows:
            exp_unsigned = r["h"] & 0xFFFFFFFFFFFFFFFF
            assert got[r["w"]] == exp_unsigned, repr(r["w"])

    def test_guards_fail_loudly(self):
        with pytest.raises(Exception, match="32 bytes"):
            self._duck_hashes(["x" * 32])
        with pytest.raises(Exception, match="non-ASCII"):
            self._duck_hashes(["café"])


# ---------------------------------------------------------------------------
# rank.py decompositions == naive global windows
# ---------------------------------------------------------------------------


class TestGlobalNtileAndPrefixSum:
    def _df(self, spark):
        rows = [(i, (i * 7919) % 101, (i * 31) % 13) for i in range(137)]
        return spark.createDataFrame(rows, "id long, v long, c long")

    def test_global_ntile_matches_sql_ntile_asc_and_desc(self, spark):
        from easy_alterator_spark.operators.rank import global_ntile

        df = self._df(spark)
        for k, order in [
            (4, [F.col("v"), F.col("id")]),
            (10, [F.col("v").desc(), F.col("id")]),
            (7, [F.col("v").desc(), F.col("id")]),
        ]:
            got = {
                r["id"]: r["t"]
                for r in global_ntile(df, order, k, "t").collect()
            }
            exp = {
                r["id"]: r["t"]
                for r in df.select(
                    "id", F.ntile(k).over(Window.orderBy(*order)).alias("t")
                ).collect()
            }
            assert got == exp, (k,)

    def test_global_prefix_sum_matches_window_cumsum_multicol(self, spark):
        from easy_alterator_spark.operators.rank import global_prefix_sum

        # distinct keys (total order) — the helper's documented domain
        df = self._df(spark).groupBy("v").agg(
            F.sum("c").alias("c1"), F.count(F.lit(1)).alias("c2")
        )
        got = {
            r["v"]: (r["p1"], r["p2"])
            for r in global_prefix_sum(
                df, ["v"], ["c1", "c2"], ["p1", "p2"]
            ).collect()
        }
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        exp = {
            r["v"]: (r["p1"], r["p2"])
            for r in df.select(
                "v",
                F.sum("c1").over(w).alias("p1"),
                F.sum("c2").over(w).alias("p2"),
            ).collect()
        }
        assert got == exp


# ---------------------------------------------------------------------------
# rec_item_cooccur per-user cap / graph_triangles degree orientation
# ---------------------------------------------------------------------------

from datetime import datetime, timedelta

T0 = datetime(2026, 1, 1, 12, 0, 0)


def _write_events_items(spark, path, baskets):
    """baskets: {user_id: [item, ...]} -> events.parquet rows with
    props JSON carrying $.k (one event per (user, item) occurrence)."""
    rows, eid = [], 0
    for uid, items in baskets.items():
        for it in items:
            eid += 1
            rows.append(
                (eid, T0 + timedelta(seconds=eid), uid, "view", 1.0,
                 '{"k": %d}' % it)
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


class TestCooccurCap:
    def test_cap_drops_items_beyond_256_most_active(self, spark, tmp_path):
        # 6 users each touch items 1..260 once: per-user cap keeps the
        # 256 smallest item ids (all n_ev ties -> item ASC), so items
        # 257..260 must vanish from the pair universe entirely even
        # though their uncapped co-counts (6 >= min-support 5) would
        # qualify. Survivors all have co = 6 and nu = 6 -> cosine 1.0.
        baskets = {u: list(range(1, 261)) for u in range(1, 7)}
        _write_events_items(spark, tmp_path, baskets)
        out = QUERIES["rec_item_cooccur"](spark, str(tmp_path)).collect()
        items = {r["item_a"] for r in out} | {r["item_b"] for r in out}
        assert max(items) == 256 and min(items) == 1
        one = sorted(
            (r["rnk"], r["item_b"]) for r in out if r["item_a"] == 1
        )
        assert one == [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
        assert all(r["co"] == 6 and r["cosine"] == 1.0 for r in out)

    def test_cap_inert_below_bound(self, spark, tmp_path):
        # 6 users over 10 items: cap cannot bind; every pair has co=6
        baskets = {u: list(range(1, 11)) for u in range(1, 7)}
        _write_events_items(spark, tmp_path, baskets)
        out = QUERIES["rec_item_cooccur"](spark, str(tmp_path)).collect()
        # 10 items x top-5 neighbors
        assert len(out) == 50
        assert all(r["co"] == 6 for r in out)


class TestTrianglesDegreeOriented:
    @staticmethod
    def _expected(baskets):
        """Independent pure-Python triangle count per the query spec:
        distinct per-user item pairs -> co-counts -> keep pairs with
        co * n_pairs > sum_co -> brute-force 3-cliques."""
        from collections import Counter
        from itertools import combinations

        co = Counter()
        for items in baskets.values():
            for a, b in combinations(sorted(set(items)), 2):
                co[(a, b)] += 1
        n_pairs, sum_co = len(co), sum(co.values())
        edges = {p for p, c in co.items() if c * n_pairs > sum_co}
        nodes = sorted({x for p in edges for x in p})
        tri = Counter()
        for a, b, c in combinations(nodes, 3):
            if {(a, b), (a, c), (b, c)} <= edges:
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
        return dict(tri)

    def test_matches_bruteforce_with_hub(self, spark, tmp_path):
        # item 1 is a hub (high degree), so degree-orientation directs
        # its edges INTO it; the triangle set must be unchanged.
        baskets = {
            1: [1, 2, 3], 2: [1, 2, 3], 3: [1, 2, 4], 4: [2, 3, 4],
            5: [1, 3, 4], 6: [5, 6], 7: [5, 6],
            8: [1, 5], 9: [1, 6], 10: [1, 7], 11: [1, 2, 3],
        }
        _write_events_items(spark, tmp_path, baskets)
        got = {
            r["node"]: r["triangles"]
            for r in QUERIES["graph_triangles"](spark, str(tmp_path)).collect()
        }
        assert got == self._expected(baskets)


# ---------------------------------------------------------------------------
# BPE replay oracle on a crafted micro-corpus (incl. early stop)
# ---------------------------------------------------------------------------


class TestBpeOracleParity:
    def _run_both(self, spark, tmp_path, texts):
        rows = [(i + 1, t, "en", "s", len(t)) for i, t in enumerate(texts)]
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/documents.parquet"
        )
        from easy_alterator_spark.queries import ORACLES

        spark_rows = sorted(
            tuple(r) for r in QUERIES["bpe_train_merges"](
                spark, str(tmp_path)
            ).collect()
        )
        con = duckdb.connect()
        # Spark writes a part-file directory; DuckDB needs the glob
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
        )
        duck_rows = sorted(
            tuple(r) for r in con.execute(
                ORACLES["bpe_train_merges"]
            ).fetchall()
        )
        return spark_rows, duck_rows

    def test_early_stop_and_tiebreak(self, spark, tmp_path):
        # vocabulary {ab, ab, cd}: round 0 merges (a,b) freq 2;
        # round 1 merges (c,d) freq 1; then NO pairs remain — both
        # sides must stop at 2 rows, exercising the structural
        # early-stop of the chained-CTE oracle
        s, d = self._run_both(spark, tmp_path, ["ab ab cd"])
        assert s == d
        assert [r[:3] for r in s] == [(0, "a", "b"), (1, "c", "d")]

    def test_greedy_nonoverlap_and_freq_order(self, spark, tmp_path):
        # 'aaa' contributes (a,a) twice (overlapping COUNT) but merges
        # to [aa, a] (non-overlapping APPLY); 'zz xy xy xy' makes the
        # argmax order deterministic and observable
        s, d = self._run_both(
            spark, tmp_path, ["aaa aaa xy xy xy", "aaa zz"]
        )
        assert s == d
        assert s[0][0] == 0  # ranks present and dense from 0
