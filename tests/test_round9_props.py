"""Randomized invariant tests for the round-9 devices: seeded random
inputs with adversarial shapes (heavy ties, hubs, tiny and skewed
tables) checked against the naive Spark forms and pure-Python
references. Complements test_round9_ops.py (hand fixtures) and
test_round9_audit.py (real-data references).
"""

from __future__ import annotations

import random
from collections import Counter
from itertools import combinations

import duckdb
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from easy_alterator_spark.queries import QUERIES, load_all

load_all()

SEEDS = [7, 42, 1337]


@pytest.mark.parametrize("seed", SEEDS)
def test_global_rank_matches_row_number_random(spark, seed):
    from easy_alterator_spark.operators.rank import global_rank

    rng = random.Random(seed)
    n = rng.randint(3, 400)
    # heavy ties: values drawn from a tiny domain; id is the tiebreak
    rows = [(i, rng.randint(0, 5)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, v long")
    order = [F.col("v").desc(), F.col("id")]
    got = {
        r["id"]: r["rk"] for r in global_rank(df, order, "rk").collect()
    }
    exp = {
        r["id"]: r["rk"]
        for r in df.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias("rk")
        ).collect()
    }
    assert got == exp


@pytest.mark.parametrize("seed", SEEDS)
def test_global_ntile_matches_sql_ntile_random(spark, seed):
    from easy_alterator_spark.operators.rank import global_ntile

    rng = random.Random(seed)
    n = rng.randint(2, 300)
    k = rng.choice([2, 3, 4, 7, 10, 16])
    rows = [(i, rng.randint(0, 9)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, v long")
    order = [F.col("v"), F.col("id")]
    got = {
        r["id"]: r["t"] for r in global_ntile(df, order, k, "t").collect()
    }
    exp = {
        r["id"]: r["t"]
        for r in df.select(
            "id", F.ntile(k).over(Window.orderBy(*order)).alias("t")
        ).collect()
    }
    assert got == exp, (n, k)


@pytest.mark.parametrize("seed", SEEDS)
def test_global_prefix_sum_matches_cumsum_random(spark, seed):
    from easy_alterator_spark.operators.rank import global_prefix_sum

    rng = random.Random(seed)
    n = rng.randint(1, 300)
    # unique keys (the helper's documented domain), arbitrary values
    keys = rng.sample(range(10_000), n)
    rows = [(kk, rng.randint(-50, 50)) for kk in keys]
    df = spark.createDataFrame(rows, "k long, c long")
    got = {
        r["k"]: r["p"]
        for r in global_prefix_sum(df, ["k"], "c", "p").collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    exp = {
        r["k"]: r["p"]
        for r in df.select("k", F.sum("c").over(w).alias("p")).collect()
    }
    assert got == exp


@pytest.mark.parametrize("seed", SEEDS)
def test_triangles_orientation_invariance_random(spark, seed, tmp_path):
    """Random basket universes (with a planted hub user pattern) —
    the degree-oriented count must equal the brute-force 3-clique
    count of the thresholded graph."""
    from tests.test_round9_ops import _write_events_items

    rng = random.Random(seed)
    n_items = rng.randint(5, 12)
    baskets = {
        u: rng.sample(range(1, n_items + 1), rng.randint(2, n_items))
        for u in range(1, rng.randint(6, 16))
    }
    _write_events_items(spark, tmp_path, baskets)

    co = Counter()
    for items in baskets.values():
        for a, b in combinations(sorted(set(items)), 2):
            co[(a, b)] += 1
    n_pairs, sum_co = len(co), sum(co.values())
    edges = {p for p, c in co.items() if c * n_pairs > sum_co}
    nodes = sorted({x for p in edges for x in p})
    exp = Counter()
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= edges:
            exp[a] += 1
            exp[b] += 1
            exp[c] += 1
    got = {
        r["node"]: r["triangles"]
        for r in QUERIES["graph_triangles"](spark, str(tmp_path)).collect()
    }
    assert got == dict(exp), (seed, sorted(edges))


@pytest.mark.parametrize("seed", SEEDS)
def test_xxh64_sql_random_ascii(spark, seed):
    """Random printable-ASCII tokens of random lengths < 32: the
    generated DuckDB SQL must reproduce F.xxhash64(t, 0) exactly."""
    from easy_alterator_spark.queries._xxh64_sql import xxh64_word_ctes

    rng = random.Random(seed)
    toks = list({
        "".join(
            chr(rng.randint(0x21, 0x7E)) for _ in range(rng.randint(0, 31))
        )
        for _ in range(60)
    })
    con = duckdb.connect()
    con.execute("CREATE TABLE vocab(w VARCHAR)")
    con.executemany("INSERT INTO vocab VALUES (?)", [(t,) for t in toks])
    got = {
        w: int(h)
        for w, h in con.execute(
            f"WITH {xxh64_word_ctes()} SELECT w, hw FROM xf"
        ).fetchall()
    }
    exp_rows = (
        spark.createDataFrame([(t,) for t in toks], "w string")
        .select("w", F.xxhash64("w", F.lit(0)).alias("h"))
        .collect()
    )
    for r in exp_rows:
        assert got[r["w"]] == (r["h"] & 0xFFFFFFFFFFFFFFFF), repr(r["w"])
