"""Round-11 optimization equivalence pins.

Round 11 rewrote several hot inner loops for speed; these tests pin
the rewrites BIT-EQUAL to their reference forms on real and
adversarial inputs, so future refactors cannot silently drift:

1. The Arrow numpy MinHash kernel vs the Column-expression twin
   (`_minhash_kernel` vs `_minhash_from_hashes_col`) — including the
   empty-set sentinel and negative token hashes (the unsigned-shift
   edge).
2. The fused one-stage `embedding_pca_power` vs a literal
   re-implementation of the pre-r11 distributed iteration arithmetic
   in plain Python over the same moment sums.
3. `keyword_search_bm25_runs` (one-pass multi-term BM25 run lists) vs
   the looped single-term `keyword_search_bm25(..., with_rank=True)`
   form it replaced.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestMinhashKernel:
    def test_kernel_equals_column_twin_on_corpus(self, spark):
        from easy_alterator_spark.functions import text as T
        from easy_alterator_spark.operators.dedup import (
            _minhash_from_hashes_col,
            _minhash_kernel,
        )
        from easy_alterator_spark.sources import load_table

        hs = load_table(spark, SF, "documents").select(
            F.col("doc_id").alias("id"),
            F.transform(
                T.distinct_tokens(F.col("text")), lambda t: F.xxhash64(t)
            ).alias("hset"),
        )
        a = hs.select(
            "id", _minhash_from_hashes_col(F.col("hset"), 64).alias("sig")
        ).collect()
        b = hs.select("id", _minhash_kernel(64)(F.col("hset")).alias("sig")).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_kernel_sentinel_and_negative_hashes(self, spark):
        from easy_alterator_spark.operators.dedup import (
            _MERSENNE31,
            _minhash_from_hashes_col,
            _minhash_kernel,
        )

        # empty set, NULL set, and raw negative/positive extremes of
        # the 64-bit hash domain (exercises the unsigned >> 33 path)
        rows = [
            ([],),
            (None,),
            ([-(2**63), 2**63 - 1, -1, 0, 1],),
            ([-(2**31), 2**31, 42],),
        ]
        df = spark.createDataFrame(rows, "hset array<bigint>")
        a = df.select(_minhash_from_hashes_col(F.col("hset"), 16).alias("s")).collect()
        b = df.select(_minhash_kernel(16)(F.col("hset")).alias("s")).collect()
        assert [r["s"] for r in a] == [r["s"] for r in b]
        # sentinel shape: position 0 is p itself; later positions wrap
        # int32 negative in BOTH forms (documented in dedup.py) —
        # always outside the real minhash range [0, p)
        assert a[0]["s"][0] == _MERSENNE31
        assert a[1]["s"][0] == _MERSENNE31
        assert a[0]["s"][1] == -(2**31)
        assert all(v >= _MERSENNE31 or v < 0 for v in a[0]["s"])


class TestFusedPcaPower:
    def test_fused_matches_reference_iteration(self, spark):
        """Recompute the pre-r11 iteration arithmetic (decimal-exact
        covariance, floor snaps, int64 sums, max-norm) in plain Python
        from the raw vectors and compare every output value."""
        import numpy as np

        from easy_alterator_spark.queries import QUERIES, load_all
        from easy_alterator_spark.queries.evalops import _POWER_ITERS
        from easy_alterator_spark.sources import load_table

        load_all()
        got = {
            int(r["dim"]): r
            for r in QUERIES["embedding_pca_power"](spark, SF).collect()
        }
        vecs = [
            r["embedding"]
            for r in load_table(spark, SF, "embeddings")
            .select("embedding")
            .collect()
        ]
        d = 64
        n = len(vecs)
        x = [
            [int(math.floor(float(v) * 1e4 + 0.5)) for v in row] for row in vecs
        ]
        g = [[sum(r[i] * r[j] for r in x) for j in range(d)] for i in range(d)]
        mu = [sum(r[i] for r in x) for i in range(d)]
        c = [[n * g[i][j] - mu[i] * mu[j] for j in range(d)] for i in range(d)]
        cd = [[float(v) for v in row] for row in c]
        t = float(sum(c[i][i] for i in range(d)))
        v = None
        m = 0
        for _ in range(_POWER_ITERS):
            if v is None:
                prod = [
                    [int(math.floor(cd[i][j] * 0.125)) for j in range(d)]
                    for i in range(d)
                ]
            else:
                prod = [
                    [int(math.floor(cd[i][j] * v[j])) for j in range(d)]
                    for i in range(d)
                ]
            u = [sum(row) for row in prod]
            m = max(abs(q) for q in u)
            v = [float(q) / float(m) for q in u]
        for i in range(d):
            assert got[i]["loading"] == math.floor(v[i] * 1e6) / 1e6
        nd = float(n)
        assert got[0]["eig_est"] == math.floor(
            float(m) / (nd * nd) / 1e8 * 1e6 + 1e-6
        ) / 1e6
        assert got[0]["anisotropy"] == math.floor(
            float(m) * 64 / t * 1e6 + 1e-6
        ) / 1e6
        assert np.isfinite(got[0]["eig_est"])


class TestBm25Runs:
    def test_one_pass_runs_equal_looped_runs(self, spark):
        from easy_alterator_spark.operators import search as SE
        from easy_alterator_spark.sources import load_table

        docs = load_table(spark, SF, "documents")
        terms = ["window", "join", "scan"]
        looped = []
        for t in terms:
            looped.extend(
                (t, r["doc_id"], r["rank"])
                for r in SE.keyword_search_bm25(
                    docs, [t], k=20, with_rank=True
                ).collect()
            )
        one_pass = [
            (r["q_term"], r["doc_id"], r["rank"])
            for r in SE.keyword_search_bm25_runs(docs, terms, k=20).collect()
        ]
        assert sorted(looped) == sorted(one_pass)
