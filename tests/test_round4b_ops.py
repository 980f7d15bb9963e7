"""Round-4 second wave: semantic decontamination, pack-efficiency
audit, and the hashed-token jaccard_pairs rewrite.

Value-level semantics on constructed rows; engine-vs-DuckDB parity
for the registered queries runs in test_queries_oracle.py."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


class TestSemanticContaminated:
    def _frames(self, spark):
        # eval 0 = x-axis, eval 20 = y-axis; train 1 aligned with eval 0,
        # train 2 aligned with eval 20 (slightly off-axis), train 3
        # orthogonal-ish to both (45° in z), train 4 the zero vector.
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (20, [0.0, 1.0, 0.0]),
            (1, [2.0, 0.0, 0.0]),
            (2, [0.1, 1.0, 0.0]),
            (3, [0.0, 0.0, 5.0]),
            (4, [0.0, 0.0, 0.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        return df.filter(F.col("vec_id") % 20 == 0), df.filter(
            F.col("vec_id") % 20 != 0
        )

    def test_hits_and_nearest(self, spark):
        from easy_alterator_spark.operators.semantic import semantic_contaminated

        evalset, train = self._frames(spark)
        out = {
            r["vec_id"]: (r["eval_vec_id"], r["cos"])
            for r in semantic_contaminated(train, evalset, threshold=0.5).collect()
        }
        assert out[1] == (0, 1.0)
        ev, cos = out[2]
        assert ev == 20 and cos == round(1.0 / math.sqrt(1.01), 4)
        # train 3 max cosine is 0 (< threshold), train 4 is the zero
        # vector (norm guard -> cos 0): both absent, hits-only output
        assert 3 not in out and 4 not in out

    def test_tie_breaks_to_smallest_eval_id(self, spark):
        from easy_alterator_spark.operators.semantic import semantic_contaminated

        spark_df = spark.createDataFrame(
            [
                (0, [1.0, 0.0]),
                (20, [1.0, 0.0]),  # identical eval vectors -> exact tie
                (1, [3.0, 0.0]),
            ],
            "vec_id long, embedding array<double>",
        )
        evalset = spark_df.filter(F.col("vec_id") % 20 == 0)
        train = spark_df.filter(F.col("vec_id") % 20 != 0)
        rows = semantic_contaminated(train, evalset, threshold=0.9).collect()
        assert len(rows) == 1 and rows[0]["eval_vec_id"] == 0


class TestPackEfficiency:
    def test_hand_computed(self, spark):
        from easy_alterator_spark.operators import sampling as SP

        # one lang, budget 10: docs of 6, 6, 9 tokens ->
        # cum-starts 0, 6, 12 -> packs 0, 0, 1 -> 2 packs used;
        # naive = ceil(6/10)+ceil(6/10)+ceil(9/10) = 3 sequences
        docs = spark.createDataFrame(
            [(1, "en", "a b c d e f"), (2, "en", "g h i j k l"),
             (3, "en", "m n o p q r s t u")],
            "doc_id long, lang string, text string",
        )
        packed = SP.pack_sequences(docs, budget=10, partition_col="lang")
        agg = (
            packed.groupBy("lang")
            .agg(
                F.countDistinct("pack_id").alias("packs"),
                F.sum("n_tokens").alias("tokens"),
                F.sum(F.ceil(F.col("n_tokens") / 10.0)).alias("naive"),
            )
            .collect()[0]
        )
        assert (agg["packs"], agg["tokens"], agg["naive"]) == (2, 21, 3)


class TestJaccardPairsHashed:
    def test_matches_string_set_jaccard(self, spark):
        from easy_alterator_spark.operators.dedup import jaccard_pairs

        docs = spark.createDataFrame(
            [
                (1, "the cat sat on the mat"),
                (2, "the cat sat on a mat"),
                (3, "completely different words here"),
                (4, ""),  # empty set: jaccard undefined, never paired
            ],
            "doc_id long, text string",
        )
        got = {
            (r["doc_id_a"], r["doc_id_b"]): r["jac"]
            for r in jaccard_pairs(docs, threshold=0.1).collect()
        }
        # sets {the,cat,sat,on,mat} vs {the,cat,sat,on,a,mat}: 5/6
        assert got[(1, 2)] == round(5 / 6, 4)
        assert (1, 3) not in got and (2, 3) not in got
        assert not any(4 in p for p in got)

    def test_size_bound_is_exact(self, spark):
        from easy_alterator_spark.operators.dedup import jaccard_pairs

        # sizes 10 vs 9 at t=0.9: bound 0.9*10=9 <= 9 keeps the pair;
        # a subset pair with jac exactly 9/10 = 0.9 must survive
        a = " ".join(f"w{i}" for i in range(10))
        b = " ".join(f"w{i}" for i in range(9))
        docs = spark.createDataFrame(
            [(1, a), (2, b)], "doc_id long, text string"
        )
        rows = jaccard_pairs(docs, threshold=0.9).collect()
        assert len(rows) == 1 and rows[0]["jac"] == 0.9


class TestDistributionPsi:
    def test_identical_and_shifted_slices(self, spark):
        from easy_alterator_spark.operators.profile import distribution_psi

        rows = []
        # baseline: 50 values in bin 0, 50 in bin 1
        rows += [("base", v) for v in [10] * 50 + [60] * 50]
        # same: identical histogram -> psi ~ 0
        rows += [("same", v) for v in [10] * 50 + [60] * 50]
        # shift: all mass in bin 2 -> large psi
        rows += [("shift", v) for v in [110] * 100]
        df = spark.createDataFrame(rows, "source string, n_chars long")
        out = {
            r["source"]: r["psi"]
            for r in distribution_psi(
                df, "n_chars", "source", baseline="base", bin_width=50
            ).collect()
        }
        assert set(out) == {"same", "shift"}
        assert abs(out["same"]) < 1e-3
        # hand value: p=(eps,eps,1+eps), q=(.5+eps,.5+eps,eps);
        # psi = 2*(eps-.5-eps)*ln(eps/(.5+eps)) + (1+eps-eps)*ln((1+eps)/eps)
        import math

        eps = 1e-6
        expect = 2 * (eps - (0.5 + eps)) * math.log(eps / (0.5 + eps)) + (
            1 + eps - eps
        ) * math.log((1 + eps) / eps)
        assert out["shift"] == round(expect, 4)


class TestExactMediaDedup:
    def test_groups_and_inventory(self, spark):
        from easy_alterator_spark.operators.multimodal import exact_media_dedup

        media = spark.createDataFrame(
            [(1, bytearray(b"aa")), (2, bytearray(b"aa")), (3, bytearray(b"bb"))],
            "media_id long, content binary",
        )
        dups = exact_media_dedup(media).collect()
        assert len(dups) == 1
        assert (dups[0]["n_copies"], dups[0]["canonical_id"]) == (2, 1)
        inv = exact_media_dedup(media, min_copies=1).collect()
        assert len(inv) == 2


class TestRankingMetrics:
    def test_hand_computed(self, spark):
        from easy_alterator_spark.operators.search import ranking_metrics

        # q1: ranked [d1, d2, d3]; relevant: d2 (rel 2), d3 (rel 1),
        #     d9 (rel 3, never retrieved).
        # dcg  = 2/log2(3) + 1/log2(4) = 2/1.58496 + 0.5
        # idcg = 3/log2(2) + 2/log2(3) + 1/log2(4)
        # mrr = 1/2; recall = 2/3
        runs = spark.createDataFrame(
            [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3), ("q2", 1, 1)],
            "q_term string, doc_id long, rank int",
        )
        truth = spark.createDataFrame(
            [("q1", 2, 2.0), ("q1", 3, 1.0), ("q1", 9, 3.0)],
            "q_term string, doc_id long, rel double",
        )
        out = {r["q_term"]: r for r in ranking_metrics(runs, truth, k=20).collect()}
        dcg = 2 / math.log2(3) + 1 / math.log2(4)
        idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
        assert out["q1"]["mrr"] == 0.5
        assert out["q1"]["ndcg"] == round(dcg / idcg, 4)
        assert out["q1"]["recall"] == round(2 / 3, 4)
        # q2 has no judged-relevant docs at all: all metrics 0
        assert (out["q2"]["mrr"], out["q2"]["ndcg"], out["q2"]["recall"]) == (
            0.0, 0.0, 0.0,
        )

    def test_k_cutoff(self, spark):
        from easy_alterator_spark.operators.search import ranking_metrics

        runs = spark.createDataFrame(
            [("q", 1, 1), ("q", 2, 2)], "q_term string, doc_id long, rank int"
        )
        truth = spark.createDataFrame(
            [("q", 2, 1.0)], "q_term string, doc_id long, rel double"
        )
        # k=1 cuts the run before the relevant doc at rank 2
        out = ranking_metrics(runs, truth, k=1).collect()[0]
        assert (out["mrr"], out["ndcg"], out["recall"]) == (0.0, 0.0, 0.0)


class TestCohensKappa:
    def test_hand_computed(self, spark):
        from easy_alterator_spark.operators.evalmetrics import cohens_kappa

        # 10 rows: gold 6a/4b; pred agrees on 5a+2b = 7
        # marginals: gold a=6 b=4; pred a=7 b=3
        # po=0.7, pe=(6*7+4*3)/100=0.54, kappa=(0.7-0.54)/0.46
        rows = (
            [("a", "a")] * 5 + [("a", "b")] * 1
            + [("b", "b")] * 2 + [("b", "a")] * 2
        )
        df = spark.createDataFrame(rows, "gold string, pred string")
        out = cohens_kappa(df, "gold", "pred").collect()[0]
        assert out["n"] == 10 and out["po"] == 0.7 and out["pe"] == 0.54
        assert out["kappa"] == round((0.7 - 0.54) / 0.46, 4)

    def test_constant_predictor_scores_zero(self, spark):
        from easy_alterator_spark.operators.evalmetrics import cohens_kappa

        # constant 'a' on a 95/5 imbalanced corpus: accuracy .95, kappa 0
        rows = [("a", "a")] * 95 + [("b", "a")] * 5
        df = spark.createDataFrame(rows, "gold string, pred string")
        out = cohens_kappa(df, "gold", "pred").collect()[0]
        assert out["po"] == 0.95 and out["kappa"] == 0.0


class TestPhrasePositional:
    def _docs(self, spark):
        rows = [
            (1, "slow hash batch end"),          # one hit at anchor 1
            (2, "x slow hash batch slow hash batch"),  # two hits
            (3, "slow hash  BATCH"),             # case/whitespace-normalized hit
            (4, "slow hash slow batch"),         # broken adjacency: no hit
            (5, "hash batch slow"),              # right tokens, wrong order
            (6, "slow"),                         # shorter than the phrase
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_hand_computed(self, spark):
        from easy_alterator_spark.operators.search import phrase_search_positional

        out = {
            r["doc_id"]: r["n_hits"]
            for r in phrase_search_positional(self._docs(spark), "slow hash batch").collect()
        }
        assert out == {1: 1, 2: 2, 3: 1}

    def test_matches_regex_formulation(self, spark):
        # three structurally independent phrase engines, one answer
        from easy_alterator_spark.operators.search import (
            phrase_occurrences,
            phrase_search_positional,
        )

        docs = self._docs(spark)
        pos = sorted(map(tuple, phrase_search_positional(docs, "slow hash batch").collect()))
        rex = sorted(map(tuple, phrase_occurrences(docs, "slow hash batch").collect()))
        assert pos == rex

    def test_overlapping_occurrences(self, spark):
        from easy_alterator_spark.operators.search import phrase_search_positional

        docs = spark.createDataFrame([(1, "a a a a")], "doc_id long, text string")
        out = phrase_search_positional(docs, "a a").collect()
        assert [(r["doc_id"], r["n_hits"]) for r in out] == [(1, 3)]


class TestSortedNeighborhood:
    """SNM: rank-window blocking — finds key-adjacent near-dups,
    misses leading-edit near-dups by design (the recall trade)."""

    def _docs(self, spark):
        rows = [
            # near-dup pair sharing the leading words -> sort-adjacent
            (1, "alpha beta gamma delta epsilon zeta eta theta iota one"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota two"),
            # near-dup pair differing in the FIRST token -> sorts far
            # apart (separated by the m* block below, > window rows)
            (3, "apple zulu yankee xray whiskey victor uniform tango sierra"),
            (4, "zebra zulu yankee xray whiskey victor uniform tango sierra"),
        ]
        # filler block sorting between 'apple...' and 'zebra...'
        rows += [
            (100 + i, f"m{i:02d} unrelated filler words nothing shared here {i}")
            for i in range(12)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_adjacent_pair_found_with_exact_jac(self, spark):
        from easy_alterator_spark.operators.dedup import sorted_neighborhood_pairs

        out = {
            (r["doc_id_a"], r["doc_id_b"]): r["jac"]
            for r in sorted_neighborhood_pairs(
                self._docs(spark), threshold=0.8, window=5
            ).collect()
        }
        # |A∩B|=9, |A∪B|=11 -> 0.8182
        assert out == {(1, 2): 0.8182}

    def test_leading_edit_escapes_window(self, spark):
        from easy_alterator_spark.operators.dedup import (
            jaccard_pairs,
            sorted_neighborhood_pairs,
        )

        docs = self._docs(spark)
        brute = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in jaccard_pairs(docs, threshold=0.8).collect()
        }
        snm = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in sorted_neighborhood_pairs(docs, threshold=0.8, window=5).collect()
        }
        assert (3, 4) in brute       # a true near-dup pair...
        assert (3, 4) not in snm     # ...missed: first-token edit
        assert snm == {(1, 2)}

    def test_wide_window_recovers_recall(self, spark):
        from easy_alterator_spark.operators.dedup import sorted_neighborhood_pairs

        docs = self._docs(spark)
        snm = {
            (r["doc_id_a"], r["doc_id_b"])
            for r in sorted_neighborhood_pairs(docs, threshold=0.8, window=20).collect()
        }
        assert snm == {(1, 2), (3, 4)}


class TestSampleWeightedFixedK:
    """A-ES fixed-k weighted sampling: exact-k, weight contract,
    python-replay determinism, and partition invariance."""

    def _docs(self, spark, n=300):
        rows = [(i, "en" if i % 2 else "fr", float(1 + (i * 37) % 200)) for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, lang string, w double")

    def test_exactly_k_per_stratum(self, spark):
        from easy_alterator_spark.operators.sampling import sample_weighted_fixed_k

        out = sample_weighted_fixed_k(
            self._docs(spark), "w", k=25, strata_cols=["lang"]
        ).collect()
        from collections import Counter

        assert Counter(r["lang"] for r in out) == {"en": 25, "fr": 25}

    def test_bad_weights_excluded(self, spark):
        from easy_alterator_spark.operators.sampling import sample_weighted_fixed_k

        rows = [(1, 5.0), (2, 0.0), (3, -1.0), (4, float("nan")), (5, None), (6, 2.0)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        out = sample_weighted_fixed_k(df, "w", k=10)
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 6]

    def test_matches_python_replay(self, spark):
        import hashlib
        import math

        from easy_alterator_spark.operators.sampling import sample_weighted_fixed_k

        docs = self._docs(spark)
        expect = {}
        for r in docs.collect():
            h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:12], 16)
            key = math.log((h + 0.5) / float(1 << 48)) / r["w"]
            expect.setdefault(r["lang"], []).append((-key, r["doc_id"]))
        want = {
            (lang, i)
            for lang, ks in expect.items()
            for _, i in sorted(ks)[:25]
        }
        got = {
            (r["lang"], r["doc_id"])
            for r in sample_weighted_fixed_k(
                docs, "w", k=25, strata_cols=["lang"]
            ).collect()
        }
        assert got == want

    def test_unstratified_partition_invariant(self, spark):
        from easy_alterator_spark.operators.sampling import sample_weighted_fixed_k

        docs = self._docs(spark)
        a = {
            r["doc_id"]
            for r in sample_weighted_fixed_k(docs.repartition(2), "w", k=30).collect()
        }
        b = {
            r["doc_id"]
            for r in sample_weighted_fixed_k(docs.repartition(13), "w", k=30).collect()
        }
        assert len(a) == 30 and a == b

    def test_heavier_rows_overrepresented(self, spark):
        # one row with overwhelming weight is effectively always taken
        from easy_alterator_spark.operators.sampling import sample_weighted_fixed_k

        rows = [(i, 1.0 if i else 1e9) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        out = {r["doc_id"] for r in sample_weighted_fixed_k(df, "w", k=5).collect()}
        assert 0 in out


class TestLabelPropagation:
    """Synchronous LPA: fixed rounds, majority vote, min-label ties."""

    def _lpa(self, spark, edges, iters):
        from easy_alterator_spark.operators.graph import label_propagation

        df = spark.createDataFrame(edges, "doc_id_a long, doc_id_b long")
        return {
            r["node"]: r["label"]
            for r in label_propagation(df, iters=iters).collect()
        }

    def test_triangle_converges_to_min_label(self, spark):
        got = self._lpa(spark, [(1, 2), (2, 3), (1, 3)], iters=4)
        assert got == {1: 1, 2: 1, 3: 1}

    def test_two_cliques_with_bridge_stay_separate(self, spark):
        # two 4-cliques joined by ONE bridge edge: CC merges them,
        # LPA must not — each side's internal majority wins
        c1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
        got = self._lpa(spark, c1 + c2 + [(4, 10)], iters=4)
        assert {got[n] for n in (1, 2, 3)} == {1}
        assert {got[n] for n in (11, 12, 13)} == {10}
        assert got[1] != got[11]

    def test_matches_python_replay(self, spark):
        import random
        from collections import Counter

        rnd = random.Random(5)
        edges = set()
        while len(edges) < 60:
            a, b = rnd.randint(0, 29), rnd.randint(0, 29)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        edges = sorted(edges)
        adj = {}
        for a, b in edges:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        labels = {n: n for n in adj}
        for _ in range(4):
            labels = {
                n: min(
                    Counter(labels[m] for m in nbrs).items(),
                    key=lambda kv: (-kv[1], kv[0]),
                )[0]
                for n, nbrs in adj.items()
            }
        assert self._lpa(spark, edges, iters=4) == labels
