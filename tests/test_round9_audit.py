"""Round-9 real-data audits: from-scratch pure-Python references for
the queries whose PLANS changed this round (rank decompositions), run
against the sf0.001 driver fixture. The round-8 lesson: equivalent-
form tests (decomposed vs naive window) and the differential oracle
both pass on a SHARED formula bug — only an independently-shaped
reference catches it. These references use plain dict/sort Python,
deliberately nothing like the Spark or SQL forms.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from easy_alterator_spark.queries import QUERIES, load_all

load_all()

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    from easy_alterator_spark.sources import load_table

    rows = load_table(spark, SF, "events").collect()
    return [
        {
            "event_id": r["event_id"],
            "ts": r["ts"],
            "user_id": r["user_id"],
            "event_type": r["event_type"],
            "value": r["value"],
        }
        for r in rows
    ]


@pytest.fixture(scope="module")
def documents(spark):
    from easy_alterator_spark.sources import load_table

    return [
        (r["doc_id"], r["text"])
        for r in load_table(spark, SF, "documents").collect()
    ]


def _cents(v: float) -> int:
    return math.floor(v * 100 + 0.5)


def _ntile(order: list, k: int) -> dict:
    """key -> SQL NTILE(k) bucket for the pre-sorted key list."""
    n = len(order)
    q, r = divmod(n, k)
    out, pos = {}, 0
    for b in range(1, k + 1):
        size = q + (1 if b <= r else 0)
        for key in order[pos : pos + size]:
            out[key] = b
        pos += size
    return out


class TestRfmSegmentsVsReference:
    def test_segments_match(self, events, spark):
        per_user = defaultdict(lambda: {"last": None, "freq": 0, "cents": 0})
        for e in events:
            u = per_user[e["user_id"]]
            d = e["ts"].date()
            u["last"] = d if u["last"] is None or d > u["last"] else u["last"]
            u["freq"] += 1
            if e["event_type"] == "purchase":
                u["cents"] += _cents(e["value"])
        anchor = max(u["last"] for u in per_user.values())
        uids = list(per_user)
        r_t = _ntile(
            sorted(uids, key=lambda i: ((anchor - per_user[i]["last"]).days, i)),
            4,
        )
        f_t = _ntile(
            sorted(uids, key=lambda i: (-per_user[i]["freq"], i)), 4
        )
        m_t = _ntile(
            sorted(uids, key=lambda i: (-per_user[i]["cents"], i)), 4
        )
        exp = defaultdict(lambda: [0, None, None])
        for i in uids:
            seg = r_t[i] * 100 + f_t[i] * 10 + m_t[i]
            c = per_user[i]["cents"]
            s = exp[seg]
            s[0] += 1
            s[1] = c if s[1] is None else min(s[1], c)
            s[2] = c if s[2] is None else max(s[2], c)
        got = {
            r["segment"]: [r["n_users"], r["min_cents"], r["max_cents"]]
            for r in QUERIES["events_rfm_segments"](spark, SF).collect()
        }
        assert got == dict(exp)


class TestLorenzDecilesVsReference:
    def test_cumulative_shares(self, events, spark):
        cnt = Counter(e["user_id"] for e in events)
        order = sorted(cnt, key=lambda u: (-cnt[u], u))
        tile = _ntile(order, 10)
        by_dec = defaultdict(lambda: [0, 0])
        for u, d in tile.items():
            by_dec[d][0] += 1
            by_dec[d][1] += cnt[u]
        total = sum(cnt.values())
        cum = 0
        exp = {}
        for d in sorted(by_dec):
            cum += by_dec[d][1]
            exp[d] = (by_dec[d][0], by_dec[d][1], cum, cum / total)
        got = {
            r["decile"]: (
                r["n_users"], r["events"], r["cum_events"], r["cum_share"]
            )
            for r in QUERIES["events_lorenz_deciles"](spark, SF).collect()
        }
        assert got == exp


class TestZipfVsReference:
    def test_ols_slope_and_r2(self, documents, spark):
        freq = Counter(
            w for _, t in documents for w in t.lower().strip().split()
        )
        ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
        xs = [math.log(i + 1) for i in range(len(ranked))]
        ys = [math.log(c) for _, c in ranked]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        sxx = sum((x - mx) ** 2 for x in xs)
        sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        syy = sum((y - my) ** 2 for y in ys)
        slope = sxy / sxx
        r2 = sxy * sxy / (sxx * syy)
        (row,) = QUERIES["text_zipf_fit"](spark, SF).collect()
        assert row["n_types"] == n
        # reference floats accumulate in a different order than the
        # engine's regr_* fold: compare at the output grid's resolution
        assert abs(row["zipf_slope"] - slope) < 2e-4
        assert abs(row["r2"] - r2) < 2e-4


class TestKsMwuVsReference:
    @staticmethod
    def _samples(events):
        # RAW values: the registered queries run the statistics on the
        # untransformed value column (NULLs filtered on both engines)
        a = sorted(
            e["value"] for e in events
            if e["event_type"] == "purchase" and e["value"] is not None
        )
        b = sorted(
            e["value"] for e in events
            if e["event_type"] == "view" and e["value"] is not None
        )
        return a, b

    def test_ks_statistic(self, events, spark):
        a, b = self._samples(events)
        n1, n2 = len(a), len(b)
        grid = sorted(set(a) | set(b))
        best, best_at = -1, None
        ia = ib = 0
        for v in grid:
            while ia < n1 and a[ia] <= v:
                ia += 1
            while ib < n2 and b[ib] <= v:
                ib += 1
            diff = abs(ia * n2 - ib * n1)
            if diff > best:
                best, best_at = diff, v
        (row,) = QUERIES["stats_ks_test"](spark, SF).collect()
        assert (row["n1"], row["n2"]) == (n1, n2)
        assert row["d_scaled"] == best
        assert row["ks_at"] == best_at
        assert row["d_stat"] == best / (n1 * n2)

    def test_mwu_doubled_rank_sum(self, events, spark):
        a, b = self._samples(events)
        pooled = sorted(a + b)
        # doubled average rank per distinct value
        first = {}
        for i, v in enumerate(pooled):
            first.setdefault(v, i + 1)
        last = {}
        for i, v in enumerate(pooled):
            last[v] = i + 1
        r2x = {v: first[v] + last[v] for v in first}  # 2 * avg rank
        r1_x2 = sum(r2x[v] for v in a)
        n1, n2 = len(a), len(b)
        u1_x2 = r1_x2 - n1 * (n1 + 1)
        (row,) = QUERIES["stats_mannwhitney"](spark, SF).collect()
        assert (row["n1"], row["n2"]) == (n1, n2)
        assert row["u1_x2"] == u1_x2
        assert row["auc"] == u1_x2 / (2 * n1 * n2)


class TestSimhashVsReference:
    def test_pairs_match_pure_python_xxh64(self, documents, spark):
        """Full independent SimHash: Python XXH64 (written from the
        public spec, no Spark/DuckDB code), majority vote, all-pairs
        hamming — vs the registered query on real sf0.001 docs."""
        M = (1 << 64) - 1
        P1, P2, P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
        P4, P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5

        def rotl(x, r):
            return ((x << r) | (x >> (64 - r))) & M

        def fmix(h):
            h ^= h >> 33
            h = (h * P2) & M
            h ^= h >> 29
            h = (h * P3) & M
            return h ^ (h >> 32)

        def rnd(acc, k):
            return (rotl((acc + k * P2) & M, 31) * P1) & M

        def xxh64(bts, seed):
            n, off = len(bts), 0
            if n >= 32:
                v = [(seed + P1 + P2) & M, (seed + P2) & M, seed,
                     (seed - P1) & M]
                while off <= n - 32:
                    for i in range(4):
                        v[i] = rnd(v[i], int.from_bytes(
                            bts[off:off + 8], "little"))
                        off += 8
                h = (rotl(v[0], 1) + rotl(v[1], 7) + rotl(v[2], 12)
                     + rotl(v[3], 18)) & M
                for vi in v:
                    h = ((h ^ rnd(0, vi)) * P1 + P4) & M
            else:
                h = (seed + P5) & M
            h = (h + n) & M
            while off <= n - 8:
                h ^= rnd(0, int.from_bytes(bts[off:off + 8], "little"))
                h = (rotl(h, 27) * P1 + P4) & M
                off += 8
            if off <= n - 4:
                h ^= (int.from_bytes(bts[off:off + 4], "little") * P1) & M
                h = (rotl(h, 23) * P2 + P3) & M
                off += 4
            while off < n:
                h ^= (bts[off] * P5) & M
                h = (rotl(h, 11) * P1) & M
                off += 1
            return fmix(h)

        def hash_int0(seed):
            h = (seed + P5 + 4) & M
            return fmix((rotl(h, 23) * P2 + P3) & M)

        def sig(text):
            toks = [w for w in text.lower().strip().split() if w]
            counts = [0] * 64
            for t in toks:
                hw = hash_int0(xxh64(t.encode(), 42))
                for i in range(64):
                    counts[i] += (hw >> i) & 1
            n = len(toks)
            return [1 if 2 * c > n else 0 for c in counts]

        docs = [(i, t) for i, t in documents if i <= 300]
        sigs = {i: sig(t) for i, t in docs}
        ids = sorted(sigs)
        exp = {}
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                hd = sum(p != q for p, q in zip(sigs[a], sigs[b]))
                if hd <= 6:
                    exp[(a, b)] = hd
        got = {
            (r["doc_id_a"], r["doc_id_b"]): r["hd"]
            for r in QUERIES["dedup_simhash"](spark, SF).collect()
        }
        assert got == exp
