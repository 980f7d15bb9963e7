"""Independent-reference audit of the round-8 family on REAL data.

Every statistic is recomputed by a from-scratch pure-Python reference
over the actual sf0.001 parquet (fetched through DuckDB, never through
the Spark code under test) and compared to the registered query's
output. This is the layer the differential oracle CANNOT provide: the
oracle proves Spark and DuckDB agree, not that the shared formula is
right — the Cramer's V first draft divided by n twice on both engines
and sailed through the gate; a reference like these caught it.

The references deliberately use different shapes than the queries
(dict folds, sorted lists, itertools) so a transcription bug cannot
appear on both sides.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import date, timedelta

import duckdb
import pytest

from easy_alterator_spark.queries import QUERIES, load_all

load_all()

SF = "/root/testdata/sf0.001"


def _rows(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


@pytest.fixture(scope="module")
def events():
    """(event_id, ts, user_id, event_type, value, props) rows."""
    return _rows(
        f"SELECT event_id, ts, user_id, event_type, value, props "
        f"FROM read_parquet('{SF}/events.parquet')"
    )


@pytest.fixture(scope="module")
def docs():
    return _rows(
        f"SELECT doc_id, text, source "
        f"FROM read_parquet('{SF}/documents.parquet')"
    )


def cents(v):
    return int(math.floor(v * 100 + 0.5))


def grid(x, nudge=True):
    return math.floor(x * 1e4 + (1e-6 if nudge else 0.0)) / 1e4


def toks(text):
    return [t for t in text.strip().lower().split() if t]


class TestMomentAudit:
    def test_skew_kurtosis_vs_reference(self, spark, events):
        by_type = defaultdict(list)
        for _, _, _, et, v, _ in events:
            by_type[et].append(cents(v))
        want = {}
        for et, cs in by_type.items():
            n = len(cs)
            mean = sum(cs) / n
            m2 = sum((c - mean) ** 2 for c in cs) / n
            m3 = sum((c - mean) ** 3 for c in cs) / n
            m4 = sum((c - mean) ** 4 for c in cs) / n
            if m2 <= 0:
                continue
            want[et] = (n, m3 / m2**1.5, m4 / m2**2 - 3)
        got = {
            r["event_type"]: r
            for r in QUERIES["stats_skew_kurtosis"](spark, SF).collect()
        }
        assert set(got) == set(want)
        for et, (n, g1, g2) in want.items():
            assert got[et]["n"] == n
            # the query computes via exact integer multiples; the float
            # reference agrees to well under the 1e-4 grid
            assert abs(got[et]["skewness"] - g1) < 2e-4, et
            assert abs(got[et]["ex_kurtosis"] - g2) < 2e-4, et

    def test_spearman_vs_reference(self, spark, events):
        xs = [cents(v) for _, _, _, _, v, _ in events]
        ys = [int(ts.timestamp()) for _, ts, _, _, _, _ in events]

        def avg_ranks(vals):
            order = sorted(range(len(vals)), key=lambda i: vals[i])
            ranks = [0.0] * len(vals)
            i = 0
            while i < len(order):
                j = i
                while j < len(order) and vals[order[j]] == vals[order[i]]:
                    j += 1
                r = (i + 1 + j) / 2  # average of ranks i+1..j
                for k in range(i, j):
                    ranks[order[k]] = r
                i = j
            return ranks

        rx, ry = avg_ranks(xs), avg_ranks(ys)
        n = len(rx)
        mx, my = sum(rx) / n, sum(ry) / n
        num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        dx = math.sqrt(sum((a - mx) ** 2 for a in rx))
        dy = math.sqrt(sum((b - my) ** 2 for b in ry))
        rho = num / (dx * dy)
        (row,) = QUERIES["stats_spearman"](spark, SF).collect()
        assert row["n"] == n
        assert abs(row["spearman_rho"] - rho) < 2e-4

    def test_trimmed_mean_vs_reference(self, spark, events):
        by_type = defaultdict(list)
        for eid, _, _, et, v, _ in events:
            by_type[et].append((cents(v), eid))
        got = {
            r["event_type"]: r
            for r in QUERIES["stats_trimmed_mean"](spark, SF).collect()
        }
        for et, pairs in by_type.items():
            pairs.sort()
            n = len(pairs)
            k = n // 10
            kept = [c for c, _ in pairs[k : n - k]]
            assert got[et]["n"] == n and got[et]["n_kept"] == len(kept)
            assert got[et]["kept_sum"] == sum(kept)
            assert got[et]["trimmed_mean_cents"] == sum(kept) / len(kept)

    def test_daily_percentiles_vs_reference(self, spark, events):
        by_day = defaultdict(list)
        for eid, ts, _, _, v, _ in events:
            by_day[ts.date()].append((cents(v), eid))
        got = {
            r["day"]: r
            for r in QUERIES["events_daily_percentiles"](spark, SF).collect()
        }
        assert set(got) == set(by_day)
        for day, pairs in by_day.items():
            pairs.sort()
            n = len(pairs)
            cs = [c for c, _ in pairs]
            assert got[day]["n"] == n
            assert got[day]["p50"] == cs[(n + 1) // 2 - 1]
            assert got[day]["p95"] == cs[-(-19 * n // 20) - 1]
            assert got[day]["p99"] == cs[-(-99 * n // 100) - 1]

    def test_cramers_v_vs_reference(self, spark, events):
        obs = Counter()
        import json as _json

        for _, _, _, et, _, pr in events:
            obs[(et, int(_json.loads(pr)["k"]))] += 1
        rows = Counter()
        cols = Counter()
        for (et, it), o in obs.items():
            rows[et] += o
            cols[it] += o
        n = sum(obs.values())
        chi2 = 0.0
        for et in rows:
            for it in cols:
                e = rows[et] * cols[it] / n
                o = obs.get((et, it), 0)
                chi2 += (o - e) ** 2 / e
        v = math.sqrt(chi2 / (n * min(len(rows) - 1, len(cols) - 1)))
        (row,) = QUERIES["stats_cramers_v"](spark, SF).collect()
        assert (row["n"], row["nr"], row["nc"]) == (n, len(rows), len(cols))
        assert abs(row["chi2"] - chi2) < 1e-5
        assert abs(row["cramers_v"] - v) < 2e-4


class TestLifecycleAudit:
    def test_ewma_vs_reference(self, spark, events):
        daily = defaultdict(lambda: defaultdict(int))
        for _, ts, uid, _, v, _ in events:
            daily[uid][ts.date()] += cents(v)
        got = {
            r["user_id"]: r
            for r in QUERIES["events_ewma_smooth"](spark, SF).collect()
        }
        assert set(got) == set(daily)
        for uid, dd in daily.items():
            xs = [float(dd[d]) for d in sorted(dd)]
            acc = xs[0]
            for x in xs[1:]:
                acc = 0.5 * acc + 0.5 * x
            assert got[uid]["n_days"] == len(xs)
            assert got[uid]["ewma_spend"] == math.floor(acc * 1e4) / 1e4

    def test_survival_km_vs_reference(self, spark, events):
        first = {}
        purch = {}
        horizon = max(ts for _, ts, _, _, _, _ in events).date()
        for _, ts, uid, et, _, _ in events:
            d = ts.date()
            if uid not in first or d < first[uid]:
                first[uid] = d
            if et == "purchase" and (uid not in purch or d < purch[uid]):
                purch[uid] = d
        durs = []
        for uid, f in first.items():
            if uid in purch:
                durs.append(((purch[uid] - f).days, 1))
            else:
                durs.append(((horizon - f).days, 0))
        by_t = defaultdict(lambda: [0, 0])  # t -> [d, c]
        for t, ev in durs:
            by_t[t][0] += ev
            by_t[t][1] += 1
        s = 1.0
        total = len(durs)
        seen = 0
        want = {}
        for t in sorted(by_t):
            d, c = by_t[t]
            n_risk = total - seen
            s *= (n_risk - d) / n_risk
            want[t] = (n_risk, d, s)
            seen += c
        got = {
            r["t"]: r
            for r in QUERIES["events_survival_km"](spark, SF).collect()
        }
        assert set(got) == set(want)
        for t, (n_risk, d, s) in want.items():
            assert got[t]["n_risk"] == n_risk and got[t]["events"] == d
            assert abs(got[t]["survival"] - s) < 2e-4

    def test_growth_accounting_vs_reference(self, spark, events):
        def week_of(d):
            return d - timedelta(days=d.weekday())

        uw = defaultdict(set)
        for _, ts, uid, _, _, _ in events:
            uw[uid].add(week_of(ts.date()))
        weeks = sorted({w for ws in uw.values() for w in ws})
        max_week = weeks[-1]
        want = {
            w: {"new": 0, "ret": 0, "res": 0, "churn": 0} for w in weeks
        }
        for uid, ws in uw.items():
            first = min(ws)
            for w in ws:
                if w == first:
                    want[w]["new"] += 1
                elif w - timedelta(days=7) in ws:
                    want[w]["ret"] += 1
                else:
                    want[w]["res"] += 1
                nxt = w + timedelta(days=7)
                if nxt <= max_week and nxt not in ws:
                    want[nxt]["churn"] += 1
        got = {
            r["week"]: r
            for r in QUERIES["events_growth_accounting"](spark, SF).collect()
        }
        # the query emits only ACTIVE weeks; merge churn-only weeks in
        for w, exp in want.items():
            if w not in got:
                assert exp["new"] + exp["ret"] + exp["res"] == 0
                continue
            r = got[w]
            assert (
                r["new_users"],
                r["retained"],
                r["resurrected"],
                r["churned"],
            ) == (exp["new"], exp["ret"], exp["res"], exp["churn"]), w

    def test_attribution_vs_reference(self, spark, events):
        by_user = defaultdict(list)
        for eid, ts, uid, et, _, _ in events:
            by_user[uid].append((ts, eid, et))
        credit = Counter()
        touch_count = Counter()
        users = defaultdict(set)
        for uid, evs in by_user.items():
            evs.sort()
            conv = next(
                ((ts, eid) for ts, eid, et in evs if et == "purchase"), None
            )
            if conv is None:
                continue
            path = [et for ts, eid, et in evs if (ts, eid) < conv]
            k = len(path)
            for pos, ch in enumerate(path, start=1):
                if k == 1:
                    pm = 1000
                elif k == 2:
                    pm = 500
                elif pos in (1, k):
                    pm = 400
                else:
                    m = pos - 1
                    pm = 200 // (k - 2) + (1 if m <= 200 % (k - 2) else 0)
                credit[ch] += pm
                touch_count[ch] += 1
                users[ch].add(uid)
        got = {
            r["event_type"]: r
            for r in QUERIES["events_attribution_positional"](
                spark, SF
            ).collect()
        }
        assert set(got) == set(credit)
        for ch in credit:
            assert got[ch]["credit_permille"] == credit[ch]
            assert got[ch]["touches"] == touch_count[ch]
            assert got[ch]["users"] == len(users[ch])

    def test_interarrival_vs_reference(self, spark, events):
        by_type = defaultdict(list)
        for eid, ts, _, et, _, _ in events:
            by_type[et].append((int(ts.timestamp()), eid))
        got = {
            r["event_type"]: r
            for r in QUERIES["events_interarrival"](spark, SF).collect()
        }
        for et, secs in by_type.items():
            secs.sort()
            gaps = [
                secs[i + 1][0] - secs[i][0] for i in range(len(secs) - 1)
            ]
            if not gaps or sum(gaps) == 0:
                assert et not in got
                continue
            n, s1 = len(gaps), sum(gaps)
            s2 = sum(g * g for g in gaps)
            cv = math.sqrt(n * s2 - s1 * s1) / s1
            assert got[et]["n_gaps"] == n and got[et]["sum_gap_s"] == s1
            assert got[et]["mean_gap_s"] == s1 / n
            assert abs(got[et]["cv"] - cv) < 2e-4


class TestCorpusAudit:
    def test_hapax_vs_reference(self, spark, docs):
        per_source = defaultdict(Counter)
        for _, text, src in docs:
            per_source[src].update(toks(text))
        got = {
            r["source"]: r
            for r in QUERIES["text_hapax_ratio"](spark, SF).collect()
        }
        for src, tc in per_source.items():
            n_tokens = sum(tc.values())
            n_types = len(tc)
            if n_tokens <= 1 or n_types == 0:
                assert src not in got
                continue
            hapax = sum(1 for c in tc.values() if c == 1)
            r = got[src]
            assert (r["n_tokens"], r["n_types"], r["hapax"]) == (
                n_tokens,
                n_types,
                hapax,
            )
            assert abs(r["ttr"] - n_types / n_tokens) < 2e-4
            assert (
                abs(r["herdan_c"] - math.log(n_types) / math.log(n_tokens))
                < 2e-4
            )

    def test_js_divergence_vs_reference(self, spark, docs):
        per_source = defaultdict(Counter)
        for _, text, src in docs:
            per_source[src].update(toks(text))
        srcs = sorted(per_source)
        got = {
            (r["source_a"], r["source_b"]): r["js_divergence"]
            for r in QUERIES["corpus_js_divergence"](spark, SF).collect()
        }
        for i, a in enumerate(srcs):
            for b in srcs[i + 1 :]:
                ca, cb = per_source[a], per_source[b]
                na, nb = sum(ca.values()), sum(cb.values())
                js = 0.0
                for term in set(ca) | set(cb):
                    p, q = ca.get(term, 0) / na, cb.get(term, 0) / nb
                    m = (p + q) / 2
                    if p > 0:
                        js += 0.5 * p * math.log(p / m)
                    if q > 0:
                        js += 0.5 * q * math.log(q / m)
                assert abs(got[(a, b)] - js) < 2e-4, (a, b)

    def test_source_overlap_vs_reference(self, spark, docs):
        vocab = defaultdict(set)
        for _, text, src in docs:
            vocab[src].update(toks(text))
        got = {
            (r["source_a"], r["source_b"]): r
            for r in QUERIES["corpus_source_overlap"](spark, SF).collect()
        }
        srcs = sorted(vocab)
        for i, a in enumerate(srcs):
            for b in srcs[i + 1 :]:
                inter = len(vocab[a] & vocab[b])
                if inter == 0:
                    assert (a, b) not in got
                    continue
                r = got[(a, b)]
                assert (r["inter"], r["vocab_a"], r["vocab_b"]) == (
                    inter,
                    len(vocab[a]),
                    len(vocab[b]),
                )
                assert r["jaccard"] == inter / len(vocab[a] | vocab[b])

    def test_lm_dirichlet_vs_reference(self, spark, docs):
        q = ("window", "shuffle", "broadcast")
        dl = {}
        tf = defaultdict(Counter)
        coll = Counter()
        for doc_id, text, _ in docs:
            ts = toks(text)
            dl[doc_id] = len(ts)
            coll.update(ts)
            for t in ts:
                if t in q:
                    tf[doc_id][t] += 1
        c_total = sum(coll.values())
        got = {
            r["doc_id"]: r
            for r in QUERIES["search_lm_dirichlet"](spark, SF).collect()
        }
        assert set(got) == {d for d in tf if tf[d]}
        for doc_id, terms in tf.items():
            if not terms:
                continue
            raw = sum(
                math.log(
                    (n + 2000.0 * coll[t] / c_total) / (dl[doc_id] + 2000.0)
                )
                for t, n in terms.items()
            )
            assert got[doc_id]["n_terms"] == len(terms)
            assert abs(got[doc_id]["score"] - raw) < 2e-4


class TestAssociationAudit:
    def _user_items(self, events):
        import json as _json

        ui = defaultdict(set)
        for _, _, uid, _, _, pr in events:
            ui[uid].add(int(_json.loads(pr)["k"]))
        return ui

    def test_cooccur_vs_reference(self, spark, events):
        ui = self._user_items(events)
        co = Counter()
        nu = Counter()
        for items in ui.values():
            s = sorted(items)
            for it in s:
                nu[it] += 1
            for i, a in enumerate(s):
                for b in s[i + 1 :]:
                    co[(a, b)] += 1
        sym = defaultdict(list)
        for (a, b), c in co.items():
            if c >= 5:
                sym[a].append((c, b))
                sym[b].append((c, a))
        want = {}
        for a, lst in sym.items():
            lst.sort(key=lambda cb: (-cb[0], cb[1]))
            for rnk, (c, b) in enumerate(lst[:5], start=1):
                want[(a, b)] = (c, rnk)
        got = {
            (r["item_a"], r["item_b"]): (r["co"], r["rnk"])
            for r in QUERIES["rec_item_cooccur"](spark, SF).collect()
        }
        assert got == want

    def test_triangles_vs_reference(self, spark, events):
        ui = self._user_items(events)
        co = Counter()
        for items in ui.values():
            s = sorted(items)
            for i, a in enumerate(s):
                for b in s[i + 1 :]:
                    co[(a, b)] += 1
        n_pairs, sum_co = len(co), sum(co.values())
        edges = {p for p, c in co.items() if c * n_pairs > sum_co}
        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
        tri = Counter()
        for a, b in edges:
            for c in adj[b]:
                if (a, c) in edges:
                    tri[a] += 1
                    tri[b] += 1
                    tri[c] += 1
        got = {
            r["node"]: r["triangles"]
            for r in QUERIES["graph_triangles"](spark, SF).collect()
        }
        assert got == dict(tri)

    def test_rbo_vs_reference(self, spark, events):
        import json as _json

        horizon = max(ts for _, ts, _, _, _, _ in events).date()
        cur = Counter()
        prev = Counter()
        for _, ts, _, _, _, pr in events:
            d = ts.date()
            item = int(_json.loads(pr)["k"])
            if d > horizon - timedelta(days=7):
                cur[item] += 1
            elif d > horizon - timedelta(days=14):
                prev[item] += 1

        def top20(cnt):
            return [
                it
                for it, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            ][:20]

        a, b = top20(cur), top20(prev)
        # straight RBO@20 (truncated): (1-p) sum_d p^(d-1) |A_d ^ B_d|/d
        p = 0.9
        rbo = 0.0
        for d in range(1, 21):
            x = len(set(a[:d]) & set(b[:d]))
            rbo += (1 - p) * p ** (d - 1) * x / d
        (row,) = QUERIES["events_rank_stability_rbo"](spark, SF).collect()
        n_common = len(set(a) & set(b))
        assert row["n_common"] == n_common
        if n_common == 0:
            assert row["rbo"] is None or row["rbo"] == 0.0
        else:
            assert abs(row["rbo"] - rbo) < 1e-9


class TestOpsAudit:
    def test_forecast_backtest_vs_reference(self, spark, events):
        daily = defaultdict(Counter)
        for _, ts, _, et, _, _ in events:
            daily[et][ts.date()] += 1
        got = {
            r["event_type"]: r
            for r in QUERIES["events_forecast_backtest"](spark, SF).collect()
        }
        for et, dd in daily.items():
            scored = [
                d
                for d in dd
                if d - timedelta(days=7) in dd and d - timedelta(days=1) in dd
            ]
            if not scored:
                assert et not in got
                continue
            sae_s = sum(abs(dd[d] - dd[d - timedelta(days=7)]) for d in scored)
            sae_n = sum(abs(dd[d] - dd[d - timedelta(days=1)]) for d in scored)
            r = got[et]
            assert r["n_scored"] == len(scored)
            assert (r["sae_seasonal"], r["sae_naive"]) == (sae_s, sae_n)
            assert r["mae_seasonal"] == sae_s / len(scored)

    def test_volume_alerts_vs_reference(self, spark, events):
        daily = defaultdict(Counter)
        for _, ts, _, et, _, _ in events:
            daily[et][ts.date()] += 1
        got = {
            (r["event_type"], r["day"]): r
            for r in QUERIES["dq_volume_alerts"](spark, SF).collect()
        }
        want_keys = set()
        for et, dd in daily.items():
            days = sorted(dd)
            for i, d in enumerate(days):
                prior = [dd[x] for x in days[max(0, i - 7) : i]]
                if len(prior) != 7:
                    continue
                want_keys.add((et, d))
                med = sorted(prior)[3]
                r = got[(et, d)]
                assert r["med7"] == med
                assert r["spike"] == (1 if dd[d] * 2 > 3 * med else 0)
                assert r["drop_alert"] == (1 if dd[d] * 2 < med else 0)
        assert set(got) == want_keys

    def test_trending_vs_reference(self, spark, events):
        import json as _json

        horizon = max(ts for _, ts, _, _, _, _ in events).date()
        cur = Counter()
        prev = Counter()
        for _, ts, _, _, _, pr in events:
            d = ts.date()
            item = int(_json.loads(pr)["k"])
            if d > horizon - timedelta(days=7):
                cur[item] += 1
            elif d > horizon - timedelta(days=14):
                prev[item] += 1
        rank_now = {
            it: i + 1
            for i, (it, _) in enumerate(
                sorted(cur.items(), key=lambda kv: (-kv[1], kv[0]))
            )
        }
        rank_prev = {
            it: i + 1
            for i, (it, _) in enumerate(
                sorted(prev.items(), key=lambda kv: (-kv[1], kv[0]))
            )
        }
        got = {
            r["item"]: r
            for r in QUERIES["events_trending_items"](spark, SF).collect()
        }
        want = {it for it, rk in rank_now.items() if rk <= 20}
        assert set(got) == want
        for it in want:
            assert got[it]["n_now"] == cur[it]
            assert got[it]["rank_now"] == rank_now[it]
            if it in rank_prev:
                assert got[it]["rank_prev"] == rank_prev[it]
            else:
                assert got[it]["rank_prev"] is None

    def test_lag_matrix_vs_reference(self, spark, events):
        daily = defaultdict(lambda: defaultdict(int))
        for _, ts, uid, _, v, _ in events:
            daily[uid][ts.date()] += cents(v)
        got = {
            (r["user_id"], r["day"]): r
            for r in QUERIES["feature_lag_matrix"](spark, SF).collect()
        }
        n_rows = 0
        for uid, dd in daily.items():
            days = sorted(dd)
            for i, d in enumerate(days):
                n_rows += 1
                r = got[(uid, d)]
                assert r["spend"] == dd[d]
                assert r["lag1_spend"] == (dd[days[i - 1]] if i else None)
                lo = max(0, i - 6)
                assert r["r7_sum"] == sum(dd[x] for x in days[lo : i + 1])
                assert r["r7_days"] == i + 1 - lo
                assert r["next_spend"] == (
                    dd[days[i + 1]] if i + 1 < len(days) else None
                )
        assert len(got) == n_rows


class TestMarkovAudit:
    def test_markov_backtest_vs_reference(self, spark, events):
        horizon = max(ts for _, ts, _, _, _, _ in events).date()
        cut = horizon - timedelta(days=7)
        by_user = defaultdict(list)
        for eid, ts, uid, et, _, _ in events:
            by_user[uid].append((ts, eid, et))
        train = Counter()
        test = []
        for uid, evs in by_user.items():
            evs.sort()
            for (_, _, a), (ts2, _, b) in zip(evs, evs[1:]):
                if ts2.date() <= cut:
                    train[(a, b)] += 1
                else:
                    test.append((a, b))
        pred = {}
        for (a, b), c in sorted(
            train.items(), key=lambda kv: (kv[0][0], -kv[1], kv[0][1])
        ):
            pred.setdefault(a, b)
        want = defaultdict(lambda: [0, 0])
        for a, b in test:
            if a in pred:
                want[a][0] += 1
                want[a][1] += int(pred[a] == b)
        got = {
            r["prev_type"]: r
            for r in QUERIES["events_markov_backtest"](spark, SF).collect()
        }
        assert set(got) == set(want)
        for a, (n, hits) in want.items():
            assert got[a]["pred_type"] == pred[a]
            assert (got[a]["n_test"], got[a]["hits"]) == (n, hits)
            assert got[a]["accuracy"] == hits / n


class TestBrownForsytheAudit:
    def test_brown_forsythe_vs_reference(self, spark, events):
        by_type = defaultdict(list)
        for _, _, _, et, v, _ in events:
            by_type[et].append(cents(v))
        zs = {}
        for et, xs in by_type.items():
            xs.sort()
            n = len(xs)
            med = (xs[(n - 1) // 2] + xs[n // 2]) / 2
            zs[et] = [abs(x - med) for x in xs]
        k = len(zs)
        n_total = sum(len(z) for z in zs.values())
        grand = sum(sum(z) for z in zs.values()) / n_total
        ssb = sum(
            len(z) * (sum(z) / len(z) - grand) ** 2 for z in zs.values()
        )
        ssw = sum(
            sum((x - sum(z) / len(z)) ** 2 for x in z) for z in zs.values()
        )
        f = (ssb / ssw) * (n_total - k) / (k - 1)
        (row,) = QUERIES["stats_brown_forsythe"](spark, SF).collect()
        assert (row["k"], row["n_total"]) == (k, n_total)
        # the query's z is DOUBLED (|2x - med2|), which scales both
        # sums of squares by 4 — F is scale-invariant
        assert abs(row["f_stat"] - f) < 2e-3
