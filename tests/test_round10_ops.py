"""Round-10 ops: from-scratch pure-Python references for the new
queries (CUSUM, Theil-Sen, Mann-Kendall, runs test, MCC, PMI), run
against the sf0.001 driver fixture. The round-8 lesson stands:
equivalent-form tests and the differential oracle can both pass on a
SHARED formula bug — only an independently-shaped reference catches
it. These references use plain dict/sort/math Python, deliberately
nothing like the Spark or SQL forms.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from easy_alterator_spark.queries import QUERIES, load_all

load_all()

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def daily_cents(spark):
    """day -> exact total cents, the shared input of the series tests."""
    from easy_alterator_spark.sources import load_table

    rows = load_table(spark, SF, "events").collect()
    d = defaultdict(int)
    for r in rows:
        if r["value"] is None:
            continue
        d[r["ts"].date()] += math.floor(r["value"] * 100 + 0.5)
    return dict(d)


def test_cusum_changepoint_reference(spark, daily_cents):
    got = {
        r["day"]: (r["day_cents"], r["cusum_num"], r["is_peak"])
        for r in QUERIES["events_cusum_changepoint"](spark, SF).collect()
    }
    days = sorted(daily_cents)
    D, S = len(days), sum(daily_cents.values())
    pre = 0
    want = {}
    for k, day in enumerate(days, start=1):
        pre += daily_cents[day]
        want[day] = D * pre - k * S
    mab = max(abs(v) for v in want.values())
    assert set(got) == set(want)
    for day in days:
        assert got[day] == (daily_cents[day], want[day], abs(want[day]) == mab)
    assert sum(1 for d in days if got[d][2]) >= 1  # a peak exists


def test_theilsen_reference(spark, daily_cents):
    (row,) = QUERIES["stats_theilsen_trend"](spark, SF).collect()
    days = sorted(daily_cents)
    slopes = []
    for i in range(len(days)):
        for j in range(i + 1, len(days)):
            dy = daily_cents[days[j]] - daily_cents[days[i]]
            dd = (days[j] - days[i]).days
            slopes.append((dy / dd, days[i], days[j]))
    slopes.sort()
    n_pairs = len(slopes)
    lower_median = slopes[(n_pairs + 1) // 2 - 1][0]
    assert row["n_days"] == len(days)
    assert row["n_pairs"] == n_pairs
    assert row["sen_slope"] == lower_median


def test_mann_kendall_reference(spark, daily_cents):
    (row,) = QUERIES["stats_mann_kendall"](spark, SF).collect()
    days = sorted(daily_cents)
    ys = [daily_cents[d] for d in days]
    s = sum(
        (0 if ys[j] == ys[i] else (1 if ys[j] > ys[i] else -1))
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    )
    n = len(ys)
    tcorr = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(ys).values() if t > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - tcorr
    assert row["n_days"] == n and row["s_stat"] == s and row["var18"] == var18
    if s != 0 and var18 != 0:
        z = (s - (1 if s > 0 else -1)) / math.sqrt(var18 / 18.0)
        assert abs(row["z"] - z) < 2e-4
    else:
        assert row["z"] == 0.0


def test_runs_test_reference(spark, daily_cents):
    (row,) = QUERIES["stats_runs_test"](spark, SF).collect()
    days = sorted(daily_cents)
    ys = [daily_cents[d] for d in days]
    lower_median = sorted(ys)[(len(ys) + 1) // 2 - 1]
    seq = [y > lower_median for y in ys if y != lower_median]
    n1, n2 = sum(seq), len(seq) - sum(seq)
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    assert (row["n1"], row["n2"], row["n_runs"]) == (n1, n2, runs)
    if n1 and n2:
        tot = n1 + n2
        mu = 1 + 2 * n1 * n2 / tot
        sig = math.sqrt(
            2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) / (tot * tot * (tot - 1))
        )
        assert abs(row["z"] - (runs - mu) / sig) < 2e-4


def test_mcc_reference(spark):
    from easy_alterator_spark.sources import load_table

    (row,) = QUERIES["eval_mcc"](spark, SF).collect()
    vecs = load_table(spark, SF, "embeddings").collect()
    scored = [
        (math.floor(float(r["embedding"][0]) * 1e4 + 0.5), int(r["label"] >= 5))
        for r in vecs
    ]
    lo = min(s for s, _ in scored)
    hi = max(s for s, _ in scored)
    tp = fp = tn = fn = 0
    for s, y in scored:
        p6 = 0 if hi == lo else math.floor((s - lo) / (hi - lo) * 1e6)
        pred = p6 >= 500000
        if pred and y:
            tp += 1
        elif pred:
            fp += 1
        elif y:
            fn += 1
        else:
            tn += 1
    assert (row["tp"], row["fp"], row["tn"], row["fn"]) == (tp, fp, tn, fn)
    den = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    if den:
        mcc = (tp * tn - fp * fn) / math.sqrt(den)
        assert abs(row["mcc"] - mcc) < 2e-6
    else:
        assert row["mcc"] == 0.0


def test_pmi_reference_and_cap(spark, tmp_path):
    """PMI on a synthetic corpus where one doc is WIDER than the
    64-token cap: the reference applies the identical cap, and the
    capped tokens are the highest-tf ones."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = []
    # 30 docs over a small vocab so pairs clear the support floor
    for i in range(30):
        toks = ["alpha", "beta"] + (["gamma"] if i % 2 == 0 else ["delta"])
        docs.append((i, " ".join(toks)))
    # one wide doc: 100 distinct rare tokens plus "alpha alpha" (tf 2
    # keeps alpha ahead of the singletons under the tf-then-token cap)
    wide = "alpha alpha " + " ".join(f"rare{j:03d}" for j in range(100))
    docs.append((30, wide))
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["s"] * len(docs), pa.string()),
            "n_chars": pa.array(
                [len(d[1]) for d in docs], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    got = {
        (r["term_a"], r["term_b"]): (r["c_ab"], r["c_a"], r["c_b"], r["pmi"])
        for r in QUERIES["text_pmi_pairs"](spark, str(tmp_path)).collect()
    }

    # reference with the identical cap: per-doc top-64 by (tf desc,
    # token asc)
    capped_sets = []
    for _, text in docs:
        tf = Counter(t for t in text.lower().split() if t)
        kept = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:64]
        capped_sets.append({t for t, _ in kept})
    n = len(docs)
    ca = Counter(t for s in capped_sets for t in s)
    cab = Counter()
    for s in capped_sets:
        ss = sorted(s)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                cab[(ss[i], ss[j])] += 1
    want = {}
    for (ta, tb), c in cab.items():
        if c >= 10:
            pmi = math.floor(
                math.log(n * c / (ca[ta] * ca[tb])) * 1e4 + 1e-6
            ) / 1e4
            want[(ta, tb)] = (c, ca[ta], ca[tb], pmi)
    assert got == want and len(got) > 0
    # the wide doc's alpha (tf 2) survived its cap; 37 of its 100
    # singleton rares were evicted (64 - 1 kept slots for rares)
    assert "alpha" in capped_sets[-1]
    assert len(capped_sets[-1]) == 64


def test_matryoshka_reference(spark):
    """Brute-force pure-Python replay on sf0.001 — also the prune's
    independent correctness check (the query prunes per-partition;
    this reference never prunes)."""
    from easy_alterator_spark.sources import load_table

    got = {
        r["qid"]: (r["overlap10"], r["full_top1"], r["prefix_top1"])
        for r in QUERIES["embedding_matryoshka_eval"](spark, SF).collect()
    }
    vecs = {
        r["vec_id"]: [
            math.floor(float(x) * 1e4 + 0.5) for x in r["embedding"]
        ]
        for r in load_table(spark, SF, "embeddings").collect()
    }
    want = {}
    for qid in (0, 1, 2, 3, 4):
        qv = vecs[qid]
        full, pre = [], []
        for vid, cv in vecs.items():
            if vid == qid:
                continue
            full.append((-sum(a * b for a, b in zip(qv, cv)), vid))
            pre.append((-sum(a * b for a, b in zip(qv[:16], cv[:16])), vid))
        full.sort()
        pre.sort()
        f10 = {vid for _, vid in full[:10]}
        p10 = {vid for _, vid in pre[:10]}
        want[qid] = (len(f10 & p10), full[0][1], pre[0][1])
    assert got == want


def test_matryoshka_plan_shape(spark):
    """The vector table must never be the shuffled side of a join —
    probes broadcast, scoring map-only; the rank windows run over the
    partition-locally pruned pairs."""
    from easy_alterator_spark.plans.audit import formatted_plan, join_counts

    plan = formatted_plan(QUERIES["embedding_matryoshka_eval"](spark, SF))
    jc = join_counts(plan)
    assert jc["SortMergeJoin"] == 0 and jc["ShuffledHashJoin"] == 0, jc
    assert jc["BroadcastNestedLoopJoin"] >= 1, jc


def test_bootstrap_poisson_reference(spark):
    """Replay the bootstrap in pure Python from the Spark-computed
    hash residues (the hash itself is parity-pinned against DuckDB in
    the round-9 xxh64 tests): weight ladder, replicate means, order
    statistics, and the CI must match; the CI must bracket the mean."""
    from pyspark.sql import functions as F

    from easy_alterator_spark.queries.evalops import (
        _BOOT_B,
        _POIS_CUM_20,
    )
    from easy_alterator_spark.sources import load_table

    (row,) = QUERIES["stats_bootstrap_poisson"](spark, SF).collect()

    ev = load_table(spark, SF, "events").filter(F.col("value").isNotNull())
    e = [
        (r["event_id"], math.floor(r["value"] * 100 + 0.5))
        for r in ev.collect()
    ]
    # hash residues via Spark (one batch), arithmetic in Python
    ids = spark.createDataFrame(
        [(i,) for i, _ in e], "event_id long"
    ).select(
        "event_id",
        *[
            F.pmod(
                F.xxhash64("event_id", F.lit(b).cast("long")),
                F.lit(1048576),
            ).alias(f"u{b}")
            for b in range(_BOOT_B)
        ],
    )
    us = {r["event_id"]: [r[f"u{b}"] for b in range(_BOOT_B)] for r in ids.collect()}

    def weight(u):
        for k, c in enumerate(_POIS_CUM_20):
            if u < c:
                return k
        return len(_POIS_CUM_20)

    means = []
    for b in range(_BOOT_B):
        nw = sw = 0
        for eid, c in e:
            w = weight(us[eid][b])
            nw += w
            sw += w * c
        if nw > 0:
            means.append(sw / nw)
    means.sort()
    b_eff = len(means)
    lo = means[math.ceil(0.05 * b_eff) - 1]
    hi = means[math.ceil(0.95 * b_eff) - 1]
    n = len(e)
    mean = sum(c for _, c in e) / n
    assert row["n_events"] == n and row["b_eff"] == b_eff
    assert row["mean"] == mean
    assert row["ci90_lo"] == lo and row["ci90_hi"] == hi
    assert row["ci90_lo"] <= row["mean"] <= row["ci90_hi"]
    assert row["ci90_lo"] < row["ci90_hi"]


def test_isotonic_fit_equals_pava(spark):
    """The minimax-form query must equal ACTUAL pool-adjacent-
    violators — a genuinely different algorithm (sequential pooling
    vs joins+windows), so a shared formula bug cannot pass both."""
    from easy_alterator_spark.sources import load_table

    got = {
        r["s"]: (r["n"], r["k"], r["fit"])
        for r in QUERIES["eval_isotonic_fit"](spark, SF).collect()
    }
    vecs = load_table(spark, SF, "embeddings").collect()
    bins = defaultdict(lambda: [0, 0])
    for r in vecs:
        s = math.floor(float(r["embedding"][0]) * 1e4 + 0.5)
        bins[s][0] += 1
        bins[s][1] += int(r["label"] >= 5)
    order = sorted(bins)
    # PAVA with weights = bin counts
    blocks = [
        [bins[s][1] / bins[s][0], bins[s][0], [s]] for s in order
    ]  # [mean, weight, members]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] > blocks[i + 1][0] + 1e-15:
            m = (
                blocks[i][0] * blocks[i][1]
                + blocks[i + 1][0] * blocks[i + 1][1]
            ) / (blocks[i][1] + blocks[i + 1][1])
            blocks[i] = [
                m,
                blocks[i][1] + blocks[i + 1][1],
                blocks[i][2] + blocks[i + 1][2],
            ]
            del blocks[i + 1]
            if i > 0:
                i -= 1
        else:
            i += 1
    want_fit = {}
    for mean, _, members in blocks:
        for s in members:
            want_fit[s] = mean
    assert set(got) == set(want_fit)
    for s in order:
        n, k, fit = got[s]
        assert (n, k) == tuple(bins[s])
        assert abs(fit - want_fit[s]) < 1e-9, (s, fit, want_fit[s])
    # monotone nondecreasing in s
    fits = [got[s][2] for s in order]
    assert all(a <= b + 1e-15 for a, b in zip(fits, fits[1:]))


def test_round10_degenerate_fixture_differential(spark, tmp_path):
    """Adversarial-degenerate corpus (ONE calendar day, all-equal
    values, 6 tiny embeddings): every round-10 query must agree with
    its oracle here too — single-day series (0 Theil-Sen pairs, MK
    var18 = 0), all-tied daily totals (runs test excludes every day),
    and a query set as large as the candidate set (matryoshka)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from easy_alterator_spark.queries import ORACLES, load_all

    load_all()
    d = str(tmp_path)
    n = 20
    base = 1_704_067_200_000_000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [base + i * 1000 for i in range(n)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1 + i % 3 for i in range(n)], pa.int64()),
                "event_type": pa.array(["view"] * n, pa.string()),
                "value": pa.array([10.0] * n, pa.float64()),
                "props": pa.array(['{"k": 1}'] * n, pa.string()),
            }
        ),
        f"{d}/events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(6), pa.int64()),
                "embedding": pa.array(
                    [[0.1 * i] + [0.0] * 63 for i in range(6)],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([1, 9, 1, 9, 1, 9], pa.int64()),
            }
        ),
        f"{d}/embeddings.parquet",
    )
    con = duckdb.connect()
    for t in ("events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    for q in (
        "stats_theilsen_trend",
        "stats_mann_kendall",
        "stats_runs_test",
        "events_cusum_changepoint",
        "stats_bootstrap_poisson",
        "eval_isotonic_fit",
        "eval_mcc",
        "embedding_matryoshka_eval",
    ):
        srows = sorted(tuple(r) for r in QUERIES[q](spark, d).collect())
        orows = sorted(tuple(r) for r in con.execute(ORACLES[q]).fetchall())
        assert srows == orows, (q, srows, orows)
    # and the degenerate shapes are the DOCUMENTED ones
    assert QUERIES["stats_theilsen_trend"](spark, d).count() == 0
    (mk,) = QUERIES["stats_mann_kendall"](spark, d).collect()
    assert mk["var18"] == 0 and mk["z"] == 0.0


def test_corpus_mix_plan_reference(spark):
    from easy_alterator_spark.queries.featureops import _MIX_SHARES
    from easy_alterator_spark.sources import load_table

    got = {
        r["lang"]: (
            r["tokens"],
            r["target"],
            r["alloc"],
            r["deficit"],
            r["rate_micro"],
        )
        for r in QUERIES["corpus_mix_plan"](spark, SF).collect()
    }
    toks = defaultdict(int)
    for r in load_table(spark, SF, "documents").collect():
        toks[r["lang"]] += len(
            [t for t in r["text"].lower().strip().split() if t]
        )
    budget = sum(toks.values()) // 2
    want = {}
    for lang, n in toks.items():
        target = budget * _MIX_SHARES.get(lang, 0) // 100
        alloc = min(n, target)
        want[lang] = (n, target, alloc, target - alloc, alloc * 1000000 // n)
    assert got == want and len(got) >= 3
    # the plan allocates no more than the budget
    assert sum(v[2] for v in got.values()) <= budget
