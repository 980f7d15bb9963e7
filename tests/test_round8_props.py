"""Randomized invariant tests for the round-8 family: random event
fixtures (seeded, adversarial shapes — single users, ties, empty
groups) written as parquet and run through the REGISTERED queries,
checked against structural invariants and pure-Python references.
Complements test_round8_ops.py (hand fixtures) and
test_round8_audit.py (real-data references).
"""

from __future__ import annotations

import math
import random
from collections import defaultdict
from datetime import datetime, timedelta

import pytest

from easy_alterator_spark.queries import QUERIES, load_all

load_all()

T0 = datetime(2026, 1, 1, 0, 0, 0)
TYPES = ["view", "click", "purchase", "signup", "error"]


def _random_events(seed, n_users=8, n_days=21, max_events=120):
    rng = random.Random(seed)
    rows = []
    eid = 0
    for _ in range(rng.randint(5, max_events)):
        eid += 1
        rows.append(
            (
                eid,
                T0
                + timedelta(
                    days=rng.randint(0, n_days - 1),
                    seconds=rng.randint(0, 86399),
                ),
                rng.randint(1, n_users),
                rng.choice(TYPES),
                rng.choice([0.0, 0.01, 1.0, 2.5, 99.99, 560.21]),
                '{"k": %d}' % rng.randint(0, 9),
            )
        )
    return rows


def _write(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


SEEDS = [7, 42, 1337]


@pytest.mark.parametrize("seed", SEEDS)
def test_attribution_credit_conserved(spark, tmp_path, seed):
    """Every converting user's path credits sum to EXACTLY 1000
    per-mille, for any path length the generator produces."""
    rows = _random_events(seed)
    _write(spark, tmp_path / str(seed), rows)
    out = QUERIES["events_attribution_positional"](
        spark, str(tmp_path / str(seed))
    ).collect()
    total_credit = sum(r["credit_permille"] for r in out)
    # python reference: count converting users with >= 1 touch
    by_user = defaultdict(list)
    for eid, ts, uid, et, _, _ in rows:
        by_user[uid].append((ts, eid, et))
    n_paths = 0
    for evs in by_user.values():
        evs.sort()
        conv = next(((ts, eid) for ts, eid, et in evs if et == "purchase"), None)
        if conv and any((ts, eid) < conv for ts, eid, _ in evs):
            n_paths += 1
    assert total_credit == 1000 * n_paths


@pytest.mark.parametrize("seed", SEEDS)
def test_survival_monotone_and_bounded(spark, tmp_path, seed):
    rows = _random_events(seed)
    _write(spark, tmp_path / str(seed), rows)
    out = sorted(
        QUERIES["events_survival_km"](
            spark, str(tmp_path / str(seed))
        ).collect(),
        key=lambda r: r["t"],
    )
    assert out, "every fixture has at least one duration"
    prev = 1.0 + 1e-12
    for r in out:
        assert 0.0 <= r["survival"] <= 1.0
        assert r["survival"] <= prev + 1e-9, "survival must be non-increasing"
        assert r["events"] <= r["n_risk"]
        prev = r["survival"]
    # risk sets shrink as durations grow
    risks = [r["n_risk"] for r in out]
    assert risks == sorted(risks, reverse=True)


@pytest.mark.parametrize("seed", SEEDS)
def test_growth_accounting_identity(spark, tmp_path, seed):
    """actives(w) == new + retained + resurrected for every week, and
    churned(w) never exceeds actives(w - 1)."""
    rows = _random_events(seed)
    _write(spark, tmp_path / str(seed), rows)
    out = {
        r["week"]: r
        for r in QUERIES["events_growth_accounting"](
            spark, str(tmp_path / str(seed))
        ).collect()
    }

    def week_of(d):
        return d - timedelta(days=d.weekday())

    actives = defaultdict(set)
    for _, ts, uid, _, _, _ in rows:
        actives[week_of(ts.date())].add(uid)
    for w, r in out.items():
        assert (
            r["new_users"] + r["retained"] + r["resurrected"]
            == len(actives[w])
        ), w
        prev = actives.get(w - timedelta(days=7), set())
        assert r["churned"] <= len(prev), w
        assert r["churned"] == len(prev - actives[w]), w


@pytest.mark.parametrize("seed", SEEDS)
def test_daily_percentiles_ordered(spark, tmp_path, seed):
    rows = _random_events(seed)
    _write(spark, tmp_path / str(seed), rows)
    for r in QUERIES["events_daily_percentiles"](
        spark, str(tmp_path / str(seed))
    ).collect():
        assert r["p50"] <= r["p95"] <= r["p99"]
        cents = sorted(
            int(math.floor(v * 100 + 0.5))
            for _, ts, _, _, v, _ in rows
            if ts.date() == r["day"]
        )
        assert r["n"] == len(cents)
        assert r["p50"] == cents[(len(cents) + 1) // 2 - 1]
        assert cents[0] <= r["p50"] and r["p99"] <= cents[-1]


@pytest.mark.parametrize("seed", SEEDS)
def test_ewma_bounded_by_series(spark, tmp_path, seed):
    """The smoother never leaves the [min, max] hull of the user's
    daily series."""
    rows = _random_events(seed)
    _write(spark, tmp_path / str(seed), rows)
    daily = defaultdict(lambda: defaultdict(int))
    for _, ts, uid, _, v, _ in rows:
        daily[uid][ts.date()] += int(math.floor(v * 100 + 0.5))
    out = {
        r["user_id"]: r
        for r in QUERIES["events_ewma_smooth"](
            spark, str(tmp_path / str(seed))
        ).collect()
    }
    assert set(out) == set(daily)
    for uid, dd in daily.items():
        lo, hi = min(dd.values()), max(dd.values())
        # floor-grid can dip at most 1e-4 below the true value
        assert lo - 1e-4 <= out[uid]["ewma_spend"] <= hi


@pytest.mark.parametrize("seed", SEEDS)
def test_trimmed_mean_within_hull(spark, tmp_path, seed):
    rows = _random_events(seed)
    _write(spark, tmp_path / str(seed), rows)
    by_type = defaultdict(list)
    for _, _, _, et, v, _ in rows:
        by_type[et].append(int(math.floor(v * 100 + 0.5)))
    for r in QUERIES["stats_trimmed_mean"](
        spark, str(tmp_path / str(seed))
    ).collect():
        cs = sorted(by_type[r["event_type"]])
        n = len(cs)
        k = n // 10
        kept = cs[k : n - k]
        assert r["n_kept"] == len(kept)
        assert kept[0] <= r["trimmed_mean_cents"] <= kept[-1]
