"""Round-12 audits.

1. Bench per-query freshness tripwire (VERDICT-r11 task 6, first
   requested r10 task 4): compare the working tree's BENCH_DETAIL.json
   against the committed same-core-count reference snapshot under
   plans/bench_ref/, normalized by the shuffle calibration, and fail
   on any query that regressed more than 4x (warn above 2x). This is
   exactly the check that would have caught this round's two
   anomalies (dedup_lsh_recall_audit 10.4 s, ddl_diff_bulk 0.705x)
   at bench time instead of at verdict time.

Normalization (documented per the task): each query's now/ref ratio
is divided by the run pair's shuffle-calibration ratio
(``shuffle_calibration_sec`` now / ref). The r11 analysis showed the
sub-second tail of this suite tracks the shuffle/stage-scheduling
calibration, not the CPU one (uniform +0.3-0.5 s/query in slow
windows with zero code change), so the shuffle key is the right
deflator for per-query comparisons. An absolute-seconds floor is
applied on top — a deliberate deviation from a bare ratio rule:
the r12 round-start bench recorded six alphabetically-adjacent
sub-second queries at 4-5x (events_survival_km 0.408 -> 2.191 s
etc., zero code change — one ordinary mid-bench steal window), so a
bare >4x FAIL would red the suite on weather. A FAIL therefore
additionally requires more than 2.0 normalized seconds of absolute
regression — the gate-breaching class (the 10.394 s
dedup_lsh_recall_audit reading was +8.6 s) — while anything >2x and
+0.4 s is WARNED for the bench reader to chase.
"""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DIR = os.path.join(REPO, "plans", "bench_ref")

WARN_RATIO, FAIL_RATIO = 2.0, 4.0
WARN_FLOOR_SEC, FAIL_FLOOR_SEC = 0.4, 2.0


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


class TestBenchFreshnessTripwire:
    def test_per_query_ratio_vs_committed_reference(self, capsys):
        cur_path = os.path.join(REPO, "BENCH_DETAIL.json")
        if not os.path.exists(cur_path):
            pytest.skip("no BENCH_DETAIL.json in the working tree")
        cur = _load(cur_path)
        cpus = cur.get("cpus")
        if cpus is None:
            pytest.skip(
                "BENCH_DETAIL.json predates the r12 'cpus' field — "
                "cannot pick a same-core-count reference"
            )
        ref_path = os.path.join(REF_DIR, f"BENCH_DETAIL_c{cpus}.json")
        if not os.path.exists(ref_path):
            pytest.skip(f"no committed reference for cpus={cpus}")
        ref = _load(ref_path)
        if cur.get("sf") != ref.get("sf"):
            pytest.skip(
                f"scale factor mismatch (now sf={cur.get('sf')}, "
                f"ref sf={ref.get('sf')}) — nothing to compare"
            )
        cal_now = cur.get("shuffle_calibration_sec")
        cal_ref = ref.get("shuffle_calibration_sec")
        if not cal_now or not cal_ref:
            pytest.skip("calibration key missing on one side")
        cal = cal_now / cal_ref

        warns, fails = [], []
        for q, ref_sec in ref["queries"].items():
            now_sec = cur["queries"].get(q)
            if now_sec is None or ref_sec <= 0:
                continue
            norm_now = now_sec / cal
            ratio = norm_now / ref_sec
            delta = norm_now - ref_sec
            if ratio > FAIL_RATIO and delta > FAIL_FLOOR_SEC:
                fails.append((q, ref_sec, now_sec, round(ratio, 2)))
            elif ratio > WARN_RATIO and delta > WARN_FLOOR_SEC:
                warns.append((q, ref_sec, now_sec, round(ratio, 2)))
        if warns:
            print(
                f"\n[freshness tripwire] WARN >{WARN_RATIO}x "
                f"(cal={cal:.2f}): {warns}"
            )
        assert not fails, (
            f"per-query regression >{FAIL_RATIO}x vs committed "
            f"reference (shuffle-cal-normalized, cal={cal:.2f}): {fails} "
            "— re-measure standalone; if real, find the commit; if "
            "weather, re-bench in a calm window and refresh "
            "plans/bench_ref/"
        )
