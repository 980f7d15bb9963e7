#!/usr/bin/env python3
"""Per-query profiling for the optimization rounds (guide §1).

For each named query: one untimed warm-up, then best-of-3 timings of
BOTH materializations — ``toPandas()`` (the bench's measure) and the
noop sink (``format("noop")`` — computes every column, discards the
result, so it isolates the computation from result transfer) — and
dumps ``explain("formatted")`` to ``plans/$PROFILE_PLANS_ROUND/<name>_<tag>.txt``
(default r12).

Usage:
    python tools/profile_query.py <tag> <query> [query ...]
    python tools/profile_query.py before dedup_minhash_lsh embedding_pca_power

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from easy_alterator_spark.queries import QUERIES, load_all  # noqa: E402
from easy_alterator_spark.session import get_spark  # noqa: E402

RUNS = 3


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    plans_only = os.environ.get("PROFILE_PLANS_ONLY") == "1"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = get_spark("easy-alterator-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q01_scan_project"](spark, sf_dir).collect()  # warm codegen

    plans_dir = os.path.join(
        REPO, "plans", os.environ.get("PROFILE_PLANS_ROUND", "r12")
    )
    os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = fn(spark, sf_dir)
        # plan BEFORE any execution (AQE initial plan)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        if plans_only:
            print(json.dumps({name: "plan written"}), flush=True)
            continue
        # warm-up (untimed)
        fn(spark, sf_dir).toPandas()
        tp, noop = [], []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            tp.append(time.perf_counter() - t0)
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop.append(time.perf_counter() - t0)
        spark.sparkContext._jvm.System.gc()
        out[name] = {
            "toPandas_best": round(min(tp), 3),
            "noop_best": round(min(noop), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
