"""Sketch accuracy contract: the approximate (mergeable) aggregates
must track their exact counterparts within the documented bounds, and
their plans must stay partial+final (the property that makes them the
100 TB path)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_bound(spark):
    from easy_alterator_spark.operators.sketches import DISTINCT_RSD, approx_distinct_by
    from easy_alterator_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    approx = {
        r["event_type"]: r["n_distinct_approx"]
        for r in approx_distinct_by(ev, "event_type", "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(1, 3 * DISTINCT_RSD * ex), (k, approx[k], ex)


def test_approx_percentile_within_bound(spark):
    from easy_alterator_spark.operators.sketches import approx_percentiles_by
    from easy_alterator_spark.sources import load_table

    orders = load_table(spark, SF, "orders")
    approx = {
        r["o_orderstatus"]: (r["p_5"], r["p_95"])
        for r in approx_percentiles_by(
            orders, "o_orderstatus", "o_totalprice", probs=[0.5, 0.95]
        ).collect()
    }
    exact = {
        r["o_orderstatus"]: (r["e50"], r["e95"])
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("e50"),
            F.percentile("o_totalprice", F.lit(0.95)).alias("e95"),
        )
        .collect()
    }
    for k, (e50, e95) in exact.items():
        a50, a95 = approx[k]
        assert abs(a50 - e50) / e50 < 0.01, (k, a50, e50)
        assert abs(a95 - e95) / e95 < 0.01, (k, a95, e95)


def test_sketch_aggregates_stay_partial_final(spark):
    """Mergeability is the point: both sketches must show partial+final
    aggregation (ObjectHashAggregate), not a single-stage collect."""
    from easy_alterator_spark.operators.sketches import (
        approx_distinct_by,
        approx_percentiles_by,
    )
    from easy_alterator_spark.plans.audit import formatted_plan
    from easy_alterator_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    for df in (
        approx_distinct_by(ev, "event_type", "user_id"),
        approx_percentiles_by(ev, "event_type", "value", probs=[0.5]),
    ):
        plan = formatted_plan(df)
        agg_nodes = plan.count("ObjectHashAggregate") + plan.count("HashAggregate")
        assert agg_nodes >= 2, plan  # partial + final
