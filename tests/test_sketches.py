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


def test_countmin_never_underestimates(spark):
    """The CMS guarantee: est >= exact for EVERY key (collisions only
    inflate). Checked over all keys, not just the returned top-k."""
    from easy_alterator_spark.operators.sketches import countmin_topk
    from easy_alterator_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    n_users = ev.select("user_id").distinct().count()
    est = {
        r["user_id"]: r["est_count"]
        for r in countmin_topk(ev, "user_id", k=n_users).collect()
    }
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(est) == set(exact)
    for u, ex in exact.items():
        assert est[u] >= ex, (u, est[u], ex)


def test_kmv_and_hll_track_exact(spark):
    """Deterministic sketches must estimate within coarse theory-bound
    factors at test scale (KMV rel-err ~ 1/sqrt(k), HLL ~ 1.04/sqrt(m);
    assert a conservative 4x of each)."""
    from easy_alterator_spark.operators.sketches import (
        HLL_M,
        hll_distinct_by,
        kmv_distinct_by,
    )
    from easy_alterator_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    kmv = {
        r["event_type"]: (r["k_eff"], r["est_distinct"])
        for r in kmv_distinct_by(ev, "event_type", "user_id", k=64).collect()
    }
    for t, ex in exact.items():
        k_eff, est = kmv[t]
        if k_eff < 64:
            assert est == ex, (t, est, ex)  # sub-k groups are exact
        else:
            assert abs(est - ex) <= 4 * ex / 8.0, (t, est, ex)
    # HLL accuracy holds only in its design regime (n >~ 2.5m — the raw
    # estimator, no ln()-based small-range correction): use sf0.01
    # event_id (~2000 distinct per type vs m=256) like the registered
    # query; 4 sigma = 4 * 1.04/sqrt(m) = 26%.
    ev01 = load_table(spark, "/root/testdata/sf0.01", "events")
    exact01 = {
        r["event_type"]: r["n"]
        for r in ev01.groupBy("event_type")
        .agg(F.count_distinct("event_id").alias("n"))
        .collect()
    }
    hll = {
        r["event_type"]: r["est_distinct"]
        for r in hll_distinct_by(ev01, "event_type", "event_id").collect()
    }
    for t, ex in exact01.items():
        assert abs(hll[t] - ex) <= 4 * 1.04 * ex / (HLL_M**0.5), (t, hll[t], ex)


def test_kmv_is_mergeable(spark):
    """The scale property: merging per-shard KMV sketches (union the
    k-min sets, re-take the k smallest) must equal the direct sketch
    over the union — this is what lets per-day sketches roll up to
    month-to-date without rescanning. Exact identity, not a bound:
    the k smallest of a union is a function of each part's k smallest."""
    from easy_alterator_spark.operators.sketches import kmv_distinct_by
    from easy_alterator_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    part1 = ev.filter(F.col("event_id") % 2 == 0)
    part2 = ev.filter(F.col("event_id") % 2 == 1)
    merged = kmv_distinct_by(
        part1.unionAll(part2), "event_type", "user_id", k=16
    )
    # simulate shard-level sketching: each part keeps its own k-mins
    # (as raw (group, h) rows), then the merge re-sketches the union
    # of those TINY sets — never the raw data
    from pyspark.sql import Window

    def kmins(df):
        from easy_alterator_spark.operators.sketches import hash60

        d = df.select(F.col("event_type"), hash60(F.col("user_id")).alias("h")).distinct()
        w = Window.partitionBy("event_type").orderBy("h")
        return d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 16).drop("rn")

    tiny = kmins(part1).unionAll(kmins(part2))
    w = Window.partitionBy("event_type").orderBy("h")
    remerged = (
        tiny.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 16)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("k_eff"), F.max("h").alias("kth_hash"))
    )
    direct = {
        r["event_type"]: (r["k_eff"], r["kth_hash"]) for r in merged.collect()
    }
    viamerge = {
        r["event_type"]: (r["k_eff"], r["kth_hash"]) for r in remerged.collect()
    }
    assert direct == viamerge


def test_sketches_accuracy_invariant_under_production_hash(spark):
    """The 100 TB swap is hash-only: with hash_source='xxhash64'
    (JVM-native, no hex round-trip) every sketch must keep its
    accuracy contract — same bounds as the md5 oracle variant — and
    CMS must keep its est >= exact guarantee."""
    from easy_alterator_spark.operators.sketches import (
        countmin_topk,
        hll_distinct_by,
        kmv_distinct_by,
    )
    from easy_alterator_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    kmv = {
        r["event_type"]: (r["k_eff"], r["est_distinct"])
        for r in kmv_distinct_by(
            ev, "event_type", "user_id", k=64, hash_source="xxhash64"
        ).collect()
    }
    for t, ex in exact.items():
        k_eff, est = kmv[t]
        assert est == ex if k_eff < 64 else abs(est - ex) <= ex / 2, (t, est, ex)
    ev01 = load_table(spark, "/root/testdata/sf0.01", "events")
    exact01 = {
        r["event_type"]: r["n"]
        for r in ev01.groupBy("event_type")
        .agg(F.count_distinct("event_id").alias("n"))
        .collect()
    }
    hll = {
        r["event_type"]: r["est_distinct"]
        for r in hll_distinct_by(
            ev01, "event_type", "event_id", hash_source="xxhash64"
        ).collect()
    }
    for t, ex in exact01.items():
        assert abs(hll[t] - ex) <= 0.26 * ex, (t, hll[t], ex)
    n_users = ev.select("user_id").distinct().count()
    est = {
        r["user_id"]: r["est_count"]
        for r in countmin_topk(
            ev, "user_id", k=n_users, hash_source="xxhash64"
        ).collect()
    }
    exact_cnt = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for u, ex in exact_cnt.items():
        assert est[u] >= ex, (u, est[u], ex)


def test_theta_intersection_tracks_exact_overlap(spark):
    """Theta intersection must track the exact pairwise distinct-user
    overlap: exact when both sketches are complete (theta = 2^60),
    within a coarse union-bound error otherwise."""
    from easy_alterator_spark.operators.sketches import (
        _H60_RANGE,
        theta_intersection_by,
    )
    from easy_alterator_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    got = {
        (r["group_a"], r["group_b"]): (r["theta"], r["est_common"])
        for r in theta_intersection_by(
            ev, "event_type", "user_id", k=32
        ).collect()
    }
    pairs = (
        ev.select("event_type", "user_id")
        .distinct()
        .alias("a")
        .join(
            ev.select("event_type", "user_id").distinct().alias("b"),
            "user_id",
        )
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("ga"), F.col("b.event_type").alias("gb")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    exact = {(r["ga"], r["gb"]): r["n"] for r in pairs.collect()}
    for key, ex in exact.items():
        theta, est = got.get(key, (None, 0.0))
        if theta == _H60_RANGE:
            assert est == ex, (key, est, ex)
        else:
            # k=32 sketches: generous 4/sqrt(k) relative bound + slack
            assert abs(est - ex) <= max(10.0, 0.75 * ex), (key, est, ex)
    # union closes the algebra: est_union must track nA + nB - overlap,
    # exactly when the union sketch is complete (k_eff_union < k)
    from easy_alterator_spark.operators.sketches import theta_union_by

    per_type = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in theta_union_by(ev, "event_type", "user_id", k=32).collect():
        key = (r["group_a"], r["group_b"])
        ex_union = per_type[key[0]] + per_type[key[1]] - exact.get(key, 0)
        if r["k_eff_union"] < 32:
            assert r["est_union"] == ex_union, (key, r["est_union"], ex_union)
        else:
            assert abs(r["est_union"] - ex_union) <= 0.75 * ex_union, (
                key,
                r["est_union"],
                ex_union,
            )
        assert 0.0 <= r["est_jaccard"] <= 1.0


def test_theta_intersection_joins_only_sketch_sized_tables(spark):
    """The raw data reduces through WindowGroupLimit to k rows per
    group BEFORE any join: the pair/theta joins run over sketch-sized
    tables (broadcast or hash), never a sort-merge over the raw
    stream, and no cartesian exists."""
    from easy_alterator_spark.operators.sketches import theta_intersection_by
    from easy_alterator_spark.plans.audit import formatted_plan, join_counts
    from easy_alterator_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    plan = formatted_plan(theta_intersection_by(ev, "event_type", "user_id"))
    assert "WindowGroupLimit" in plan, plan
    jc = join_counts(plan)
    assert jc["CartesianProduct"] == 0, plan
    assert jc["BroadcastNestedLoopJoin"] == 0, plan


def test_hll_is_two_partial_aggregates_no_join(spark):
    """HLL's scale shape: raw stream -> (group, idx) MAX(rho) partial
    aggregate -> per-group register fold. Two aggregate levels, no
    distinct pre-pass, no join, no window anywhere in the plan."""
    from easy_alterator_spark.operators.sketches import hll_distinct_by
    from easy_alterator_spark.plans.audit import formatted_plan, join_counts
    from easy_alterator_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    plan = formatted_plan(hll_distinct_by(ev, "event_type", "event_id"))
    assert sum(join_counts(plan).values()) == 0, plan
    assert "Window" not in plan, plan
    assert plan.count("HashAggregate") >= 4, plan  # partial+final x 2 levels


def test_kmv_plans_window_group_limit(spark):
    """The KMV rank filter must plan as WindowGroupLimit: each map task
    forwards only its local top-k per group BEFORE the window shuffle —
    the property that keeps the second exchange k-bounded at 100 TB."""
    from easy_alterator_spark.operators.sketches import kmv_distinct_by
    from easy_alterator_spark.plans.audit import formatted_plan
    from easy_alterator_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    plan = formatted_plan(kmv_distinct_by(ev, "event_type", "user_id"))
    assert "WindowGroupLimit" in plan, plan


def test_countmin_probe_is_joinless(spark):
    """The CMS probe must be pure map-side (array-literal lookups on
    the collected model-sized counter table): no join node of any kind
    in the plan, and top-k via TakeOrderedAndProject, not a full sort."""
    from easy_alterator_spark.operators.sketches import countmin_topk
    from easy_alterator_spark.plans.audit import formatted_plan
    from easy_alterator_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    plan = formatted_plan(countmin_topk(ev, "user_id"))
    assert "Join" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


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
