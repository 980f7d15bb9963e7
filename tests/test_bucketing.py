"""Bucketed co-located join: same join, zero shuffles — asserted on
the physical plan, with values equal to the shuffled variant."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_db(spark):
    db = "ea_bucket_test"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    spark.sql(f"CREATE DATABASE {db}")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    yield db
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed_db):
    from easy_alterator_spark.plans.audit import exchange_count, formatted_plan
    from easy_alterator_spark.sources import load_table
    from easy_alterator_spark.sources.bucketing import write_bucketed

    db = bucketed_db
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(orders, f"{db}.orders_b", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(
        lineitem, f"{db}.lineitem_b", ["l_orderkey"], 8, ["l_orderkey"]
    )

    # force a non-broadcast join so the distribution requirement is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob = spark.table(f"{db}.orders_b")
        lb = spark.table(f"{db}.lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.round(F.sum("l_quantity"), 2).alias("sq"))
        plan = formatted_plan(
            ob.join(lb, ob.o_orderkey == lb.l_orderkey).select(
                "o_orderkey", "l_quantity"
            )
        )
        # co-located: the join itself introduces no shuffle
        assert exchange_count(plan) == 0, plan

        # unbucketed twin: same join must shuffle both sides
        plan2 = formatted_plan(
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).select(
                "o_orderkey", "l_quantity"
            )
        )
        assert exchange_count(plan2) >= 2

        # and the values agree with the unbucketed computation
        want = {
            r["o_orderstatus"]: r["sq"]
            for r in orders.join(
                lineitem, orders.o_orderkey == lineitem.l_orderkey
            )
            .groupBy("o_orderstatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sq"))
            .collect()
        }
        got = {r["o_orderstatus"]: r["sq"] for r in joined.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
