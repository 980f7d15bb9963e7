"""Partition pruning: a day filter over a date-partitioned events copy
must prune at planning time (PartitionFilters), read only that day's
rows, and agree with the unpartitioned computation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def part_dir(spark, tmp_path_factory):
    from easy_alterator_spark.sources import load_table
    from easy_alterator_spark.sources.partitioned import write_daily_partitioned

    path = str(tmp_path_factory.mktemp("events_daily"))
    write_daily_partitioned(load_table(spark, SF, "events"), path)
    return path


def test_day_filter_becomes_partition_filter(spark, part_dir):
    from easy_alterator_spark.plans.audit import formatted_plan
    from easy_alterator_spark.sources import load_table
    from easy_alterator_spark.sources.partitioned import read_day

    days = [
        r["d"]
        for r in load_table(spark, SF, "events")
        .select(F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .distinct()
        .orderBy("d")
        .collect()
    ]
    day = str(days[len(days) // 2])

    df = read_day(spark, part_dir, day)
    plan = formatted_plan(df)
    # pruning happens during planning: the predicate must appear as a
    # PartitionFilter on the scan, NOT as a data filter
    assert "PartitionFilters" in plan
    assert f"(d = {day})" in plan or "(d#" in plan, plan

    expected = (
        load_table(spark, SF, "events")
        .filter(F.to_date(F.date_trunc("day", "ts")) == F.lit(day))
        .count()
    )
    assert df.count() == expected


def test_partitioned_write_bounds_file_count(spark, part_dir):
    import glob
    import os

    day_dirs = glob.glob(os.path.join(part_dir, "d=*"))
    assert len(day_dirs) > 1  # actually partitioned
    for dd in day_dirs:
        files = [f for f in os.listdir(dd) if f.endswith(".parquet")]
        # repartition("d") before write: one file per day, not one per
        # input split x day
        assert len(files) == 1, (dd, files)
