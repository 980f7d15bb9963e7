"""Tests for the 100 TB posture utilities: salted skew join and
size-targeted parquet compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


class TestSaltedJoin:
    def _frames(self, spark):
        # one pathologically hot key (90% of rows) + a uniform tail
        big = spark.range(0, 10000).select(
            F.when(F.col("id") < 9000, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
            F.col("id").alias("v"),
        )
        small = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        return big, small

    def test_matches_plain_join(self, spark):
        from easy_alterator_spark.operators.skew import salted_join

        big, small = self._frames(spark)
        plain = big.join(small, "k").groupBy("k").agg(
            F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
        )
        salted = salted_join(big, small, "k").groupBy("k").agg(
            F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
        )
        assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    def test_left_join_preserves_unmatched(self, spark):
        from easy_alterator_spark.operators.skew import salted_join

        big, small = self._frames(spark)
        small_half = small.filter(F.col("k") < 50)
        plain = big.join(small_half, "k", "left")
        salted = salted_join(big, small_half, "k", how="left")
        assert salted.count() == plain.count()
        nulls = salted.filter(F.col("w").isNull()).count()
        assert nulls == plain.filter(F.col("w").isNull()).count() > 0

    def test_salt_spreads_hot_key(self, spark):
        from easy_alterator_spark.operators.skew import salted_join

        big, small = self._frames(spark)
        out = salted_join(big, small, "k", salt=16)
        # the join key in the plan must be composite (k, __salt): the
        # hot key k=7 then hashes into up to 16 shuffle partitions
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "__salt" in plan

    def test_rejects_bad_salt(self, spark):
        import pytest

        from easy_alterator_spark.operators.skew import salted_join

        big, small = self._frames(spark)
        with pytest.raises(ValueError):
            salted_join(big, small, "k", salt=0)


class TestCompaction:
    def test_compacts_many_small_files(self, spark, tmp_path):
        from easy_alterator_spark.sources.compact import compact_parquet

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        # 64 tiny files
        spark.range(0, 50000).select(
            F.col("id"), (F.col("id") % 97).alias("key")
        ).repartition(64).write.parquet(src)
        assert len([f for f in os.listdir(src) if f.endswith(".parquet")]) == 64

        summary = compact_parquet(
            spark, src, dst, target_file_bytes=10 * 1024 * 1024, sort_col="id"
        ).collect()[0]
        assert summary.files_before == 64
        assert summary.files_after < 8
        assert summary.rows == 50000

        # content preserved
        got = spark.read.parquet(dst)
        assert got.count() == 50000
        assert got.agg(F.sum("id")).collect()[0][0] == 49999 * 50000 // 2

    def test_range_sort_gives_non_overlapping_files(self, spark, tmp_path):
        from easy_alterator_spark.sources.compact import compact_parquet

        src = str(tmp_path / "src2")
        dst = str(tmp_path / "dst2")
        spark.range(0, 20000).repartition(16).write.parquet(src)
        compact_parquet(spark, src, dst, target_file_bytes=30 * 1024, sort_col="id")
        files = sorted(
            os.path.join(dst, f) for f in os.listdir(dst) if f.endswith(".parquet")
        )
        assert len(files) > 1
        # per-file [min,max] ranges must not overlap -> scan pruning works
        ranges = []
        for f in files:
            df = spark.read.parquet(f)
            lo, hi = df.agg(F.min("id"), F.max("id")).collect()[0]
            ranges.append((lo, hi))
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 < lo2
