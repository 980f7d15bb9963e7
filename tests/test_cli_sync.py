"""End-to-end CLI + sync tests against real session-catalog tables and
real DDL files on disk."""

from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module")
def db(spark):
    name = "ea_cli_test"
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")
    spark.sql(f"CREATE DATABASE {name}")
    yield name
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")


class TestSync:
    def test_sync_adds_missing_columns(self, spark, db):
        from easy_alterator_spark.diff.sync import sync_tables

        spark.sql(f"CREATE TABLE {db}.src_t (id INT, amount DOUBLE, extra STRING) USING parquet")
        spark.sql(f"CREATE TABLE {db}.tgt_t (id INT, amount DOUBLE) USING parquet")
        report = sync_tables(spark, f"{db}.src_t", f"{db}.tgt_t")
        assert report["details"]["add"] == [{"Name": "extra", "Type": "string"}]
        got = [c.name for c in spark.catalog.listColumns(f"{db}.tgt_t")]
        assert got == ["id", "amount", "extra"]

    def test_sync_validate_dry_run(self, spark, db):
        from easy_alterator_spark.diff.sync import sync_tables

        spark.sql(f"CREATE TABLE {db}.src_v (id INT, n2 STRING) USING parquet")
        spark.sql(f"CREATE TABLE {db}.tgt_v (id INT) USING parquet")
        report = sync_tables(spark, f"{db}.src_v", f"{db}.tgt_v", validate=True)
        assert report["statements"]
        assert [c.name for c in spark.catalog.listColumns(f"{db}.tgt_v")] == ["id"]

    def test_sync_partition_mismatch_raises(self, spark, db):
        from easy_alterator_spark.diff.sync import SyncError, sync_tables

        spark.sql(
            f"CREATE TABLE {db}.src_p (v STRING, day_rk DATE) USING parquet PARTITIONED BY (day_rk)"
        )
        spark.sql(f"CREATE TABLE {db}.tgt_p (v STRING) USING parquet")
        with pytest.raises(SyncError, match="Partition"):
            sync_tables(spark, f"{db}.src_p", f"{db}.tgt_p")
        # pcheck disabled: no raise (the ALTER may still be impossible
        # on v1 tables, so validate-only here)
        report = sync_tables(
            spark, f"{db}.src_p", f"{db}.tgt_p", part_check=False, validate=True
        )
        assert {a["Name"] for a in report["details"]["add"]} == {"day_rk"}


class TestCli:
    def test_validate_run_via_files(self, spark, db, tmp_path):
        from easy_alterator_spark.cli import run_alterator

        spark.sql(f"CREATE TABLE {db}.cli_t (id INT, amount DOUBLE) USING parquet")
        ddl = tmp_path / "cli_t.hql"
        ddl.write_text(
            f"CREATE EXTERNAL TABLE `{db}.cli_t`("
            "`id` int, `amount` double, `added` string) STORED AS PARQUET;"
        )
        (tmp_path / "ignored.txt").write_text("not a ddl")
        report = run_alterator(spark, [str(tmp_path)], validate=True)
        assert report["ResponseMetadata"]["stats"]["num_updates"] == 1
        e = report["success_tables"][0]
        assert e["details"]["add"] == [{"Name": "added", "Type": "string"}]
        # validate mode: nothing applied
        assert [c.name for c in spark.catalog.listColumns(f"{db}.cli_t")] == [
            "id",
            "amount",
        ]

    def test_apply_run(self, spark, db, tmp_path):
        from easy_alterator_spark.cli import run_alterator

        spark.sql(f"CREATE TABLE {db}.cli_a (id INT) USING parquet")
        ddl = tmp_path / "cli_a.hql"
        ddl.write_text(
            f"CREATE EXTERNAL TABLE `{db}.cli_a`(`id` int, `n1` string) STORED AS PARQUET;"
        )
        report = run_alterator(spark, [str(ddl)], validate=False)
        assert report["applied_statements"]
        assert [c.name for c in spark.catalog.listColumns(f"{db}.cli_a")] == ["id", "n1"]

    def test_report_is_json_serializable(self, spark, db, tmp_path):
        from easy_alterator_spark.cli import run_alterator

        ddl = tmp_path / "newt.hql"
        ddl.write_text(
            f"CREATE EXTERNAL TABLE `{db}.not_there`(`x` int) STORED AS PARQUET;"
        )
        report = run_alterator(spark, [str(ddl)], validate=True)
        assert json.loads(json.dumps(report))["new_tables"] == [f"{db}.not_there"]
