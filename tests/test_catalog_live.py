"""Live-catalog wiring tests for the run_alterator pipeline:

- ICEBERG tables snapshot their columns/partition-spec/properties from
  metadata.json (REAL field ids), not from listColumns — a NULL-field-id
  snapshot makes every partition field look simultaneously new and
  dropped and would apply spurious ADD/DROP PARTITION FIELD.
- migration (still-Hive) tables are report-only during apply.
- one failing table's ALTER must not abort the remaining tables.
- hive-provider tables are only PARQUET when the SerDe triple says so.
"""

from __future__ import annotations

import json

import pytest

ICE_METADATA = {
    "format-version": 2,
    "current-schema-id": 0,
    "schemas": [
        {
            "schema-id": 0,
            "fields": [
                {"id": 1, "name": "col1", "required": False, "type": "string"},
                {"id": 2, "name": "amount", "required": False, "type": "long"},
                {"id": 3, "name": "day_rk", "required": False, "type": "date"},
            ],
        },
    ],
    "default-spec-id": 0,
    "partition-specs": [
        {
            "spec-id": 0,
            "fields": [
                {"field-id": 1000, "name": "day_rk", "transform": "identity", "source-id": 3}
            ],
        }
    ],
    "properties": {"owner": "someone", "write.merge.mode": "merge-on-read"},
}


@pytest.fixture(scope="module")
def db(spark):
    name = "ea_cat_live_test"
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")
    spark.sql(f"CREATE DATABASE {name}")
    yield name
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")


@pytest.fixture(scope="module")
def ice_table(spark, db, tmp_path_factory):
    """A session-catalog table that LOOKS like a live Glue Iceberg
    table: table_type=ICEBERG + metadata_location properties (the
    engine never needs the Iceberg runtime jar to diff it)."""
    meta = tmp_path_factory.mktemp("icelive") / "v3.metadata.json"
    meta.write_text(json.dumps(ICE_METADATA))
    t = f"{db}.ice_live"
    # NB: Spark's session catalog reserves `table_type`, so the
    # iceberg marker here is metadata_location alone (catalog.py
    # detects either).
    spark.sql(
        f"CREATE TABLE {t} (col1 STRING, amount BIGINT, day_rk DATE) USING parquet "
        f"TBLPROPERTIES ('metadata_location'='{meta}')"
    )
    return t


class TestIcebergSnapshot:
    def test_snapshot_uses_metadata_field_ids(self, spark, ice_table):
        from easy_alterator_spark.diff.catalog import snapshot_catalog

        cat_cols, cat_tables = snapshot_catalog(spark, [ice_table])
        rows = {(r["name"], r["is_partition"]): r for r in cat_cols.collect()}
        # schema fields carry the metadata.json ids and TYPE VOCABULARY
        assert rows[("amount", False)]["field_id"] == 2
        assert rows[("amount", False)]["type"] == "long"
        # partition spec row exists with its real iceberg field id
        assert rows[("day_rk", True)]["field_id"] == 1000
        tbl = cat_tables.collect()[0]
        assert tbl["format"] == "ICEBERG"
        # properties come from metadata.json (owner stripped)
        assert tbl["properties"] == {"write.merge.mode": "merge-on-read"}

    def test_identical_ddl_yields_no_partition_churn(self, spark, ice_table, tmp_path):
        """The ADVICE scenario: with NULL field ids the partition field
        would report as BOTH new and dropped. With metadata wiring the
        diff is clean."""
        from easy_alterator_spark.cli import run_alterator

        ddl = tmp_path / "ice_live.hql"
        ddl.write_text(
            f"""
            CREATE TABLE `{ice_table}` (
                `col1` string,
                `amount` bigint,
                `day_rk` date,
            ) USING iceberg
            PARTITIONED BY (`day_rk`)
            TBLPROPERTIES('write.merge.mode'='merge-on-read');
            """
        )
        report = run_alterator(spark, [str(ddl)], validate=True)
        # with real field ids the diff is CLEAN: the table is identical
        # (a NULL-field-id snapshot would emit an iceberg entry with
        # day_rk both new and dropped)
        assert report["identical_tables"] == [ice_table]
        assert report["iceberg_tables"] == []


class TestApplyGuards:
    def test_migration_tables_are_report_only(self, spark, db, tmp_path):
        # catalog table is plain parquet; DDL says iceberg -> migration.
        # Apply must NOT run iceberg DDL against the still-Hive table.
        from easy_alterator_spark.cli import run_alterator

        t = f"{db}.mig_t"
        spark.sql(f"CREATE TABLE {t} (id INT, v STRING) USING parquet")
        ddl = tmp_path / "mig_t.hql"
        ddl.write_text(
            f"""
            CREATE TABLE `{t}` (
                `id` int,
                `v` string,
            ) USING iceberg
            TBLPROPERTIES('write.merge.mode'='merge-on-read');
            """
        )
        report = run_alterator(spark, [str(ddl)], validate=False)
        e = report["iceberg_tables"][0]
        assert e["migration"] == "True"
        # a tblprops delta exists, but migration entries are report-only
        assert report["applied_statements"] == []
        assert "apply_errors" not in report

    def test_one_failing_table_does_not_abort_the_rest(
        self, spark, db, tmp_path, monkeypatch
    ):
        from easy_alterator_spark.cli import run_alterator
        from easy_alterator_spark.diff import catalog as cat_mod

        good, bad = f"{db}.app_good", f"{db}.app_bad"
        spark.sql(f"CREATE TABLE {good} (id INT) USING parquet")
        spark.sql(f"CREATE TABLE {bad} (id INT) USING parquet")
        for t in ("app_good", "app_bad"):
            (tmp_path / f"{t}.hql").write_text(
                f"CREATE EXTERNAL TABLE `{db}.{t}`(`id` int, `n1` string) "
                "STORED AS PARQUET;"
            )

        real_apply = cat_mod.apply_statements

        def flaky_apply(spark_, stmts):
            if any("app_bad" in s for s in stmts):
                raise RuntimeError("boom: catalog rejected the ALTER")
            return real_apply(spark_, stmts)

        monkeypatch.setattr(cat_mod, "apply_statements", flaky_apply)
        report = run_alterator(spark, [str(tmp_path)], validate=False)
        assert list(report["apply_errors"]) == [bad]
        assert any("app_good" in s for s in report["applied_statements"])
        # the good table actually got its column
        assert [c.name for c in spark.catalog.listColumns(good)] == ["id", "n1"]


class TestTableFormat:
    def test_non_parquet_provider_not_classified_parquet(self, spark, db):
        from easy_alterator_spark.diff.catalog import _table_format

        t = f"{db}.csv_t"
        spark.sql(f"CREATE TABLE {t} (id INT, v STRING) USING csv")
        fmt, _ = _table_format(spark, t)
        assert fmt != "PARQUET"

    def test_parse_props_quote_aware(self):
        from easy_alterator_spark.diff.catalog import _parse_props

        raw = "[cols=a,b,c, table_type=ICEBERG, path=/x/y, write.merge.mode=merge-on-read]"
        props = _parse_props(raw)
        assert props["cols"] == "a,b,c"
        assert props["table_type"] == "ICEBERG"
        assert props["write.merge.mode"] == "merge-on-read"
