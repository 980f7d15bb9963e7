"""Interchange formats (ORC / CSV / JSON lines): value-faithful
round-trips, explicit-schema discipline, and ORC scan pushdown."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _orders(spark):
    from easy_alterator_spark.sources import load_table

    return load_table(spark, SF, "orders")


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("fmt", ["orc", "csv", "json"])
def test_round_trip_value_equal(spark, tmp_path, fmt):
    from easy_alterator_spark.sources.formats import read_as, write_as

    src = _orders(spark)
    path = str(tmp_path / f"orders_{fmt}")
    write_as(src, fmt, path)
    back = read_as(spark, fmt, path, schema=src.schema)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_csv_and_json_refuse_inference(spark, tmp_path):
    from easy_alterator_spark.sources.formats import read_as, write_as

    src = _orders(spark).limit(5)
    for fmt in ("csv", "json"):
        path = str(tmp_path / f"x_{fmt}")
        write_as(src, fmt, path)
        with pytest.raises(ValueError, match="explicit schema"):
            read_as(spark, fmt, path)


def test_orc_pushdown_reaches_scan(spark, tmp_path):
    from easy_alterator_spark.plans.audit import assert_filter_pushed
    from easy_alterator_spark.sources.formats import read_as, write_as

    src = _orders(spark)
    path = str(tmp_path / "orders_orc")
    write_as(src, "orc", path)
    df = (
        read_as(spark, "orc", path)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )
    assert_filter_pushed(df, "EqualTo(o_orderstatus,F)")


def test_json_reads_only_referenced_fields(spark, tmp_path):
    """A 2-column projection of a JSON dataset must carry a pruned
    ReadSchema — the Jackson parser then skips the other fields."""
    from easy_alterator_spark.plans.audit import formatted_plan, read_schemas
    from easy_alterator_spark.sources.formats import read_as, write_as

    src = _orders(spark)
    path = str(tmp_path / "orders_json")
    write_as(src, "json", path)
    df = read_as(spark, "json", path, schema=src.schema).select(
        "o_orderkey", "o_totalprice"
    )
    schemas = " ".join(read_schemas(formatted_plan(df)))
    assert "o_orderkey" in schemas and "o_totalprice" in schemas
    assert "o_orderstatus" not in schemas
