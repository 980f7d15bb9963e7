"""Iceberg-path schema diff, corpus-wide.

Re-expresses the reference handler (iceberg_schema_handler.py:241-576)
as DataFrame joins keyed by ``table_name``:

- J5 full outer on name      -> new columns + non-commented deletes
- J6 inner on name           -> renames/deletes/updates base
- J7 cat.name = hql.renamed_from -> renames
- J10 full outer on field_id -> partition new/dropped/replaced
- A5 property set algebra    -> map_* functions on the props maps
- O3/O4 position cascade     -> lead() window for next-column, then the
  per-table (tiny) topological sort via groupBy().applyInPandas over
  :func:`easy_alterator_spark.ddl.position.plan_moves`

Documented divergences from the reference (bit-rot fixed, see
SURVEY.md §0/§7):

- The migration `_same_order` gate compares (name, type) sequences;
  the reference's dict-equality compare (iceberg_schema_handler.py:
  702-708) can never be True because the two sides carry different
  keys, so every migration would report ``sequenceMismatch``.
- An incompatible change missing ``backfilled_from`` marks THAT TABLE
  as errored (reason ``ValidationError``) instead of raising out of
  the whole run (iceberg_schema_handler.py:366-371 raises ValueError).
- A partition list present on only one side goes through the same
  field-id outer join (the reference's raw-dict fallback crashes on a
  ``field_id``/``field-id`` key mismatch, :511-513 vs :107-110).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..ddl import types as TY
from ..ddl.position import plan_moves

_MOVES_SCHEMA = "table_name string, name string, after string, reason string, ord int"


def _plan_moves_udf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-table cascade closure + topological ordering (driver logic
    distributed per group — each group is tens of rows)."""
    table = pdf["table_name"].iloc[0]
    directives = dict(zip(pdf["name"], pdf["after"]))
    changes = {
        r["name"]: r["after"] for _, r in pdf.iterrows() if bool(r["is_valid_change"])
    }
    moves = plan_moves(directives, changes)
    return pd.DataFrame(
        [
            {
                "table_name": table,
                "name": m["name"],
                "after": m["after"],
                "reason": m["reason"],
                "ord": i,
            }
            for i, m in enumerate(moves)
        ],
        columns=["table_name", "name", "after", "reason", "ord"],
    )


def _hql_columns(parsed: DataFrame) -> DataFrame:
    """Exploded HQL column descriptors with Iceberg flags (F7) and the
    comparison-vocabulary type normalization (P7) applied for
    non-migration tables (iceberg_schema_handler.py:84-97). Expects a
    ``requires_migration`` column on ``parsed``."""
    c = parsed.select(
        "table_name", "requires_migration", F.explode("columns").alias("c")
    )
    return c.select(
        "table_name",
        "requires_migration",
        F.col("c.pos").alias("pos"),
        F.col("c.name").alias("name"),
        F.when(
            F.col("requires_migration"), F.col("c.type")
        ).otherwise(TY.normalize_iceberg_ddl_type_col(F.col("c.type"))).alias("type"),
        F.col("c.commented").alias("is_deleted"),
        F.col("c.renamed_from").isNotNull().alias("is_renamed"),
        F.col("c.renamed_from").alias("renamed_from"),
        F.col("c.after").isNotNull().alias("is_after"),
        F.col("c.after").alias("after"),
        F.col("c.backfilled_from").alias("backfilled_from"),
        F.col("c.first").alias("is_first"),
    )


def _cat_columns(cat_cols: DataFrame, migration: DataFrame) -> DataFrame:
    """Catalog columns in comparison vocabulary.

    Live Iceberg tables: schema fields only (partition *sources* are
    already schema fields), types mapped iceberg->spark
    (rule_book.py:336-339). Migration (still-Hive) tables: data columns
    + partition keys, raw Hive types, ids synthesized 1..n in that
    order (iceberg_schema_handler.py:153-172)."""
    c = cat_cols.join(migration, "table_name").filter(
        ~F.col("is_partition") | F.col("requires_migration")
    )
    w = Window.partitionBy("table_name").orderBy(
        F.col("is_partition").cast("int"), "position"
    )
    return c.select(
        "table_name",
        F.lower("name").alias("name"),
        F.when(
            F.col("requires_migration"), F.col("type")
        ).otherwise(TY.iceberg_to_spark_type_col(F.col("type"))).alias("type"),
        F.when(F.col("requires_migration"), F.row_number().over(w) - 1)
        .otherwise(F.col("position"))
        .alias("position"),
        F.when(F.col("requires_migration"), F.row_number().over(w)).otherwise(
            F.col("field_id")
        ).alias("id"),
    )


def iceberg_diff(
    parsed: DataFrame,
    cat_cols: DataFrame,
    cat_tables: DataFrame,
    catalog_name: str = "glue_catalog",
) -> DataFrame:
    """Diff iceberg-routed DDL files against the catalog snapshot.

    Returns one row per table with nested diff columns:
    (table_name, full_name, requires_migration, sequence_mismatch,
    error, new_cols, dropped, renamed, compatible, incompatible,
    position_changes, first_col, part_new, part_dropped, part_replaced,
    props_new, props_removed, props_updated)
    """
    # the iceberg diff is keyed by table; if two corpus files name the
    # same table, keep the lexically-last file deterministically (the
    # hive path is file-keyed and reports both)
    w = Window.partitionBy("table_name").orderBy(F.col("file_path").desc())
    routed = (
        parsed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("table_name", "columns", "iceberg_partitions", "tblprops")
    )
    migration = cat_tables.select(
        "table_name", (F.col("format") != "ICEBERG").alias("requires_migration")
    )
    hql = _hql_columns(routed.join(F.broadcast(migration), "table_name"))
    cat = _cat_columns(cat_cols, migration)

    # --- J6 inner join base -------------------------------------------
    common = hql.join(
        cat.select("table_name", "name", F.col("type").alias("type_old"), "position", "id"),
        ["table_name", "name"],
        "inner",
    )

    # deletes: commented & present in catalog, plus catalog columns
    # absent from the DDL that are not rename sources (J12/F8)
    commented_deletes = common.filter(F.col("is_deleted")).select(
        "table_name", "pos", "name"
    )
    rename_sources = hql.filter(F.col("renamed_from").isNotNull()).select(
        "table_name", F.col("renamed_from").alias("name")
    )
    absent = (
        cat.select("table_name", "name", "position")
        .join(hql.select("table_name", "name"), ["table_name", "name"], "left_anti")
        .join(rename_sources, ["table_name", "name"], "left_anti")
        .select("table_name", (F.col("position") + 100000).alias("pos"), "name")
    )
    deletes = commented_deletes.unionByName(absent)

    # --- J7 renames ----------------------------------------------------
    renames = (
        cat.select("table_name", F.col("name").alias("old_name"))
        .join(
            hql.filter(F.col("renamed_from").isNotNull()).select(
                "table_name",
                "pos",
                F.col("renamed_from").alias("old_name"),
                F.col("name").alias("new_name"),
            ),
            ["table_name", "old_name"],
            "inner",
        )
    )

    # --- F10 type updates + F5 compatibility ---------------------------
    updated = common.filter(F.col("type_old") != F.col("type")).select(
        "table_name",
        "pos",
        "name",
        F.col("type_old").alias("old_type"),
        F.col("type").alias("new_type"),
        "backfilled_from",
        TY.is_compatible_col(F.col("type_old"), F.col("type"), "iceberg").alias("compat"),
    )

    # --- position updates (O3/O4) --------------------------------------
    # candidates: existing, type-unchanged, has `after`, not deleted (F11)
    after_cand = common.filter(
        (F.col("type_old") == F.col("type")) & F.col("is_after") & ~F.col("is_deleted")
    ).select("table_name", "name", "after")
    # current next-column per catalog order (O4): lead over position
    nxt = cat.select(
        "table_name",
        F.col("name").alias("after"),
        F.lead("name")
        .over(Window.partitionBy("table_name").orderBy("position"))
        .alias("current_next"),
    )
    # valid change: the after-target exists in the catalog AND the column
    # isn't already right after it (J11)
    target_in_cat = after_cand.join(
        cat.select("table_name", F.col("name").alias("after")).distinct(),
        ["table_name", "after"],
        "left_semi",
    )
    valid_changes = target_in_cat.join(nxt, ["table_name", "after"], "left").filter(
        F.col("current_next").isNull() | (F.col("current_next") != F.col("name"))
    )
    cascade_input = after_cand.join(
        valid_changes.select("table_name", "name", F.lit(True).alias("is_valid_change")),
        ["table_name", "name"],
        "left",
    ).na.fill({"is_valid_change": False})
    moves = (
        cascade_input.groupBy("table_name")
        .applyInPandas(_plan_moves_udf, _MOVES_SCHEMA)
    )

    first_cols = (
        common.filter((F.col("type_old") == F.col("type")) & F.col("is_first"))
        .groupBy("table_name")
        .agg(F.min_by("name", "pos").alias("first_col"))
    )

    # --- new columns (F9) ----------------------------------------------
    backfill_targets = hql.filter(F.col("backfilled_from").isNotNull()).select(
        "table_name", F.col("backfilled_from").alias("name")
    )
    new_cols = (
        hql.filter(~F.col("is_deleted") & F.col("renamed_from").isNull())
        .join(cat.select("table_name", "name"), ["table_name", "name"], "left_anti")
        .join(backfill_targets, ["table_name", "name"], "left_anti")
        .select("table_name", "pos", "name", "type", "after", F.col("is_first").alias("first"))
    )

    # --- partition diff (J10) ------------------------------------------
    hql_parts = (
        routed.select("table_name", F.explode("iceberg_partitions").alias("p"))
        .select("table_name", "p.*")
        .filter(~F.col("commented"))  # ids assigned before the filter
    )
    cat_parts = (
        cat_cols.join(F.broadcast(migration), "table_name")
        .filter(F.col("is_partition"))
        .select(
            "table_name",
            F.lower("name").alias("name"),
            F.when(
                F.col("requires_migration"),
                F.row_number().over(
                    Window.partitionBy("table_name").orderBy("position")
                ) + 999,
            ).otherwise(F.col("field_id")).alias("field_id"),
        )
    )
    pj = (
        hql_parts.select(
            "table_name", "field_id", F.col("name").alias("name_new"), "expr"
        )
        .join(
            cat_parts.select("table_name", "field_id", F.col("name").alias("name_old")),
            ["table_name", "field_id"],
            "full_outer",
        )
    )
    part_agg = pj.groupBy("table_name").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("name_old").isNull(),
                        F.struct(
                            F.col("field_id"),
                            F.col("name_new").alias("name"),
                            F.col("expr"),
                        ),
                    )
                )
            ),
            lambda s: s,
        ).alias("part_new"),
        F.collect_list(F.when(F.col("name_new").isNull(), F.col("name_old"))).alias(
            "part_dropped"
        ),
        F.collect_list(
            F.when(
                F.col("name_old").isNotNull()
                & F.col("name_new").isNotNull()
                & (F.col("name_old") != F.col("name_new")),
                F.struct(
                    F.col("name_old").alias("old_name"),
                    F.col("name_new").alias("new_name"),
                    # carry the parsed transform expr: Iceberg's
                    # REPLACE ... WITH clause needs the expression
                    # (months(`ts`)), not the derived field name
                    F.col("expr"),
                ),
            )
        ).alias("part_replaced"),
    )

    # --- tblprops (A5) --------------------------------------------------
    default_props = F.array(*[F.lit(p) for p in TY.ICEBERG_DEFAULT_PROPS])
    props = (
        routed.select("table_name", "tblprops")
        .join(
            cat_tables.select(
                "table_name",
                F.map_filter(
                    F.coalesce(
                        F.col("properties").cast("map<string,string>"),
                        F.create_map().cast("map<string,string>"),
                    ),
                    lambda k, _: k != "owner",
                ).alias("cat_props"),
            ),
            "table_name",
            "left",
        )
        .join(F.broadcast(migration), "table_name")
        .select(
            "table_name",
            F.coalesce("tblprops", F.create_map().cast("map<string,string>")).alias("hp"),
            F.coalesce("cat_props", F.create_map().cast("map<string,string>")).alias("cp"),
            "requires_migration",
        )
    )
    both_present = (F.size(F.map_keys("hp")) > 0) & (F.size(F.map_keys("cp")) > 0)
    props = props.select(
        "table_name",
        F.when(
            F.col("requires_migration") | ~both_present, F.col("hp")
        ).otherwise(
            F.map_filter(F.col("hp"), lambda k, _: ~F.array_contains(F.map_keys("cp"), k))
        ).alias("props_new"),
        F.when(
            F.col("requires_migration") | ~both_present,
            F.array().cast("array<string>"),
        ).otherwise(
            F.filter(
                F.map_keys("cp"),
                lambda k: ~F.array_contains(default_props, k)
                & ~F.array_contains(F.map_keys("hp"), k),
            )
        ).alias("props_removed"),
        F.when(
            F.col("requires_migration") | ~both_present,
            F.create_map().cast("map<string,string>"),
        ).otherwise(
            F.map_filter(
                F.col("hp"),
                lambda k, v: F.array_contains(F.map_keys("cp"), k)
                & (v != F.element_at(F.col("cp"), k)),
            )
        ).alias("props_updated"),
    )

    # --- migration sequence gate (O2) ----------------------------------
    hql_seq = hql.groupBy("table_name").agg(
        F.array_sort(
            F.collect_list(F.struct("pos", F.struct("name", "type").alias("nt")))
        ).alias("hs")
    ).select("table_name", F.transform("hs", lambda s: s["nt"]).alias("hs"))
    cat_seq = cat.groupBy("table_name").agg(
        F.array_sort(
            F.collect_list(F.struct("position", F.struct("name", "type").alias("nt")))
        ).alias("cs")
    ).select("table_name", F.transform("cs", lambda s: s["nt"]).alias("cs"))
    seq = (
        hql_seq.join(cat_seq, "table_name", "full_outer")
        .join(F.broadcast(migration), "table_name")
        .select(
            "table_name",
            (
                F.col("requires_migration")
                & (
                    F.coalesce("hs", F.array()) != F.coalesce("cs", F.array())
                )
            ).alias("sequence_mismatch"),
        )
    )

    # --- per-table aggregation ------------------------------------------
    def sorted_structs(df: DataFrame, payload: Column, order: Column, name: str) -> DataFrame:
        arr = F.array_sort(F.collect_list(F.struct(order.alias("o"), payload.alias("p"))))
        return df.groupBy("table_name").agg(
            F.transform(arr, lambda s: s["p"]).alias(name)
        )

    agg_new = sorted_structs(
        new_cols,
        F.struct("name", "type", "after", "first"),
        F.col("pos"),
        "new_cols",
    )
    agg_del = sorted_structs(deletes, F.col("name"), F.col("pos"), "dropped")
    agg_ren = sorted_structs(
        renames,
        F.struct("old_name", "new_name"),
        F.col("pos"),
        "renamed",
    )
    agg_compat = sorted_structs(
        updated.filter(F.col("compat")),
        F.struct("name", "old_type", "new_type"),
        F.col("pos"),
        "compatible",
    )
    agg_incompat = sorted_structs(
        updated.filter(~F.col("compat")),
        F.struct("name", "old_type", "new_type", "backfilled_from"),
        F.col("pos"),
        "incompatible",
    )
    agg_moves = sorted_structs(
        moves, F.struct("name", "after", "reason"), F.col("ord"), "position_changes"
    )
    backfill_err = (
        updated.filter(~F.col("compat") & F.col("backfilled_from").isNull())
        .groupBy("table_name")
        .agg(F.collect_list("name").alias("missing_backfill"))
    )

    out = (
        routed.select("table_name")
        .distinct()
        .join(F.broadcast(migration), "table_name", "left")
        .join(seq.drop("requires_migration"), "table_name", "left")
        .join(agg_new, "table_name", "left")
        .join(agg_del, "table_name", "left")
        .join(agg_ren, "table_name", "left")
        .join(agg_compat, "table_name", "left")
        .join(agg_incompat, "table_name", "left")
        .join(agg_moves, "table_name", "left")
        .join(first_cols, "table_name", "left")
        .join(part_agg, "table_name", "left")
        .join(props, "table_name", "left")
        .join(backfill_err, "table_name", "left")
    )
    return out.select(
        "table_name",
        F.concat(F.lit(catalog_name + "."), "table_name").alias("full_name"),
        F.coalesce("requires_migration", F.lit(False)).alias("requires_migration"),
        F.coalesce("sequence_mismatch", F.lit(False)).alias("sequence_mismatch"),
        F.when(
            F.col("missing_backfill").isNotNull(),
            F.concat(
                F.lit("backfilled_from is missing for column in DDL file for: "),
                F.concat_ws(", ", "missing_backfill"),
            ),
        ).alias("error"),
        "new_cols",
        "dropped",
        "renamed",
        "compatible",
        "incompatible",
        "position_changes",
        "first_col",
        "part_new",
        "part_dropped",
        "part_replaced",
        "props_new",
        "props_removed",
        "props_updated",
    )
