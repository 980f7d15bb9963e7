"""Render diff results into ordered Spark SQL ALTER statements (V3).

Closes the reference's report-only Iceberg gap (SURVEY.md §3.3): every
diff the engine detects maps onto a Spark DDL statement. Hive tables
use ADD COLUMNS / REPLACE COLUMNS (the Glue ``update_table`` dict
mutation in glue_utils.py:35-87 is exactly a REPLACE COLUMNS);
Iceberg tables use the fine-grained ALTERs.

Ordering guarantees (the part the reference encodes implicitly):
renames before type changes and adds (a rename frees its old name),
adds before drops (a backfill target must exist before its source is
dropped), position changes in the topological order produced by
:mod:`easy_alterator_spark.ddl.position` (each AFTER anchor is already
in place when referenced).

Type vocabulary: statements always use Spark DDL names — the
comparison-domain vocabulary (``long``, ``timestamptz``) never leaks
into output (SURVEY.md §7 watch list; rule_book.py:332-339 boundary).
"""

from __future__ import annotations

from typing import Any

# comparison vocabulary -> Spark DDL vocabulary
_TO_SPARK_DDL = {"long": "bigint", "timestamptz": "timestamp"}


def spark_ddl_type(t: str) -> str:
    return _TO_SPARK_DDL.get(t, t)


def _q(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _qt(table: str) -> str:
    return ".".join(_q(p) for p in table.split("."))


def hive_alter_statements(
    table_name: str,
    add: list[dict[str, str]],
    delete: list[dict[str, str]],
    catalog_schema: list[dict[str, str]] | None = None,
) -> list[str]:
    """Hive path: ADD COLUMNS for pure adds; REPLACE COLUMNS when
    anything is deleted or retyped (delete+add of the same name).

    catalog_schema: current (Name, Type) data columns in order —
    required for the REPLACE form, which must restate the full schema.
    """
    t = _qt(table_name)
    add_names = {c["Name"] for c in add}
    del_names = {c["Name"] for c in delete}
    if not delete:
        if not add:
            return []
        cols = ", ".join(f"{_q(c['Name'])} {spark_ddl_type(c['Type'])}" for c in add)
        return [f"ALTER TABLE {t} ADD COLUMNS ({cols})"]
    if catalog_schema is None:
        raise ValueError("REPLACE COLUMNS requires the current catalog schema")
    retyped = {c["Name"]: c["Type"] for c in add if c["Name"] in del_names}
    remaining = [
        {"Name": c["Name"], "Type": retyped.get(c["Name"], c["Type"])}
        for c in catalog_schema
        if c["Name"] not in del_names or c["Name"] in retyped
    ]
    pure_new = [c for c in add if c["Name"] not in {r["Name"] for r in remaining}]
    final = remaining + pure_new
    cols = ", ".join(f"{_q(c['Name'])} {spark_ddl_type(c['Type'])}" for c in final)
    return [f"ALTER TABLE {t} REPLACE COLUMNS ({cols})"]


def iceberg_alter_statements(entry: dict[str, Any]) -> list[str]:
    """Iceberg path: fine-grained ALTERs from a (cleaned or raw) diff
    entry shaped like the run report's ``iceberg_tables`` items."""
    table = entry["table_name"]
    # strip the catalog prefix if present (glue_catalog.db.tbl -> db.tbl
    # stays fully qualified for Spark's iceberg catalog)
    t = _qt(table)
    stmts: list[str] = []
    cols = entry.get("columns", {}) or {}
    updated = cols.get("updated", {}) or {}

    for r in cols.get("renamed", []) or []:
        stmts.append(
            f"ALTER TABLE {t} RENAME COLUMN {_q(r['old_name'])} TO {_q(r['new_name'])}"
        )
    for c in updated.get("compatible", []) or []:
        stmts.append(
            f"ALTER TABLE {t} ALTER COLUMN {_q(c['name'])} TYPE {spark_ddl_type(c['new_type'])}"
        )
    for c in cols.get("new", []) or []:
        pos = ""
        if c.get("first"):
            pos = " FIRST"
        elif c.get("after"):
            pos = f" AFTER {_q(c['after'])}"
        stmts.append(
            f"ALTER TABLE {t} ADD COLUMN {_q(c['name'])} {spark_ddl_type(c['type'])}{pos}"
        )
    # incompatible changes ride through the backfill protocol: the NEW
    # column was already emitted under columns.new (the DDL declares it)
    # after its renamed_from/backfilled_from source; nothing extra here.
    for name in cols.get("dropped", []) or []:
        stmts.append(f"ALTER TABLE {t} DROP COLUMN {_q(name)}")
    for m in updated.get("position_changes", []) or []:
        if "first" in m:
            stmts.append(f"ALTER TABLE {t} ALTER COLUMN {_q(m['first'])} FIRST")
        else:
            stmts.append(
                f"ALTER TABLE {t} ALTER COLUMN {_q(m['name'])} AFTER {_q(m['after'])}"
            )

    parts = entry.get("partition_columns", {}) or {}
    for p in parts.get("replaced", []) or []:
        # Iceberg's WITH clause takes a partition EXPRESSION: for a
        # transform-change rename (ts_day -> ts_month) the new field
        # name is a derived column that does not exist — render the
        # parsed transform expr (months(`ts`)); identity renames fall
        # back to the quoted column name.
        expr = p.get("expr")
        target = expr if expr and "(" in expr else _q(p["new_name"])
        stmts.append(
            f"ALTER TABLE {t} REPLACE PARTITION FIELD {_q(p['old_name'])} WITH {target}"
        )
    for p in parts.get("new", []) or []:
        # identity fields render as the quoted column; transform fields
        # render their DDL expression (days(`ts`), bucket(16, `id`))
        expr = p.get("expr")
        target = expr if expr and "(" in expr else _q(p["name"])
        stmts.append(f"ALTER TABLE {t} ADD PARTITION FIELD {target}")
    for name in parts.get("dropped", []) or []:
        stmts.append(f"ALTER TABLE {t} DROP PARTITION FIELD {_q(name)}")

    props = entry.get("tblprops", {}) or {}
    set_props = {**(props.get("new") or {}), **(props.get("updated") or {})}
    if set_props:
        kv = ", ".join(f"'{k}'='{v}'" for k, v in sorted(set_props.items()))
        stmts.append(f"ALTER TABLE {t} SET TBLPROPERTIES ({kv})")
    removed = props.get("removed") or []
    if removed:
        ks = ", ".join(f"'{k}'" for k in sorted(removed))
        stmts.append(f"ALTER TABLE {t} UNSET TBLPROPERTIES ({ks})")
    return stmts
