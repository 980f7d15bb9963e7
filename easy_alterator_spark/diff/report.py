"""Run-report assembly (A1): outcome rows -> the reference's JSON shape.

The heavy lifting (routing, joins, classification) happens in Spark;
this module collects the per-table outcome rows — tiny by construction,
one row per DDL file — and shapes the nested report exactly like the
reference's ``get_results`` (alterator.py:741-796) and the Iceberg
handler's cleaned nested dict (iceberg_schema_handler.py:578-700).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def clean(result):
    """Recursively drop empty values (parity with
    iceberg_schema_handler.clean_results:682-700)."""
    if isinstance(result, dict):
        out = {}
        for k, v in result.items():
            cv = clean(v)
            if cv or cv == 0:
                out[k] = cv
        return out
    if isinstance(result, list):
        return [clean(x) for x in result]
    return result


def _row_to_iceberg_entry(r) -> dict[str, Any]:
    if r["sequence_mismatch"]:
        return {
            "table_name": r["full_name"],
            "sequenceMismatch": "True",
            "migration": str(bool(r["requires_migration"])),
        }
    updated: dict[str, Any] = {
        "compatible": [
            {"name": c["name"], "old_type": c["old_type"], "new_type": c["new_type"]}
            for c in (r["compatible"] or [])
        ],
        "incompatible": [
            {
                "name": c["name"],
                "old_type": c["old_type"],
                "new_type": c["new_type"],
                "backfilled_from": c["backfilled_from"],
            }
            for c in (r["incompatible"] or [])
        ],
        "position_changes": [
            {"name": m["name"], "after": m["after"], "reason": m["reason"]}
            for m in (r["position_changes"] or [])
        ],
    }
    if r["first_col"]:
        updated["position_changes"] = updated["position_changes"] + [
            {"first": r["first_col"]}
        ]
    entry = {
        "table_name": r["full_name"],
        "columns": {
            "new": [
                {
                    "name": c["name"],
                    "type": c["type"],
                    "after": c["after"],
                    "first": c["first"],
                }
                for c in (r["new_cols"] or [])
            ],
            "dropped": list(r["dropped"] or []),
            "renamed": [
                {"old_name": c["old_name"], "new_name": c["new_name"]}
                for c in (r["renamed"] or [])
            ],
            "updated": updated,
        },
        "partition_columns": {
            "new": [
                {"field_id": p["field_id"], "name": p["name"], "expr": p["expr"]}
                for p in (r["part_new"] or [])
            ],
            "dropped": list(r["part_dropped"] or []),
            "replaced": [
                {
                    "old_name": p["old_name"],
                    "new_name": p["new_name"],
                    "expr": p["expr"],
                }
                for p in (r["part_replaced"] or [])
            ],
        },
        "tblprops": {
            "new": dict(r["props_new"] or {}),
            "removed": list(r["props_removed"] or []),
            "updated": dict(r["props_updated"] or {}),
        },
        "migration": str(bool(r["requires_migration"])),
    }
    return clean(entry)


def _nt(lst) -> list[dict[str, str]]:
    return [{"Name": c["Name"], "Type": c["Type"]} for c in (lst or [])]


def build_report(
    hive_outcomes: DataFrame,
    iceberg_results: DataFrame | None = None,
    versions: dict[str, str] | None = None,
    validate: bool = True,
    force: bool = False,
) -> dict[str, Any]:
    """Collect outcome rows and shape the reference report JSON.

    Args:
        hive_outcomes: output of :func:`easy_alterator_spark.diff.hive.hive_diff`.
        iceberg_results: output of
            :func:`easy_alterator_spark.diff.iceberg.iceberg_diff` for
            the iceberg-routed tables (may be None if none).
        versions: table_name -> catalog version id (for the success
            version bracket; validate mode reports prev == current).
    """
    versions = versions or {}
    ice_entries: dict[str, dict[str, Any]] = {}
    ice_errors: dict[str, str] = {}
    if iceberg_results is not None:
        for r in iceberg_results.collect():
            if r["error"]:
                ice_errors[r["table_name"]] = r["error"]
            else:
                ice_entries[r["table_name"]] = _row_to_iceberg_entry(r)

    success, skipped, new, identical = [], [], [], []
    errored, non_parquet, iceberg, format_changed = [], [], [], []

    for r in hive_outcomes.collect():
        o = r["outcome"]
        if o == "skipped":
            if r["reason"] in ("TableNameNotExtracted", "NonCreateSQL"):
                skipped.append(
                    {
                        "table_name": r["table_name"] or "",
                        "filename": r["file_path"],
                        "reason": r["reason"],
                    }
                )
            elif r["reason"] in (
                "IncompatibleDataTypeError",
                "IncompatibleDataTypeAndPartitionValidationError",
            ):
                skipped.append(
                    {
                        "table_name": r["table_name"],
                        "reason": r["reason"],
                        "details": {
                            "compatible": [
                                {
                                    "Name": c["Name"],
                                    "Type": c["Type"],
                                    "updated_type": c["updated_type"],
                                }
                                for c in (r["compatible"] or [])
                            ],
                            "incompatible": [
                                {
                                    "Name": c["Name"],
                                    "Type": c["Type"],
                                    "updated_type": c["updated_type"],
                                    "backfilled_from": c["backfilled_from"],
                                }
                                for c in (r["incompatible"] or [])
                            ],
                            "add": _nt(r["add"]),
                            "delete": _nt(r["delete"]),
                        },
                    }
                )
            else:  # partition validation reasons
                skipped.append({"table_name": r["table_name"], "reason": r["reason"]})
        elif o == "errored":
            errored.append(r["table_name"])
        elif o == "new":
            new.append(r["table_name"])
        elif o == "non_parquet":
            non_parquet.append(r["table_name"])
        elif o == "format_changed":
            fc = r["format_change"]
            format_changed.append(
                {
                    "old_format": fc["old_format"],
                    "new_format": fc["new_format"],
                    "table_name": r["table_name"],
                }
            )
        elif o == "iceberg":
            if r["format_change"] is not None:
                fc = r["format_change"]
                format_changed.append(
                    {
                        "old_format": fc["old_format"],
                        "new_format": fc["new_format"],
                        "table_name": r["table_name"],
                    }
                )
            if r["table_name"] in ice_errors:
                errored.append(
                    {
                        "table_name": r["table_name"],
                        "reason": "ValidationError",
                        "error": ice_errors[r["table_name"]],
                    }
                )
            else:
                entry = ice_entries.get(r["table_name"], {})
                has_updates = any(
                    entry.get(k)
                    for k in ("columns", "partition_columns", "tblprops", "sequenceMismatch")
                )
                if has_updates:
                    iceberg.append(entry)
                elif r["format_change"] is None:
                    identical.append(r["table_name"])
        elif o == "identical":
            identical.append(r["table_name"])
        elif o == "success":
            v = versions.get(r["table_name"])
            success.append(
                {
                    "table_name": r["table_name"],
                    "previous_version": v,
                    "current_version": v,
                    "details": {"add": _nt(r["add"]), "delete": _nt(r["delete"])},
                }
            )

    total = (
        len(success)
        + len(skipped)
        + len(new)
        + len(identical)
        + len(errored)
        + len(non_parquet)
        + len(iceberg)
        + len(format_changed)
    )
    return {
        "ResponseMetadata": {
            "validation": validate,
            "force": force,
            "stats": {
                "num_tables_analyzed": total,
                "num_updates": len(success),
                "num_skipped": len(skipped),
                "num_new": len(new),
                "num_errored": len(errored),
                "num_identical": len(identical),
                "num_non_parquet_tables": len(non_parquet),
                "num_iceberg_tables": len(iceberg),
                "num_format_changed_tables": len(format_changed),
            },
        },
        "success_tables": success,
        "skipped_tables": skipped,
        "new_tables": new,
        "identical_tables": identical,
        "errored_tables": errored,
        "non_parquet_tables": non_parquet,
        "iceberg_tables": iceberg,
        "format_changed_tables": format_changed,
    }
