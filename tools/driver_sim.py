"""Simulate the correctness driver: vanilla SparkSession (no engine
confs), every ``queries()`` entry vs its ``oracle_sql()`` DuckDB twin
at sf0.01, value-hash comparison with columns sorted by name.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import sys
import traceback

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def canon(v):
    import datetime
    import math

    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def result_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        (tuple(canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    return hashlib.sha256(repr(canon_rows).encode()).hexdigest()[:16]


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    # deliberately vanilla: the driver does not apply engine confs
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    from easy_alterator_spark.sources import TABLE_NAMES

    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    report, n_red = {}, 0
    for name in sorted(queries):
        if ONLY and name not in ONLY:
            continue
        rec = {}
        try:
            df = queries[name](spark, SF_DIR)
            s_cols = list(df.columns)
            s_rows = [tuple(r) for r in df.collect()]
            rec["spark_rows"] = len(s_rows)
            if name in oracles:
                cur = con.execute(oracles[name])
                d_cols = [d[0] for d in cur.description]
                d_rows = cur.fetchall()
                rec["oracle_rows"] = len(d_rows)
                rec["rows_match"] = len(s_rows) == len(d_rows)
                rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
                rec["hash_match"] = result_hash(s_cols, s_rows) == result_hash(
                    d_cols, d_rows
                )
                if not all(
                    (rec["rows_match"], rec["schema_match"], rec["hash_match"])
                ):
                    n_red += 1
            else:
                rec["err"] = "no_oracle"
        except Exception:
            rec["err"] = traceback.format_exc()[-600:]
            n_red += 1
        report[name] = rec
        flag = (
            "OK"
            if rec.get("hash_match")
            else ("--" if rec.get("err") == "no_oracle" else "RED")
        )
        print(f"{flag} {name} {json.dumps({k: v for k, v in rec.items() if k != 'err'})}")
        if flag == "RED" and rec.get("err"):
            print(rec["err"])
    print(f"\nRED={n_red} total={len(report)}")
    with open("/tmp/driver_sim.json", "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
