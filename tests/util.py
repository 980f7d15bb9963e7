"""Differential-comparison helpers mirroring the driver's gate:
row count + column names + order-insensitive canonicalized values."""

from __future__ import annotations

import datetime
import math


def canon_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # absorb only representation noise (queries already ROUND)
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(canon_value(x) for x in v)
    return v


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def spark_result(df) -> tuple[list[str], list[tuple]]:
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def assert_df_matches_oracle(df, con, sql: str, name: str = "") -> None:
    s_cols, s_rows = spark_result(df)
    d_cols, d_rows = duck_result(con, sql)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_canon = canon_rows(s_cols, s_rows)
    d_canon = canon_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
