"""Parser round-trip: generate random schemas, render CREATE TABLE
text, parse the whole corpus in one plan, and verify every extraction
(names, types, positions, directives, partitions, tblprops)."""

from __future__ import annotations

import random

import pytest

TYPES = [
    "string", "int", "bigint", "double", "float", "date", "timestamp",
    "decimal(18, 7)", "decimal(10,2)", "varchar(32)", "smallint",
    # nested complex types (depth up to 3 — the parser's documented bound)
    "array<int>",
    "map<string, int>",
    "array<struct<a:int,b:string>>",
    "struct<x:decimal(10,2),y:array<string>>",
    "map<string,array<struct<k:string,v:double>>>",
]


def gen_table(rng: random.Random, i: int):
    n_cols = rng.randint(1, 12)
    cols = []
    for j in range(n_cols):
        name = f"col_{i}_{j}"
        typ = rng.choice(TYPES)
        directive = rng.choice([None, None, None, "renamed_from", "after", "backfilled_from", "first"])
        commented = rng.random() < 0.15
        cols.append((name, typ, directive, commented))
    iceberg = rng.random() < 0.5
    n_parts = rng.randint(0, 2)
    parts = [(f"pcol_{i}_{k}", rng.choice(["date", "int"])) for k in range(n_parts)]
    props = {f"prop.{k}": f"v{k}" for k in range(rng.randint(0, 3))} if iceberg else {}
    return cols, parts, props, iceberg


def render(i, cols, parts, props, iceberg):
    lines = []
    for name, typ, directive, commented in cols:
        prefix = "-- " if commented else ""
        suffix = ""
        if directive == "first":
            suffix = " -- first"
        elif directive:
            suffix = f" -- {directive}: target_{name}"
        lines.append(f"    {prefix}`{name}` {typ},{suffix}")
    body = "\n".join(lines)
    part_clause = ""
    if parts:
        if iceberg:
            entries = ",\n".join(f"    `{n}`" for n, _ in parts)
        else:
            entries = ",\n".join(f"    `{n}` {t}" for n, t in parts)
        part_clause = f"\nPARTITIONED BY (\n{entries}\n)"
    props_clause = ""
    if props:
        kv = ",\n".join(f"    '{k}'='{v}'" for k, v in props.items())
        props_clause = f"\nTBLPROPERTIES(\n{kv}\n)"
    fmt = "USING iceberg" if iceberg else "STORED AS PARQUET"
    ext = "" if iceberg else "EXTERNAL "
    return (
        f"CREATE {ext}TABLE IF NOT EXISTS `gdb.gen_{i}` (\n{body}\n)\n"
        f"{fmt}{part_clause}\nLOCATION 's3://b/gen_{i}'{props_clause};"
    )


@pytest.mark.parametrize("seed", [7, 42])
def test_roundtrip(spark, seed):
    from easy_alterator_spark.ddl.parser import corpus_from_rows, parse_ddl_corpus

    rng = random.Random(seed)
    tables = [gen_table(rng, i) for i in range(30)]
    corpus = corpus_from_rows(
        spark,
        [
            (f"g/{i}.hql", render(i, *t))
            for i, t in enumerate(tables)
        ],
    )
    parsed = {r["file_path"]: r for r in parse_ddl_corpus(corpus).collect()}
    for i, (cols, parts, props, iceberg) in enumerate(tables):
        r = parsed[f"g/{i}.hql"]
        assert r["table_name"] == f"gdb.gen_{i}"
        assert r["is_create"]
        assert r["is_external"] == (not iceberg)
        assert r["hql_format"] == ("iceberg" if iceberg else "parquet")

        # column extraction: hive partition entries also match the
        # column regex (they carry types) — reference behavior
        expected = [(n, t.lower()) for n, t, _, _ in cols]
        if not iceberg:
            expected += [(n, t) for n, t in parts]
        got = [(c["name"], c["type"]) for c in r["columns"]]
        assert got == expected, f"table {i}"
        assert [c["pos"] for c in r["columns"]] == list(range(len(expected)))

        for c, (name, _, directive, commented) in zip(r["columns"], cols):
            assert c["commented"] == commented, (i, name)
            if directive == "first":
                assert c["first"]
            elif directive:
                assert c[directive] == f"target_{name}", (i, name, directive)
            else:
                assert c["renamed_from"] is None and c["after"] is None

        if iceberg:
            assert [(p["name"], p["field_id"]) for p in r["iceberg_partitions"]] == [
                (n, 1000 + k) for k, (n, _) in enumerate(parts)
            ]
            assert dict(r["tblprops"] or {}) == props
        else:
            assert [(p["name"], p["type"]) for p in r["hive_partitions"]] == [
                (n, t) for n, t in parts
            ]
