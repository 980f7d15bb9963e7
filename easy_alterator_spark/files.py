"""DDL file discovery + YAML config (S1/S4 in SURVEY.md §2.1).

Driver-side by design: listing a few hundred DDL paths is metadata
work; the *contents* are read distributed via ``spark.read.text``
(ddl/parser.read_ddl_corpus). Mirrors the reference's filter rules
(file_utils.py:48-128): directories expand to prefix/suffix-filtered
entries, explicit file paths pass through, and a table allowlist keeps
only ``{prefix}{table}.{suffix}`` names.
"""

from __future__ import annotations

import os

try:
    import yaml
except ImportError:  # pragma: no cover - PyYAML is optional
    yaml = None


def filter_ddl_files(
    paths: list[str],
    prefix: str | None = None,
    suffix: str = "hql",
    table_names: list[str] | None = None,
) -> list[str]:
    prefix = prefix or ""
    out: list[str] = []
    for path in paths:
        if os.path.isdir(path):
            names = [
                n
                for n in sorted(os.listdir(path))
                if n.startswith(prefix) and n.endswith(suffix)
            ]
            if table_names:
                wanted = {f"{prefix}{t}.{suffix}" for t in table_names}
                names = [n for n in names if n in wanted]
            out.extend(os.path.join(path, n) for n in names)
        else:
            out.append(path)
    return out


def read_config(path: str) -> dict:
    """YAML config: {path: ..., tables: [...]} (file_utils.py:131-142)."""
    if yaml is None:
        raise RuntimeError("PyYAML not available")
    with open(path, encoding="utf-8") as fs:
        return yaml.safe_load(fs)
