"""Filtered aliases — the OpenSearch alias API analog
(``IndicesAliasesRequest``; detector configs routinely point at an
alias whose filter scopes a shared physical index, and time-sliced
corpora hide N monthly tables behind one read alias).

An alias registry is one JSON file (atomic tmp+rename writes, like the
index meta):

    {"alias": {"tables": ["/data/tx_2024*", "db.events"],
               "filter": {...query DSL...} | null,
               "write_table": "db.events" | null}}

``resolve_alias`` loads the union of the member tables (glob/list
semantics from :func:`load_table`) and applies the stored filter as a
compiled filter-context predicate — the alias filter composes with any
query the caller runs on top, exactly like the reference ANDs the
alias filter into every search.  ``write_table`` designates the single
member writes go to (the reference's ``is_write_index``); appends
through an alias without one raise, like OpenSearch.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .tables import load_table, write_table


def _read(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def _write(path: str, reg: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def put_alias(
    registry_path: str,
    alias: str,
    tables: list[str] | str,
    filter_query: dict[str, Any] | None = None,
    write_table_ident: str | None = None,
    spark: SparkSession | None = None,
) -> None:
    """Create or replace an alias (the add-alias action).  Pass
    ``spark`` to validate the filter at PUT time by compiling it
    against the member union's schema — a bad filter then fails here,
    like OpenSearch, not at first search."""
    tables = [tables] if isinstance(tables, str) else list(tables)
    if filter_query is not None and spark is not None:
        from ..query.planner import compile_filter

        compile_filter(load_table(spark, tables), filter_query)
    if not tables:
        raise ValueError("alias needs at least one member table")
    if write_table_ident is not None and write_table_ident not in tables:
        raise ValueError(
            f"write table {write_table_ident!r} must be an alias member")
    reg = _read(registry_path)
    reg[alias] = {"tables": tables, "filter": filter_query,
                  "write_table": write_table_ident}
    _write(registry_path, reg)


def delete_alias(registry_path: str, alias: str) -> None:
    reg = _read(registry_path)
    if alias not in reg:
        raise KeyError(f"alias {alias!r} does not exist")
    del reg[alias]
    _write(registry_path, reg)


def get_aliases(registry_path: str) -> dict:
    """The whole registry (the GET _alias shape)."""
    return _read(registry_path)


def resolve_alias(spark: SparkSession, registry_path: str,
                  alias: str) -> DataFrame:
    """Alias → filtered union DataFrame.  The stored filter compiles in
    filter context against the union's columns; callers' queries stack
    on top (AND), mirroring the reference."""
    reg = _read(registry_path)
    if alias not in reg:
        raise KeyError(f"alias {alias!r} does not exist")
    spec = reg[alias]
    df = load_table(spark, spec["tables"])
    if spec.get("filter") is not None:
        from ..query.planner import compile_filter

        df = df.filter(compile_filter(df, spec["filter"]))
    return df


def write_through_alias(df: DataFrame, registry_path: str, alias: str,
                        mode: str = "append") -> None:
    """Append via the alias's designated write table; no write table →
    raise (OpenSearch: 'no write index is defined for alias')."""
    reg = _read(registry_path)
    if alias not in reg:
        raise KeyError(f"alias {alias!r} does not exist")
    wt = reg[alias].get("write_table")
    if not wt:
        raise ValueError(
            f"no write table is defined for alias {alias!r}")
    write_table(df, wt, mode=mode)
