"""Rehearsal of the driver's correctness gate: every ``queries()`` entry
runs at sf0.01 and, when an ``oracle_sql()`` twin exists, must match
DuckDB row-for-row (order-insensitive, schema-aligned) — the same
comparison CORRECTNESS_r{N}.json records."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _normalize(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf[sorted(pdf.columns)].copy()
    rows = []
    for tup in pdf.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                row.append(None)
            elif isinstance(v, (np.floating, float)):
                row.append(round(float(v), 6))
            elif isinstance(v, (np.integer, int)):
                row.append(int(v))
            elif isinstance(v, pd.Timestamp):
                row.append(v.isoformat())
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) >= 0
    assert {"doc_id", "rank", "score"} == set(pdf.columns)


def test_all_queries_against_oracle(spark, duck):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    failures = []
    for name, fn in qs.items():
        got = fn(spark, SF).toPandas()
        if name not in oracles:
            # rows-only check (non-SQL-expressible)
            assert got is not None
            continue
        want = duck.sql(oracles[name]).df()
        if sorted(got.columns) != sorted(want.columns):
            failures.append((name, "schema", list(got.columns), list(want.columns)))
            continue
        # strict dtype agreement (int width / float / timestamp / object)
        for c in got.columns:
            gk, wk = got[c].dtype.kind, want[c].dtype.kind
            gi = str(got[c].dtype) if gk == "i" else gk
            wi = str(want[c].dtype) if wk == "i" else wk
            if gi != wi:
                failures.append((name, "dtype", c, (str(got[c].dtype),
                                                    str(want[c].dtype))))
        if len(got) != len(want):
            failures.append((name, "rowcount", len(got), len(want)))
            continue
        g, w = _normalize(got), _normalize(want)
        if g != w:
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            failures.append((name, "values", diff, None))
    assert not failures, failures
