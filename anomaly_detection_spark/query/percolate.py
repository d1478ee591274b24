"""``percolate`` analog: match documents against STORED queries —
the reverse-search primitive (PercolateQueryBuilder; alerting /
saved-search fan-out is its reference use).

Spark-first shape: every stored query compiles to one Catalyst
boolean Column (the engine's normal filter compilation, so the whole
filter-context DSL percolates); a batch of queries becomes ONE
projection pass over the doc stream — an array of (query_id, matched)
structs, filtered and exploded.  No shuffle, no per-query scan: cost
is one corpus scan per ``batch_size`` queries regardless of match
counts.  ``batch_size`` bounds codegen width (hundreds of predicates
in one projection is where Janino costs start); batches union.

The reference percolates CANDIDATE queries via a term-index prefilter
before evaluating — the analog optimization here would be pruning
queries whose required terms miss the doc batch entirely; with
whole-stage codegen evaluating all predicates in one fused pass, the
prefilter only pays off at many thousands of stored queries
(documented, not implemented)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..localdf import local_df

from .planner import compile_filter


def percolate(docs: DataFrame, queries: dict[str, dict[str, Any]],
              batch_size: int = 100,
              id_col: str = "docid") -> DataFrame:
    """(doc id, query_id) pairs for every stored query each doc
    matches.  ``queries`` maps query_id → filter-context query body
    (scored queries don't percolate — same as the reference, where
    percolation is matching, not ranking)."""
    if not queries:
        return local_df(docs.sparkSession,
                        [], f"{id_col} long, query_id string")
    items = sorted(queries.items())
    outs = []
    for i in range(0, len(items), max(1, batch_size)):
        chunk = items[i:i + batch_size]
        structs = [
            F.struct(
                F.lit(qid).alias("query_id"),
                F.coalesce(compile_filter(docs, body),
                           F.lit(False)).alias("m"))
            for qid, body in chunk]
        outs.append(
            docs.select(F.col(id_col),
                        F.explode(F.array(*structs)).alias("_q"))
            .filter(F.col("_q.m"))
            .select(id_col, F.col("_q.query_id").alias("query_id")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy(id_col, "query_id")
