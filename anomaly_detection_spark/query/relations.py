"""Parent/child relation queries: ``has_child`` / ``has_parent`` —
the join-field query family (HasChildQueryBuilder /
HasParentQueryBuilder; public semantics), plus the engine-natural
``conversation_filter`` for the transcript data model.

The reference stores parents and children in one index under a join
field and resolves the relation with a global-ordinals join at query
time.  Spark-first that IS just a join: compile the inner query on
the relative side, aggregate child matches per join key, semi-join
back — broadcast-able whenever the matching key set is small, and a
plain shuffled semi-join otherwise (Catalyst/AQE picks).  Matching
only (ScoreMode.None — the reference's default; score modes would
need child-score aggregation, out of the supported subset like the
other filter-context rewrites)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .planner import compile_filter


def has_child(parents: DataFrame, children: DataFrame,
              query: dict[str, Any], join_field: str = "conv_id",
              min_children: int = 1,
              max_children: int | None = None) -> DataFrame:
    """Parent rows with ≥ ``min_children`` (and ≤ ``max_children``
    when given) children matching ``query`` — HasChildQueryBuilder's
    min_children/max_children contract."""
    matched = (children.filter(compile_filter(children, query))
               .groupBy(join_field)
               .agg(F.count("*").alias("_nc")))
    cond = F.col("_nc") >= int(min_children)
    if max_children is not None:
        cond = cond & (F.col("_nc") <= int(max_children))
    keys = matched.filter(cond).select(join_field)
    return parents.join(keys, join_field, "left_semi")


def has_parent(children: DataFrame, parents: DataFrame,
               query: dict[str, Any],
               join_field: str = "conv_id") -> DataFrame:
    """Child rows whose parent matches ``query``
    (HasParentQueryBuilder)."""
    keys = (parents.filter(compile_filter(parents, query))
            .select(join_field).distinct())
    return children.join(keys, join_field, "left_semi")


def conversation_filter(df: DataFrame, query: dict[str, Any],
                        join_field: str = "conv_id") -> DataFrame:
    """All rows of every GROUP containing ≥ 1 row matching ``query``
    — ``has_child`` where parent and child are the same turns table
    grouped by conversation (the transcript engine's natural "find
    whole conversations where ..." primitive)."""
    keys = (df.filter(compile_filter(df, query))
            .select(join_field).distinct())
    return df.join(keys, join_field, "left_semi")


def parent_id(children: DataFrame, pid,
              join_field: str = "conv_id") -> DataFrame:
    """``parent_id`` query (ParentIdQueryBuilder): children of ONE
    named parent — a plain codegen equality filter on the join field,
    no join at all (the reference resolves it the same way, without
    the global-ordinals join has_parent needs)."""
    return children.filter(F.col(join_field) == F.lit(pid))


def children_agg(parents: DataFrame, children: DataFrame,
                 terms_field: str | None = None,
                 sub_specs: dict[str, dict] | None = None,
                 query: dict[str, Any] | None = None,
                 join_field: str = "conv_id") -> DataFrame:
    """``children`` aggregation (ChildrenAggregationBuilder): switch
    the bucket context from parent docs to their children —
    per ``terms_field`` bucket over the (optionally query-filtered)
    parents, ``doc_count`` = children of that bucket's parents and
    metric sub-aggs evaluated over those CHILD docs.  One equi-join on
    the join field + one map-side-combinable agg; Catalyst/AQE
    broadcasts the parent side when the matching key set is small."""
    from .aggs import metric_agg_cols

    if query:
        parents = parents.filter(compile_filter(parents, query))
    cols = [join_field] + ([terms_field] if terms_field else [])
    keyed = parents.select(*cols).distinct()
    joined = children.join(keyed, join_field)
    subs = metric_agg_cols(sub_specs or {})
    if terms_field:
        return (joined.groupBy(terms_field)
                .agg(F.count("*").alias("doc_count"), *subs)
                .orderBy(F.desc("doc_count"), F.asc(terms_field)))
    return joined.agg(F.count("*").alias("doc_count"), *subs)


def parent_agg(children: DataFrame, parents: DataFrame,
               terms_field: str | None = None,
               sub_specs: dict[str, dict] | None = None,
               query: dict[str, Any] | None = None,
               join_field: str = "conv_id") -> DataFrame:
    """``parent`` aggregation (ParentAggregationBuilder — the reverse
    direction): per ``terms_field`` bucket over the (optionally
    filtered) CHILD docs, ``doc_count`` = distinct parents having ≥ 1
    child in the bucket and metric sub-aggs over those PARENT docs.
    The distinct on (bucket, join key) happens before the parent join,
    so a parent with many children in one bucket counts once — the
    reference's global-ordinals dedup."""
    from .aggs import metric_agg_cols

    if query:
        children = children.filter(compile_filter(children, query))
    cols = ([terms_field] if terms_field else []) + [join_field]
    keys = children.select(*cols).distinct()
    joined = keys.join(parents, join_field)
    subs = metric_agg_cols(sub_specs or {})
    if terms_field:
        return (joined.groupBy(terms_field)
                .agg(F.count("*").alias("doc_count"), *subs)
                .orderBy(F.desc("doc_count"), F.asc(terms_field)))
    return joined.agg(F.count("*").alias("doc_count"), *subs)
