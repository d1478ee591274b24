"""Source/sink abstraction: Iceberg when a catalog is configured,
parquet otherwise.

The north-star input is an Iceberg table of transcripts; this sandbox
has no Iceberg runtime jar, so the same call sites work against parquet
paths.  On a real cluster, pass a catalog table identifier
(``catalog.db.transcripts``) and add
``--packages org.apache.iceberg:iceberg-spark-runtime-...`` +
``spark.sql.catalog.<name>`` configs to spark-submit — everything else
(docid assignment, index build, query) is storage-agnostic because it
only sees a DataFrame.

Iceberg-specific niceties the engine exploits when present:
- partition pruning on ``ts`` (days/hours transform) serves the range
  queries (SURVEY.md §2.1 Q4);
- incremental scans (``option("start-snapshot-id", ...)``) feed the
  streaming feature job between index build rounds;
- ``DELETE FROM ... WHERE`` implements S8 delete-by-query natively
  (parquet fallback: filtered overwrite below).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _is_path(ident: str) -> bool:
    return "/" in ident or ident.endswith(".parquet")


def _has_glob(ident: str) -> bool:
    return any(c in ident for c in "*?[")


def load_table(spark: SparkSession, ident: str | list[str]) -> DataFrame:
    """Load one or more tables by Iceberg identifier or filesystem path.

    Detector configs may name source indices as a list or a pattern
    (``Config.java:97``; ``CompositeRetriever.java:333-350`` resolves
    ``blah*`` to concrete indices and queries their union) — mirrored
    here: a list unions by name; a path glob (``/data/tx_2024*``) or a
    catalog identifier pattern (``db.tx_*``) fans in every match.
    Union is by column name with missing columns null-filled, like
    searching heterogeneous indices through one mapping.
    """
    if isinstance(ident, (list, tuple)):
        dfs = [load_table(spark, i) for i in ident]
        if not dfs:
            raise ValueError("empty table list")
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out
    if _is_path(ident):
        if _has_glob(ident):
            import glob as _glob

            matches = sorted(_glob.glob(ident))
            if not matches:
                raise FileNotFoundError(f"no tables match pattern {ident!r}")
            return load_table(spark, matches)
        return spark.read.parquet(ident)
    if _has_glob(ident):
        import fnmatch

        db, _, pat = ident.rpartition(".")
        names = [t.name for t in (spark.catalog.listTables(db) if db
                                  else spark.catalog.listTables())]
        hits = sorted(n for n in names if fnmatch.fnmatch(n, pat))
        if not hits:
            raise ValueError(f"no tables match identifier pattern {ident!r}")
        return load_table(spark, [f"{db}.{n}" if db else n for n in hits])
    try:
        return spark.table(ident)
    except Exception as exc:
        raise RuntimeError(
            f"table identifier {ident!r} needs a registered view or an "
            "Iceberg/HMS catalog on the classpath; pass a parquet path "
            "in this environment"
        ) from exc


def write_table(df: DataFrame, ident: str, mode: str = "append") -> None:
    """Append/overwrite to an Iceberg table or parquet path."""
    if _is_path(ident):
        df.write.mode(mode).parquet(ident)
        return
    if mode == "append":
        df.writeTo(ident).append()  # pragma: no cover - needs catalog
    else:
        df.writeTo(ident).replace()  # pragma: no cover - needs catalog


def delete_by_query(
    spark: SparkSession, ident: str, query: dict[str, Any]
) -> int:
    """S8 delete-by-query (DeleteAnomalyResultsTransportAction.java:128):
    Iceberg → ``DELETE FROM … WHERE``; parquet → one filtered rewrite
    into a temp dir followed by a directory swap (the crash window is
    two renames, and the rewritten data survives either way — no state
    where the table is half-overwritten).
    Returns the number of deleted rows."""
    from ..query.planner import compile_filter

    df = load_table(spark, ident)
    cond = compile_filter(df, query)
    n = df.filter(cond).count()
    if n == 0:
        return 0
    if _is_path(ident):
        import shutil

        base = ident.rstrip("/")
        tmp = base + ".__tmp_delete__"
        trash = base + ".__old_delete__"
        # Retain = NOT matching.  A raw ~cond drops rows where the
        # predicate is NULL (NULL on both sides) — OpenSearch
        # delete-by-query deletes only *matching* docs, so null-field
        # rows must survive; coalesce(cond, FALSE) matches the SQL
        # branch's DELETE-only-TRUE semantics.
        df.filter(~F.coalesce(cond, F.lit(False))).write.mode(
            "overwrite"
        ).parquet(tmp)
        shutil.rmtree(trash, ignore_errors=True)
        shutil.move(base, trash)
        shutil.move(tmp, base)
        shutil.rmtree(trash, ignore_errors=True)
    else:  # pragma: no cover - needs catalog
        spark.sql(f"DELETE FROM {ident} WHERE {predicate_sql(query)}")
    return n


def _apply_update_script(df: DataFrame, script: str,
                         params: dict[str, Any] | None,
                         cond=None) -> DataFrame:
    """Update-script subset (UpdateByQueryRequest / ReindexRequest
    ``script``): ``;``-separated ``ctx._source.f = <expr>`` /
    ``ctx._source.f += <expr>`` statements, ``<expr>`` the painless
    arithmetic subset (``_painless_arith`` — the scripted_metric
    compiler) with fields referenced as ``ctx._source.g`` or
    ``doc['g'].value``.  With ``cond``, non-matching rows keep their
    original values; new values are cast back to the column's type so
    the table schema never drifts.  Statements apply IN ORDER, each
    seeing the previous one's result (painless sequencing)."""
    import re

    from ..query.aggs import _painless_arith, _sm_statements

    stmt_re = re.compile(
        r"ctx\._source\.([A-Za-z_]\w*)\s*(\+?=)\s*(.+)", re.S)
    out = df
    for st in _sm_statements(script):
        m = stmt_re.fullmatch(st)
        if not m:
            raise ValueError(
                f"update script statements must be "
                f"'ctx._source.f = expr' or '+= expr': {st!r}")
        name, op, rhs = m.group(1), m.group(2), m.group(3)
        if name not in out.columns:
            raise ValueError(f"update script references unknown "
                             f"field {name!r}")
        rhs = re.sub(r"ctx\._source\.([A-Za-z_]\w*)",
                     r"doc['\1'].value", rhs)
        sql = _painless_arith(rhs, params or {})
        if op == "+=":
            sql = f"`{name}` + ({sql})"
        new = F.expr(sql).cast(out.schema[name].dataType)
        if cond is not None:
            new = F.when(F.coalesce(cond, F.lit(False)), new) \
                .otherwise(F.col(name))
        out = out.withColumn(name, new)
    return out


def update_by_query(
    spark: SparkSession, ident: str, query: dict[str, Any],
    script: str, params: dict[str, Any] | None = None,
) -> int:
    """``_update_by_query`` analog: rows matching ``query`` get the
    update script applied (subset: :func:`_apply_update_script`).
    Iceberg → ``UPDATE … SET … WHERE`` territory, but the script can
    chain statements, so both branches use the same full rewrite:
    parquet writes to a temp dir and swaps directories (the same
    two-rename crash window as :func:`delete_by_query`).  Returns the
    number of updated rows."""
    from ..query.planner import compile_filter

    df = load_table(spark, ident)
    cond = compile_filter(df, query)
    n = df.filter(cond).count()
    if n == 0:
        return 0
    updated = _apply_update_script(df, script, params, cond=cond)
    if _is_path(ident):
        import shutil

        base = ident.rstrip("/")
        tmp = base + ".__tmp_update__"
        trash = base + ".__old_update__"
        updated.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(trash, ignore_errors=True)
        shutil.move(base, trash)
        shutil.move(tmp, base)
        shutil.rmtree(trash, ignore_errors=True)
    else:  # pragma: no cover - needs catalog
        updated.writeTo(ident).replace()
    return n


def reindex(
    spark: SparkSession, source: str | list[str], dest: str,
    query: dict[str, Any] | None = None, script: str | None = None,
    params: dict[str, Any] | None = None, max_docs: int | None = None,
    mode: str = "append", pipeline: dict[str, Any] | None = None,
) -> int:
    """``_reindex`` analog: read ``source`` (list/glob fan-in like any
    search target), optionally filter by ``query``, transform with the
    update-script subset, cap at ``max_docs``, write to ``dest``.
    ``op_type`` create/index degenerates to mode append/overwrite —
    a columnar table has no per-doc id conflict to detect.  The
    ``max_docs`` cut is made deterministic by ordering on ``docid``
    when the source carries one (OpenSearch's cut is internal-order);
    otherwise it is an arbitrary-but-valid prefix.  Returns the number
    of rows written."""
    from ..query.planner import compile_filter

    df = load_table(spark, source)
    if query:
        df = df.filter(compile_filter(df, query))
    if script:
        df = _apply_update_script(df, script, params)
    if pipeline:
        # _reindex's "dest.pipeline" — run an ingest pipeline on the
        # way through (after the script, like the reference: the
        # script runs in the reindex phase, the pipeline at ingest)
        from .ingest import apply_ingest_pipeline

        df = apply_ingest_pipeline(df, pipeline)
    if max_docs is not None:
        if "docid" in df.columns:
            df = df.orderBy("docid")
        df = df.limit(int(max_docs))
    n = df.count()
    write_table(df, dest, mode=mode)
    return n


def predicate_sql(query: dict[str, Any]) -> str:
    """Render the supported query-DSL subset as an ANSI-SQL predicate —
    for pushing delete-by-query into engines that speak SQL (Iceberg
    ``DELETE FROM … WHERE``).  ``Column._jc.toString()`` is not
    guaranteed valid SQL, so the DSL is rendered directly.  Timestamp
    ranges must use ISO strings here (epoch-millis ints would need the
    target column type, which SQL rendering can't see)."""
    if not query:
        return "TRUE"
    (kind, body), = query.items()
    if kind == "match_all":
        return "TRUE"
    if kind == "bool":
        parts: list[str] = []
        for ctx in ("must", "filter"):
            sub = body.get(ctx)
            for s in (sub if isinstance(sub, list) else [sub] if sub else []):
                parts.append(predicate_sql(s))
        shoulds = body.get("should") or []
        shoulds = shoulds if isinstance(shoulds, list) else [shoulds]
        if shoulds and not parts:
            parts.append("(" + " OR ".join(predicate_sql(s) for s in shoulds) + ")")
        mn = body.get("must_not")
        for s in (mn if isinstance(mn, list) else [mn] if mn else []):
            parts.append(f"NOT coalesce({predicate_sql(s)}, FALSE)")
        return " AND ".join(parts) if parts else "TRUE"
    if kind == "term":
        (fld, spec), = body.items()
        v = spec.get("value") if isinstance(spec, dict) else spec
        return f"{fld} = {_sql_lit(v)}"
    if kind == "terms":
        (fld, vals), = body.items()
        return f"{fld} IN ({', '.join(_sql_lit(v) for v in vals)})"
    if kind == "range":
        (fld, spec), = body.items()
        ops = {"gte": ">=", "gt": ">", "lte": "<=", "lt": "<"}
        return " AND ".join(f"{fld} {ops[o]} {_sql_lit(spec[o])}"
                            for o in ops if o in spec)
    if kind == "exists":
        return f"{body['field']} IS NOT NULL"
    if kind == "wildcard":
        (fld, spec), = body.items()
        from ..query.planner import _glob_to_like
        pat = spec.get("value") if isinstance(spec, dict) else spec
        return f"{fld} LIKE {_sql_lit(_glob_to_like(pat))}"
    raise ValueError(f"cannot render query kind {kind!r} as SQL")


def _sql_lit(v: Any) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)
