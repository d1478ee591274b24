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
