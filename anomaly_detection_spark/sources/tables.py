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


def _is_path(ident: str) -> bool:
    return "/" in ident or ident.endswith(".parquet")


def load_table(spark: SparkSession, ident: str) -> DataFrame:
    """Load a table by Iceberg identifier or filesystem path."""
    if _is_path(ident):
        return spark.read.parquet(ident)
    try:
        return spark.table(ident)
    except Exception as exc:  # pragma: no cover - no catalog in sandbox
        raise RuntimeError(
            f"table identifier {ident!r} needs an Iceberg/HMS catalog on "
            "the classpath; pass a parquet path in this environment"
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
    Iceberg → ``DELETE FROM … WHERE``; parquet → filtered overwrite.
    Returns the number of deleted rows."""
    from ..query.planner import compile_filter

    df = load_table(spark, ident)
    cond = compile_filter(df, query)
    n = df.filter(cond).count()
    if n == 0:
        return 0
    remaining = df.filter(~cond)
    if _is_path(ident):
        tmp = ident.rstrip("/") + ".__tmp_delete__"
        remaining.write.mode("overwrite").parquet(tmp)
        reread = spark.read.parquet(tmp)
        reread.write.mode("overwrite").parquet(ident)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    else:  # pragma: no cover - needs catalog
        df.sparkSession.sql(f"DELETE FROM {ident} WHERE "
                            + cond._jc.toString())
    return n
