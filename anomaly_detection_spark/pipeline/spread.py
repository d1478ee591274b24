"""Conditional width-spread for narrow scans.

Single-file tables (one parquet file, one row group) plan a one-task
scan, so any per-doc heavy stage downstream — tokenize, shingle
hashing, a Python pass — runs serial on one core (guide §2.5: one
unsplittable input is input skew).  The fix is a deterministic hash
repartition, but ONLY when the scan is actually narrower than the
cluster: on a production table with thousands of splits the same
repartition would shuffle the whole corpus text for nothing, so the
spread must be a no-op there (this is what keeps the local-mode win
honest at 100 TB — see OPTIMIZATION_r06.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_narrow_scan(df: DataFrame, key: str | F.Column) -> DataFrame:
    """Hash-repartition ``df`` by ``key`` up to cluster width when its
    current scan has fewer partitions than the cluster; return ``df``
    unchanged otherwise.

    ``key`` must be a deterministic column (an id or the text itself) —
    never ``rand()``: retried map tasks must reproduce the same
    row-to-partition assignment (guide §2.5, SPARK-38388).
    """
    spark = df.sparkSession
    par = max(4, spark.sparkContext.defaultParallelism)
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        n = 0
    if n >= par:
        return df
    return df.repartition(par, key if isinstance(key, F.Column)
                          else F.col(key))
