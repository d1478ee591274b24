"""Custom stateful streaming operator: per-entity sliding shingles.

The reference keeps per-entity model/shingle state in memory with
checkpoint persistence (``FeatureManager.java:248-263`` batchShingle +
``anomaly-checkpoint.json`` state docs).  The Structured Streaming
equivalent is ``applyInPandasWithState``: state = the last (k-1) feature
points per entity; every closed interval emits one shingle row once k
consecutive points exist.

State survives restarts via the streaming checkpoint location — the
same durability contract as the reference's checkpoint index.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_shingles(
    features: DataFrame,
    k: int = 8,
    entity_col: str = "entity",
    bucket_col: str = "window_start",
    value_col: str = "v",
) -> DataFrame:
    """(entity, bucket, value) stream → (entity, bucket, shingle array<double>)
    emitted for every bucket that completes a k-window.

    Input should be the output of a windowed aggregation (one row per
    closed (entity, bucket)); rows inside one micro-batch may arrive
    unordered — they are sorted by bucket before folding into state.
    """
    out_schema = (f"{entity_col} string, {bucket_col} timestamp, "
                  "shingle array<double>")
    state_schema = "buckets array<long>, values array<double>"

    def fn(key: Any, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        if state.exists:
            buckets, values = state.get
            buckets, values = list(buckets), list(values)
        else:
            buckets, values = [], []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(bucket_col)
        out_b, out_s = [], []
        for _, r in rows.iterrows():
            b = int(pd.Timestamp(r[bucket_col]).value // 10**6)
            buckets.append(b)
            values.append(float(r[value_col]))
            if len(values) > k:
                buckets, values = buckets[-k:], values[-k:]
            if len(values) == k:
                out_b.append(r[bucket_col])
                out_s.append(list(values))
        state.update((buckets, values))
        if not out_b:
            return iter(())
        return iter([pd.DataFrame({
            entity_col: [key[0]] * len(out_b),
            bucket_col: out_b,
            "shingle": out_s,
        })])

    return (features.groupBy(entity_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))
