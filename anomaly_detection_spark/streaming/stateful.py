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

import numpy as np
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
        # vectorized fold: concat state tail + new points, emit one
        # sliding window per new point once k consecutive points exist
        if state.exists:
            sb, sv = state.get
            sb = np.asarray(sb, dtype=np.int64)
            sv = np.asarray(sv, dtype=np.float64)
        else:
            sb = np.empty(0, dtype=np.int64)
            sv = np.empty(0, dtype=np.float64)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(bucket_col).reset_index(drop=True)
        nb = (pd.to_datetime(rows[bucket_col])
              .to_numpy(dtype="datetime64[ms]").astype(np.int64))
        nv = rows[value_col].to_numpy(dtype=np.float64)
        n0 = len(sv)
        all_b = np.concatenate([sb, nb])
        all_v = np.concatenate([sv, nv])
        state.update((all_b[-k:].tolist(), all_v[-k:].tolist()))
        if len(all_v) < k:
            return iter(())
        # window ending at global index i lives at sliding view row i-k+1
        wins = np.lib.stride_tricks.sliding_window_view(all_v, k)
        emit = np.arange(max(n0, k - 1), len(all_v))
        if len(emit) == 0:
            return iter(())
        return iter([pd.DataFrame({
            entity_col: [key[0]] * len(emit),
            bucket_col: rows[bucket_col].iloc[emit - n0].to_numpy(),
            "shingle": [w.tolist() for w in wins[emit - k + 1]],
        })])

    return (features.groupBy(entity_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))
