"""Per-entity model-scoring seam (SURVEY.md §3.1 end-to-end).

The reference fans detector results out per entity and feeds each
entity's shingled feature history to its model
(``ResultProcessor.java:204-331`` → per-entity RCF update/score).  The
Spark seam is ``applyInPandas`` over the entity key: one pandas batch
per entity, rows bucket-ordered, a pluggable vectorized scorer over the
value series.  RCF itself lives in a library the survey scopes out; the
stand-in scorer is a trailing-window z-score — deliberately
SQL-expressible so the whole seam is oracle-checkable, while any numpy
scorer (an actual RCF binding included) plugs into the same signature.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def zscore_scorer(k: int = 8, eps: float = 1e-9,
                  include_current: bool = True) -> Callable[[np.ndarray], np.ndarray]:
    """Trailing-window z-score; NaN until a full k-window exists.
    Variance via avg(v²) − avg(v)² so the float sequence matches the
    SQL oracle bit-for-bit.

    ``include_current=True``: window is v_{i−k+1..i} (the SQL-window
    shape) — note |z| is then bounded by √(k−1), since the point damps
    its own baseline.  ``include_current=False``: window is the PRIOR
    k points v_{i−k..i−1} — the detection shape (a spike is judged
    against history it isn't part of; reference models likewise score
    a point against the model state before ingesting it)."""

    def score(values: np.ndarray) -> np.ndarray:
        n = len(values)
        out = np.full(n, np.nan)
        need = k if include_current else k + 1
        if n < need:
            return out
        win = np.lib.stride_tricks.sliding_window_view(values, k)
        m = win.sum(axis=1) / k
        m2 = (win * win).sum(axis=1) / k
        std = np.sqrt(np.maximum(m2 - m * m, 0.0))
        if include_current:
            out[k - 1:] = (values[k - 1:] - m) / (std + eps)
        else:
            out[k:] = (values[k:] - m[:n - k]) / (std[:n - k] + eps)
        return out

    return score


def seasonal_zscore_scorer(
    period: int,
    n_periods: int = 4,
    resid_window: int = 288,
    min_periods: int = 72,
    eps: float = 1e-9,
) -> Callable[[np.ndarray], tuple[np.ndarray, np.ndarray]]:
    """Seasonal-baseline scorer for periodic series (the shape RCF
    learns through shingles): expected value = MEDIAN of the same slot
    over the past ``n_periods`` periods (median so one anomalous period
    can't poison the next period's baseline), residuals are RELATIVE
    (``(v − exp)/|exp|`` — robust to trend/level drift), and the score
    is the residual's z against a trailing ``resid_window`` of
    residuals whose mean absorbs steady drift.

    Returns ``(z, expected_adj)`` where ``expected_adj`` is the
    drift-corrected expected value (``exp · (1 + resid_mean)``) — the
    "expected" the suppression rules compare margins against.  NaN
    until one full period plus ``min_periods`` residuals exist.

    The series must be on a DENSE time grid (one value per interval):
    pair with the detector's imputation for gappy entities."""

    def score(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        n = len(values)
        exp = np.full(n, np.nan)
        lags = np.full((n_periods, n), np.nan)
        for j in range(1, n_periods + 1):
            off = j * period
            if off < n:
                lags[j - 1, off:] = values[:n - off]
        with np.errstate(all="ignore"):
            exp = np.nanmedian(lags, axis=0)
        rr = (values - exp) / np.maximum(np.abs(exp), 1.0)
        s = pd.Series(rr)
        rm = s.rolling(resid_window, min_periods=min_periods) \
            .mean().shift(1).to_numpy()
        rs = s.rolling(resid_window, min_periods=min_periods) \
            .std().shift(1).to_numpy()
        z = (rr - rm) / (rs + eps)
        exp_adj = exp * (1.0 + rm)
        return z, exp_adj

    score.returns_expected = True
    return score


def score_entities(
    features: DataFrame,
    value_col: str,
    scorer: Callable[[np.ndarray], np.ndarray] | None = None,
    entity_cols: tuple[str, ...] = ("entity",),
    bucket_col: str = "bucket_start",
    score_col: str = "score",
) -> DataFrame:
    """(entity…, bucket, value) → + ``score`` from the per-entity scorer.

    One task per entity group (hash-partitioned on the entity key — the
    same fan-out shape as the reference's per-entity model hosting);
    rows are sorted by bucket inside the batch, and the scorer sees the
    full ordered value series at once (vectorized, no per-row Python).
    Rows whose score is NaN (warm-up) are dropped, mirroring the
    reference's cold-start interval handling.
    """
    scorer = scorer or zscore_scorer()
    ent = list(entity_cols)
    # a scorer may also return its expected baseline per point
    # (returns_expected attribute) — surfaced as an ``_exp`` column for
    # rule suppression (actual-vs-expected margins)
    ret_exp = getattr(scorer, "returns_expected", False)
    # copy, don't .add(): DataFrame.schema is cached and add() mutates it
    fields = list(features.schema.fields)
    if ret_exp:
        fields.append(T.StructField("_exp", T.DoubleType()))
    out_schema = T.StructType(fields + [T.StructField(score_col,
                                                      T.DoubleType())])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bucket_col).reset_index(drop=True)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        if ret_exp:
            z, exp = scorer(vals)
            pdf["_exp"] = exp
            pdf[score_col] = z
        else:
            pdf[score_col] = scorer(vals)
        out = pdf[pdf[score_col].notna()]
        return out[[f.name for f in out_schema.fields]]

    return features.groupBy(*ent).applyInPandas(fn, schema=out_schema)
