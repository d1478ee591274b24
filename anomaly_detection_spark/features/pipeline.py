"""Detector feature pipeline parity (SURVEY.md §2.7, §3.1).

The reference's hot path — one composite query per interval producing
per-entity feature vectors, then shingling and imputation before model
scoring — restated as window functions over a dense bucket grid:

- ``feature_matrix``: filter + groupBy(entity, time bucket) + feature
  aggs == the CompositeRetriever page loop collapsed into one plan
  (``CompositeRetriever.java:154-183``).
- ``nearest_fill``: missing buckets take the nearest neighbor within
  ``max_neighbor_distance`` intervals (``FeatureManager.java:202-229``).
- ``impute_linear``: linear interpolation between surrounding samples,
  edges clamped to nearest (``LinearUniformImputer.java:43-81``).
- ``shingles``: last-k window of feature vectors per entity
  (``FeatureManager.java:248-263`` batchShingle), dropped when more
  than ``floor(k · max_missing_rate)`` of the k points were filled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..query.aggs import bucketize, metric_agg_column, to_millis


def feature_matrix(
    df: DataFrame,
    ts_col: str,
    interval_ms: int,
    feature_specs: dict[str, dict],
    entity_cols: tuple[str, ...] = (),
    filter_cond: Column | None = None,
) -> DataFrame:
    """(entity…, bucket_start, <feature columns>) per non-empty bucket."""
    if filter_cond is not None:
        df = df.filter(filter_cond)
    bucket = bucketize(ts_col, interval_ms).alias("bucket_start")
    return (
        df.groupBy(*entity_cols, bucket)
        .agg(F.count("*").alias("doc_count"),
             *[metric_agg_column(s, a) for a, s in feature_specs.items()])
    )


def _dense_grid(features: DataFrame, interval_ms: int,
                entity_cols: tuple[str, ...]) -> DataFrame:
    """Per-entity dense bucket grid spanning each entity's extent."""
    ent = list(entity_cols)
    ext = features.groupBy(*ent).agg(
        F.min(to_millis("bucket_start")).alias("lo"),
        F.max(to_millis("bucket_start")).alias("hi"))
    grid = ext.select(
        *ent,
        F.explode(F.sequence("lo", "hi", F.lit(interval_ms))).alias("bucket_ms"))
    return grid.select(*ent, F.timestamp_millis("bucket_ms").alias("bucket_start"))


def nearest_fill(
    features: DataFrame,
    interval_ms: int,
    value_cols: list[str],
    entity_cols: tuple[str, ...] = (),
    max_neighbor_distance: int = 2,
) -> DataFrame:
    """Densify to every bucket and fill gaps from the nearest non-null
    neighbor within ``max_neighbor_distance`` buckets (prev wins ties).
    Adds ``is_filled`` (true where the original bucket was missing but a
    neighbor filled it); unfillable buckets keep nulls."""
    ent = list(entity_cols)
    grid = _dense_grid(features, interval_ms, entity_cols)
    # presence = the bucket existed in `features` (join marker), NOT
    # value_cols[0] non-null — a present bucket whose first feature
    # aggregated to null must keep its other columns, not be refilled
    dense = grid.join(features.withColumn("_orig", F.lit(True)),
                      [*ent, "bucket_start"], "left")
    idx = (to_millis("bucket_start") / interval_ms).cast("long")
    dense = dense.withColumn("_idx", idx).withColumn(
        "_present", F.col("_orig").isNotNull())
    w = Window.partitionBy(*ent).orderBy("_idx")
    wp = w.rowsBetween(Window.unboundedPreceding, 0)
    wn = w.rowsBetween(0, Window.unboundedFollowing)
    present = F.col("_present")
    dense = (
        dense
        .withColumn("_pidx", F.last(F.when(present, F.col("_idx")), True).over(wp))
        .withColumn("_nidx", F.first(F.when(present, F.col("_idx")), True).over(wn))
    )
    dp = F.col("_idx") - F.col("_pidx")
    dn = F.col("_nidx") - F.col("_idx")
    use_prev = F.col("_pidx").isNotNull() & (dp <= max_neighbor_distance) & (
        F.col("_nidx").isNull() | (dp <= dn) | (dn > max_neighbor_distance))
    use_next = F.col("_nidx").isNotNull() & (dn <= max_neighbor_distance)
    for c in value_cols:
        prev_v = F.last(F.when(present, F.col(c)), True).over(wp)
        next_v = F.first(F.when(present, F.col(c)), True).over(wn)
        dense = dense.withColumn(
            c,
            F.when(present, F.col(c))
            .when(use_prev, prev_v)
            .when(use_next, next_v))
    dense = dense.withColumn(
        "is_filled",
        (~present) & F.col(value_cols[0]).isNotNull())
    return dense.drop("_idx", "_pidx", "_nidx", "_present", "_orig")


def impute_linear(
    features: DataFrame,
    interval_ms: int,
    value_cols: list[str],
    entity_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Linear interpolation of missing buckets between the surrounding
    samples; leading/trailing gaps clamp to the nearest sample
    (LinearUniformImputer.java:62-75 formula, deterministic)."""
    ent = list(entity_cols)
    grid = _dense_grid(features, interval_ms, entity_cols)
    # presence = join marker (see nearest_fill) — null features in a
    # present bucket are skipped as anchors but never trigger a refill
    dense = grid.join(features.withColumn("_orig", F.lit(True)),
                      [*ent, "bucket_start"], "left")
    dense = (dense
             .withColumn("_idx", (to_millis("bucket_start") / interval_ms).cast("long"))
             .withColumn("_present", F.col("_orig").isNotNull()))
    w = Window.partitionBy(*ent).orderBy("_idx")
    wp = w.rowsBetween(Window.unboundedPreceding, 0)
    wn = w.rowsBetween(0, Window.unboundedFollowing)
    present = F.col("_present")
    dense = (
        dense
        .withColumn("_pidx", F.last(F.when(present, F.col("_idx")), True).over(wp))
        .withColumn("_nidx", F.first(F.when(present, F.col("_idx")), True).over(wn))
    )
    frac = (F.col("_idx") - F.col("_pidx")) / (F.col("_nidx") - F.col("_pidx"))
    for c in value_cols:
        pv = F.last(F.when(present, F.col(c)), True).over(wp)
        nv = F.first(F.when(present, F.col(c)), True).over(wn)
        dense = dense.withColumn(
            c,
            F.when(present, F.col(c))
            .when(F.col("_pidx").isNull(), nv)          # leading edge
            .when(F.col("_nidx").isNull(), pv)          # trailing edge
            .otherwise(pv + (nv - pv) * frac))
    dense = dense.withColumn("is_filled", ~present)
    return dense.drop("_idx", "_pidx", "_nidx", "_present", "_orig")


def impute_fill(
    features: DataFrame,
    interval_ms: int,
    value_cols: list[str],
    entity_cols: tuple[str, ...] = (),
    method: str = "zero",
    fixed_values: dict[str, float] | None = None,
) -> DataFrame:
    """The reference's remaining imputation methods
    (``ImputationMethod.java:12-20``): ``zero`` fills missing buckets
    with 0, ``fixed_values`` with a per-feature constant
    (``FixedValueImputer``), ``previous`` carries the last present
    value forward (``PreviousValueImputer``; leading gaps stay null —
    there is no previous sample to carry).  ``linear`` lives in
    :func:`impute_linear`.  Same dense-grid/presence semantics as
    :func:`nearest_fill`."""
    if method not in ("zero", "fixed_values", "previous"):
        raise ValueError(
            f"impute_fill supports zero/fixed_values/previous; got "
            f"{method!r} (linear → impute_linear, nearest → nearest_fill)")
    if method == "fixed_values":
        fixed_values = fixed_values or {}
        missing = [c for c in value_cols if c not in fixed_values]
        if missing:
            raise ValueError(
                f"fixed_values imputation needs a value per feature; "
                f"missing {missing}")
    ent = list(entity_cols)
    grid = _dense_grid(features, interval_ms, entity_cols)
    dense = grid.join(features.withColumn("_orig", F.lit(True)),
                      [*ent, "bucket_start"], "left")
    dense = dense.withColumn("_present", F.col("_orig").isNotNull())
    present = F.col("_present")
    if method == "previous":
        w = (Window.partitionBy(*ent)
             .orderBy((to_millis("bucket_start") / interval_ms).cast("long"))
             .rowsBetween(Window.unboundedPreceding, 0))
    for c in value_cols:
        if method == "zero":
            fill = F.lit(0.0)
        elif method == "fixed_values":
            fill = F.lit(float(fixed_values[c]))
        else:
            fill = F.last(F.when(present, F.col(c)), True).over(w)
        dense = dense.withColumn(
            c, F.when(present, F.col(c)).otherwise(fill))
    dense = dense.withColumn("is_filled", ~present)
    return dense.drop("_present", "_orig")


def shingles(
    filled: DataFrame,
    value_cols: list[str],
    k: int = 8,
    entity_cols: tuple[str, ...] = (),
    max_missing_rate: float = 0.25,
) -> DataFrame:
    """Sliding last-k shingle per entity over a dense, filled grid
    (batchShingle).  Emits ``shingle`` = array of k feature vectors
    (oldest→newest) for every bucket with a complete window and at most
    ``floor(k·max_missing_rate)`` filled points."""
    ent = list(entity_cols)
    w = Window.partitionBy(*ent).orderBy("bucket_start")
    wk = w.rowsBetween(-(k - 1), 0)
    vec = F.array(*[F.col(c).cast("double") for c in value_cols])
    out = (
        filled
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_nmiss", F.sum(
            F.when(F.col("is_filled") | F.col(value_cols[0]).isNull(), 1)
            .otherwise(0)).over(wk))
        .withColumn("shingle", F.collect_list(vec).over(wk))
    )
    ok = (
        (F.col("_rn") >= k)
        & (F.col("_nmiss") <= int(k * max_missing_rate))
        & (F.size("shingle") == k)
        & F.col(value_cols[0]).isNotNull()
    )
    return out.filter(ok).select(*ent, "bucket_start", "shingle", "_nmiss") \
        .withColumnRenamed("_nmiss", "n_filled")
