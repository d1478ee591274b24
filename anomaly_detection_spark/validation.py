"""Detector config validation + interval suggestion.

Restates the reference's validate/suggest surface
(``rest/handler/ModelValidationActionHandler.java`` /
``rest/handler/IntervalCalculation.java``) on DataFrames:

- :func:`suggest_interval` — the adaptive median-interval discovery
  (``IntervalCalculation.findMedianIntervalAdaptive`` +
  ``refineGap``, faithfully): a coarse estimate (span / doc count)
  refined by a bidirectional zoom over ≤256-bucket date_histograms,
  stopping when the MEDIAN gap between consecutive non-empty buckets'
  first timestamps is within a factor of two of the bucket width;
  falls back to an auto_date_histogram minimum-gap estimate past the
  depth cap (``runAutoDate``).
- :func:`validate_detector` — the config checks a user hits before a
  detector runs: sources resolve and are non-empty, the time field
  exists and is a timestamp, the filter query and every feature
  aggregation compile, and an interval recommendation.

Each refinement step is one tiny aggregation job over a ≤256-bucket
window — driver-side looping is the right shape here (the reference
does the same over sequential search requests); this is a validation
utility, not a hot path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .query.aggs import to_millis

BUCKET_CAP = 256            # IntervalCalculation.java:57
MAX_SPLIT_DEPTH = 10        # IntervalCalculation.java:58
MINUTE_MS = 60_000


def _ceil_minutes(ms: float) -> int:
    return max(1, int(math.ceil(ms / MINUTE_MS)))


def _bucket_gaps(base: DataFrame, ts_col: str, bucket_ms: int,
                 lo_ms: int, hi_ms: int) -> tuple[float, bool]:
    """One refinement probe: histogram at ``bucket_ms`` over
    [lo_ms, hi_ms], min(first_ts) per bucket → (median gap between
    consecutive non-empty buckets' first timestamps, whether empty
    buckets sit BETWEEN non-empty ones)."""
    ms = to_millis(ts_col)
    rows = (base.filter((ms >= lo_ms) & (ms <= hi_ms))
            .groupBy((F.floor(ms / bucket_ms)).alias("_b"))
            .agg(F.min(ms).alias("_first"))
            .orderBy("_b")
            .collect())
    if len(rows) < 2:
        return float("nan"), False
    bs = [r["_b"] for r in rows]
    # non-empty buckets come back as rows; empties between = index gaps
    has_empty_between = any(b2 - b1 > 1 for b1, b2 in zip(bs, bs[1:]))
    firsts = [r["_first"] for r in rows]
    gaps = sorted(g for g in
                  (b - a for a, b in zip(firsts, firsts[1:])) if g > 0)
    if not gaps:
        return float("nan"), has_empty_between
    mid = len(gaps) // 2
    med = (float(gaps[mid]) if len(gaps) % 2
           else (gaps[mid - 1] + gaps[mid]) / 2.0)
    return med, has_empty_between


def suggest_interval(
    df: DataFrame,
    ts_col: str = "ts",
    filter_cond=None,
    min_bucket_mins: int = 1,
    bucket_cap: int = BUCKET_CAP,
    max_depth: int = MAX_SPLIT_DEPTH,
) -> int | None:
    """Recommended detection interval in MINUTES, or None when the
    data cannot support one (< 2 docs / zero span) — the
    ``findMedianIntervalAdaptive`` contract."""
    base = df.filter(filter_cond) if filter_cond is not None else df
    ms = to_millis(ts_col)
    row = base.agg(F.min(ms).alias("lo"), F.max(ms).alias("hi"),
                   F.count("*").alias("n")).collect()[0]
    if row["lo"] is None or row["n"] < 2 or row["lo"] == row["hi"]:
        return None
    lo, hi, total = int(row["lo"]), int(row["hi"]), int(row["n"])

    bucket_mins = max(min_bucket_mins, _ceil_minutes((hi - lo) / total))
    zoom = -1
    for _ in range(max_depth + 1):
        bucket_ms = bucket_mins * MINUTE_MS
        # keep ≤ bucket_cap buckets: probe the trailing window only
        probe_lo = max(lo, hi - bucket_ms * bucket_cap) \
            if (hi - lo) // bucket_ms > bucket_cap else lo
        med, empty_between = _bucket_gaps(base, ts_col, bucket_ms,
                                          probe_lo, hi)
        if not math.isnan(med) and med > 0:
            gap_mins = _ceil_minutes(med)
            if bucket_mins / 2.0 < gap_mins < bucket_mins * 2.0:
                return max(1, gap_mins)
        if zoom < 0:
            if empty_between or bucket_mins <= min_bucket_mins:
                zoom = 1
                bucket_mins *= 2
            else:
                bucket_mins = max(min_bucket_mins, bucket_mins // 2)
        else:
            bucket_mins *= 2

    # fallback (runAutoDate): auto histogram at ≤ bucket_cap buckets,
    # shortest positive gap between non-empty buckets' first timestamps
    span = hi - lo + 1
    auto_ms = max(MINUTE_MS, int(math.ceil(span / bucket_cap)))
    rows = (base.groupBy((F.floor(ms / auto_ms)).alias("_b"))
            .agg(F.min(ms).alias("_first")).orderBy("_b").collect())
    firsts = [r["_first"] for r in rows]
    gaps = [b - a for a, b in zip(firsts, firsts[1:]) if b - a > 0]
    return _ceil_minutes(min(gaps)) if gaps else None


def validate_detector(spark: SparkSession, det) -> dict:
    """Pre-flight config validation (ModelValidationActionHandler's
    user-facing checks).  Returns ``{"issues": {aspect: message, ...},
    "suggested_interval_minutes": int | None}`` — empty issues =
    config is runnable."""
    from .query.planner import compile_filter
    from .sources import load_table

    issues: dict[str, str] = {}
    src = None
    try:
        src = load_table(spark, det.indices)
        if not src.head(1):
            issues["indices"] = f"source {det.indices!r} is empty"
    except Exception as e:  # noqa: BLE001 — surfaced to the user
        issues["indices"] = f"cannot resolve source {det.indices!r}: {e}"

    suggested = None
    if src is not None and "indices" not in issues:
        from pyspark.sql import types as T

        if det.time_field not in src.columns:
            issues["time_field"] = (
                f"time field {det.time_field!r} not in source columns "
                f"{src.columns}")
        elif not isinstance(src.schema[det.time_field].dataType,
                            (T.TimestampType, T.TimestampNTZType)):
            issues["time_field"] = (
                f"time field {det.time_field!r} must be a timestamp, "
                f"got {src.schema[det.time_field].dataType.simpleString()}")

        cond = None
        if det.filter_query is not None:
            try:
                cond = compile_filter(src, det.filter_query)
            except Exception as e:  # noqa: BLE001
                issues["filter_query"] = f"filter query rejected: {e}"

        from .query.aggs import metric_agg_column

        for name, spec in det.feature_specs.items():
            try:
                src.agg(metric_agg_column(spec, name))
            except Exception as e:  # noqa: BLE001
                issues[f"feature:{name}"] = f"aggregation rejected: {e}"

        for c in det.category_fields:
            if c not in src.columns:
                issues[f"category:{c}"] = "category field not in source"

        if "time_field" not in issues:
            suggested = suggest_interval(src, det.time_field,
                                         filter_cond=cond)
            if suggested is None:
                issues["interval"] = (
                    "not enough data to infer an interval (< 2 docs "
                    "or zero time span)")

    return {"issues": issues, "suggested_interval_minutes": suggested}


# --- forecaster validation (RestValidateForecasterAction analog) ------------

#: TimeSeriesSettings.MAX_SHINGLE_SIZE × Forecaster.DEFAULT_HORIZON_
#: SHINGLE_RATIO (128 × 3) — the reference's horizon ceiling
#: (Forecaster.java:237)
MAX_HORIZON = 128 * 3


def suggest_shingle(horizon: int | None = None,
                    seasonality: int | None = None,
                    default: int = 8) -> int:
    """The reference's forecaster shingle recommendation
    (``Forecaster.ForecastShingleGetter``): with a seasonality hint or
    horizon, ``max(seasonality/2, horizon/3)`` clamped to
    [MINIMUM_SHINGLE_SIZE=4, MAX_SHINGLE_SIZE=128]; otherwise the
    default."""
    if not seasonality and not horizon:
        return default
    candidate = 0
    if seasonality:
        candidate = max(candidate, seasonality // 2)
    if horizon:
        candidate = max(candidate, horizon // 3)
    # clamp even when the hint rounds to 0 (horizon=2 → 0 → floor 4):
    # a supplied hint always yields the clamped recommendation, so a
    # larger horizon can never suggest a SMALLER shingle
    return max(4, min(128, candidate))


def validate_forecaster(spark: SparkSession, fc) -> dict:
    """Forecaster pre-flight validation: every detector-shaped check
    (source, time field, filter, features, categories, interval
    recommendation) plus the forecast-specific horizon bounds
    (``Forecaster.java:237``: 1 ≤ horizon ≤ 384) and the suggested
    shingle size.  ``fc`` is an
    :class:`~anomaly_detection_spark.forecast.Forecaster` (any object
    with the detector-shaped fields + ``horizon`` works)."""
    out = validate_detector(spark, fc)
    horizon = getattr(fc, "horizon", None)
    if horizon is None or horizon < 1 or horizon > MAX_HORIZON:
        out["issues"]["horizon"] = (
            f"horizon must be in [1, {MAX_HORIZON}], got {horizon!r}")
    out["suggested_shingle_size"] = suggest_shingle(horizon=horizon)
    return out


# TimeSeriesSettings.java:94 — history suggestions cap here
MAX_HISTORY_INTERVALS = 10_000
# TimeSeriesSettings.NUM_MIN_SAMPLES — Config.getDefaultHistory adds
# the shingle size on top
NUM_MIN_SAMPLES = 32


def suggest_history(spark: SparkSession, det, now_ms: int,
                    interval_minutes: int | None = None) -> dict:
    """The reference's history suggestion
    (``rest/handler/HistorySuggest.java`` via
    ``BaseSuggestConfigParamTransportAction.suggestHistory``): how many
    trailing intervals of source data a historical run / cold start
    can train on.

    ``history = clamp((max_ts − min_ts) // interval,
    default_history, MAX_HISTORY_INTERVALS)`` where ``default_history
    = NUM_MIN_SAMPLES + shingle_size`` (``Config.getDefaultHistory``)
    and a future-dated max is capped at ``now`` — all three reference
    behaviors.  With no usable interval (``interval_minutes`` omitted
    and the detector interval unset), the default history returns
    alone, like the reference's null-interval branch.  One min/max
    aggregation over the (filtered) source."""
    from .query.planner import compile_filter
    from .sources import load_table

    default_history = NUM_MIN_SAMPLES + det.shingle_size
    interval_ms = ((interval_minutes * MINUTE_MS)
                   if interval_minutes else det.interval_ms)
    if not interval_ms:
        return {"history": default_history, "interval_minutes": None}
    src = load_table(spark, det.indices)
    base = (src.filter(compile_filter(src, det.filter_query))
            if det.filter_query else src)
    ms = to_millis(det.time_field)
    row = base.agg(F.min(ms).alias("lo"), F.max(ms).alias("hi")).first()
    if row["lo"] is None:
        raise ValueError("Empty data. Cannot suggest a history.")
    hi = min(int(row["hi"]), now_ms)      # future dates cap at now
    history = max(0, (hi - int(row["lo"]))) // interval_ms
    return {"history": int(max(default_history,
                               min(history, MAX_HISTORY_INTERVALS))),
            "interval_minutes": interval_ms // MINUTE_MS}


def suggest_window_delay(spark: SparkSession, det, now_ms: int) -> dict:
    """The reference's adaptive window-delay suggestion
    (``BaseSuggestConfigParamTransportAction.suggestWindowDelay``):
    enough delay that the current query window's data has been
    ingested.  ``buckets_behind = ceil((now − latest_ts) / interval)``
    plus one safety bucket, converted to whole minutes (ceiling); a
    future-dated latest timestamp yields 0 delay.  One max aggregation
    over the (filtered) source."""
    from .query.planner import compile_filter
    from .sources import load_table

    src = load_table(spark, det.indices)
    base = (src.filter(compile_filter(src, det.filter_query))
            if det.filter_query else src)
    row = base.agg(F.max(to_millis(det.time_field)).alias("hi")).first()
    if row["hi"] is None:
        raise ValueError("Cannot find a good window delay.")
    latest = int(row["hi"])
    delay_ms = 0
    if now_ms > latest:
        bucket_ms = det.interval_ms
        buckets_behind = (now_ms - latest + bucket_ms - 1) // bucket_ms
        delay_ms = (buckets_behind + 1) * bucket_ms
    return {"window_delay_minutes": int(math.ceil(delay_ms / 60000.0))}


# CommonMessages.java:55-70 — the model-aspect validation messages
RAW_DATA_TOO_SPARSE = (
    "Source index data is potentially too sparse for model training. "
    "Consider changing interval length or ingesting more data")
FILTER_QUERY_TOO_SPARSE = ("Data is too sparse after data filter is "
                           "applied. Consider changing the data filter")
CATEGORY_FIELD_TOO_SPARSE = (
    "Data is most likely too sparse with the given category fields. "
    "Consider revising category field/s or ingesting more data.")
CATEGORY_FIELD_NO_DATA = (
    "No entity was found with the given categorical fields. Consider "
    "revising category field/s or ingesting more data")
FEATURE_QUERY_TOO_SPARSE = (
    "Data is most likely too sparse when given feature queries are "
    "applied. Consider revising feature queries")
INTERVAL_REC = ("The selected interval might collect sparse data. "
                "Consider changing interval length to: ")
WINDOW_DELAY_REC = ("Latest seen data point is at least %d minutes ago. "
                    "Consider changing window delay to at least %d "
                    "minutes.")
# TimeSeriesSettings.java:278 — top-entity window uses at least this
MAX_INTERVAL_REC_LENGTH_IN_MINUTES = 60


def _continuous_shingles(base: DataFrame, det, latest_ms: int,
                         history: int) -> int:
    """``SearchFeatureDao.countContinuousShinglesFromHistogramSearch``
    + ``countShingles``: histogram at the configured interval over
    ``[latest − history×interval, latest]``, then count the length-
    ``shingle_size`` windows whose every bucket is non-empty — the
    density statistic every model-validation sparsity check compares
    to NUM_MIN_SAMPLES.  One bounded groupBy (≤ history+1 buckets);
    the window slide runs driver-side on the boolean grid."""
    interval = det.interval_ms
    lo = latest_ms - history * interval
    ms = to_millis(det.time_field)
    rows = (base.filter((ms >= lo) & (ms <= latest_ms))
            .groupBy(F.floor((ms - F.lit(lo)) / interval).alias("_b"))
            .count().collect())
    nonempty = [False] * (history + 1)
    for r in rows:
        nonempty[int(r["_b"])] = r["count"] > 0
    k = det.shingle_size
    return sum(1 for i in range(k - 1, len(nonempty))
               if all(nonempty[i - k + 1:i + 1]))


def validate_model(spark: SparkSession, det, now_ms: int,
                   history_intervals: int | None = None) -> dict:
    """Model-aspect validation (``ModelValidationActionHandler``,
    ``validation_type=model``) — the reference's fail-fast root-cause
    chain, with its exact messages and decision order:

    1. interval recommendation over the filtered source narrowed to
       the HC top entity (``IntervalCalculation`` with
       ``LatestTimeRetriever.getTopEntity``): a recommendation ≤ the
       configured interval means data is dense enough — only the
       window-delay check remains; a larger recommendation returns
       ``detection_interval`` with ``INTERVAL_REC`` (:209-224),
    2. no recommendation at all → add one configuration at a time to
       find the root cause: raw data (``RAW_DATA_TOO_SPARSE``,
       :238-266), + filter query (``FILTER_QUERY_TOO_SPARSE``), +
       top-entity terms (``CATEGORY_FIELD_TOO_SPARSE`` /
       ``CATEGORY_FIELD_NO_DATA``), + each feature's source field
       (``FEATURE_QUERY_TOO_SPARSE: <name>``) — every check is
       "continuous shingle count < NUM_MIN_SAMPLES" over the same
       histogram (:358-437),
    3. a clean chain still recommends a window delay when ``now −
       latest > window_delay`` (``sendWindowDelayRec``, ceil minutes
       in BOTH message slots, :440-448).

    Returns ``{"issues": {aspect: message}}`` with at most one issue
    (fail-fast, like the listener chain), plus
    ``suggested_interval_minutes`` when an interval was recommended.
    ``history_intervals`` defaults to ``Config.getDefaultHistory`` =
    NUM_MIN_SAMPLES + shingle_size."""
    import math as _math

    from .query.planner import compile_filter
    from .sources import load_table

    history = int(history_intervals
                  or (NUM_MIN_SAMPLES + det.shingle_size))
    src = load_table(spark, det.indices)
    ms = to_millis(det.time_field)
    row = src.agg(F.max(ms)).first()
    if row[0] is None:
        return {"issues": {"indices": RAW_DATA_TOO_SPARSE}}
    latest = int(row[0])
    fbase = (src.filter(compile_filter(src, det.filter_query))
             if det.filter_query else src)

    # HC top entity over the max(60min, interval) × history window
    # (LatestTimeRetriever.getTopEntity:124-145)
    top_entity: dict = {}
    tbase = fbase
    if det.category_fields:
        span = max(MAX_INTERVAL_REC_LENGTH_IN_MINUTES * MINUTE_MS,
                   det.interval_ms)
        te = (fbase.filter((ms >= latest - history * span)
                           & (ms <= latest))
              .groupBy(*det.category_fields).count()
              .orderBy(F.desc("count"), *det.category_fields)
              .limit(1).collect())
        if te:
            top_entity = {c: te[0][c] for c in det.category_fields}
            for c, v in top_entity.items():
                tbase = tbase.filter(F.col(c) == F.lit(v))

    suggested = suggest_interval(tbase, det.time_field)
    configured_min = det.interval_ms // MINUTE_MS

    def _window_delay_issue() -> dict:
        if now_ms - latest > det.window_delay_ms:
            mins = int(_math.ceil((now_ms - latest) / 60000.0))
            return {"window_delay": WINDOW_DELAY_REC % (mins, mins)}
        return {}

    if suggested is not None:
        if configured_min >= suggested:
            return {"issues": _window_delay_issue()}
        return {"issues": {"detection_interval":
                           f"{INTERVAL_REC}{suggested} minutes"},
                "suggested_interval_minutes": suggested}

    # root-cause chain, one configuration at a time
    if _continuous_shingles(src, det, latest, history) < NUM_MIN_SAMPLES:
        return {"issues": {"indices": RAW_DATA_TOO_SPARSE}}
    if det.filter_query and _continuous_shingles(
            fbase, det, latest, history) < NUM_MIN_SAMPLES:
        return {"issues": {"filter_query": FILTER_QUERY_TOO_SPARSE}}
    if det.category_fields:
        if not top_entity:
            return {"issues": {"category_field": CATEGORY_FIELD_NO_DATA}}
        if _continuous_shingles(tbase, det, latest,
                                history) < NUM_MIN_SAMPLES:
            return {"issues": {"category_field":
                               CATEGORY_FIELD_TOO_SPARSE}}
    for name in sorted(det.feature_specs):
        (_agg, b), = det.feature_specs[name].items()
        fld = b.get("field") if isinstance(b, dict) else None
        if fld is None:
            continue            # script features carry no single field
        if _continuous_shingles(tbase.filter(F.col(fld).isNotNull()),
                                det, latest, history) < NUM_MIN_SAMPLES:
            return {"issues": {"feature_attributes":
                               f"{FEATURE_QUERY_TOO_SPARSE}: {name}"}}
    return {"issues": _window_delay_issue()}
