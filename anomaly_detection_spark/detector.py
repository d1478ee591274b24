"""Detector-level API: the reference's user surface, end to end.

A reference user defines an anomaly detector as a config document —
source indices (possibly a pattern), a filter query, feature
aggregations, a detection interval, a window delay, category (entity)
fields, and a shingle size (``Config.java:97``, the detector mapping in
``src/main/resources/mappings/config.json``) — and reads back anomaly
results rows (``anomaly-results.json`` mapping: entity as a nested
name/value list, anomaly_grade/confidence, data_start/end_time).

This module composes the engine's pieces into exactly that surface:

    load_table(pattern) → compile_filter(query JSON) → feature_matrix
    per (entity, interval) → per-entity scoring seam → result rows

The model stand-in is the deterministic trailing-window z-score from
:mod:`features.scoring` (RCF lives in a library the survey scopes
out); ``anomaly_grade`` maps |z| through the same shape the reference
uses for its threshold (0 below 3σ, saturating at 6σ), and
``confidence`` ramps with history like the reference's cold-start
handling (``ResultProcessor.java:204-331`` fan-out; scores per entity).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .localdf import local_df

from .features import feature_matrix, score_entities
from .functions.entity import with_entity
from .query.planner import compile_filter
from .sources import load_table


@dataclass
class Detector:
    """The detector config subset the engine consumes (Config.java)."""
    detector_id: str
    indices: str | list[str]
    feature_specs: dict[str, dict]          # {name: {agg: {"field": col}}}
    time_field: str = "ts"
    interval_ms: int = 600_000              # 10-minute default, like the plugin
    window_delay_ms: int = 0
    filter_query: dict | None = None
    category_fields: tuple[str, ...] = ()   # empty = single-stream
    shingle_size: int = 8
    confidence_ramp: int = 32               # intervals to full confidence
    # ImputationMethod.java:12-20 parity: zero | fixed_values |
    # previous | linear (None = skip missing buckets, the default)
    imputation_method: str | None = None
    imputation_values: dict[str, float] | None = None
    # Config "rules" parity (AbstractRuleTestCase.java:99-108 shape):
    # [{"action": "ignore_anomaly", "conditions": [{"feature_name": ...,
    #   "threshold_type": "actual_over_expected_margin" | "expected_over_
    #   actual_margin" | "actual_over_expected_ratio" | "expected_over_
    #   actual_ratio", "operator": "lte", "value": ...}, ...]}]
    # — an anomaly is suppressed (grade forced to 0) when EVERY
    # condition of a rule holds; "expected" is the model's trailing
    # baseline (the scorer's window mean here).
    suppression_rules: tuple = ()
    # |z| at which anomaly_grade lifts off 0 (saturates at 2×); the
    # z-score stand-in's default 3σ matches the oracle formula
    anomaly_threshold: float = 3.0

    def __post_init__(self):
        if self.imputation_method not in (
                None, "zero", "fixed_values", "previous", "linear"):
            raise ValueError(
                f"imputation_method must be zero/fixed_values/previous/"
                f"linear, got {self.imputation_method!r}")
        # feature names are interpolated into a stack() expr string by
        # the scoring melt — reject names that could escape it
        from .query.aggs import require_safe_names

        require_safe_names(self.feature_specs, "feature names")


class TaskCancelledError(RuntimeError):
    """A cancel flag was observed between pieces — the reference's
    TaskCancelledException (``ADBatchTaskRunner.java:1377-1396``: the
    runner checks the cancel flag when starting the next piece and
    throws with the recorded reason + who stopped it)."""

    def __init__(self, reason: str, stopped_by: str | None = None):
        super().__init__(reason)
        self.reason = reason
        self.stopped_by = stopped_by


def _grade(z: F.Column, thr: float = 3.0) -> F.Column:
    """|z| → anomaly grade in [0, 1]: 0 below ``thr``σ, 1 at ≥2·thr σ."""
    return F.greatest(F.lit(0.0),
                      F.least(F.lit(1.0), (F.abs(z) - thr) / thr))


def _attribution_ring(result: DataFrame, feats: list[str],
                      interval_ms: int) -> DataFrame:
    """Attach the anomaly-results explanation ring from normalized
    intermediate columns (shared by preview's joint path and
    :func:`run_once_stateful_joint`, so the two can never drift):

    - ``_attr``: array<double> per-feature shares, null when the model
      didn't attribute (grade ≤ alert threshold)
    - ``_exp``: array<double> expected feature vector, null when warm
    - ``_rel``: int relative index (≤ 0), null when no attribution
    - ``_past``: array<double> raw inputs at the relative slot, null
      unless the anomaly is in the past

    Emits ``relevant_attribution`` / ``expected_values`` /
    ``relative_index`` / ``approx_anomaly_start_time`` /
    ``past_values`` — all null when ``anomaly_grade`` is 0, matching
    the mapping's presence contract (raw attribution null at grade ≤ 0,
    ``ModelUtil.java:133-136``; approx start only when relativeIndex
    < 0, ``AnomalyResult.java:489-491``)."""
    graded = F.col("anomaly_grade") > 0
    anomalous = graded & F.col("_attr").isNotNull()
    result = result.withColumn(
        "relevant_attribution",
        F.when(anomalous, F.array(*[
            F.struct(F.lit(n).alias("feature_id"),
                     F.round(F.element_at("_attr", j + 1), 6)
                     .alias("data"))
            for j, n in enumerate(feats)])))
    # expected values come from the model on every scored row — gate
    # on the grade alone
    result = result.withColumn(
        "expected_values",
        F.when(graded & F.col("_exp").isNotNull(), F.array(F.struct(
            F.lit(1.0).alias("likelihood"),
            F.array(*[
                F.struct(F.lit(n).alias("feature_id"),
                         F.element_at("_exp", j + 1).alias("data"))
                for j, n in enumerate(feats)]).alias("value_list")))))
    result = result.withColumn(
        "relative_index", F.when(anomalous, F.col("_rel")))
    result = result.withColumn(
        "approx_anomaly_start_time",
        F.when(anomalous & (F.col("_rel") < 0),
               F.timestamp_millis(
                   F.unix_millis(F.col("data_start_time")
                                 .cast("timestamp"))
                   + F.col("_rel").cast("long") * interval_ms)))
    return result.withColumn(
        "past_values",
        F.when(anomalous & (F.col("_rel") < 0)
               & F.col("_past").isNotNull(),
               F.array(*[
                   F.struct(F.lit(n).alias("feature_id"),
                            F.element_at("_past", j + 1).alias("data"))
                   for j, n in enumerate(feats)])))


RING_COLS = ["relevant_attribution", "expected_values", "relative_index",
             "approx_anomaly_start_time", "past_values"]


def _check_attr_threshold(alert_threshold, det: Detector) -> None:
    """The model attributes points past ITS alert threshold; the grade
    lifts off at ``det.anomaly_threshold``.  If the model's is higher,
    rows the detector reports anomalous would carry null attribution —
    reject the inconsistent wiring instead of silently violating the
    "present iff grade > 0" contract (the reference derives both from
    the same thresholder so they can never diverge)."""
    if alert_threshold is not None and alert_threshold > det.anomaly_threshold:
        raise ValueError(
            f"model alert_threshold ({alert_threshold}) > detector "
            f"anomaly_threshold ({det.anomaly_threshold}): anomalous "
            f"rows would lack attribution — pass "
            f"alert_threshold={det.anomaly_threshold} to the model")


def _swap_state_dir(frame: DataFrame, spath: str,
                    field_names: list[str]) -> None:
    """Atomic-ish state rewrite: write ``frame[field_names]`` to a tmp
    dir, then swap directories (the crash window is two renames, and
    the rewritten data survives either way)."""
    import os
    import shutil

    tmp, trash = spath + ".__tmp__", spath + ".__old__"
    frame.select(*field_names).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(trash, ignore_errors=True)
    if os.path.exists(spath):
        shutil.move(spath, trash)
    shutil.move(tmp, spath)
    shutil.rmtree(trash, ignore_errors=True)


def _feature_imputed(feats: list[str]) -> F.Column:
    """``feature_imputed`` result field (anomaly-results.json nested
    {feature_id, imputed}; ``ModelUtil.calculateImputedFeatures``):
    a bucket the imputation step materialized carries ``doc_count``
    0 — this engine's imputation fills whole missing buckets, so the
    flag is uniform across features (the reference flags per-NaN
    coordinate; a present bucket here never has a filled feature)."""
    return F.array(*[
        F.struct(F.lit(n).alias("feature_id"),
                 (F.col("doc_count") == 0).alias("imputed"))
        for n in feats])


def _rule_suppressed(det: Detector, feats: list[str]) -> F.Column:
    """Compile ``det.suppression_rules`` to a boolean Column over the
    per-feature actual (`<f>`) and expected (`_exp_<f>`) columns.

    Reference semantics (the plugin's Config "rules", issued by e.g.
    AbstractRuleTestCase.java:99-108): a rule with action
    ``ignore_anomaly`` suppresses the anomaly when ALL its conditions
    hold; threshold types compare the actual-vs-expected margin
    (difference) or ratio against ``value`` with ``lte``/``gte``."""
    any_rule = F.lit(False)
    for rule in det.suppression_rules:
        if rule.get("action") != "ignore_anomaly":
            raise ValueError(f"unsupported rule action {rule.get('action')!r}")
        all_conds = F.lit(True)
        for cond in rule["conditions"]:
            f = cond["feature_name"]
            if f not in feats:
                raise ValueError(f"rule names unknown feature {f!r}")
            a, e = F.col(f).cast("double"), F.col(f"_exp_{f}")
            tt = cond["threshold_type"]
            if tt == "actual_over_expected_margin":
                metric = a - e
            elif tt == "expected_over_actual_margin":
                metric = e - a
            elif tt == "actual_over_expected_ratio":
                metric = (a - e) / F.greatest(F.abs(e), F.lit(1e-12))
            elif tt == "expected_over_actual_ratio":
                metric = (e - a) / F.greatest(F.abs(e), F.lit(1e-12))
            else:
                raise ValueError(f"unsupported threshold_type {tt!r}")
            op = cond.get("operator", "lte")
            if op == "lte":
                c = metric <= F.lit(float(cond["value"]))
            elif op == "gte":
                c = metric >= F.lit(float(cond["value"]))
            else:
                raise ValueError(f"unsupported rule operator {op!r}")
            all_conds = all_conds & F.coalesce(c, F.lit(False))
        any_rule = any_rule | all_conds
    return any_rule


def preview(spark: SparkSession, det: Detector,
            scorer=None) -> DataFrame:
    """Historical/preview analysis: score every closed interval
    (PreviewAnomalyDetectorTransportAction analog).  Returns anomaly-
    result-shaped rows; intervals inside the model's warm-up window
    (``shingle_size`` points) are omitted, like the reference's
    cold-start."""
    from .features import zscore_scorer

    # detection scores a point against history that EXCLUDES it
    scorer = scorer or zscore_scorer(det.shingle_size,
                                     include_current=False)
    src = load_table(spark, det.indices)
    cond = (compile_filter(src, det.filter_query)
            if det.filter_query else None)
    feats = sorted(det.feature_specs)
    fm = feature_matrix(src, det.time_field, det.interval_ms,
                        det.feature_specs,
                        entity_cols=det.category_fields,
                        filter_cond=cond)
    if det.imputation_method:
        # densify + fill missing buckets per the configured
        # ImputationMethod before scoring (the reference imputes the
        # feature series ahead of the model, FeatureManager.java:459-466)
        from .features import impute_fill, impute_linear

        if det.imputation_method == "linear":
            fm = impute_linear(fm, det.interval_ms, feats,
                               entity_cols=det.category_fields)
        else:
            fm = impute_fill(fm, det.interval_ms, feats,
                             entity_cols=det.category_fields,
                             method=det.imputation_method,
                             fixed_values=det.imputation_values)
        fm = fm.withColumn("doc_count", F.coalesce("doc_count", F.lit(0)))
    # score each feature with the per-entity seam; join scores back.
    # single-stream detectors score as one constant entity group.
    ent = list(det.category_fields)
    gcols = ent or ["_g"]
    base = fm if ent else fm.withColumn("_g", F.lit("_"))

    if getattr(scorer, "multivariate", False):
        # JOINT scoring (the reference's model shape): one model per
        # entity over the feature VECTOR — the scorer sees the
        # (n_buckets × n_features) matrix, returns one z per interval
        # plus per-feature expected values.  Buckets missing any
        # feature are skipped (the joint model needs the full vector;
        # configure imputation for gappy entities).
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        cond_all = None
        for n in feats:
            c = F.col(n).isNotNull()
            cond_all = c if cond_all is None else cond_all & c
        basej = base.filter(cond_all)
        # a joint scorer may also attribute each anomaly across the
        # feature vector (returns_attribution — e.g. rcf_scorer_joint's
        # DiVector split): surfaced as the reference's
        # relevant_attribution / expected_value result fields
        # (AnomalyResult.java:66-67,171; null when the point isn't
        # anomalous, ModelUtil.normalizeAttribution's null contract)
        ret_attr = getattr(scorer, "returns_attribution", False)
        out_fields = list(basej.schema.fields) + [
            *[T.StructField(f"_exp_{n}", T.DoubleType()) for n in feats],
            *([T.StructField(f"_attr_{n}", T.DoubleType())
               for n in feats] if ret_attr else []),
            *([T.StructField("_rel", T.DoubleType()),
               *[T.StructField(f"_past_{n}", T.DoubleType())
                 for n in feats]] if ret_attr else []),
            T.StructField("_z", T.DoubleType())]
        out_schema = T.StructType(out_fields)

        def fnj(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("bucket_start").reset_index(drop=True)
            V = pdf[feats].to_numpy(dtype=np.float64)
            if ret_attr:
                z, exps, attrs, rel, past = scorer(V)
                for j, n in enumerate(feats):
                    pdf[f"_attr_{n}"] = attrs[:, j]
                    pdf[f"_past_{n}"] = past[:, j]
                pdf["_rel"] = rel
            else:
                z, exps = scorer(V)
            for j, n in enumerate(feats):
                pdf[f"_exp_{n}"] = exps[:, j]
            pdf["_z"] = z
            out = pdf[~pdf["_z"].isna()]
            return out[[f.name for f in out_fields]]

        out = basej.groupBy(*gcols).applyInPandas(fnj, schema=out_schema)
        from pyspark.sql.window import Window as _Wj

        conf_wj = _Wj.partitionBy(*gcols).orderBy("bucket_start")
        out = out.withColumn("_cnt", F.count("_z").over(conf_wj))
        score = F.abs(F.col("_z"))
        conf = F.least(F.lit(1.0),
                       F.col("_cnt") / F.lit(float(det.confidence_ramp)))
        result = (out
                  .withColumn("anomaly_score", F.round(score, 6))
                  .withColumn("anomaly_grade",
                              F.round(_grade(score, det.anomaly_threshold),
                                      6))
                  .withColumn("confidence", F.round(conf, 6))
                  .withColumn("detector_id", F.lit(det.detector_id))
                  .withColumn("data_start_time", F.col("bucket_start"))
                  .withColumn("data_end_time", F.timestamp_millis(
                      F.unix_millis(F.col("bucket_start").cast("timestamp"))
                      + det.interval_ms)))
        if det.suppression_rules:
            result = result.withColumn(
                "anomaly_grade",
                F.when(_rule_suppressed(det, feats), F.lit(0.0))
                .otherwise(F.col("anomaly_grade")))
        if ent:
            result = with_entity(result, {c: c for c in ent})
        else:
            result = result.withColumn(
                "entity",
                F.array().cast("array<struct<name:string,value:string>>"))
        extra_cols = []
        if ret_attr:
            _check_attr_threshold(
                getattr(scorer, "alert_threshold", None), det)
            # normalize the per-feature NaN-sentinel columns to the
            # null-sentinel arrays the shared ring builder expects
            # (_rel as NaN must be nulled BEFORE the int cast — a raw
            # cast would turn NaN into 0)
            attr_present = ~F.isnan(F.col(f"_attr_{feats[0]}"))
            result = (result
                      .withColumn("_attr", F.when(attr_present, F.array(
                          *[F.col(f"_attr_{n}") for n in feats])))
                      .withColumn("_exp", F.array(
                          *[F.col(f"_exp_{n}") for n in feats]))
                      .withColumn("_rel", F.when(
                          ~F.isnan("_rel"),
                          F.col("_rel").cast("int")))
                      .withColumn("_past", F.when(
                          ~F.isnan(F.col(f"_past_{feats[0]}")), F.array(
                              *[F.col(f"_past_{n}") for n in feats]))))
            result = _attribution_ring(result, feats, det.interval_ms)
            extra_cols = list(RING_COLS)
        if det.imputation_method:
            result = result.withColumn("feature_imputed",
                                       _feature_imputed(feats))
            extra_cols = extra_cols + ["feature_imputed"]
        return result.select(
            "detector_id", "entity", "data_start_time", "data_end_time",
            *feats, "anomaly_score", "anomaly_grade", "confidence",
            *extra_cols, *ent, "bucket_start")
    # Single-pass multi-feature scoring: melt features to rows, run ONE
    # applyInPandas over (entity, feature), pivot the scores back.  An
    # F-feature detector costs one FlatMapGroupsInPandas + one pivot
    # shuffle instead of F stateful passes + F joins.
    pairs = ", ".join(f"'{n}', cast(`{n}` as double)" for n in feats)
    melted = base.select(
        *gcols, "bucket_start",
        F.expr(f"stack({len(feats)}, {pairs})").alias("_feat", "_v"))
    # a null feature value (e.g. avg over an all-null bucket) is skipped
    # — the window holds the last k SCORED values, exactly like the
    # stateful paths, which never ingest a null
    melted = melted.filter(F.col("_v").isNotNull())
    if det.suppression_rules and not getattr(scorer, "returns_expected",
                                             False):
        # the model's expected value for rule margins: scorers that
        # expose their own baseline (returns_expected) surface it
        # through the seam as ``_exp``; otherwise it is the z-score
        # stand-in's trailing-window mean (prior shingle_size points)
        from pyspark.sql.window import Window as _W

        wexp = (_W.partitionBy(*gcols, "_feat").orderBy("bucket_start")
                .rowsBetween(-det.shingle_size, -1))
        melted = melted.withColumn("_exp", F.avg("_v").over(wexp))
    scored = score_entities(melted, "_v", scorer=scorer,
                            entity_cols=(*gcols, "_feat"), score_col="_z")
    if det.suppression_rules:
        zw = (scored.groupBy(*gcols, "bucket_start")
              .pivot("_feat", feats)
              .agg(F.first("_z").alias("z"), F.first("_exp").alias("exp")))
        for n in feats:
            zw = (zw.withColumnRenamed(f"{n}_z", f"_z_{n}")
                  .withColumnRenamed(f"{n}_exp", f"_exp_{n}"))
    else:
        zw = (scored.groupBy(*gcols, "bucket_start")
              .pivot("_feat", feats).agg(F.first("_z")))
        for n in feats:
            zw = zw.withColumnRenamed(n, f"_z_{n}")
    out = base.join(zw, [*gcols, "bucket_start"])
    # Confidence ramps with scored history per entity (the reference
    # reports <1 confidence until the model is warm).  The count is the
    # MIN across features of each feature's cumulative scored intervals
    # — computed BEFORE the all-features filter so it agrees exactly
    # with the per-feature scored_cnt state run_once_stateful and
    # run_historical carry (min across features there too).
    from pyspark.sql.window import Window

    conf_w = Window.partitionBy(*gcols).orderBy("bucket_start")
    cum = [F.count(F.col(f"_z_{n}")).over(conf_w) for n in feats]
    out = out.withColumn("_cnt", F.least(*cum) if len(cum) > 1 else cum[0])
    for n in feats:
        # a bucket survives only if every feature scored (identical to
        # the previous per-feature inner joins)
        out = out.filter(F.col(f"_z_{n}").isNotNull())
    score = F.greatest(*[F.abs(F.col(f"_z_{n}")) for n in feats]) \
        if len(feats) > 1 else F.abs(F.col(f"_z_{feats[0]}"))
    conf = F.least(F.lit(1.0),
                   F.col("_cnt") / F.lit(float(det.confidence_ramp)))
    result = (out
              .withColumn("anomaly_score", F.round(score, 6))
              .withColumn("anomaly_grade",
                          F.round(_grade(score, det.anomaly_threshold), 6))
              .withColumn("confidence", F.round(conf, 6))
              .withColumn("detector_id", F.lit(det.detector_id))
              .withColumn("data_start_time", F.col("bucket_start"))
              .withColumn("data_end_time", F.timestamp_millis(
                  F.unix_millis(F.col("bucket_start").cast("timestamp"))
                  + det.interval_ms)))
    if det.suppression_rules:
        # ignore_anomaly: a matching rule forces the grade to 0 (the
        # anomaly is reported as non-anomalous, like the reference)
        result = result.withColumn(
            "anomaly_grade",
            F.when(_rule_suppressed(det, feats), F.lit(0.0))
            .otherwise(F.col("anomaly_grade")))
    if ent:
        result = with_entity(result, {c: c for c in ent})
    else:
        result = result.withColumn(
            "entity",
            F.array().cast("array<struct<name:string,value:string>>"))
    imp_cols = []
    if det.imputation_method:
        result = result.withColumn("feature_imputed",
                                   _feature_imputed(feats))
        imp_cols = ["feature_imputed"]
    return result.select(
        "detector_id", "entity", "data_start_time", "data_end_time",
        *feats, "anomaly_score", "anomaly_grade", "confidence",
        *imp_cols, *ent, "bucket_start")


def run_once(spark: SparkSession, det: Detector, now_ms: int,
             history_intervals: int = 64, scorer=None) -> DataFrame:
    """One realtime detection interval (ResultProcessor analog): score
    the latest closed interval ending at ``now - window_delay``, using
    the trailing ``history_intervals`` for context."""
    end = ((now_ms - det.window_delay_ms) // det.interval_ms) * det.interval_ms
    start = end - det.interval_ms
    hist_start = end - history_intervals * det.interval_ms
    base = {"range": {det.time_field: {"gte": hist_start, "lt": end}}}
    q = ({"bool": {"filter": [base, det.filter_query]}}
         if det.filter_query else base)
    scoped = Detector(
        detector_id=det.detector_id, indices=det.indices,
        feature_specs=det.feature_specs, time_field=det.time_field,
        interval_ms=det.interval_ms, window_delay_ms=det.window_delay_ms,
        filter_query=q, category_fields=det.category_fields,
        shingle_size=det.shingle_size, confidence_ramp=det.confidence_ramp)
    res = preview(spark, scoped, scorer=scorer)
    return res.filter(F.unix_millis(F.col("bucket_start").cast("timestamp"))
                      == start)


# --- model-state checkpoint for realtime detection --------------------------
#
# The reference persists per-(detector, entity) model/shingle state
# between intervals (timeseries/ml/CheckpointDao.java; the
# anomaly-checkpoint.json mapping is the one dynamic:true index) so a
# realtime pass reads ONE interval of raw data plus its checkpoint.
# The Spark analog: a parquet state table per detector holding, per
# (entity, feature), the trailing shingle window and the count of
# scored intervals.  run_once_stateful scans only [start, end) of the
# source, scores the new point against the checkpointed window, and
# rewrites the state (tmp-dir + swap, same crash posture as
# delete_by_query; on a real cluster this is an Iceberg MERGE INTO).


def _state_path(state_dir: str, detector_id: str) -> str:
    import os

    return os.path.join(state_dir, detector_id)


def run_once_stateful(spark: SparkSession, det: Detector, now_ms: int,
                      state_dir: str, eps: float = 1e-9,
                      scorer_factory=None, cache_policy=None,
                      cold_start_history: int | None = None) -> DataFrame:
    """One realtime interval using checkpointed per-entity state.

    Produces rows identical to :func:`preview`'s output at the same
    bucket (same trailing-z model, same warm-up and confidence ramp)
    when called once per interval in order — but reads only the new
    interval's raw events, not ``history_intervals`` of history.

    Idempotent per interval: the state rows carry the last-ingested
    bucket (``last_ms``) and its score (``last_z``), so a retry of the
    same interval (scheduler re-fire, downstream write failure after
    the state swap) REPLAYS the stored score without appending the
    value into the shingle window again.  A call for an interval older
    than ``last_ms`` is a no-op (no mutation, no rows).

    ``scorer_factory`` (same protocol as :func:`run_historical`'s —
    e.g. :func:`~anomaly_detection_spark.features.rcf_stream_factory`)
    swaps the trailing-z window for a checkpointed streaming model:
    the per-(entity, feature) serialized model rides in the state
    table's ``model`` column and is restored/updated/re-serialized
    each interval — the reference's realtime checkpoint round-trip
    (``CheckpointDao``).  Replay semantics are identical (the model is
    NOT updated twice for a retried interval).

    ``cache_policy`` (a :class:`~anomaly_detection_spark.caching.
    CachePolicy`) bounds how many entities hold state rows — the
    reference's HC PriorityCache (doorkeeper + decayed-frequency
    priority + dedicated/shared budget with strict-greater
    replacement, PriorityCache.java).  Entities the cache defers
    (``cold``) produce no result and no state mutation this interval;
    evicted entities lose their model rows and cold-start on
    re-admission.  With no policy every entity is hosted (the
    single-stream posture).

    ``imputation_method`` zero/fixed_values/previous imputes the
    CURRENT interval for entities that hold state but produced no
    bucket row (the reference's realtime posture: the imputer fills
    the model's missing data point, ``ImputationMethod.java``) —
    rows carry ``feature_imputed`` flags like preview's; sequential
    calls over a gappy span equal preview-with-imputation row-for-row
    inside each entity's observed extent.  ``linear`` still raises
    (it interpolates toward the NEXT sample, unobservable in
    realtime); ``previous`` carries the last ingested value (the new
    ``last_v`` state column; pre-upgrade state tables null-fill and
    start carrying on their next interval).

    ``cold_start_history`` enables the reference's historical
    cold-start training (``ModelColdStart.java:340-418``,
    ``ADColdStart.java:192``): an (entity, feature) with NO state row
    trains on up to ``max(32, cold_start_history)`` trailing interval
    features ending at the CURRENT bucket's start (training excludes
    the scored interval, like the reference's ``endTimeMs =
    dataStartTime``), with interior gaps linearly interpolated
    between present neighboring samples — so a detector started over
    existing data initializes in ONE call instead of waiting out the
    warm-up in live intervals.  Training replays the exact live
    recurrence, so a cold-started state equals the state a sequential
    interval-by-interval run over the same history would have built.
    The trailing scan is restricted to new entities by a broadcast
    semi-join before aggregation (at steady state new entities per
    interval are few).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .features import feature_matrix

    impute = det.imputation_method
    if impute == "linear":
        raise NotImplementedError(
            "linear imputation interpolates toward the NEXT sample, "
            "which a single realtime interval cannot observe — use "
            "zero/fixed_values/previous here, or preview/"
            "run_historical for linear series")
    if impute == "fixed_values":
        missing = [f for f in det.feature_specs
                   if f not in (det.imputation_values or {})]
        if missing:
            raise ValueError(
                f"fixed_values imputation needs a value per feature; "
                f"missing {missing}")
    k = det.shingle_size
    end = ((now_ms - det.window_delay_ms) // det.interval_ms) * det.interval_ms
    start = end - det.interval_ms
    ent = list(det.category_fields)
    gcols = ent or ["_g"]
    feats = sorted(det.feature_specs)

    rng = {"range": {det.time_field: {"gte": start, "lt": end}}}
    q = ({"bool": {"filter": [rng, det.filter_query]}}
         if det.filter_query else rng)
    src = load_table(spark, det.indices)
    fm = feature_matrix(src, det.time_field, det.interval_ms,
                        det.feature_specs,
                        entity_cols=tuple(det.category_fields),
                        filter_cond=compile_filter(src, q))
    base = fm if ent else fm.withColumn("_g", F.lit("_"))
    pairs = ", ".join(f"'{n}', cast(`{n}` as double)" for n in feats)
    cur = base.select(
        *gcols,
        F.expr(f"stack({len(feats)}, {pairs})").alias("_feat", "_v"))

    spath = _state_path(state_dir, det.detector_id)
    state_fields = ([f for f in cur.schema.fields if f.name != "_v"]
                    + [T.StructField("vals", T.ArrayType(T.DoubleType())),
                       T.StructField("scored_cnt", T.LongType()),
                       T.StructField("last_ms", T.LongType()),
                       T.StructField("last_z", T.DoubleType()),
                       T.StructField("model", T.BinaryType()),
                       T.StructField("last_v", T.DoubleType())])
    state_schema = T.StructType(state_fields)
    import os

    if os.path.exists(spath):
        state = spark.read.parquet(spath)
        # state written before the idempotency / model / imputation
        # columns existed
        for c, t in (("last_ms", "long"), ("last_z", "double"),
                     ("model", "binary"), ("last_v", "double")):
            if c not in state.columns:
                state = state.withColumn(c, F.lit(None).cast(t))
    else:
        state = local_df(spark, [], state_schema)

    if cache_policy is not None:
        from .caching import admit_entities

        present = cur.select(*gcols).distinct()
        hosted = state.select(*gcols).distinct()
        hot, _cold, evicted = admit_entities(
            spark, state_dir, det.detector_id, present, hosted,
            cache_policy, now_ms, det.interval_ms)
        # evicted models drop (cold-start on re-admission); cold and
        # doorkeeper-skipped entities contribute nothing this interval
        state = state.join(evicted, gcols, "left_anti")
        cur = cur.join(hot, gcols, "left_semi")

    joined = state.join(cur, [*gcols, "_feat"], "full_outer")
    if impute:
        # impute only for entities with NO bucket row this interval
        # (preview's impute_fill fills MISSING buckets; a present
        # bucket whose feature aggregated to null stays null there
        # too) — flag entity presence before the per-feature melt
        joined = joined.join(
            cur.select(*gcols).distinct()
            .withColumn("_ent_present", F.lit(True)),
            gcols, "left_outer")
    else:
        joined = joined.withColumn("_ent_present", F.lit(None)
                                   .cast("boolean"))
    if cold_start_history:
        # selectNumberOfSamples: at least numMinSamples (32)
        n_train = max(32, int(cold_start_history))
        new_keys = (cur.select(*gcols, "_feat").distinct()
                    .join(state.select(*gcols, "_feat").distinct(),
                          [*gcols, "_feat"], "left_anti"))
        src_new = (src.join(F.broadcast(new_keys.select(*ent).distinct()),
                            ent, "left_semi") if ent else src)
        rng_h = {"range": {det.time_field: {
            "gte": start - n_train * det.interval_ms, "lt": start}}}
        qh = ({"bool": {"filter": [rng_h, det.filter_query]}}
              if det.filter_query else rng_h)
        fmh = feature_matrix(src_new, det.time_field, det.interval_ms,
                             det.feature_specs,
                             entity_cols=tuple(det.category_fields),
                             filter_cond=compile_filter(src_new, qh))
        bh = fmh if ent else fmh.withColumn("_g", F.lit("_"))
        cs = (bh.select(
                  *gcols,
                  F.unix_millis(F.col("bucket_start").cast("timestamp"))
                  .alias("_bms"),
                  F.expr(f"stack({len(feats)}, {pairs})")
                  .alias("_feat", "_hv"))
              .filter(F.col("_hv").isNotNull())
              .groupBy(*gcols, "_feat")
              .agg(F.array_sort(F.collect_list(F.struct("_bms", "_hv")))
                   .alias("_p"))
              .select(*gcols, "_feat",
                      F.col("_p._bms").alias("_cs_ms"),
                      F.col("_p._hv").alias("_cs_v"))
              .join(new_keys, [*gcols, "_feat"], "left_semi"))
        joined = joined.join(cs, [*gcols, "_feat"], "left_outer")
    else:
        joined = (joined
                  .withColumn("_cs_ms", F.lit(None).cast("array<long>"))
                  .withColumn("_cs_v", F.lit(None).cast("array<double>")))
    interval_ms = det.interval_ms
    fixed_vals = dict(det.imputation_values or {})
    upd_schema = T.StructType(list(state_fields)
                              + [T.StructField("_z", T.DoubleType()),
                                 T.StructField("_vu", T.DoubleType()),
                                 T.StructField("_imp", T.BooleanType())])

    def fn(batches):
        for pdf in batches:
            n = len(pdf)
            vals_list = [list(v) if v is not None and not (
                isinstance(v, float) and pd.isna(v)) else []
                for v in pdf["vals"]]
            lens = np.fromiter((len(v) for v in vals_list), np.int64, n)
            v = pdf["_v"].to_numpy(dtype=np.float64)
            havev = ~np.isnan(v)
            lm = pdf["last_ms"].to_numpy(dtype=np.float64)  # NaN = never
            lz = pdf["last_z"].to_numpy(dtype=np.float64)
            lv = pdf["last_v"].to_numpy(dtype=np.float64)
            imputed = np.zeros(n, dtype=bool)
            if impute:
                # synthesize the missing value BEFORE the replay/
                # ingest masks so every downstream step (idempotent
                # replay, cold-start skip, window append, model
                # update) treats it exactly like an observed one —
                # replays recompute the same value deterministically
                # (zero/fixed are constants; 'previous' re-reads the
                # carried value)
                ent_absent = ~(pdf["_ent_present"] == True) \
                    .to_numpy(dtype=bool)      # noqa: E712 (None-safe)
                has_state = ~np.isnan(lm)
                cand = ~havev & ent_absent & has_state
                for i in np.flatnonzero(cand):
                    if impute == "zero":
                        v[i] = 0.0
                    elif impute == "fixed_values":
                        v[i] = float(fixed_vals[pdf["_feat"].iloc[i]])
                    else:                      # previous
                        if vals_list[i]:
                            v[i] = float(vals_list[i][-1])
                        elif not np.isnan(lv[i]):
                            v[i] = lv[i]
                        else:
                            continue           # nothing to carry yet
                    imputed[i] = True
                havev = ~np.isnan(v)
            # already-ingested interval → replay stored score, no append;
            # an older interval than last_ms → no-op (out-of-order call)
            replay = havev & (lm == float(start))
            ingest = havev & ~replay & ~(lm > float(start))
            z = np.full(n, np.nan)
            models = list(pdf["model"]) if "model" in pdf.columns \
                else [None] * n
            extra_cnt = np.zeros(n, dtype=np.int64)
            # historical cold start: rows with no prior state train on
            # the joined trailing series before the live update below
            # runs (the recurrence is the live one, so the resulting
            # state equals a sequential run over the same history)
            for i in range(n):
                hv = pdf["_cs_v"].iloc[i]
                if (hv is None or (isinstance(hv, float) and pd.isna(hv))
                        or len(hv) == 0 or not ingest[i]
                        or lens[i] > 0 or not (
                            models[i] is None
                            or (isinstance(models[i], float)
                                and pd.isna(models[i])))):
                    continue
                times = np.asarray(pdf["_cs_ms"].iloc[i], dtype=np.float64)
                values = np.asarray(hv, dtype=np.float64)
                if len(times) > 1:
                    # interpolate interior gaps between present
                    # neighboring samples (ModelColdStart.java:346)
                    grid = np.arange(times[0],
                                     times[-1] + interval_ms / 2,
                                     interval_ms)
                    values = np.interp(grid, times, values)
                if scorer_factory is not None:
                    stream = scorer_factory()
                    for val in values:
                        zt, _ = stream.update(float(val))
                        if not np.isnan(zt):
                            extra_cnt[i] += 1
                    models[i] = stream.to_bytes()
                else:
                    w: list = []
                    for val in values:
                        if len(w) == k:
                            extra_cnt[i] += 1
                        w = (w + [float(val)])[-k:]
                    vals_list[i] = w
                    lens[i] = len(w)
            if scorer_factory is not None:
                # one checkpointed streaming model per row (a row IS one
                # entity-feature model — the per-entity loop mirrors the
                # reference's per-model checkpoint round-trip)
                for i in np.flatnonzero(ingest):
                    mb = models[i]
                    stream = (scorer_factory() if mb is None or (
                        isinstance(mb, float) and pd.isna(mb))
                        else scorer_factory.restore(bytes(mb)))
                    zi, _ = stream.update(float(v[i]))
                    z[i] = zi
                    models[i] = stream.to_bytes()
            else:
                idx = np.flatnonzero((lens == k) & ingest)
                if len(idx):
                    # same float sequence as zscore_scorer (sum/k twice)
                    W = np.array([vals_list[i] for i in idx],
                                 dtype=np.float64)
                    m = W.sum(axis=1) / k
                    m2 = (W * W).sum(axis=1) / k
                    std = np.sqrt(np.maximum(m2 - m * m, 0.0))
                    z[idx] = (v[idx] - m) / (std + eps)
            z[replay] = lz[replay]
            newvals = [
                (vals_list[i] + [float(v[i])])[-k:]
                if ingest[i] and scorer_factory is None
                else vals_list[i]
                for i in range(n)]
            cnt = pdf["scored_cnt"].fillna(0).to_numpy(dtype=np.int64)
            cnt = cnt + extra_cnt \
                + ((~np.isnan(z)) & ingest).astype(np.int64)
            new_lm = np.where(ingest, float(start), lm)
            new_lz = np.where(ingest, z, lz)
            new_lv = np.where(ingest, v, lv)
            out = pdf.drop(columns=["vals", "scored_cnt", "last_ms",
                                    "last_z", "last_v", "_v", "model",
                                    "_cs_ms", "_cs_v", "_ent_present"],
                           errors="ignore").copy()
            out["vals"] = newvals
            out["scored_cnt"] = cnt
            out["last_ms"] = pd.Series(new_lm).astype("Int64")
            out["last_z"] = new_lz
            out["model"] = models
            out["last_v"] = new_lv
            out["_z"] = z
            out["_vu"] = np.where(havev, v, np.nan)
            out["_imp"] = imputed
            yield out[[f.name for f in upd_schema.fields]]

    upd = joined.mapInPandas(fn, schema=upd_schema)
    # truncate lineage before swapping the state dir the plan reads from
    upd = upd.localCheckpoint()
    _swap_state_dir(upd, spath, [f.name for f in state_fields])

    scored = upd.filter(F.col("_z").isNotNull())
    zw = (scored.groupBy(*gcols)
          .pivot("_feat", feats).agg(F.first("_z")))
    for n in feats:
        zw = zw.withColumnRenamed(n, f"_z_{n}")
    # min across features = the preview definition of scored history
    # (a feature that missed an interval holds the entity's count back)
    cnt1 = (scored.groupBy(*gcols)
            .agg(F.min("scored_cnt").alias("_cnt")))
    if impute:
        # feature values come from the update rows — an imputed
        # entity has NO base row this interval, so base can't source
        # them; the _imp flags feed the feature_imputed result field
        vw = (scored.groupBy(*gcols)
              .pivot("_feat", feats)
              .agg(F.first("_vu").alias("v"),
                   F.first("_imp").alias("imp")))
        for n in feats:
            vw = (vw.withColumnRenamed(f"{n}_v", n)
                  .withColumnRenamed(f"{n}_imp", f"_imp_{n}"))
        out = vw.join(zw, gcols).join(cnt1, gcols)
    else:
        out = base.join(zw, gcols).join(cnt1, gcols)
    for n in feats:
        out = out.filter(F.col(f"_z_{n}").isNotNull())
    score = F.greatest(*[F.abs(F.col(f"_z_{n}")) for n in feats]) \
        if len(feats) > 1 else F.abs(F.col(f"_z_{feats[0]}"))
    conf = F.least(F.lit(1.0),
                   F.col("_cnt") / F.lit(float(det.confidence_ramp)))
    result = (out
              .withColumn("anomaly_score", F.round(score, 6))
              .withColumn("anomaly_grade",
                          F.round(_grade(score, det.anomaly_threshold), 6))
              .withColumn("confidence", F.round(conf, 6))
              .withColumn("detector_id", F.lit(det.detector_id))
              .withColumn("bucket_start", F.timestamp_millis(F.lit(start)))
              .withColumn("data_start_time", F.col("bucket_start"))
              .withColumn("data_end_time", F.timestamp_millis(F.lit(end))))
    if ent:
        result = with_entity(result, {c: c for c in ent})
    else:
        result = result.withColumn(
            "entity",
            F.array().cast("array<struct<name:string,value:string>>"))
    imp_cols = []
    if impute:
        # same nested {feature_id, imputed} shape as the preview paths
        result = result.withColumn("feature_imputed", F.array(*[
            F.struct(F.lit(n).alias("feature_id"),
                     F.coalesce(F.col(f"_imp_{n}"), F.lit(False))
                     .alias("imputed")) for n in feats]))
        imp_cols = ["feature_imputed"]
    return result.select(
        "detector_id", "entity", "data_start_time", "data_end_time",
        *feats, "anomaly_score", "anomaly_grade", "confidence",
        *ent, "bucket_start", *imp_cols)


def run_once_stateful_joint(spark: SparkSession, det: Detector,
                            now_ms: int, state_dir: str,
                            stream_factory=None,
                            scorer_factory=None,
                            cache_policy=None,
                            cold_start_history: int | None = None) -> DataFrame:
    """One realtime interval with ONE checkpointed JOINT multivariate
    model per entity — the reference's actual model shape (one
    ThresholdedRandomCutForest over the feature vector per entity,
    ``ADModelManager``), where :func:`run_once_stateful` checkpoints a
    scalar model per (entity, feature).

    ``stream_factory`` builds/restores a multivariate stream (e.g.
    :func:`~anomaly_detection_spark.features.rcf_stream_factory` with
    ``n_features=len(feature_specs)``): ``update(vector) -> (z,
    expected_vector)`` plus the attribution state
    (``last_attribution``/``last_relative_index``/``last_past_values``).
    Result rows carry the full anomaly-results ring —
    ``relevant_attribution``, ``expected_values``, ``relative_index``,
    ``approx_anomaly_start_time``, ``past_values`` — for anomalous
    intervals (null at grade 0, like preview's joint path).

    Same replay/idempotency contract as :func:`run_once_stateful`
    (retried intervals replay the stored outputs without double-
    ingesting; the serialized replay outputs ride the state table).
    Buckets missing any feature are skipped, like preview's joint
    path.  ``imputation_method`` zero/fixed_values/previous imputes
    the WHOLE vector for stateful entities with no bucket row this
    interval (``previous`` carries the last ingested vector via the
    ``last_vec`` state column; partial buckets stay skipped, matching
    preview's impute-then-complete-vector semantics; ``linear``
    raises).  State lives under ``<detector_id>__joint`` so the two
    stateful modes never read each other's schema.

    ``cold_start_history`` trains a NEW entity's joint model on up to
    ``max(32, N)`` trailing complete-feature buckets ending at the
    scored bucket's start (the scalar path's historical cold start,
    ``ModelColdStart.java:340-418``) — feeding the exact live
    recurrence, so the cold-started model is byte-identical to a
    sequential run's.  Unlike the scalar path no interior
    interpolation happens: the joint path skips incomplete buckets
    live, and cold start mirrors that.

    ``cache_policy`` applies the same HC entity-cache admission as the
    scalar path (:func:`run_once_stateful`) — the cache table is
    shared per detector across both state layouts, like the
    reference's one EntityCache per detector.
    """
    import pickle

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .features import feature_matrix

    impute = det.imputation_method
    if impute == "linear":
        raise NotImplementedError(
            "linear imputation interpolates toward the NEXT sample, "
            "which a single realtime interval cannot observe — use "
            "zero/fixed_values/previous here")
    if impute == "fixed_values":
        _missing = [f for f in det.feature_specs
                    if f not in (det.imputation_values or {})]
        if _missing:
            raise ValueError(
                f"fixed_values imputation needs a value per feature; "
                f"missing {_missing}")
    # scorer_factory is the JobStore.tick runner-seam spelling of the
    # same argument (tick calls run(..., scorer_factory=...)) — accept
    # either name so the joint path schedules like the scalar one
    if stream_factory is None:
        stream_factory = scorer_factory
    if stream_factory is None:
        raise ValueError("run_once_stateful_joint needs a stream/"
                         "scorer factory (e.g. rcf_stream_factory("
                         "n_features=F))")
    _check_attr_threshold(
        getattr(stream_factory, "alert_threshold", None), det)
    end = ((now_ms - det.window_delay_ms) // det.interval_ms) \
        * det.interval_ms
    start = end - det.interval_ms
    ent = list(det.category_fields)
    gcols = ent or ["_g"]
    feats = sorted(det.feature_specs)
    nf = len(feats)

    rng = {"range": {det.time_field: {"gte": start, "lt": end}}}
    q = ({"bool": {"filter": [rng, det.filter_query]}}
         if det.filter_query else rng)
    src = load_table(spark, det.indices)
    fm = feature_matrix(src, det.time_field, det.interval_ms,
                        det.feature_specs,
                        entity_cols=tuple(det.category_fields),
                        filter_cond=compile_filter(src, q))
    base = fm if ent else fm.withColumn("_g", F.lit("_"))
    cond_all = None
    for n in feats:
        c = F.col(n).isNotNull()
        cond_all = c if cond_all is None else cond_all & c
    cur = base.filter(cond_all).select(
        *gcols,
        F.array(*[F.col(n).cast("double") for n in feats]).alias("_vec"))

    spath = _state_path(state_dir, f"{det.detector_id}__joint")
    import os

    state_fields = ([f for f in cur.schema.fields if f.name != "_vec"]
                    + [T.StructField("scored_cnt", T.LongType()),
                       T.StructField("last_ms", T.LongType()),
                       T.StructField("model", T.BinaryType()),
                       T.StructField("last_out", T.BinaryType()),
                       T.StructField("last_vec",
                                     T.ArrayType(T.DoubleType()))])
    state_schema = T.StructType(state_fields)
    if os.path.exists(spath):
        state = spark.read.parquet(spath)
        if "last_vec" not in state.columns:   # pre-imputation tables
            state = state.withColumn(
                "last_vec", F.lit(None).cast("array<double>"))
    else:
        state = local_df(spark, [], state_schema)

    if cache_policy is not None:
        from .caching import admit_entities

        present = cur.select(*gcols).distinct()
        hosted = state.select(*gcols).distinct()
        hot, _cold, evicted = admit_entities(
            spark, state_dir, det.detector_id, present, hosted,
            cache_policy, now_ms, det.interval_ms)
        state = state.join(evicted, gcols, "left_anti")
        cur = cur.join(hot, gcols, "left_semi")

    joined = state.join(cur, gcols, "full_outer")
    if impute:
        # entity presence = a bucket ROW exists (pre-complete-vector
        # filter): partial buckets are present-but-skipped, exactly
        # like preview's joint path over an imputed-fill grid
        joined = joined.join(
            base.select(*gcols).distinct()
            .withColumn("_ent_present", F.lit(True)),
            gcols, "left_outer")
    else:
        joined = joined.withColumn("_ent_present",
                                   F.lit(None).cast("boolean"))
    if cold_start_history:
        n_train = max(32, int(cold_start_history))
        new_ent = (cur.select(*gcols).distinct()
                   .join(state.select(*gcols).distinct(), gcols,
                         "left_anti"))
        src_new = (src.join(F.broadcast(new_ent), ent, "left_semi")
                   if ent else src)
        rng_h = {"range": {det.time_field: {
            "gte": start - n_train * det.interval_ms, "lt": start}}}
        qh = ({"bool": {"filter": [rng_h, det.filter_query]}}
              if det.filter_query else rng_h)
        fmh = feature_matrix(src_new, det.time_field, det.interval_ms,
                             det.feature_specs,
                             entity_cols=tuple(det.category_fields),
                             filter_cond=compile_filter(src_new, qh))
        bhh = fmh if ent else fmh.withColumn("_g", F.lit("_"))
        csj = (bhh.filter(cond_all)
               .select(*gcols,
                       F.unix_millis(F.col("bucket_start")
                                     .cast("timestamp")).alias("_bms"),
                       F.array(*[F.col(nm).cast("double")
                                 for nm in feats]).alias("_hvec"))
               .groupBy(*gcols)
               .agg(F.array_sort(F.collect_list(
                   F.struct("_bms", "_hvec"))).alias("_p"))
               .select(*gcols, F.col("_p._hvec").alias("_cs_vecs"))
               .join(new_ent, gcols, "left_semi"))
        joined = joined.join(csj, gcols, "left_outer")
    else:
        joined = joined.withColumn(
            "_cs_vecs", F.lit(None).cast("array<array<double>>"))
    fixed_vec = ([float((det.imputation_values or {})[f])
                  for f in feats] if impute == "fixed_values" else None)
    out_extra = [T.StructField("_z", T.DoubleType()),
                 T.StructField("_exp", T.ArrayType(T.DoubleType())),
                 T.StructField("_attr", T.ArrayType(T.DoubleType())),
                 T.StructField("_rel", T.IntegerType()),
                 T.StructField("_past", T.ArrayType(T.DoubleType())),
                 T.StructField("_vu", T.ArrayType(T.DoubleType())),
                 T.StructField("_imp", T.BooleanType())]
    upd_schema = T.StructType(list(state_fields) + out_extra)

    def fn(batches):
        for pdf in batches:
            n = len(pdf)
            z = np.full(n, np.nan)
            exps: list = [None] * n
            attrs: list = [None] * n
            rels: list = [None] * n
            pasts: list = [None] * n
            models = list(pdf["model"])
            louts = list(pdf["last_out"])
            lvecs = list(pdf["last_vec"])
            lm = pdf["last_ms"].to_numpy(dtype=np.float64)
            lm_orig = lm.copy()                  # pre-ingest snapshot
            vecs = list(pdf["_vec"])
            extra_cnt = np.zeros(n, dtype=np.int64)
            imputed = np.zeros(n, dtype=bool)

            def has(x):
                return x is not None and not (isinstance(x, float)
                                              and pd.isna(x))

            if impute:
                # synthesize the missing vector BEFORE the replay/
                # ingest logic so it flows through the identical
                # recurrence; replays recompute the same vector
                # (zero/fixed constants; previous re-reads last_vec,
                # which the imputed ingest itself carried forward)
                ent_p = (pdf["_ent_present"] == True) \
                    .to_numpy(dtype=bool)      # noqa: E712 (None-safe)
                for i in range(n):
                    if has(vecs[i]) or ent_p[i] or np.isnan(lm[i]):
                        continue
                    if impute == "zero":
                        vecs[i] = [0.0] * nf
                    elif impute == "fixed_values":
                        vecs[i] = list(fixed_vec)
                    elif has(lvecs[i]):          # previous
                        vecs[i] = [float(x) for x in lvecs[i]]
                    else:
                        continue                 # nothing to carry yet
                    imputed[i] = True

            for i in range(n):
                if not has(vecs[i]):
                    continue
                if lm[i] == float(start):            # replay, no ingest
                    if has(louts[i]):
                        o = pickle.loads(bytes(louts[i]))
                        z[i] = o["z"]
                        exps[i] = o["exp"]
                        attrs[i] = o["attr"]
                        rels[i] = o["rel"]
                        pasts[i] = o["past"]
                    continue
                if lm[i] > float(start):             # out-of-order call
                    continue
                cvs = pdf["_cs_vecs"].iloc[i]
                if (not has(models[i]) and has(cvs) and len(cvs)
                        and np.isnan(lm_orig[i])):
                    # historical cold start: train the fresh joint
                    # model on the trailing complete-feature buckets
                    # through the live recurrence
                    cs_stream = stream_factory()
                    for hv in cvs:
                        zt, _ = cs_stream.update(
                            float(hv[0]) if nf == 1
                            else [float(x) for x in hv])
                        if zt == zt:
                            extra_cnt[i] += 1
                    models[i] = cs_stream.to_bytes()
                stream = (stream_factory() if not has(models[i])
                          else stream_factory.restore(bytes(models[i])))
                # an F=1 stream takes a scalar (RCFStream.update's
                # univariate spelling), F>1 the vector
                zi, ei = stream.update(
                    float(vecs[i][0]) if nf == 1
                    else [float(x) for x in vecs[i]])
                z[i] = zi
                if zi == zi:                          # scored (warm)
                    exps[i] = ([float(x) for x in ei]
                               if nf > 1 else [float(ei)])
                attrs[i] = stream.last_attribution
                rels[i] = stream.last_relative_index
                pasts[i] = stream.last_past_values
                models[i] = stream.to_bytes()
                louts[i] = pickle.dumps(
                    {"z": z[i], "exp": exps[i], "attr": attrs[i],
                     "rel": rels[i], "past": pasts[i]})
                lvecs[i] = [float(x) for x in vecs[i]]
                lm[i] = float(start)
            cnt = pdf["scored_cnt"].fillna(0).to_numpy(dtype=np.int64)
            # count only fresh scores (replays already counted)
            fresh = (~np.isnan(z)) & (np.isnan(lm_orig)
                                      | (lm_orig != float(start)))
            cnt = cnt + extra_cnt + fresh.astype(np.int64)
            out = pdf.drop(columns=["_vec", "scored_cnt", "last_ms",
                                    "model", "last_out", "last_vec",
                                    "_cs_vecs", "_ent_present"],
                           errors="ignore").copy()
            out["scored_cnt"] = cnt
            out["last_ms"] = pd.Series(lm).astype("Int64")
            out["model"] = models
            out["last_out"] = louts
            out["last_vec"] = [lv if has(lv) else None for lv in lvecs]
            out["_vu"] = [([float(x) for x in v] if has(v) else None)
                          for v in vecs]
            out["_imp"] = imputed
            out["_z"] = z
            out["_exp"] = exps
            out["_attr"] = attrs
            out["_rel"] = pd.array(
                [r if r is not None else None for r in rels],
                dtype="Int32")
            out["_past"] = pasts
            yield out[[f.name for f in upd_schema.fields]]

    upd = joined.mapInPandas(fn, schema=upd_schema)
    upd = upd.localCheckpoint()
    _swap_state_dir(upd, spath, [f.name for f in state_fields])

    scored = upd.filter(F.col("_z").isNotNull())
    if impute:
        # imputed entities have no base row — feature values come
        # from the vector the model actually ingested
        out = scored.select(*gcols, "scored_cnt", "_z", "_exp",
                            "_attr", "_rel", "_past", "_vu", "_imp")
        for j, nm in enumerate(feats):
            out = out.withColumn(nm, F.element_at("_vu", j + 1))
    else:
        out = base.join(scored.select(
            *gcols, "scored_cnt", "_z", "_exp", "_attr", "_rel",
            "_past"), gcols)
    score = F.abs(F.col("_z"))
    conf = F.least(F.lit(1.0), F.col("scored_cnt")
                   / F.lit(float(det.confidence_ramp)))
    result = (out
              .withColumn("anomaly_score", F.round(score, 6))
              .withColumn("anomaly_grade",
                          F.round(_grade(score, det.anomaly_threshold), 6))
              .withColumn("confidence", F.round(conf, 6))
              .withColumn("detector_id", F.lit(det.detector_id))
              .withColumn("bucket_start", F.timestamp_millis(F.lit(start)))
              .withColumn("data_start_time", F.col("bucket_start"))
              .withColumn("data_end_time", F.timestamp_millis(F.lit(end))))
    if det.suppression_rules:
        for j, n in enumerate(feats):
            result = result.withColumn(f"_exp_{n}",
                                       F.element_at("_exp", j + 1))
        result = result.withColumn(
            "anomaly_grade",
            F.when(_rule_suppressed(det, feats), F.lit(0.0))
            .otherwise(F.col("anomaly_grade")))
    if ent:
        result = with_entity(result, {c: c for c in ent})
    else:
        result = result.withColumn(
            "entity",
            F.array().cast("array<struct<name:string,value:string>>"))
    result = _attribution_ring(result, feats, det.interval_ms)
    imp_cols = []
    if impute:
        result = result.withColumn("feature_imputed", F.array(*[
            F.struct(F.lit(nm).alias("feature_id"),
                     F.coalesce(F.col("_imp"), F.lit(False))
                     .alias("imputed")) for nm in feats]))
        imp_cols = ["feature_imputed"]
    return result.select(
        "detector_id", "entity", "data_start_time", "data_end_time",
        *feats, "anomaly_score", "anomaly_grade", "confidence",
        *RING_COLS, *ent, "bucket_start", *imp_cols)


#: the reference's checkpoint TTL (AnomalyDetectorSettings.java:213-218)
CHECKPOINT_TTL_MS = 7 * 24 * 3600 * 1000


def prune_state(spark: SparkSession, detector_id: str, state_dir: str,
                now_ms: int, ttl_ms: int = CHECKPOINT_TTL_MS) -> int:
    """Expire per-entity model checkpoints not updated within the TTL
    (the reference's checkpoint maintenance: a periodic delete of
    checkpoint docs whose last update is older than ``checkpoint_ttl``,
    default 7 days — ``AnomalyDetectorSettings.java:213-218``,
    ``ADCheckpointMaintainWorker``).

    Scale posture: under entity churn (the HC-detector norm — new
    session/user entities appear, old ones stop emitting), the state
    table otherwise grows monotonically with every entity EVER seen;
    at the 100 TB / million-entity target that's unbounded model bytes
    scanned by every interval's full-outer join.  Pruning keeps the
    state bounded by the ACTIVE entity count.  Expired entities that
    reappear later cold-start fresh, exactly like the reference after
    a checkpoint expiry.

    Both state layouts are pruned — the scalar per-(entity, feature)
    table under ``detector_id`` and the joint multivariate table under
    ``<detector_id>__joint`` (:func:`run_once_stateful_joint`).  Same
    tmp+swap crash posture as the state writes; returns the total
    number of rows pruned.  A retention pass is idempotent."""
    import os

    cutoff = now_ms - ttl_ms
    pruned = 0
    for ident in (detector_id, f"{detector_id}__joint"):
        spath = _state_path(state_dir, ident)
        if not os.path.exists(spath):
            continue
        state = spark.read.parquet(spath)
        # rows that never ingested an interval (last_ms null — e.g. an
        # entity-feature whose only interval had a null value) are
        # KEPT: they carry no model bytes and no timestamp to age them
        # by, and counting them as TTL expiries would misreport the
        # prune
        keep = state.filter(F.col("last_ms").isNull()
                            | (F.col("last_ms") >= cutoff))
        n_total = state.count()
        kept = keep.localCheckpoint()        # cut lineage before swap
        n_keep = kept.count()
        if n_keep == n_total:
            continue
        _swap_state_dir(kept, spath, kept.columns)
        pruned += n_total - n_keep
    return pruned


# --- historical (batch) analysis ---------------------------------------------
#
# The reference's historical analysis (ADBatchTaskRunner.java) walks a
# [start, end) range in bounded pieces (MAX_BATCH_TASK_PIECE_SIZE =
# 10_000 intervals per query, TimeSeriesSettings.java:99), carrying
# model state across pieces and checkpointing progress so an
# interrupted task resumes at the next piece.  The Spark analog below
# reuses the run_once_stateful state table, scores each piece's
# buckets SEQUENTIALLY per (entity, feature) inside one applyInPandas
# pass, appends piece results to a parquet results dir with an atomic
# done-marker per piece, and skips completed pieces on resume.


def run_historical(
    spark: SparkSession,
    det: Detector,
    start_ms: int,
    end_ms: int,
    state_dir: str,
    results_dir: str,
    piece_intervals: int = 128,
    eps: float = 1e-9,
    scorer_factory=None,
    on_piece=None,
    cancel_check=None,
) -> DataFrame:
    """Batch detection over ``[start_ms, end_ms)`` in pieces.

    Row-identical to :func:`preview` over the same span (same trailing-z
    model, warm-up and confidence ramp) while scanning each raw event
    exactly once; interruption loses at most one piece of work.
    Returns the accumulated results frame (all completed pieces).

    The piece is the atomic unit: piece ``p`` reads piece ``p-1``'s
    state SNAPSHOT (under ``results_dir``) and writes its own snapshot
    + results + done-marker; the live state dir (``state_dir``) is
    swapped only once, after every piece is done.  A crash anywhere
    inside a piece re-runs that piece from the previous snapshot — the
    state it ingests from can never have advanced past it.

    ``scorer_factory`` swaps the trailing-z model for a checkpointable
    streaming model (the reference's historical task likewise restores
    the entity's RCF checkpoint per piece, ``ADBatchTaskRunner.java``):
    a callable returning a fresh stream with ``update(v) -> (z,
    expected)`` and ``to_bytes()``, plus a ``restore(bytes)`` attribute
    — e.g. :func:`~anomaly_detection_spark.features.rcf_stream_factory`.
    The per-(entity, feature) model bytes ride in the state snapshot's
    ``model`` column.  ``det.suppression_rules`` are honored in both
    modes (margins against the model's expected value, like preview).

    ``imputation_method`` zero/fixed_values/previous fills each
    entity's missing buckets inside its observed extent — the extent
    is computed ONCE up front (one raw min/max agg, broadcast into
    every piece) because preview's dense grid stops at the entity's
    last bucket and a piece cannot know that locally; gaps spanning
    piece boundaries impute correctly (the ``previous`` carry rides
    the state snapshot's ``last_v``).  ``linear`` interpolates toward
    neighbors that may live in DIFFERENT pieces, so its fill table is
    computed ONCE up front instead (one extra whole-range feature
    aggregation through the same :func:`impute_linear` preview uses —
    fill values depend only on the raw series, never on model state)
    and each piece unions in its range-slice of fills; the table holds
    only the MISSING buckets, so it stays small relative to the data.
    Results carry ``feature_imputed`` for every method.

    Task-tracking hooks (both opt-in; see
    :mod:`anomaly_detection_spark.tasks`): ``cancel_check()`` is called
    before each piece — return a ``(reason, stopped_by)`` pair to abort
    with :class:`TaskCancelledError` (the reference checks its cancel
    flag exactly there, ``ADBatchTaskRunner.java:1377``); ``on_piece(p,
    n_pieces, snapshot_path)`` fires after piece ``p`` completes (or is
    skipped on resume) so a task store can record progress.
    """
    import os
    import shutil

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .features import feature_matrix

    impute = det.imputation_method
    if impute == "fixed_values":
        _missing = [f for f in det.feature_specs
                    if f not in (det.imputation_values or {})]
        if _missing:
            raise ValueError(
                f"fixed_values imputation needs a value per feature; "
                f"missing {_missing}")
    fixed_vals = dict(det.imputation_values or {})
    k = det.shingle_size
    start_ms = (start_ms // det.interval_ms) * det.interval_ms
    end_ms = (end_ms // det.interval_ms) * det.interval_ms
    ent = list(det.category_fields)
    gcols = ent or ["_g"]
    feats = sorted(det.feature_specs)
    spath = _state_path(state_dir, det.detector_id)
    os.makedirs(results_dir, exist_ok=True)

    piece_ms = piece_intervals * det.interval_ms
    n_pieces = max(1, -(-(end_ms - start_ms) // piece_ms))

    src = load_table(spark, det.indices)
    ext = None
    fills = None
    if impute:
        from .query.aggs import to_millis

        rng_all = {"range": {det.time_field: {"gte": start_ms,
                                              "lt": end_ms}}}
        q_all = ({"bool": {"filter": [rng_all, det.filter_query]}}
                 if det.filter_query else rng_all)
    if impute == "linear":
        # linear's fill values interpolate toward present neighbors
        # that may live in DIFFERENT pieces, but they depend only on
        # the raw feature series — never on model state — so the whole
        # fill table is computed ONCE up front through the exact
        # function preview uses (impute_linear: dense per-entity grid,
        # anchor semantics, edge clamps), then each piece unions in
        # its range-slice.  Only the MISSING buckets are kept, so the
        # table is small relative to the data; one extra whole-range
        # feature aggregation is the cost.
        # Memory profile: impute_linear's per-entity window functions
        # sort one entity's dense bucket series within a task, so peak
        # per-task memory is O(range/interval) rows per entity — for a
        # years-long span with few entities this spills before it OOMs
        # (window sort is spillable), but it does bypass the piece
        # bound the zero/previous paths enjoy.  A chunk-wise fill
        # (each gap only needs its two anchor neighbors, so pieces
        # extended one present bucket each side suffice) is the
        # escape hatch if that profile ever bites; not done while the
        # fill table stays preview-identical by construction here.
        from .features import impute_linear

        fm_all = feature_matrix(src, det.time_field, det.interval_ms,
                                det.feature_specs,
                                entity_cols=tuple(det.category_fields),
                                filter_cond=compile_filter(src, q_all))
        lin = impute_linear(fm_all, det.interval_ms, feats,
                            entity_cols=tuple(det.category_fields))
        lin = lin.filter(F.col("is_filled"))
        lin = lin if ent else lin.withColumn("_g", F.lit("_"))
        _pairs = ", ".join(f"'{n}', cast(`{n}` as double)" for n in feats)
        fills = (lin.select(
            *gcols,
            F.unix_millis(F.col("bucket_start").cast("timestamp"))
            .alias("bucket_ms"),
            F.expr(f"stack({len(feats)}, {_pairs})").alias("_feat", "_v"))
            .localCheckpoint())
    elif impute:
        # per-entity bucket extent over the WHOLE range, computed once
        # up front: preview's dense grid spans each entity's extent, so
        # imputation must stop at the entity's last observed bucket —
        # a piece cannot know that locally.  One raw-event min/max agg
        # (no feature evaluation); output is one small row per entity,
        # broadcast into every piece.
        bms = (F.floor(to_millis(det.time_field) / det.interval_ms)
               * det.interval_ms)
        ev = src.filter(compile_filter(src, q_all))
        ev = (ev.select(*ent, bms.alias("_bms")) if ent
              else ev.select(F.lit("_").alias("_g"), bms.alias("_bms")))
        ext = (ev.groupBy(*gcols)
               .agg(F.min("_bms").alias("_elo"),
                    F.max("_bms").alias("_ehi"))).localCheckpoint()
    # group-col types from the source (gcols order preserved — the
    # UDF's output columns are matched positionally against the schema)
    gstruct = ([src.schema[c] for c in ent] if ent
               else [T.StructField("_g", T.StringType())])
    out_schema = T.StructType(
        gstruct
        + [T.StructField("_feat", T.StringType()),
           T.StructField("bucket_ms", T.LongType()),
           T.StructField("_z", T.DoubleType()),
           T.StructField("_exp", T.DoubleType()),
           T.StructField("cnt_after", T.LongType()),
           T.StructField("vals", T.ArrayType(T.DoubleType())),
           T.StructField("model", T.BinaryType()),
           T.StructField("last_v", T.DoubleType()),
           T.StructField("_vu", T.DoubleType()),
           T.StructField("_imp", T.BooleanType())])

    def snap(p: int) -> str:
        return os.path.join(results_dir, f"_state_piece_{p}")

    for p in range(n_pieces):
        if cancel_check is not None:
            cancelled = cancel_check()
            if cancelled:
                raise TaskCancelledError(*cancelled)
        marker = os.path.join(results_dir, f"_piece_{p}.done")
        if os.path.exists(marker):
            if on_piece is not None:
                on_piece(p, n_pieces, snap(p))
            continue
        lo = start_ms + p * piece_ms
        hi = min(end_ms, lo + piece_ms)
        rng = {"range": {det.time_field: {"gte": lo, "lt": hi}}}
        q = ({"bool": {"filter": [rng, det.filter_query]}}
             if det.filter_query else rng)
        fm = feature_matrix(src, det.time_field, det.interval_ms,
                            det.feature_specs,
                            entity_cols=tuple(det.category_fields),
                            filter_cond=compile_filter(src, q))
        base = fm if ent else fm.withColumn("_g", F.lit("_"))
        pairs = ", ".join(f"'{n}', cast(`{n}` as double)" for n in feats)
        cur = base.select(
            *gcols,
            F.unix_millis(F.col("bucket_start").cast("timestamp"))
            .alias("bucket_ms"),
            F.expr(f"stack({len(feats)}, {pairs})").alias("_feat", "_v"))

        # piece p's input state: piece p-1's snapshot; piece 0 starts
        # from the live state dir (e.g. a prior run_once_stateful)
        in_state = snap(p - 1) if p > 0 and os.path.exists(snap(p - 1)) \
            else spath
        if os.path.exists(in_state):
            state = spark.read.parquet(in_state)
            # snapshot written before the model / imputation columns
            for c, t in (("model", "binary"), ("last_v", "double")):
                if c not in state.columns:
                    state = state.withColumn(c, F.lit(None).cast(t))
        else:
            state = local_df(
                spark, [], T.StructType(
                    gstruct
                    + [T.StructField("_feat", T.StringType()),
                       T.StructField("vals",
                                     T.ArrayType(T.DoubleType())),
                       T.StructField("scored_cnt", T.LongType()),
                       T.StructField("model", T.BinaryType()),
                       T.StructField("last_v", T.DoubleType())]))
        st = state.select(*gcols, "_feat", "vals", "scored_cnt",
                          "model", "last_v")
        if impute == "linear":
            # this piece's slice of the precomputed fill table rides
            # the melt itself (no join): fill rows ingest in bucket
            # order like any present value, flagged imputed
            cur = cur.withColumn("_impin", F.lit(False)).unionByName(
                fills.filter((F.col("bucket_ms") >= lo)
                             & (F.col("bucket_ms") < hi))
                .withColumn("_impin", F.lit(True)))
        elif impute:
            cur = cur.join(F.broadcast(ext), gcols, "left")
            # renamed copy for the state side — joining the SAME frame
            # onto both cogroup inputs is an ambiguous self-join
            ext_r = ext.select(*gcols,
                               F.col("_elo").alias("_elo_r"),
                               F.col("_ehi").alias("_ehi_r"))
            st = st.join(F.broadcast(ext_r), gcols, "left")

        # COGROUP, not a full-outer join: a serialized model checkpoint
        # is ~MBs, and joining it onto every bucket row would shuffle
        # piece_intervals copies of it per entity (measured: a 1.7 MB
        # RCF blob × 4096 buckets = 14 GB for a 2-entity piece).  With
        # cogroup the state row crosses the wire exactly once per key.
        def fn(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
            vals: list = []
            model_b = None
            cnt = 0
            carry = None                  # last ingested value
            if len(rpdf):
                r0 = rpdf.iloc[0]
                if r0["vals"] is not None and not (
                        isinstance(r0["vals"], float)
                        and pd.isna(r0["vals"])):
                    vals = list(r0["vals"])
                if r0["model"] is not None and not (
                        isinstance(r0["model"], float)
                        and pd.isna(r0["model"])):
                    model_b = bytes(r0["model"])
                if not pd.isna(r0["scored_cnt"]):
                    cnt = int(r0["scored_cnt"])
                if "last_v" in rpdf.columns and not pd.isna(r0["last_v"]):
                    carry = float(r0["last_v"])
            if carry is None and vals:
                carry = float(vals[-1])
            stream = None
            if scorer_factory is not None:
                stream = (scorer_factory() if model_b is None
                          else scorer_factory.restore(model_b))
            rows = lpdf.sort_values("bucket_ms")
            # (bucket_ms, value, was_imputed) sequence: observed rows
            # as-is, or — under imputation — the entity-extent grid
            # with missing buckets synthesized (preview's
            # fill-missing-buckets-only semantics: a present bucket
            # whose feature aggregated to null stays null)
            has_fill = "_impin" in rows.columns
            seq: list = [(int(r["bucket_ms"]), r["_v"],
                          bool(r["_impin"]) if has_fill else False)
                         for _, r in rows.iterrows()]
            if impute and impute != "linear":
                elo = ehi = None
                for side, sfx in ((rows, ""), (rpdf, "_r")):
                    if len(side) and f"_elo{sfx}" in side.columns \
                            and not pd.isna(side[f"_elo{sfx}"].iloc[0]):
                        elo = int(side[f"_elo{sfx}"].iloc[0])
                        ehi = int(side[f"_ehi{sfx}"].iloc[0])
                        break
                if elo is not None:
                    present = {b for b, _v, _i in seq}
                    feat_name = key[-1]
                    glo = max(elo, lo)
                    ghi = min(ehi, hi - det.interval_ms)
                    merged = dict()
                    for b, v, _i in seq:
                        merged[b] = (v, False)
                    b = glo
                    while b <= ghi:
                        if b not in present:
                            if impute == "zero":
                                merged[b] = (0.0, True)
                            elif impute == "fixed_values":
                                merged[b] = (float(fixed_vals[feat_name]),
                                             True)
                            # 'previous' is resolved in the ingest loop
                            # (the carry evolves as values ingest)
                            else:
                                merged[b] = (None, True)
                        b += det.interval_ms
                    seq = [(b, *merged[b]) for b in sorted(merged)]
            out = []
            for bms, v, was_imp in seq:
                z = np.nan
                exp = np.nan
                used = None
                if was_imp and impute == "previous":
                    v = carry                 # may still be None
                if v is not None and not pd.isna(v):
                    used = float(v)
                    if stream is not None:
                        z, exp = stream.update(float(v))
                        if not np.isnan(z):
                            cnt += 1
                    else:
                        if len(vals) == k:
                            # same float sequence as zscore_scorer;
                            # expected = the prior-window mean, the same
                            # baseline preview uses for rule margins
                            w = np.asarray(vals, dtype=np.float64)
                            m = w.sum() / k
                            m2 = (w * w).sum() / k
                            std = np.sqrt(max(m2 - m * m, 0.0))
                            z = (float(v) - m) / (std + eps)
                            exp = m
                            cnt += 1
                        vals = (vals + [float(v)])[-k:]
                    carry = float(v)
                out.append([*key, bms, z, exp, cnt, None, None, None,
                            used, bool(was_imp)])
            # trailing state row (bucket_ms null)
            out.append([*key, None, None, None, cnt, vals,
                        stream.to_bytes() if stream is not None else None,
                        carry, None, None])
            return pd.DataFrame(
                out, columns=[*gcols, "_feat", "bucket_ms", "_z", "_exp",
                              "cnt_after", "vals", "model", "last_v",
                              "_vu", "_imp"])

        upd = (cur.groupBy(*gcols, "_feat")
               .cogroup(st.groupBy(*gcols, "_feat"))
               .applyInPandas(fn, schema=out_schema)
               .localCheckpoint())

        # piece-local state snapshot — the live state dir is untouched
        # until every piece is done, so a crashed piece always re-runs
        # against the state it started from
        new_state = (upd.filter(F.col("bucket_ms").isNull())
                     .select(*gcols, "_feat", "vals",
                             F.col("cnt_after").alias("scored_cnt"),
                             "model", "last_v"))
        new_state.write.mode("overwrite").parquet(snap(p))

        scored = upd.filter(F.col("_z").isNotNull())
        if det.suppression_rules:
            zw = (scored.groupBy(*gcols, "bucket_ms")
                  .pivot("_feat", feats)
                  .agg(F.first("_z").alias("z"),
                       F.first("_exp").alias("exp")))
            for n in feats:
                zw = (zw.withColumnRenamed(f"{n}_z", f"_z_{n}")
                      .withColumnRenamed(f"{n}_exp", f"_exp_{n}"))
        else:
            zw = (scored.groupBy(*gcols, "bucket_ms")
                  .pivot("_feat", feats).agg(F.first("_z")))
            for n in feats:
                zw = zw.withColumnRenamed(n, f"_z_{n}")
        cnt1 = (scored.groupBy(*gcols, "bucket_ms")
                .agg(F.min("cnt_after").alias("_cnt")))
        if impute:
            # imputed buckets have no base row — feature values come
            # from what the model actually ingested; _imp flags feed
            # the feature_imputed result field
            vw = (scored.groupBy(*gcols, "bucket_ms")
                  .pivot("_feat", feats)
                  .agg(F.first("_vu").alias("v"),
                       F.first("_imp").alias("imp")))
            for n in feats:
                vw = (vw.withColumnRenamed(f"{n}_v", n)
                      .withColumnRenamed(f"{n}_imp", f"_imp_{n}"))
            wide = vw.withColumn("bucket_start",
                                 F.timestamp_millis(F.col("bucket_ms")))
        else:
            wide = base.withColumn(
                "bucket_ms",
                F.unix_millis(F.col("bucket_start").cast("timestamp")))
        out = (wide.join(zw, [*gcols, "bucket_ms"])
               .join(cnt1, [*gcols, "bucket_ms"]))
        for n in feats:
            out = out.filter(F.col(f"_z_{n}").isNotNull())
        score = F.greatest(*[F.abs(F.col(f"_z_{n}")) for n in feats]) \
            if len(feats) > 1 else F.abs(F.col(f"_z_{feats[0]}"))
        conf = F.least(F.lit(1.0),
                       F.col("_cnt") / F.lit(float(det.confidence_ramp)))
        result = (out
                  .withColumn("anomaly_score", F.round(score, 6))
                  .withColumn("anomaly_grade",
                          F.round(_grade(score, det.anomaly_threshold), 6))
                  .withColumn("confidence", F.round(conf, 6))
                  .withColumn("detector_id", F.lit(det.detector_id))
                  .withColumn("data_start_time", F.col("bucket_start"))
                  .withColumn("data_end_time", F.timestamp_millis(
                      F.col("bucket_ms") + det.interval_ms)))
        if det.suppression_rules:
            result = result.withColumn(
                "anomaly_grade",
                F.when(_rule_suppressed(det, feats), F.lit(0.0))
                .otherwise(F.col("anomaly_grade")))
        if ent:
            result = with_entity(result, {c: c for c in ent})
        else:
            result = result.withColumn(
                "entity",
                F.array().cast("array<struct<name:string,value:string>>"))
        imp_cols = []
        if impute:
            result = result.withColumn("feature_imputed", F.array(*[
                F.struct(F.lit(n).alias("feature_id"),
                         F.coalesce(F.col(f"_imp_{n}"), F.lit(False))
                         .alias("imputed")) for n in feats]))
            imp_cols = ["feature_imputed"]
        (result.select(
            "detector_id", "entity", "data_start_time", "data_end_time",
            *feats, "anomaly_score", "anomaly_grade", "confidence",
            *ent, "bucket_start", *imp_cols)
         .write.mode("overwrite").parquet(
             os.path.join(results_dir, f"piece={p}")))
        with open(marker, "w") as f:
            f.write("done")
        if on_piece is not None:
            on_piece(p, n_pieces, snap(p))

    # finalize: publish the last piece's snapshot as the live state
    # (tmp+swap), then drop the snapshots.  Re-running after a crash
    # here re-publishes the same content — idempotent.
    last = snap(n_pieces - 1)
    if os.path.exists(last):
        tmp, trash = spath + ".__tmp__", spath + ".__old__"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(last, tmp)
        shutil.rmtree(trash, ignore_errors=True)
        if os.path.exists(spath):
            shutil.move(spath, trash)
        shutil.move(tmp, spath)
        shutil.rmtree(trash, ignore_errors=True)
        for p in range(n_pieces):
            shutil.rmtree(snap(p), ignore_errors=True)

    return spark.read.parquet(os.path.join(results_dir, "piece=*"))
