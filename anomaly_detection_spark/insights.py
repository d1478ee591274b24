"""Insights anomaly-correlation job (reference parity, one DataFrame plan).

The reference's insights job scrolls every anomaly result in an
execution window (``InsightsJobProcessor.java:366-435``: filter
``anomaly_grade > 0`` + execution-time range, scroll pages of 10k) and
clusters them CLIENT-SIDE into correlated incident windows
(``ad/correlation/AnomalyCorrelation.java``): pairwise similarity =
temporal overlap of delta-dilated intervals (IoU / overlap-coefficient
hybrid) × a Laplacian duration penalty ``exp(-|durA-durB|/kappa)``,
threshold graph, connected components, per-cluster event window =
[earliest start, latest end].

Spark restatement: the scroll collapses into a scan; pair generation
is a time-bucket equi-join (two dilated intervals can only overlap if
they share a coarse time bucket — no all-pairs); similarity is pure
codegen arithmetic; components reuse
:func:`~anomaly_detection_spark.pipeline.dedup.duplicate_clusters`.
Defaults mirror the reference's constants
(``InsightsJobProcessor.java:342-389``: DELTA_TOL 5m, ALPHA 0.30,
KAPPA 30m, MIN_OVERLAP 3m, HYBRID with LAM 0.6 / TAU_CONTAIN 0.8 /
RHO_MAX 0.25 / CONTAINMENT_RELAX 0.45).  The per-detector
backward-dilation special case for coarse community aggregations
(``backwardDilation``) applies only when a detector-interval map is
supplied in the reference; this restatement is the map-absent default
(dilation = delta on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pipeline.dedup import duplicate_clusters
from .query.aggs import to_millis

MINUTE_MS = 60_000


def correlated_anomaly_clusters(
    results: DataFrame,
    start_ms: int | None = None,
    end_ms: int | None = None,
    id_cols: tuple[str, ...] = ("detector_id",),
    start_col: str = "data_start_time",
    end_col: str = "data_end_time",
    grade_col: str = "anomaly_grade",
    delta_ms: int = 5 * MINUTE_MS,
    kappa_ms: int = 30 * MINUTE_MS,
    min_similarity: float = 0.30,
    min_overlap_ms: int = 3 * MINUTE_MS,
    mode: str = "hybrid",
    lam: float = 0.6,
    tau_contain: float = 0.8,
    rho_max: float = 0.25,
    containment_relax: float = 0.45,
    include_singletons: bool = True,
    bucket_ms: int = 60 * MINUTE_MS,
) -> DataFrame:
    """Cluster anomaly-result rows into correlated incident groups.

    Returns one row per anomaly: the ``id_cols``, raw interval, a
    ``cluster_id`` (min anomaly key of the component), and the
    cluster's ``cluster_size`` / ``window_start`` / ``window_end``
    (epoch ms, spanning raw member intervals).

    ``bucket_ms`` is the pair-generation grain: dilated intervals are
    exploded onto coarse time buckets and only co-bucketed anomalies
    are compared — at corpus scale the join cost is
    Σ_bucket n_bucket², never N².  Any bucket width ≥ the typical
    dilated interval works; results are bucket-independent (a pair
    overlapping in time always shares ≥ 1 bucket because overlap > 0).
    """
    if mode not in ("iou", "ovl", "hybrid"):
        raise ValueError(f"mode must be iou/ovl/hybrid, got {mode!r}")

    s_ms = to_millis(start_col)
    e_ms = to_millis(end_col)
    anoms = results.filter(F.col(grade_col) > 0)
    if start_ms is not None:
        anoms = anoms.filter(s_ms >= F.lit(start_ms))
    if end_ms is not None:
        anoms = anoms.filter(e_ms <= F.lit(end_ms))
    # stable scalar anomaly key for pairing/clustering — rows that tie
    # on (id_cols, interval) are the SAME logical anomaly and rightly
    # collapse; make id_cols include the entity/model id when several
    # streams share a detector_id
    aid = F.xxhash64(*id_cols, s_ms, e_ms)
    base = anoms.select(
        aid.alias("_aid"), *id_cols,
        s_ms.alias("_s"), e_ms.alias("_e"),
        (s_ms - F.lit(delta_ms)).alias("_ds"),
        (e_ms + F.lit(delta_ms)).alias("_de"))

    # time-bucket equi-join: only co-bucketed dilated intervals pair up
    bucketed = base.select(
        "_aid", "_s", "_e", "_ds", "_de",
        F.explode(F.sequence(
            F.floor(F.col("_ds") / bucket_ms),
            F.floor(F.col("_de") / bucket_ms))).alias("_b"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = (a.join(b, (F.col("a._b") == F.col("b._b"))
                    & (F.col("a._aid") < F.col("b._aid")))
             .select(F.col("a._aid").alias("id_a"),
                     F.col("b._aid").alias("id_b"),
                     F.col("a._s").alias("sa"), F.col("a._e").alias("ea"),
                     F.col("a._ds").alias("dsa"), F.col("a._de").alias("dea"),
                     F.col("b._s").alias("sb"), F.col("b._e").alias("eb"),
                     F.col("b._ds").alias("dsb"), F.col("b._de").alias("deb"))
             .distinct())

    ov = (F.least("dea", "deb") - F.greatest("dsa", "dsb")).cast("double")
    len_a = (F.col("dea") - F.col("dsa")).cast("double")
    len_b = (F.col("deb") - F.col("dsb")).cast("double")
    union = len_a + len_b - ov
    iou = F.when((ov > 0) & (union > 0), ov / union).otherwise(F.lit(0.0))
    ovl = F.when((ov > 0) & (F.least(len_a, len_b) > 0),
                 ov / F.least(len_a, len_b)).otherwise(F.lit(0.0))
    strong = ((F.least(len_a, len_b) / F.greatest(len_a, len_b)
               <= F.lit(rho_max))
              & (ovl >= F.lit(tau_contain)))
    if mode == "iou":
        t = iou
    elif mode == "ovl":
        t = ovl
    else:
        t = F.when(strong, (1.0 - lam) * iou + lam * ovl).otherwise(iou)
    # duration penalty on RAW durations (Anomaly.getDuration)
    dur_a = (F.col("ea") - F.col("sa")).cast("double")
    dur_b = (F.col("eb") - F.col("sb")).cast("double")
    base_pen = F.exp(-F.abs(dur_a - dur_b) / F.lit(float(kappa_ms)))
    pen = F.when(strong,
                 F.lit(1.0) if containment_relax == 0.0
                 else F.pow(base_pen, F.lit(containment_relax))) \
        .otherwise(base_pen)
    sim = F.when(t > 0, t * pen).otherwise(F.lit(0.0))

    edges = (pairs.withColumn("_sim", sim)
             .filter((F.col("_sim") >= F.lit(min_similarity))
                     & (ov >= F.lit(float(min_overlap_ms))))
             .select("id_a", "id_b"))

    comp = duplicate_clusters(edges).select(
        F.col("doc_id").alias("_aid"), "cluster_id", "cluster_size")
    nodes = base.select("_aid", *id_cols, "_s", "_e")
    labeled = nodes.join(comp, "_aid", "left")
    labeled = labeled.withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col("_aid"))) \
        .withColumn("cluster_size",
                    F.coalesce("cluster_size", F.lit(1)).cast("long"))
    if not include_singletons:
        labeled = labeled.filter(F.col("cluster_size") > 1)

    win = labeled.groupBy("cluster_id").agg(
        F.min("_s").alias("window_start"), F.max("_e").alias("window_end"))
    return (labeled.join(win, "cluster_id")
            .select(*id_cols, F.col("_s").alias("start_ms"),
                    F.col("_e").alias("end_ms"), "cluster_id",
                    "cluster_size", "window_start", "window_end")
            .orderBy("cluster_id", "start_ms", *id_cols))


def top_anomaly_results(
    results: DataFrame,
    start_ms: int,
    end_ms: int,
    entity_cols: tuple[str, ...],
    order: str = "severity",
    size: int = 10,
    grade_col: str = "anomaly_grade",
    time_col: str = "data_end_time",
) -> DataFrame:
    """Top entities by anomaly severity or occurrence — the
    ``SearchTopAnomalyResultTransportAction`` analog as ONE plan.

    Reference semantics (the composite query its docs spell out +
    ``OrderType``): anomalous rows (``anomaly_grade > 0``) with
    ``data_end_time`` in ``[start, end)``, bucketed by entity, ranked
    by ``severity`` (max grade, desc) or ``occurrence`` (anomalous-
    interval count, desc); page size ≤ 1000 (MAX_SIZE).  The
    reference's composite-agg pagination + client-side bucket heap
    collapse into groupBy → TakeOrderedAndProject.
    """
    if order not in ("severity", "occurrence"):
        raise ValueError(f"order must be severity/occurrence: {order!r}")
    if not entity_cols:
        raise ValueError("top_anomaly_results needs entity columns")
    if not 1 <= size <= 1000:
        raise ValueError(f"size must be in [1, 1000]: {size}")
    t = to_millis(time_col)
    ent = list(entity_cols)
    agg = (results
           .filter((F.col(grade_col) > 0)
                   & (t >= start_ms) & (t < end_ms))
           .groupBy(*ent)
           .agg(F.max(grade_col).alias("max_anomaly_grade"),
                F.count(F.lit(1)).alias("doc_count")))
    key = ("max_anomaly_grade" if order == "severity" else "doc_count")
    return (agg.orderBy(F.desc(key), *[F.asc(c) for c in ent])
            .limit(size))
