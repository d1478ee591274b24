"""HC entity-model cache policy (PriorityCache / PriorityTracker /
DoorKeeper / MemoryTracker analogs in `caching.py`)."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.caching import (
    CachePolicy, admit_entities, estimate_caster_model_size,
    estimate_trcf_model_size, priority_increment, update_priority_py)

MIN = 60_000
T0 = 1_700_000_000_000


def test_priority_is_log_sum_exp_of_decayed_hits():
    # PriorityTracker.getUpdatedPriority accumulates e^{inc} in log
    # space.  A new node enters at priority 0 (PriorityNode ctor), so
    # after hits with increments i1..in, p = log(1 + sum e^{ik}) — the
    # leading 1 is the e^0 the initial zero contributes.
    incs = [0, 0, 1, 3, 3]
    p = None
    for i in incs:
        p = update_priority_py(p, i)
    assert p == pytest.approx(
        math.log(1 + sum(math.exp(i) for i in incs)))
    # recency wins over an equal hit count (decay favors later periods)
    old = update_priority_py(update_priority_py(None, 0), 1)
    new = update_priority_py(update_priority_py(None, 10), 11)
    assert new > old
    # overflow falls back to the latest increment (reference float path)
    assert update_priority_py(0.0, 1000) == 1000.0
    # increment = elapsed periods >> 3
    assert priority_increment(T0 + 16 * 8 * MIN, T0, MIN) == 16
    assert priority_increment(T0 + 7 * MIN, T0, MIN) == 0


def test_trcf_model_size_matches_reference_expected_values():
    # TRCFMemoryTests.testEstimateModelSize exact expectations
    assert estimate_trcf_model_size(8, 50, 0.0, 8, 256) == 400768
    assert estimate_trcf_model_size(32, 50, 0.0, 8, 256) == 623944
    assert estimate_trcf_model_size(9, 50, 1.0, 1, 256) == 1789092
    assert estimate_trcf_model_size(6, 50, 0.0, 1, 256) == 609244
    assert estimate_trcf_model_size(8, 50, 0.0, 2, 256) == 518960
    assert estimate_trcf_model_size(32, 50, 0.0, 4, 256) == 746392
    # caster adds the ErrorHandler term on top
    assert (estimate_caster_model_size(8, 50, 0.0, 8, 256, 24)
            > estimate_trcf_model_size(8, 50, 0.0, 8, 256))
    with pytest.raises(ValueError, match="shingle"):
        estimate_trcf_model_size(256, 50, 0.0, 256, 256)


def _ents(spark, *names):
    return spark.createDataFrame(pd.DataFrame({"service": list(names)})) \
        if names else spark.createDataFrame(
            [], "service string")


def _run(spark, sd, present, hosted, pol, now):
    hot, cold, ev = admit_entities(
        spark, sd, "det-c", _ents(spark, *present), _ents(spark, *hosted),
        pol, now, MIN)
    key = lambda df: sorted(r.service for r in df.collect())  # noqa: E731
    return key(hot), key(cold), key(ev)


def test_doorkeeper_defers_first_appearance(spark, tmp_path):
    sd = str(tmp_path)
    pol = CachePolicy(dedicated_cache_size=4, shared_memory_bytes=0)
    hot, cold, ev = _run(spark, sd, ["a", "b"], [], pol, T0)
    assert hot == [] and cold == ["a", "b"] and ev == []
    # second appearance passes the doorkeeper and fills free slots
    hot, cold, ev = _run(spark, sd, ["a", "b"], [], pol, T0 + MIN)
    assert hot == ["a", "b"] and cold == [] and ev == []
    # hosted entities never consult the doorkeeper (isActive bypass)
    hot, cold, ev = _run(spark, sd, ["a"], ["a", "b"], pol, T0 + 2 * MIN)
    assert hot == ["a"] and cold == [] and ev == []


def test_doorkeeper_resets_after_maintenance_window(spark, tmp_path):
    sd = str(tmp_path)
    pol = CachePolicy(dedicated_cache_size=4, doorkeeper_reset_intervals=10)
    _run(spark, sd, ["a"], [], pol, T0)          # count -> 1
    # past the reset window the count is wiped: first visit defers again
    hot, cold, _ = _run(spark, sd, ["a"], [], pol, T0 + 11 * MIN)
    assert hot == [] and cold == ["a"]
    hot, cold, _ = _run(spark, sd, ["a"], [], pol, T0 + 12 * MIN)
    assert hot == ["a"]


def test_strict_greater_replacement_evicts_minimum(spark, tmp_path):
    sd = str(tmp_path)
    pol = CachePolicy(dedicated_cache_size=2, shared_memory_bytes=0)
    now = T0
    _run(spark, sd, ["a", "b"], [], pol, now)               # doorkeeper
    now += MIN
    hot, _, _ = _run(spark, sd, ["a", "b"], [], pol, now)    # admitted
    assert hot == ["a", "b"]
    hosted = ["a", "b"]
    for _ in range(4):                                       # build priority
        now += MIN
        hot, cold, ev = _run(spark, sd, ["a", "b"], hosted, pol, now)
        assert hot == ["a", "b"] and ev == []
    # newcomer with one admitted visit cannot out-prioritize (strict >)
    now += MIN
    _run(spark, sd, ["c"], hosted, pol, now)                 # doorkeeper
    now += MIN
    hot, cold, ev = _run(spark, sd, ["c"], hosted, pol, now)
    assert hot == [] and cold == ["c"] and ev == []
    # keep hitting c while a/b idle: decayed counts eventually cross,
    # and the MINIMUM hosted entity is evicted (tie -> key asc = "a")
    evicted = None
    for _ in range(200):
        now += MIN
        hot, cold, ev = _run(spark, sd, ["c"], hosted, pol, now)
        if ev:
            evicted = (hot, ev)
            break
    assert evicted == (["c"], ["a"])


def test_run_once_stateful_cache_policy_bounds_models(spark, tmp_path):
    from anomaly_detection_spark.detector import Detector, run_once_stateful

    base = pd.Timestamp("2025-03-01")
    rows = []
    for h in range(40):
        for ent in ("a", "b", "c"):
            for i in range(3):
                rows.append((ent, base + pd.Timedelta(hours=h, minutes=i),
                             float(10 + i)))
    pdf = pd.DataFrame(rows, columns=["service", "ts", "value"])
    path = str(tmp_path / "events")
    spark.createDataFrame(pdf).write.parquet(path)
    det = Detector(
        detector_id="det-cache", indices=path,
        feature_specs={"n": {"value_count": {"field": "value"}}},
        time_field="ts", interval_ms=3600_000,
        category_fields=("service",), shingle_size=4)
    t0 = int(base.value // 1_000_000)

    # permissive policy (slots cover all entities, doorkeeper off)
    # must equal the uncached run row-for-row
    sd_p, sd_n = str(tmp_path / "sp"), str(tmp_path / "sn")
    permissive = CachePolicy(dedicated_cache_size=10,
                             doorkeeper_count_threshold=0)
    for h in range(1, 10):
        now = t0 + h * 3600_000
        a = run_once_stateful(spark, det, now, sd_p,
                              cache_policy=permissive).toPandas()
        b = run_once_stateful(spark, det, now, sd_n).toPandas()
        pd.testing.assert_frame_equal(
            a.drop(columns=["entity"]).sort_values("service")
            .reset_index(drop=True),
            b.drop(columns=["entity"]).sort_values("service")
            .reset_index(drop=True))

    # one-slot budget: exactly one entity ever holds state rows
    sd_1 = str(tmp_path / "s1")
    tight = CachePolicy(dedicated_cache_size=1,
                        doorkeeper_count_threshold=0)
    for h in range(1, 10):
        res = run_once_stateful(spark, det, t0 + h * 3600_000, sd_1,
                                cache_policy=tight)
        assert res.select("service").distinct().count() <= 1
    state = spark.read.parquet(sd_1 + "/det-cache")
    assert state.select("service").distinct().count() == 1
    # deterministic winner: first fill is priority-tie -> key asc
    assert state.select("service").first().service == "a"


def _write_cache(spark, state_dir, det_id, rows, landmark):
    """rows: (service, priority, hosted) with dk_count=5 (past gate)."""
    from anomaly_detection_spark.caching import _cache_path

    pdf = pd.DataFrame(rows, columns=["service", "priority", "hosted"])
    pdf["dk_count"] = 5
    pdf["landmark_ms"] = landmark
    pdf["dk_reset_ms"] = landmark
    pdf["last_hit_ms"] = landmark
    (spark.createDataFrame(pdf)
     .select("service", "dk_count", "priority", "hosted",
             "landmark_ms", "dk_reset_ms", "last_hit_ms")
     .write.mode("overwrite").parquet(_cache_path(state_dir, det_id)))


def _write_state(spark, state_dir, det_id, services):
    from anomaly_detection_spark.detector import _state_path

    pdf = pd.DataFrame({"service": services, "_feat": "v",
                        "last_ms": T0, "scored_cnt": 40})
    (spark.createDataFrame(pdf).write.mode("overwrite")
     .parquet(_state_path(state_dir, det_id)))


def test_rebalance_shared_cache_cross_detector(spark, tmp_path):
    from anomaly_detection_spark.caching import rebalance_shared_cache
    from anomaly_detection_spark.detector import _state_path

    sd = str(tmp_path)
    now = T0 + 10 * MIN
    # A hosts a1 (dedicated) + a2 (shared incumbent, scaled 2.0);
    # B hosts b1 (dedicated) and tracks candidate b2 (scaled 5.0)
    _write_cache(spark, sd, "A", [("a1", 10.0, True), ("a2", 2.0, True)],
                 T0)
    _write_cache(spark, sd, "B", [("b1", 50.0, True), ("b2", 5.0, False)],
                 T0)
    _write_state(spark, sd, "A", ["a1", "a2"])
    _write_state(spark, sd, "B", ["b1"])
    pol = CachePolicy(dedicated_cache_size=1, model_bytes=1)
    policies, report = rebalance_shared_cache(
        spark, sd, [("A", pol), ("B", pol)], shared_memory_bytes=1,
        now_ms=now, interval_ms=MIN)
    # strictly greater candidate evicts the other detector's minimum
    assert report["A"] == {"admitted": [], "evicted": [("a2",)]}
    assert report["B"] == {"admitted": [("b2",)], "evicted": []}
    assert policies["A"].shared_memory_bytes == 0
    assert policies["B"].shared_memory_bytes == 1
    # the evicted entity's model rows are GONE; the dedicated one stays
    sa = spark.read.parquet(_state_path(sd, "A")).toPandas()
    assert sorted(sa["service"]) == ["a1"]
    # cache flags track the arbitration
    from anomaly_detection_spark.caching import _cache_path
    ca = spark.read.parquet(_cache_path(sd, "A")).toPandas()
    assert not ca.set_index("service")["hosted"]["a2"]
    cb = spark.read.parquet(_cache_path(sd, "B")).toPandas()
    assert cb.set_index("service")["hosted"]["b2"]


def test_rebalance_ties_keep_incumbent_and_dedicated_is_free(
        spark, tmp_path):
    from anomaly_detection_spark.caching import rebalance_shared_cache

    sd = str(tmp_path)
    now = T0 + 10 * MIN
    # equal scaled priorities: the incumbent wins (strict-greater rule)
    _write_cache(spark, sd, "A", [("a1", 10.0, True), ("a2", 5.0, True)],
                 T0)
    _write_cache(spark, sd, "B", [("b1", 50.0, True), ("b2", 5.0, False)],
                 T0)
    _write_state(spark, sd, "A", ["a1", "a2"])
    pol = CachePolicy(dedicated_cache_size=1, model_bytes=1)
    policies, report = rebalance_shared_cache(
        spark, sd, [("A", pol), ("B", pol)], shared_memory_bytes=1,
        now_ms=now, interval_ms=MIN)
    assert report["A"]["evicted"] == [] and report["B"]["admitted"] == []
    assert policies["A"].shared_memory_bytes == 1
    # a candidate with free dedicated slots is admitted WITHOUT
    # consuming shared bytes (dedicatedCacheAvailable -> put)
    _write_cache(spark, sd, "C", [("c1", 0.5, False)], T0)
    policies, report = rebalance_shared_cache(
        spark, sd, [("A", pol), ("C", pol)], shared_memory_bytes=1,
        now_ms=now, interval_ms=MIN)
    assert report["C"]["admitted"] == [("c1",)]
    assert policies["C"].shared_memory_bytes == 0


def test_rebalance_scaled_priority_compares_across_landmarks(
        spark, tmp_path):
    from anomaly_detection_spark.caching import rebalance_shared_cache

    sd = str(tmp_path)
    # A's landmark is 16 intervals older -> inc(A) = 2, inc(B) = 0:
    # a2 raw 5.0 scales to 3.0; b2 raw 4.0 scales to 4.0 and wins
    # despite the lower raw priority
    now = T0 + 16 * 8 * MIN  # inc = 16 periods >> 3 = 2
    _write_cache(spark, sd, "A", [("a1", 99.0, True), ("a2", 5.0, True)],
                 T0)
    _write_cache(spark, sd, "B", [("b1", 99.0, True), ("b2", 4.0, False)],
                 now)
    _write_state(spark, sd, "A", ["a1", "a2"])
    pol = CachePolicy(dedicated_cache_size=1, model_bytes=1)
    _, report = rebalance_shared_cache(
        spark, sd, [("A", pol), ("B", pol)], shared_memory_bytes=1,
        now_ms=now, interval_ms=MIN)
    assert report["A"]["evicted"] == [("a2",)]
    assert report["B"]["admitted"] == [("b2",)]


def test_run_once_stateful_joint_cache_policy_bounds_models(
        spark, tmp_path):
    from anomaly_detection_spark.detector import (Detector,
                                                  run_once_stateful_joint)
    from anomaly_detection_spark.features import rcf_stream_factory

    base = pd.Timestamp("2025-03-01")
    rows = []
    for h in range(12):
        for ent in ("a", "b", "c"):
            for i in range(3):
                rows.append((ent, base + pd.Timedelta(hours=h, minutes=i),
                             float(10 + i)))
    pdf = pd.DataFrame(rows, columns=["service", "ts", "value"])
    path = str(tmp_path / "events")
    spark.createDataFrame(pdf).write.parquet(path)
    det = Detector(
        detector_id="det-jc", indices=path,
        feature_specs={"n": {"value_count": {"field": "value"}}},
        time_field="ts", interval_ms=3600_000,
        category_fields=("service",), shingle_size=4)
    t0 = int(base.value // 1_000_000)
    factory = rcf_stream_factory(n_trees=5, sample_size=32,
                                 shingle=2, seed=7)
    # one-slot budget: exactly one entity ever holds joint state rows
    sd = str(tmp_path / "s1")
    tight = CachePolicy(dedicated_cache_size=1,
                        doorkeeper_count_threshold=0)
    for h in range(1, 8):
        res = run_once_stateful_joint(
            spark, det, t0 + h * 3600_000, sd,
            stream_factory=factory, cache_policy=tight)
        assert res.select("service").distinct().count() <= 1
    state = spark.read.parquet(sd + "/det-jc__joint")
    assert state.select("service").distinct().count() == 1
    assert state.select("service").first().service == "a"
