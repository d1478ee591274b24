"""Detector job lifecycle (JobProcessor.java / Job.java analog):
create/start/stop, due-interval ticking over run_once_stateful,
lease-based locking, and the EndRunException stop protocol (soft
failures stop the job only after 6 consecutive occurrences; endNow
stops immediately; transient errors never stop it)."""

import numpy as np
import pandas as pd
import pytest

from anomaly_detection_spark.detector import Detector
from anomaly_detection_spark.jobs import (
    MAX_RETRY_FOR_END_RUN_EXCEPTION,
    EndRunError,
    JobStore,
)

INTERVAL = 60_000


@pytest.fixture(scope="module")
def source(spark, tmp_path_factory):
    rng = np.random.default_rng(61)
    n = 200
    base = pd.Timestamp("2025-01-01")
    pdf = pd.DataFrame({
        "ts": [base + pd.Timedelta(milliseconds=i * INTERVAL)
               for i in range(n)],
        "v": 50.0 + rng.normal(0, 1, n),
    })
    path = str(tmp_path_factory.mktemp("jobsrc") / "events")
    spark.createDataFrame(pdf).write.parquet(path)
    return path, int(base.value // 10**6), n


def _det(path, det_id="job-det"):
    return Detector(detector_id=det_id, indices=path,
                    feature_specs={"f": {"avg": {"field": "v"}}},
                    time_field="ts", interval_ms=INTERVAL)


def test_job_lifecycle_and_tick(spark, tmp_path, source):
    path, start_ms, n = source
    store = JobStore(str(tmp_path / "jobs"))
    det = _det(path)
    now = start_ms + 50 * INTERVAL
    doc = store.create_job(det, now)
    assert doc["enabled"] and doc["enabled_time"] == now
    assert doc["schedule_interval_ms"] == INTERVAL
    assert store.list_jobs() == ["job-det"]

    res = store.tick(spark, now, str(tmp_path / "state"))
    assert set(res) == {"job-det"}
    # same now → interval already run → not due
    assert store.tick(spark, now, str(tmp_path / "state")) == {}
    assert store.get_job("job-det")["last_end_ms"] == \
        (now // INTERVAL) * INTERVAL
    # next interval → due again
    res = store.tick(spark, now + INTERVAL, str(tmp_path / "state"))
    assert set(res) == {"job-det"}

    store.stop_job("job-det", now + 2 * INTERVAL)
    assert store.tick(spark, now + 2 * INTERVAL,
                      str(tmp_path / "state")) == {}
    doc = store.get_job("job-det")
    assert not doc["enabled"] and doc["disabled_time"] == now + 2 * INTERVAL
    store.start_job("job-det", now + 3 * INTERVAL)
    assert store.get_job("job-det")["enabled"]


def test_lock_lease_blocks_until_expiry(spark, tmp_path, source):
    path, start_ms, _ = source
    store = JobStore(str(tmp_path / "jobs"))
    store.create_job(_det(path, "locked"), start_ms, lock_duration_s=120)
    now = start_ms + 40 * INTERVAL
    doc = store.get_job("locked")
    doc["lock_until_ms"] = now + 60_000         # someone else holds it
    store._write(doc)
    assert store.tick(spark, now, str(tmp_path / "state")) == {}
    # lease expired → stealable
    later = now + 61_000
    res = store.tick(spark, later, str(tmp_path / "state"))
    assert set(res) == {"locked"}
    assert store.get_job("locked")["lock_until_ms"] == 0   # released


def test_end_run_protocol(spark, tmp_path, source):
    path, start_ms, _ = source
    store = JobStore(str(tmp_path / "jobs"))
    store.create_job(_det(path, "erj"), start_ms)

    calls = {"n": 0}

    def soft_fail(spark_, det, now_ms, state_dir, scorer_factory=None):
        calls["n"] += 1
        raise EndRunError("bad feature query")

    # six consecutive soft failures: still enabled, count climbing
    now = start_ms + 30 * INTERVAL
    for i in range(MAX_RETRY_FOR_END_RUN_EXCEPTION):
        store.tick(spark, now + i * INTERVAL, str(tmp_path / "s"),
                   runner=soft_fail)
        doc = store.get_job("erj")
        assert doc["enabled"] and doc["end_run_count"] == i + 1
        assert "bad feature query" in doc["last_error"]
    # the 7th stops the job (count > max)
    store.tick(spark, now + 6 * INTERVAL, str(tmp_path / "s"),
               runner=soft_fail)
    doc = store.get_job("erj")
    assert not doc["enabled"]
    assert calls["n"] == 7


def test_failed_interval_not_retried_within_interval(spark, tmp_path,
                                                     source):
    """The EndRun budget burns once per SCHEDULED interval, not once
    per tick call: ticking every few seconds inside one interval
    attempts the job once (the scheduler fires per interval)."""
    path, start_ms, _ = source
    store = JobStore(str(tmp_path / "jobs"))
    store.create_job(_det(path, "gate"), start_ms)
    calls = {"n": 0}

    def soft_fail(*a, **k):
        calls["n"] += 1
        raise EndRunError("soft")

    now = start_ms + 30 * INTERVAL
    for sec in range(0, 50, 10):          # five ticks, same interval
        store.tick(spark, now + sec * 1000, str(tmp_path / "s"),
                   runner=soft_fail)
    doc = store.get_job("gate")
    assert calls["n"] == 1 and doc["end_run_count"] == 1
    assert doc["enabled"]
    # next interval → one more attempt
    store.tick(spark, now + INTERVAL, str(tmp_path / "s"),
               runner=soft_fail)
    assert calls["n"] == 2
    assert store.get_job("gate")["end_run_count"] == 2


def test_concurrent_stop_survives_running_tick(spark, tmp_path, source):
    """A stop_job issued while the tick's runner is executing must not
    be clobbered when the tick releases the lease (the tick re-reads
    the doc and writes only the fields it owns)."""
    path, start_ms, _ = source
    store = JobStore(str(tmp_path / "jobs"))
    store.create_job(_det(path, "race"), start_ms)
    now = start_ms + 30 * INTERVAL

    def stopper(spark_, det, now_ms, state_dir, scorer_factory=None):
        # simulates a user stopping the job mid-run
        store.stop_job("race", now_ms)
        from anomaly_detection_spark.detector import run_once_stateful
        return run_once_stateful(spark_, det, now_ms, state_dir)

    res = store.tick(spark, now, str(tmp_path / "s"), runner=stopper)
    assert set(res) == {"race"}
    doc = store.get_job("race")
    assert not doc["enabled"]             # the stop survived
    assert doc["disabled_time"] == now
    assert doc["lock_until_ms"] == 0      # lease still released
    assert doc["last_end_ms"] == (now // INTERVAL) * INTERVAL


def test_transient_error_resets_count_and_stays_enabled(
        spark, tmp_path, source):
    path, start_ms, _ = source
    store = JobStore(str(tmp_path / "jobs"))
    store.create_job(_det(path, "trj"), start_ms)
    now = start_ms + 30 * INTERVAL

    def soft_fail(*a, **k):
        raise EndRunError("soft")

    def transient(*a, **k):
        raise TimeoutError("source briefly unreachable")

    store.tick(spark, now, str(tmp_path / "s"), runner=soft_fail)
    assert store.get_job("trj")["end_run_count"] == 1
    store.tick(spark, now + INTERVAL, str(tmp_path / "s"),
               runner=transient)
    doc = store.get_job("trj")
    assert doc["enabled"] and doc["end_run_count"] == 0
    assert "TimeoutError" in doc["last_error"]
    # a real success clears the error
    res = store.tick(spark, now + 2 * INTERVAL, str(tmp_path / "s"))
    assert set(res) == {"trj"}
    assert store.get_job("trj")["last_error"] is None


def test_end_now_stops_immediately(spark, tmp_path, source):
    path, start_ms, _ = source
    store = JobStore(str(tmp_path / "jobs"))
    store.create_job(_det(path, "enj"), start_ms)

    def hard_fail(*a, **k):
        raise EndRunError("model memory limit", end_now=True)

    store.tick(spark, start_ms + 30 * INTERVAL, str(tmp_path / "s"),
               runner=hard_fail)
    doc = store.get_job("enj")
    assert not doc["enabled"] and doc["end_run_count"] == 0
    assert "model memory" in doc["last_error"]


def test_tick_results_match_run_once_stateful(spark, tmp_path, source):
    """The tick's result rows ARE run_once_stateful's (same state dir
    → same scores), so the scheduler wrapper adds no semantics."""
    from anomaly_detection_spark.detector import run_once_stateful

    path, start_ms, _ = source
    store = JobStore(str(tmp_path / "jobs"))
    det = _det(path, "par")
    store.create_job(det, start_ms)
    now = start_ms + 60 * INTERVAL
    # warm both state dirs identically over 10 consecutive intervals
    rows_tick, rows_direct = [], []
    for i in range(10):
        t = now + i * INTERVAL
        res = store.tick(spark, t, str(tmp_path / "st_tick"))
        if res:
            rows_tick.extend(res["par"].select(
                "bucket_start", "anomaly_score").collect())
        rows_direct.extend(run_once_stateful(
            spark, det, t, str(tmp_path / "st_direct")).select(
            "bucket_start", "anomaly_score").collect())
    assert rows_tick == rows_direct


def test_prune_state_expires_stale_entities(spark, tmp_path):
    """Checkpoint TTL maintenance (AD_CHECKPOINT_TTL analog): entities
    whose state wasn't updated within the TTL are dropped; active
    entities keep scoring with their model state intact; pruned entities
    cold-start on return."""
    import pandas as pd

    from anomaly_detection_spark.detector import (
        Detector,
        prune_state,
        run_once_stateful,
    )

    rng = np.random.default_rng(73)
    base = pd.Timestamp("2025-01-01")
    n = 40
    rows = []
    for i in range(n):
        ts = base + pd.Timedelta(milliseconds=i * INTERVAL)
        rows.append({"ts": ts, "service": "live", "v": 10 + rng.normal()})
        if i < 20:                      # "gone" stops emitting halfway
            rows.append({"ts": ts, "service": "gone",
                         "v": 20 + rng.normal()})
    path = str(tmp_path / "events")
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(path)
    det = Detector(detector_id="ttl", indices=path,
                   feature_specs={"f": {"avg": {"field": "v"}}},
                   time_field="ts", interval_ms=INTERVAL,
                   category_fields=("service",))
    start_ms = int(base.value // 10**6)
    sd = str(tmp_path / "state")
    for i in range(1, n + 1):
        run_once_stateful(spark, det, start_ms + i * INTERVAL, sd)
    state = spark.read.parquet(sd + "/ttl")
    assert set(r.service for r in state.select("service").collect()) \
        == {"live", "gone"}
    # 'gone' last updated at interval start 19·I; now = 40·I, so a
    # TTL of 20 intervals (cutoff 20·I) expires it while 'live'
    # (last_ms 39·I) survives
    now = start_ms + n * INTERVAL
    pruned = prune_state(spark, "ttl", sd, now, ttl_ms=20 * INTERVAL)
    assert pruned == 1
    state = spark.read.parquet(sd + "/ttl")
    assert set(r.service for r in state.select("service").collect()) \
        == {"live"}
    # idempotent; live keeps its shingle history (scores next interval)
    assert prune_state(spark, "ttl", sd, now, ttl_ms=20 * INTERVAL) == 0
    res = run_once_stateful(spark, det, now + INTERVAL, sd)
    assert res.count() == 0 or set(
        r.service for r in res.select("service").collect()) <= {"live"}


def test_profile_reports_job_state(spark, tmp_path, source):
    """profile_detector overlays the job doc: a stopped job reports
    DISABLED (the reference's ProfileRunner reads the Job), and the
    job's last_error surfaces as the profile error field."""
    from anomaly_detection_spark.profile import profile_detector

    path, start_ms, _ = source
    store = JobStore(str(tmp_path / "jobs"))
    det = _det(path, "pj")
    store.create_job(det, start_ms)
    now = start_ms + 40 * INTERVAL
    store.tick(spark, now, str(tmp_path / "state"))

    p = profile_detector(spark, det, str(tmp_path / "state"),
                         job_store=store)
    assert p["state"] in ("INIT", "RUNNING", "READY")
    assert "error" not in p

    store.stop_job("pj", now + INTERVAL, reason="user stop")
    p2 = profile_detector(spark, det, str(tmp_path / "state"),
                          job_store=store)
    assert p2["state"] == "DISABLED"
    assert p2["error"] == "user stop"
    # no job registered → unchanged model-derived state
    det2 = _det(path, "unregistered")
    p3 = profile_detector(spark, det2, str(tmp_path / "state"),
                          job_store=store)
    assert p3["state"] == "INIT"


def test_tick_schedules_joint_runner(spark, tmp_path, source):
    """The joint stateful path wires into the scheduler through the
    same runner seam (tick passes scorer_factory=...), including the
    single-feature case; threshold mismatches are rejected up front."""
    from anomaly_detection_spark.detector import (
        Detector,
        run_once_stateful_joint,
    )
    from anomaly_detection_spark.features import rcf_stream_factory

    path, start_ms, _ = source
    store = JobStore(str(tmp_path / "jobs"))
    det = _det(path, "joint-job")
    store.create_job(det, start_ms)
    factory = rcf_stream_factory(shingle=4, n_trees=5, sample_size=32,
                                 min_samples=8, n_features=1, seed=31)
    now = start_ms + 60 * INTERVAL
    ran = 0
    for i in range(30):
        res = store.tick(spark, now + i * INTERVAL,
                         str(tmp_path / "state"),
                         scorer_factory=factory,
                         runner=run_once_stateful_joint)
        doc = store.get_job("joint-job")
        assert doc["last_error"] is None, doc["last_error"]
        if res and res["joint-job"].count():
            ran += 1
    assert ran > 5                      # warm-up passed, scores flowing
    # the joint state landed under the __joint suffix and is visible
    # to profile + prune
    from anomaly_detection_spark.detector import prune_state
    from anomaly_detection_spark.profile import profile_detector

    p = profile_detector(spark, det, str(tmp_path / "state"),
                         job_store=store)
    assert p["model_count"] == 1 and p["total_model_bytes"] > 0
    assert p["state"] in ("RUNNING", "READY")
    assert prune_state(spark, "joint-job", str(tmp_path / "state"),
                       now + 100 * INTERVAL, ttl_ms=5 * INTERVAL) == 1
    # threshold wiring rejected up front (grade would outrun attribution)
    bad = rcf_stream_factory(n_features=2, alert_threshold=4.0)
    with pytest.raises(ValueError, match="alert_threshold"):
        run_once_stateful_joint(spark, det, now, str(tmp_path / "s2"),
                                stream_factory=bad)


def test_tick_shared_cache_arbitration(spark, tmp_path, source):
    """tick(shared_cache=) rebalances the global pool across the
    enabled jobs' detectors and hands each runner its awarded
    policy."""
    from anomaly_detection_spark.caching import CachePolicy, _cache_path

    path, start_ms, n = source
    store = JobStore(str(tmp_path / "jobs"))
    state_dir = str(tmp_path / "state")
    det_a, det_b = _det(path, "sc-a"), _det(path, "sc-b")
    now = start_ms + 50 * INTERVAL
    store.create_job(det_a, now)
    store.create_job(det_b, now)
    # pre-seeded trackers: A hosts a low-priority shared incumbent,
    # B tracks a strictly stronger candidate
    import os

    os.makedirs(state_dir, exist_ok=True)

    def _cache(det_id, rows):
        pdf = pd.DataFrame(rows,
                           columns=["service", "priority", "hosted"])
        pdf["dk_count"] = 5
        pdf["landmark_ms"] = start_ms
        pdf["dk_reset_ms"] = start_ms
        pdf["last_hit_ms"] = start_ms
        (spark.createDataFrame(pdf)
         .write.mode("overwrite")
         .parquet(_cache_path(state_dir, det_id)))

    _cache("sc-a", [("a1", 10.0, True), ("a2", 2.0, True)])
    _cache("sc-b", [("b1", 50.0, True), ("b2", 5.0, False)])
    pol = CachePolicy(dedicated_cache_size=1, model_bytes=1)
    got: dict = {}

    def runner(spark_, det, now_ms, sd, scorer_factory=None,
               cache_policy=None, **kw):
        got[det.detector_id] = cache_policy
        from anomaly_detection_spark.detector import run_once_stateful
        return run_once_stateful(spark_, det, now_ms, sd)

    res = store.tick(spark, now, state_dir, runner=runner,
                     shared_cache=(1, pol))
    assert set(res) == {"sc-a", "sc-b"}
    # B won the single shared slot; A keeps only its dedicated one
    assert got["sc-a"].shared_memory_bytes == 0
    assert got["sc-b"].shared_memory_bytes == 1
    ca = spark.read.parquet(_cache_path(state_dir, "sc-a")).toPandas()
    assert not ca.set_index("service")["hosted"]["a2"]
