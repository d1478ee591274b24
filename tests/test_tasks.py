"""Task lifecycle (ad/task analogs): tracked historical analysis with
progress/cancel/resume, task profile, realtime task refresh."""

import os

import numpy as np
import pandas as pd
import pytest

from anomaly_detection_spark.detector import Detector, run_historical
from anomaly_detection_spark.tasks import (
    TaskStore,
    profile_task,
    start_historical_task,
    update_realtime_task,
)

INTERVAL = 600_000
BASE = pd.Timestamp("2025-04-01")
BASE_MS = int(BASE.value // 10**6)
N_INTERVALS = 64


def _events(spark, tmp_path_factory, n=N_INTERVALS):
    rng = np.random.default_rng(7)
    frames = []
    for svc in ("A", "B"):
        frames.append(pd.DataFrame({
            "service": svc,
            "ts": [BASE + pd.Timedelta(milliseconds=i * INTERVAL)
                   for i in range(n)],
            "value": rng.normal(10.0, 1.0, n),
        }))
    path = str(tmp_path_factory.mktemp("task_ev") / "events")
    spark.createDataFrame(pd.concat(frames)).write.parquet(path)
    return path


def _det(path, det_id="task-det"):
    return Detector(
        detector_id=det_id, indices=path,
        feature_specs={"v": {"avg": {"field": "value"}}},
        time_field="ts", interval_ms=INTERVAL,
        category_fields=("service",), shingle_size=4, confidence_ramp=8)


class RecordingStore(TaskStore):
    """Capture every update for state/progress sequence assertions."""

    def __init__(self, tasks_dir):
        super().__init__(tasks_dir, clock=lambda: 777_000)
        self.history = []

    def update_task(self, task_id, **fields):
        doc = super().update_task(task_id, **fields)
        self.history.append(dict(doc))
        return doc


def test_historical_task_lifecycle(spark, tmp_path_factory):
    path = _events(spark, tmp_path_factory)
    state = str(tmp_path_factory.mktemp("task_state"))
    results = str(tmp_path_factory.mktemp("task_res"))
    store = RecordingStore(str(tmp_path_factory.mktemp("tasks")))
    det = _det(path)
    end_ms = BASE_MS + N_INTERVALS * INTERVAL

    # reference refuses spans under NUM_MIN_SAMPLES intervals
    with pytest.raises(ValueError, match="not enough data"):
        start_historical_task(spark, store, det, BASE_MS,
                              BASE_MS + 10 * INTERVAL, state, results)

    doc, res = start_historical_task(
        spark, store, det, BASE_MS, end_ms, state, results,
        piece_intervals=16)
    assert doc["state"] == "FINISHED"
    assert doc["task_type"] == "HISTORICAL_HC_DETECTOR"
    assert doc["task_progress"] == 1.0
    assert doc["current_piece"] == end_ms
    assert doc["init_progress"] == 1.0        # 61 scored >= 32
    assert doc["execution_end_time"] is not None
    assert doc["is_latest"] is True
    assert doc["detection_date_range"] == {"start_time": BASE_MS,
                                           "end_time": end_ms}
    assert res is not None and res.count() > 0

    # progress advanced monotonically piece by piece, INIT before
    # RUNNING (init_progress crosses 1.0 at the 36th scored bucket,
    # inside piece 3 of 4)
    seq = [h for h in store.history if h["task_id"] == doc["task_id"]
           and h["state"] in ("INIT", "RUNNING", "FINISHED")]
    progress = [h["task_progress"] for h in seq]
    assert progress == sorted(progress)
    states = [h["state"] for h in seq]
    assert "INIT" in states and "RUNNING" in states
    assert states.index("RUNNING") > states.index("INIT")
    assert [h["current_piece"] for h in seq if h["state"] != "CREATED"][-1] \
        == end_ms

    # a second analysis flips is_latest off the first (ADTaskManager)
    results2 = str(tmp_path_factory.mktemp("task_res2"))
    doc2, _ = start_historical_task(
        spark, store, det, BASE_MS, end_ms, state, results2,
        piece_intervals=16)
    assert doc2["task_id"] != doc["task_id"]
    assert doc2["is_latest"] is True
    assert store.get_task(doc["task_id"])["is_latest"] is False
    assert store.latest_task(det.detector_id)["task_id"] == doc2["task_id"]

    # task profile: doc + model substrate summary
    prof = profile_task(spark, store, doc2["task_id"], det, state)
    assert prof["task"]["state"] == "FINISHED"
    assert prof["total_entities_count"] == 2
    assert prof["model_count"] == 2


def test_historical_task_cancel_then_resume(spark, tmp_path_factory):
    path = _events(spark, tmp_path_factory)
    state = str(tmp_path_factory.mktemp("tc_state"))
    results = str(tmp_path_factory.mktemp("tc_res"))
    tasks_dir = str(tmp_path_factory.mktemp("tc_tasks"))
    det = _det(path, "task-cancel")
    end_ms = BASE_MS + N_INTERVALS * INTERVAL

    class CancelAfterFirstPiece(TaskStore):
        def update_task(self, task_id, **fields):
            doc = super().update_task(task_id, **fields)
            if (fields.get("task_progress", 0) and doc["cancelled"]
                    is False and doc["state"] in ("INIT", "RUNNING")):
                doc = self.cancel_task(task_id, stopped_by="tester")
            return doc

    store = CancelAfterFirstPiece(tasks_dir, clock=lambda: 1_000)
    doc, res = start_historical_task(
        spark, store, det, BASE_MS, end_ms, state, results,
        piece_intervals=16)
    assert res is None
    assert doc["state"] == "STOPPED"
    assert doc["stopped_by"] == "tester"
    assert doc["error"] == "Task cancelled by user"
    # exactly one piece ran before the flag was observed
    done = [f for f in os.listdir(results) if f.endswith(".done")]
    assert done == ["_piece_0.done"]
    # stopping an ended task rejects
    with pytest.raises(ValueError, match="already ended"):
        store.cancel_task(doc["task_id"], stopped_by="tester")

    # resume: a fresh task over the same results dir skips the done
    # piece and produces results identical to an untracked full run
    store2 = TaskStore(tasks_dir, clock=lambda: 2_000)
    doc2, res2 = start_historical_task(
        spark, store2, det, BASE_MS, end_ms, state, results,
        piece_intervals=16)
    assert doc2["state"] == "FINISHED"
    assert store2.get_task(doc["task_id"])["is_latest"] is False

    det_twin = _det(path, "task-twin")
    twin_state = str(tmp_path_factory.mktemp("tc_twin_state"))
    twin_res = str(tmp_path_factory.mktemp("tc_twin_res"))
    twin = run_historical(spark, det_twin, BASE_MS, end_ms,
                          twin_state, twin_res, piece_intervals=16)
    a = sorted(res2.select("service", "bucket_start", "anomaly_score")
               .collect())
    b = sorted(twin.select("service", "bucket_start", "anomaly_score")
               .collect())
    assert a == b


def test_historical_task_failure_recorded(spark, tmp_path_factory):
    store = TaskStore(str(tmp_path_factory.mktemp("tf_tasks")),
                      clock=lambda: 3_000)
    det = _det("/nonexistent/path/events", "task-fail")
    with pytest.raises(Exception):
        start_historical_task(
            spark, store, det, BASE_MS,
            BASE_MS + N_INTERVALS * INTERVAL,
            str(tmp_path_factory.mktemp("tf_state")),
            str(tmp_path_factory.mktemp("tf_res")))
    doc = store.latest_task("task-fail")
    assert doc["state"] == "FAILED"
    assert doc["error"]
    assert doc["execution_end_time"] == 3_000


def test_realtime_task_via_job_tick(spark, tmp_path_factory):
    from anomaly_detection_spark.jobs import JobStore

    path = _events(spark, tmp_path_factory, n=12)
    state = str(tmp_path_factory.mktemp("rt_state"))
    det = _det(path, "rt-det")
    jobs = JobStore(str(tmp_path_factory.mktemp("rt_jobs")))
    tasks = TaskStore(str(tmp_path_factory.mktemp("rt_tasks")),
                      clock=lambda: 4_000)
    jobs.create_job(det, BASE_MS)

    jobs.tick(spark, BASE_MS + INTERVAL + 1, state, task_store=tasks)
    doc = tasks.latest_task("rt-det", prefix="REALTIME")
    assert doc is not None
    assert doc["task_type"] == "REALTIME_HC_DETECTOR"
    assert doc["state"] == "INIT"          # far below 32 updates
    assert doc["init_progress"] < 1.0

    jobs.tick(spark, BASE_MS + 2 * INTERVAL + 1, state,
              task_store=tasks)
    doc2 = tasks.latest_task("rt-det", prefix="REALTIME")
    assert doc2["task_id"] == doc["task_id"]   # refreshed, not re-created

    # stop: the latest realtime task transitions to STOPPED
    stopped = update_realtime_task(spark, tasks, det, state,
                                   stopped=True)
    assert stopped["state"] == "STOPPED"
    # stop again: no-op on an ended task
    again = update_realtime_task(spark, tasks, det, state, stopped=True)
    assert again["state"] == "STOPPED"


def test_stop_and_delete_detector(spark, tmp_path_factory):
    from anomaly_detection_spark.detector import _state_path
    from anomaly_detection_spark.jobs import JobStore
    from anomaly_detection_spark.tasks import (delete_detector,
                                               stop_detector)

    path = _events(spark, tmp_path_factory, n=12)
    state = str(tmp_path_factory.mktemp("sd_state"))
    det = _det(path, "sd-det")
    jobs = JobStore(str(tmp_path_factory.mktemp("sd_jobs")))
    tasks = TaskStore(str(tmp_path_factory.mktemp("sd_tasks")),
                      clock=lambda: 5_000)
    jobs.create_job(det, BASE_MS)
    jobs.tick(spark, BASE_MS + INTERVAL + 1, state, task_store=tasks)
    # a crashed historical run leaves a not-ended task doc behind
    crashed = tasks._new_task(det, "HISTORICAL_HC_DETECTOR",
                              "HISTORICAL", {})
    tasks.update_task(crashed["task_id"], state="INIT")

    # delete while the job is enabled refuses, reference message shape
    with pytest.raises(ValueError, match="Job is running"):
        delete_detector(spark, jobs, tasks, det, state)

    out = stop_detector(spark, jobs, tasks, det, state, BASE_MS,
                        stopped_by="ops")
    assert out["job_stopped"] is True
    assert jobs.get_job("sd-det")["enabled"] is False
    assert out["realtime_task"]["state"] == "STOPPED"
    assert out["historical_task"]["state"] == "STOPPED"
    assert out["historical_task"]["stopped_by"] == "ops"
    assert out["historical_task"]["cancelled"] is True
    # idempotent: nothing left running
    out2 = stop_detector(spark, jobs, tasks, det, state, BASE_MS)
    assert out2["job_stopped"] is False
    assert out2["historical_task"]["state"] == "STOPPED"

    # a fresh not-ended historical blocks delete even with the job off
    crashed2 = tasks._new_task(det, "HISTORICAL_HC_DETECTOR",
                               "HISTORICAL", {})
    tasks.update_task(crashed2["task_id"], state="RUNNING")
    with pytest.raises(ValueError, match="Historical is running"):
        delete_detector(spark, jobs, tasks, det, state)
    tasks.update_task(crashed2["task_id"], state="STOPPED")

    assert os.path.exists(_state_path(state, "sd-det"))
    delete_detector(spark, jobs, tasks, det, state)
    assert tasks.list_tasks("sd-det") == []
    assert "sd-det" not in jobs.list_jobs()
    assert not os.path.exists(_state_path(state, "sd-det"))
    # deleting an already-deleted detector is a no-op
    delete_detector(spark, jobs, tasks, det, state)


def test_run_once_forecast_task(spark, tmp_path_factory):
    from anomaly_detection_spark.forecast import (Forecaster,
                                                  holt_forecaster)
    from anomaly_detection_spark.tasks import run_once_forecast_task

    n = 120
    vals = 10.0 + 0.5 * np.arange(n)
    pdf = pd.DataFrame({
        "service": "A",
        "ts": [BASE + pd.Timedelta(milliseconds=i * INTERVAL)
               for i in range(n)],
        "value": vals,
    })
    path = str(tmp_path_factory.mktemp("rof") / "events")
    spark.createDataFrame(pdf).write.parquet(path)
    fc = Forecaster(
        forecaster_id="rof-fc", indices=path,
        feature_specs={"v": {"avg": {"field": "value"}}},
        time_field="ts", interval_ms=INTERVAL, horizon=6,
        category_fields=("service",))
    store = TaskStore(str(tmp_path_factory.mktemp("rof_tasks")),
                      clock=lambda: 6_000)
    now = BASE_MS + n * INTERVAL + 1
    doc, res = run_once_forecast_task(
        spark, store, fc, now, forecaster=holt_forecaster(6))
    assert doc["task_type"] == "RUN_ONCE_FORECAST_HC_FORECASTER"
    assert doc["state"] == "TEST_COMPLETE"
    assert doc["task_progress"] == 1.0
    assert doc["detector_id"] == "rof-fc"
    assert res.count() == 6

    # failure path: unreadable source → INIT_TEST_FAILED, error kept
    bad = Forecaster(
        forecaster_id="rof-bad", indices="/nonexistent/rof",
        feature_specs={"v": {"avg": {"field": "value"}}},
        time_field="ts", interval_ms=INTERVAL, horizon=6)
    with pytest.raises(Exception):
        run_once_forecast_task(spark, store, bad, now)
    fdoc = store.latest_task("rof-bad", prefix="RUN_ONCE")
    assert fdoc["task_type"] == "RUN_ONCE_FORECAST_SINGLE_STREAM"
    assert fdoc["state"] == "INIT_TEST_FAILED"
    assert fdoc["error"]
