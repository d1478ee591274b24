"""Historical cold-start training on the stateful realtime path
(ModelColdStart.java analogs): a cold-started state equals the state a
sequential interval-by-interval run builds, for both the z-window and
the checkpointed RCF model family; interior gaps interpolate."""

import numpy as np
import pandas as pd

from anomaly_detection_spark.detector import Detector, run_once_stateful

INTERVAL = 600_000
BASE = pd.Timestamp("2025-05-01")
BASE_MS = int(BASE.value // 10**6)


def _write(spark, tmp_path_factory, rows):
    pdf = pd.DataFrame(rows, columns=["service", "i", "value"])
    pdf["ts"] = [BASE + pd.Timedelta(milliseconds=int(i) * INTERVAL)
                 for i in pdf["i"]]
    path = str(tmp_path_factory.mktemp("cs") / "events")
    spark.createDataFrame(pdf[["service", "ts", "value"]]) \
        .write.parquet(path)
    return path


def _det(path, det_id):
    return Detector(
        detector_id=det_id, indices=path,
        feature_specs={"v": {"avg": {"field": "value"}}},
        time_field="ts", interval_ms=INTERVAL,
        category_fields=("service",), shingle_size=4, confidence_ramp=8)


def _state_pdf(spark, state_dir, det_id):
    from anomaly_detection_spark.detector import _state_path

    return (spark.read.parquet(_state_path(state_dir, det_id))
            .toPandas().sort_values(["service", "_feat"])
            .reset_index(drop=True))


def test_cold_start_equals_sequential_zpath(spark, tmp_path_factory):
    rng = np.random.default_rng(11)
    rows = [(svc, i, float(v))
            for svc in ("A", "B")
            for i, v in enumerate(rng.normal(10, 1, 12))]
    # entity C appears late: data only from interval 6 on
    rows += [("C", i, float(v))
             for i, v in zip(range(6, 12), rng.normal(5, 1, 6))]
    path = _write(spark, tmp_path_factory, rows)

    seq_state = str(tmp_path_factory.mktemp("cs_seq"))
    det_seq = _det(path, "cs-seq")
    last = None
    for i in range(12):
        last = run_once_stateful(
            spark, det_seq, BASE_MS + (i + 1) * INTERVAL + 1, seq_state)
    seq_rows = sorted(last.select(
        "service", "anomaly_score", "confidence").collect())

    cold_state = str(tmp_path_factory.mktemp("cs_cold"))
    det_cold = _det(path, "cs-cold")
    cold = run_once_stateful(
        spark, det_cold, BASE_MS + 12 * INTERVAL + 1, cold_state,
        cold_start_history=64)
    cold_rows = sorted(cold.select(
        "service", "anomaly_score", "confidence").collect())
    assert cold_rows == seq_rows

    st_seq = _state_pdf(spark, seq_state, "cs-seq")
    st_cold = _state_pdf(spark, cold_state, "cs-cold")
    assert list(st_cold["service"]) == list(st_seq["service"])
    for a, b in zip(st_cold["vals"], st_seq["vals"]):
        assert list(a) == list(b)
    assert list(st_cold["scored_cnt"]) == list(st_seq["scored_cnt"])
    # and the NEXT interval continues identically from either state
    nxt_seq = sorted(run_once_stateful(
        spark, det_seq, BASE_MS + 12 * INTERVAL + 1, seq_state)
        .select("service", "anomaly_score").collect())
    # (cold's 12th interval == seq's 12th interval already shown; this
    # checks the cold state replays idempotently too)
    nxt_cold = sorted(run_once_stateful(
        spark, det_cold, BASE_MS + 12 * INTERVAL + 1, cold_state,
        cold_start_history=64)
        .select("service", "anomaly_score").collect())
    assert nxt_cold == nxt_seq


def test_cold_start_equals_sequential_rcf(spark, tmp_path_factory):
    from anomaly_detection_spark.features import rcf_stream_factory

    rng = np.random.default_rng(13)
    rows = [("A", i, float(v))
            for i, v in enumerate(rng.normal(10, 1, 40))]
    path = _write(spark, tmp_path_factory, rows)
    factory = rcf_stream_factory(n_trees=10, sample_size=64,
                                 shingle=4, min_samples=8)

    seq_state = str(tmp_path_factory.mktemp("csr_seq"))
    det_seq = _det(path, "csr-seq")
    last = None
    for i in range(40):
        last = run_once_stateful(
            spark, det_seq, BASE_MS + (i + 1) * INTERVAL + 1, seq_state,
            scorer_factory=factory)
    seq_rows = sorted(last.select("service", "anomaly_score").collect())

    cold_state = str(tmp_path_factory.mktemp("csr_cold"))
    det_cold = _det(path, "csr-cold")
    cold = run_once_stateful(
        spark, det_cold, BASE_MS + 40 * INTERVAL + 1, cold_state,
        scorer_factory=factory, cold_start_history=64)
    cold_rows = sorted(cold.select("service", "anomaly_score").collect())
    assert cold_rows == seq_rows
    st_seq = _state_pdf(spark, seq_state, "csr-seq")
    st_cold = _state_pdf(spark, cold_state, "csr-cold")
    assert bytes(st_cold["model"].iloc[0]) == bytes(st_seq["model"].iloc[0])
    assert st_cold["scored_cnt"].iloc[0] == st_seq["scored_cnt"].iloc[0]


def test_cold_start_interpolates_interior_gap(spark, tmp_path_factory):
    # history 0..9 with bucket 5 missing; values = 2*i so the
    # interpolated point is exactly 10.0
    rows = [("A", i, float(2 * i)) for i in range(10) if i != 5]
    rows += [("A", 10, 20.0)]
    path = _write(spark, tmp_path_factory, rows)
    state = str(tmp_path_factory.mktemp("csg"))
    det = _det(path, "cs-gap")
    run_once_stateful(spark, det, BASE_MS + 11 * INTERVAL + 1, state,
                      cold_start_history=64)
    st = _state_pdf(spark, state, "cs-gap")
    # window = last 4 of the dense grid 0..9 (interior 5 interpolated)
    # then the live interval 10 appended: [14, 16, 18, 20]
    assert list(st["vals"].iloc[0]) == [14.0, 16.0, 18.0, 20.0]
    # scored count: dense grid scores buckets 4..9 (6) + live (1)
    assert st["scored_cnt"].iloc[0] == 7


def test_cold_start_existing_entities_untouched(spark, tmp_path_factory):
    rng = np.random.default_rng(17)
    rows = [("A", i, float(v)) for i, v in enumerate(rng.normal(10, 1, 8))]
    path = _write(spark, tmp_path_factory, rows)
    state = str(tmp_path_factory.mktemp("cse"))
    det = _det(path, "cs-ex")
    # warm A over two live intervals WITHOUT cold start
    run_once_stateful(spark, det, BASE_MS + 1 * INTERVAL + 1, state)
    run_once_stateful(spark, det, BASE_MS + 2 * INTERVAL + 1, state)
    before = _state_pdf(spark, state, "cs-ex")
    # enabling cold start later must not retrain the existing state
    run_once_stateful(spark, det, BASE_MS + 3 * INTERVAL + 1, state,
                      cold_start_history=64)
    after = _state_pdf(spark, state, "cs-ex")
    assert list(after["vals"].iloc[0]) == \
        list(before["vals"].iloc[0]) + [after["vals"].iloc[0][-1]]
    assert after["scored_cnt"].iloc[0] <= before["scored_cnt"].iloc[0] + 1


def test_cold_start_joint_equals_sequential(spark, tmp_path_factory):
    from anomaly_detection_spark.detector import run_once_stateful_joint
    from anomaly_detection_spark.features import rcf_stream_factory

    rng = np.random.default_rng(19)
    n = 40
    pdf = pd.DataFrame({
        "service": "A",
        "ts": [BASE + pd.Timedelta(milliseconds=i * INTERVAL)
               for i in range(n)],
        "value": rng.normal(10, 1, n),
        "lat": rng.normal(100, 5, n),
    })
    path = str(tmp_path_factory.mktemp("csj") / "events")
    spark.createDataFrame(pdf).write.parquet(path)

    def det(det_id):
        return Detector(
            detector_id=det_id, indices=path,
            feature_specs={"v": {"avg": {"field": "value"}},
                           "l": {"avg": {"field": "lat"}}},
            time_field="ts", interval_ms=INTERVAL,
            category_fields=("service",), shingle_size=4,
            confidence_ramp=8)

    def factory():
        return rcf_stream_factory(n_trees=10, sample_size=64,
                                  shingle=4, min_samples=8,
                                  n_features=2)

    seq_state = str(tmp_path_factory.mktemp("csj_seq"))
    last = None
    for i in range(n):
        last = run_once_stateful_joint(
            spark, det("csj-seq"), BASE_MS + (i + 1) * INTERVAL + 1,
            seq_state, stream_factory=factory())
    seq_rows = sorted(last.select("service", "anomaly_score",
                                  "confidence").collect())

    cold_state = str(tmp_path_factory.mktemp("csj_cold"))
    cold = run_once_stateful_joint(
        spark, det("csj-cold"), BASE_MS + n * INTERVAL + 1, cold_state,
        stream_factory=factory(), cold_start_history=64)
    cold_rows = sorted(cold.select("service", "anomaly_score",
                                   "confidence").collect())
    assert cold_rows == seq_rows

    from anomaly_detection_spark.detector import _state_path
    sA = spark.read.parquet(
        _state_path(seq_state, "csj-seq__joint")).toPandas()
    sB = spark.read.parquet(
        _state_path(cold_state, "csj-cold__joint")).toPandas()
    assert bytes(sB["model"].iloc[0]) == bytes(sA["model"].iloc[0])
    assert sB["scored_cnt"].iloc[0] == sA["scored_cnt"].iloc[0]


def test_tick_cold_start_passthrough(spark, tmp_path_factory):
    from anomaly_detection_spark.jobs import JobStore
    from anomaly_detection_spark.profile import profile_detector

    rng = np.random.default_rng(23)
    rows = [("A", i, float(v)) for i, v in enumerate(rng.normal(10, 1, 30))]
    path = _write(spark, tmp_path_factory, rows)
    state = str(tmp_path_factory.mktemp("tcs"))
    det = _det(path, "tick-cs")
    jobs = JobStore(str(tmp_path_factory.mktemp("tcs_jobs")))
    jobs.create_job(det, BASE_MS)
    # one tick at interval 20, cold-starting from the 20 prior buckets
    jobs.tick(spark, BASE_MS + 21 * INTERVAL + 1, state,
              cold_start_history=64)
    p = profile_detector(spark, det, state)
    # 20 history buckets → 16 scored + live = 17 >= ramp 8 → READY
    assert p["state"] == "READY" and p["init_progress"] == 1.0
    assert "init_progress_detail" not in p

    # a fresh detector with no runs reports the InitProgressProfile
    det2 = _det(path, "tick-cs2")
    run_once_stateful(spark, det2, BASE_MS + 6 * INTERVAL + 1, state)
    p2 = profile_detector(spark, det2, state)
    assert p2["state"] == "RUNNING"
    d = p2["init_progress_detail"]
    assert d["percentage"] == p2["init_progress"]
    assert d["needed_intervals"] == 8
    assert d["estimated_minutes_left"] == 80.0
