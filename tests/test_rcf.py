"""Random Cut Forest internals: tree invariants under insert/delete,
reservoir bounds, determinism, duplicate handling, checkpoint
round-trip, and anomaly response on a planted spike."""

import pickle
import random

import numpy as np
import pytest

from anomaly_detection_spark.features.rcf import (
    RandomCutTree,
    RCFStream,
    StreamingRCF,
    rcf_scorer,
)


def _check_tree(t: RandomCutTree):
    """Masses = leaf counts below; bboxes = union of points below."""
    if t.root < 0:
        return 0

    def rec(n):
        if t.point[n] is not None:
            assert t.mass[n] >= 1
            assert t.bbmin[n] == list(t.point[n])
            return t.mass[n], list(t.point[n]), list(t.point[n])
        lm, lmin, lmax = rec(t.left[n])
        rm, rmin, rmax = rec(t.right[n])
        assert t.parent[t.left[n]] == n and t.parent[t.right[n]] == n
        assert t.mass[n] == lm + rm, "internal mass mismatch"
        want_min = [min(a, b) for a, b in zip(lmin, rmin)]
        want_max = [max(a, b) for a, b in zip(lmax, rmax)]
        assert t.bbmin[n] == pytest.approx(want_min)
        assert t.bbmax[n] == pytest.approx(want_max)
        # children straddle the cut
        d, c = t.cutdim[n], t.cutval[n]
        assert t.bbmax[t.left[n]][d] <= c < t.bbmax[n][d] + 1e-9
        assert t.bbmin[t.right[n]][d] > c
        return lm + rm, want_min, want_max

    m, _, _ = rec(t.root)
    return m


def test_tree_invariants_random_insert_delete():
    rng = random.Random(3)
    nrng = np.random.default_rng(5)
    t = RandomCutTree(3, rng)
    live = []
    for step in range(600):
        if live and (rng.random() < 0.4 or len(live) > 80):
            i = rng.randrange(len(live))
            leaf, p = live.pop(i)
            t.delete(leaf)
        else:
            p = tuple(np.round(nrng.normal(0, 1, 3), 3).tolist())
            live.append((t.insert(p), p))
        if step % 97 == 0:
            assert _check_tree(t) == len(live)
    assert _check_tree(t) == len(live)


def test_tree_duplicate_mass():
    t = RandomCutTree(2, random.Random(1))
    p = (1.0, 2.0)
    ids = [t.insert(p) for _ in range(5)]
    assert len(set(ids)) == 1
    assert t.total_mass == 5
    t.insert((0.0, 0.0))
    assert t.total_mass == 6
    for _ in range(4):
        t.delete(ids[0])
    assert t.total_mass == 2
    assert _check_tree(t) == 2


def test_forest_reservoir_bounded_and_deterministic():
    f1 = StreamingRCF(2, n_trees=5, sample_size=32, seed=7)
    f2 = StreamingRCF(2, n_trees=5, sample_size=32, seed=7)
    rng = np.random.default_rng(0)
    pts = [tuple(x) for x in rng.normal(0, 1, (300, 2))]
    s1 = [f1.score_and_update(p)[0] for p in pts]
    s2 = [f2.score_and_update(p)[0] for p in pts]
    assert s1 == s2, "same seed must replay identically"
    for t in f1.trees:
        assert t.total_mass <= 32


def test_stream_flags_planted_spike():
    rng = np.random.default_rng(42)
    vals = rng.normal(100.0, 2.0, 600)
    vals[500] = 160.0                       # 30-sigma spike
    sc = rcf_scorer(shingle=8, n_trees=15, sample_size=64)
    z, exp = sc(vals)
    assert np.isnan(z[:7]).all()            # shingle warm-up
    assert abs(z[500]) > 3.0, z[500]
    normal = np.abs(np.nan_to_num(z[:499]))
    assert (normal > abs(z[500])).sum() == 0
    # expected value tracks the normal level, not the spike
    assert abs(exp[500] - 100.0) < 20.0


def test_stream_checkpoint_roundtrip_identical():
    rng = np.random.default_rng(9)
    vals = rng.normal(0, 1, 300)
    a = RCFStream(shingle=4, n_trees=5, sample_size=32, seed=3)
    b = RCFStream(shingle=4, n_trees=5, sample_size=32, seed=3)
    for v in vals[:150]:
        a.update(v)
        b.update(v)
    b = RCFStream.from_bytes(b.to_bytes())   # checkpoint + restore
    za = [a.update(v) for v in vals[150:]]
    zb = [b.update(v) for v in vals[150:]]
    assert za == zb


def test_stream_constant_series_no_blowup():
    sc = rcf_scorer(shingle=4, n_trees=5, sample_size=16, min_samples=8)
    z, exp = sc(np.full(200, 7.0))
    z = np.nan_to_num(z)
    assert (np.abs(z) < 3.0).all()


def test_alert_once_suppresses_continuation():
    rng = np.random.default_rng(1)
    vals = rng.normal(50.0, 1.0, 400)
    vals[300:310] = 90.0                    # sustained shift
    sc = rcf_scorer(shingle=8, n_trees=15, sample_size=64)
    z, _ = sc(vals)
    run = np.abs(np.nan_to_num(z[300:310]))
    assert run[0] > 3.0                     # onset alerts
    assert (run > 3.0).sum() <= 3, run      # continuations suppressed


def test_from_bytes_rejects_garbage():
    with pytest.raises(Exception):
        RCFStream.from_bytes(pickle.dumps({"not": "a stream"}))


def test_rcf_preview_equals_historical(spark, tmp_path_factory):
    """preview (whole-series scorer) and run_historical (piece-wise with
    checkpoint/restore between pieces) must produce identical scores —
    the checkpoint round-trip is exact, so piecing cannot change z."""
    import pandas as pd

    from anomaly_detection_spark.detector import (
        Detector,
        preview,
        run_historical,
    )
    from anomaly_detection_spark.features import (
        rcf_scorer,
        rcf_stream_factory,
    )

    rng = np.random.default_rng(7)
    n, interval_ms = 500, 60_000
    base = pd.Timestamp("2025-01-01")
    vals = 50.0 + 5.0 * np.sin(np.arange(n) / 20.0) + rng.normal(0, 1, n)
    vals[400] += 40.0
    pdf = pd.DataFrame({
        "ts": [base + pd.Timedelta(milliseconds=i * interval_ms)
               for i in range(n)],
        "v": vals,
    })
    path = str(tmp_path_factory.mktemp("rcfid") / "events")
    spark.createDataFrame(pdf).write.parquet(path)
    det = Detector(
        detector_id="rcf-id", indices=path,
        feature_specs={"f": {"avg": {"field": "v"}}},
        time_field="ts", interval_ms=interval_ms, anomaly_threshold=3.0)
    conf = dict(shingle=8, n_trees=5, sample_size=32)

    res_p = (preview(spark, det, scorer=rcf_scorer(**conf))
             .select("bucket_start", "anomaly_score", "anomaly_grade",
                     "confidence").toPandas()
             .sort_values("bucket_start").reset_index(drop=True))
    wd = tmp_path_factory.mktemp("rcfhist")
    start_ms = int(base.value // 10**6)
    res_h = (run_historical(
        spark, det, start_ms, start_ms + n * interval_ms,
        state_dir=str(wd / "state"), results_dir=str(wd / "results"),
        piece_intervals=137,           # uneven pieces on purpose
        scorer_factory=rcf_stream_factory(**conf))
        .select("bucket_start", "anomaly_score", "anomaly_grade",
                "confidence").toPandas()
        .sort_values("bucket_start").reset_index(drop=True))

    assert len(res_p) == len(res_h) > 400
    assert (res_p.bucket_start == res_h.bucket_start).all()
    assert np.allclose(res_p.anomaly_score, res_h.anomaly_score)
    assert np.allclose(res_p.anomaly_grade, res_h.anomaly_grade)
    assert np.allclose(res_p.confidence, res_h.confidence)
    assert (res_p.anomaly_grade > 0).sum() >= 1   # the spike alerts


def test_rcf_historical_linear_imputation_matches_preview(
        spark, tmp_path_factory):
    """run_historical with LINEAR imputation on the checkpointed-RCF
    path equals the imputing preview — the up-front fill table feeds
    the same ingest recurrence the scorer seam runs, including a gap
    that spans the uneven piece boundary (intervals 136-138 with
    piece_intervals=137)."""
    import pandas as pd

    from anomaly_detection_spark.detector import (
        Detector,
        preview,
        run_historical,
    )
    from anomaly_detection_spark.features import (
        rcf_scorer,
        rcf_stream_factory,
    )

    rng = np.random.default_rng(11)
    n, interval_ms = 400, 60_000
    base = pd.Timestamp("2025-03-01")
    vals = 20.0 + 3.0 * np.sin(np.arange(n) / 15.0) + rng.normal(0, 0.5, n)
    vals[350] += 25.0
    gaps = {60, 136, 137, 138, 250}         # 136-138 spans the boundary
    pdf = pd.DataFrame({
        "ts": [base + pd.Timedelta(milliseconds=i * interval_ms)
               for i in range(n) if i not in gaps],
        "v": [v for i, v in enumerate(vals) if i not in gaps],
    })
    path = str(tmp_path_factory.mktemp("rcflin") / "events")
    spark.createDataFrame(pdf).write.parquet(path)
    det = Detector(
        detector_id="rcf-lin", indices=path,
        feature_specs={"f": {"avg": {"field": "v"}}},
        time_field="ts", interval_ms=interval_ms, anomaly_threshold=3.0,
        imputation_method="linear")
    conf = dict(shingle=8, n_trees=5, sample_size=32)

    res_p = (preview(spark, det, scorer=rcf_scorer(**conf))
             .select("bucket_start", "anomaly_score", "f",
                     "feature_imputed").toPandas()
             .sort_values("bucket_start").reset_index(drop=True))
    wd = tmp_path_factory.mktemp("rcflinh")
    start_ms = int(base.value // 10**6)
    res_h = (run_historical(
        spark, det, start_ms, start_ms + n * interval_ms,
        state_dir=str(wd / "state"), results_dir=str(wd / "results"),
        piece_intervals=137,
        scorer_factory=rcf_stream_factory(**conf))
        .select("bucket_start", "anomaly_score", "f",
                "feature_imputed").toPandas()
        .sort_values("bucket_start").reset_index(drop=True))

    assert len(res_p) == len(res_h) > 350    # gap buckets present too
    assert (res_p.bucket_start == res_h.bucket_start).all()
    assert np.allclose(res_p.anomaly_score, res_h.anomaly_score)
    assert np.allclose(res_p.f, res_h.f)
    flags_p = [tuple(e["imputed"] for e in fi)
               for fi in res_p.feature_imputed]
    flags_h = [tuple(e["imputed"] for e in fi)
               for fi in res_h.feature_imputed]
    assert flags_p == flags_h
    assert sum(f[0] for f in flags_h) == len(gaps)  # every gap scored


def test_rcf_stateful_sequence_matches_preview(spark, tmp_path_factory):
    """run_once_stateful with the checkpointed RCF stream, called once
    per interval in order, must reproduce preview's RCF rows exactly —
    and a retried interval must replay, not double-update the model."""
    import pandas as pd

    from anomaly_detection_spark.detector import (
        Detector,
        preview,
        run_once_stateful,
    )
    from anomaly_detection_spark.features import (
        rcf_scorer,
        rcf_stream_factory,
    )

    rng = np.random.default_rng(3)
    n, interval_ms = 60, 60_000
    base = pd.Timestamp("2025-04-01")
    vals = 20.0 + rng.normal(0, 1, n)
    vals[50] += 30.0
    pdf = pd.DataFrame({
        "ts": [base + pd.Timedelta(milliseconds=i * interval_ms)
               for i in range(n)],
        "v": vals,
    })
    path = str(tmp_path_factory.mktemp("rcfst") / "events")
    spark.createDataFrame(pdf).write.parquet(path)
    det = Detector(
        detector_id="rcf-st", indices=path,
        feature_specs={"f": {"avg": {"field": "v"}}},
        time_field="ts", interval_ms=interval_ms, anomaly_threshold=3.0,
        confidence_ramp=8)
    conf = dict(shingle=4, n_trees=5, sample_size=16, min_samples=8)
    want = (preview(spark, det, scorer=rcf_scorer(**conf))
            .select("bucket_start", "anomaly_score", "anomaly_grade")
            .toPandas().sort_values("bucket_start").reset_index(drop=True))

    state = str(tmp_path_factory.mktemp("rcfst_state"))
    base_ms = int(base.value // 10**6)
    got_rows = []
    fac = rcf_stream_factory(**conf)
    for i in range(n):
        now = base_ms + (i + 1) * interval_ms + 1
        df = run_once_stateful(spark, det, now, state,
                               scorer_factory=fac)
        out = df.select("bucket_start", "anomaly_score",
                        "anomaly_grade").collect()
        if i == 30:   # retry mid-sequence: must replay identically
            out2 = run_once_stateful(spark, det, now, state,
                                     scorer_factory=fac) \
                .select("bucket_start", "anomaly_score",
                        "anomaly_grade").collect()
            assert [tuple(r) for r in out2] == [tuple(r) for r in out]
        got_rows.extend((r["bucket_start"], r["anomaly_score"],
                         r["anomaly_grade"]) for r in out)
    import pandas as _pd

    got = (_pd.DataFrame(got_rows, columns=["bucket_start",
                                            "anomaly_score",
                                            "anomaly_grade"])
           .sort_values("bucket_start").reset_index(drop=True))
    assert len(got) == len(want) > 40
    assert np.allclose(got.anomaly_score, want.anomaly_score)
    assert np.allclose(got.anomaly_grade, want.anomaly_grade)
    assert (got.anomaly_grade > 0).any()      # the spike alerts


def test_joint_rcf_preview_two_features(spark, tmp_path_factory):
    """Joint multivariate scoring (one model per entity over the
    feature vector): a correlated two-feature break that neither
    feature flags alone is flagged jointly; F=1 joint equals the
    univariate scorer's z sequence (same forest dims, same seed)."""
    import pandas as pd

    from anomaly_detection_spark.detector import Detector, preview
    from anomaly_detection_spark.features import (
        rcf_scorer,
        rcf_scorer_joint,
    )

    rng = np.random.default_rng(11)
    n, interval_ms = 400, 60_000
    base = pd.Timestamp("2025-05-01")
    a = rng.normal(10.0, 1.0, n)
    b = 2.0 * a + rng.normal(0.0, 0.2, n)   # tightly correlated
    # break at t=350: a high while b crashes — the joint point lands
    # outside the normalized box corner (+4σ, −4σ), the off-manifold
    # shape a joint forest isolates in two cuts.  (A within-box
    # correlation break scores only mildly — box-based isolation is
    # edge-sensitive, a characteristic shared with the reference's
    # model.)
    a[350], b[350] = 14.0, 12.0
    pdf = pd.DataFrame({
        "ts": [base + pd.Timedelta(milliseconds=i * interval_ms)
               for i in range(n)],
        "a": a, "b": b,
    })
    path = str(tmp_path_factory.mktemp("rcfjoint") / "events")
    spark.createDataFrame(pdf).write.parquet(path)
    det = Detector(
        detector_id="rcf-joint", indices=path,
        feature_specs={"fa": {"avg": {"field": "a"}},
                       "fb": {"avg": {"field": "b"}}},
        time_field="ts", interval_ms=interval_ms, anomaly_threshold=3.0)
    conf = dict(shingle=4, n_trees=15, sample_size=64)
    res = (preview(spark, det, scorer=rcf_scorer_joint(2, **conf))
           .toPandas().sort_values("bucket_start").reset_index(drop=True))
    assert len(res) > 300
    idx = (res.bucket_start.map(pd.Timestamp) - base) \
        .dt.total_seconds() // 60
    broke = res[idx == 350]
    assert len(broke) == 1
    assert broke.iloc[0].anomaly_grade > 0, broke.iloc[0].anomaly_score

    # F=1 joint ≡ univariate (same dims/seed → same float sequence)
    det1 = Detector(
        detector_id="rcf-j1", indices=path,
        feature_specs={"fa": {"avg": {"field": "a"}}},
        time_field="ts", interval_ms=interval_ms, anomaly_threshold=3.0)
    r_joint = (preview(spark, det1, scorer=rcf_scorer_joint(1, **conf))
               .select("bucket_start", "anomaly_score").toPandas()
               .sort_values("bucket_start").reset_index(drop=True))
    r_uni = (preview(spark, det1, scorer=rcf_scorer(**conf))
             .select("bucket_start", "anomaly_score").toPandas()
             .sort_values("bucket_start").reset_index(drop=True))
    assert len(r_joint) == len(r_uni)
    assert np.allclose(r_joint.anomaly_score, r_uni.anomaly_score)
