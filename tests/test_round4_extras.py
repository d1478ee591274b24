"""Round-4 extras: date_histogram time_zone/offset, interval
suggestion, and detector config validation."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

HOUR = 3_600_000
DAY = 24 * HOUR


def _events(spark, stamps_ms, values=None):
    rows = [(i, int(t), float(values[i] if values else i))
            for i, t in enumerate(stamps_ms)]
    return spark.createDataFrame(rows, "event_id long, ms long, v double") \
        .select("event_id", F.timestamp_millis("ms").alias("ts"), "v")


# --- date_histogram time_zone / offset ---------------------------------------


def test_date_histogram_fixed_offset_and_timezone(spark):
    from anomaly_detection_spark.query.aggs import date_histogram

    base = 1_740_787_200_000  # 2025-03-01T00:00:00Z (midnight UTC)
    # events at 22:00 and 23:30 UTC on the previous day + 00:30 today
    df = _events(spark, [base - 2 * HOUR, base - HOUR // 2,
                         base + HOUR // 2])

    # daily buckets at UTC midnight: events split 2 | 1
    utc = date_histogram(df, "ts", DAY, min_doc_count=1).toPandas()
    assert sorted(utc.doc_count) == [1, 2]

    # +02:00: local midnight = 22:00 UTC → boundaries at 22:00; all
    # three events land in ONE local day [22:00, 22:00+24h)
    tz = date_histogram(df, "ts", DAY, min_doc_count=1,
                        time_zone="+02:00").toPandas()
    assert list(tz.doc_count) == [3]
    assert pd.Timestamp(tz.bucket_start.iloc[0]) == pd.Timestamp(
        base - 2 * HOUR, unit="ms")

    # offset shifts the grid the other way (boundary at 00:30 UTC)
    off = date_histogram(df, "ts", DAY, min_doc_count=1,
                         offset_ms=HOUR // 2).toPandas()
    off = off.sort_values("bucket_start").reset_index(drop=True)
    assert list(off.doc_count) == [2, 1]
    assert pd.Timestamp(off.bucket_start.iloc[1]) == pd.Timestamp(
        base + HOUR // 2, unit="ms")

    # minDocCount(0) dense grid sits on the shifted boundaries too
    dense = date_histogram(df, "ts", DAY, time_zone="+02:00").toPandas()
    assert list(dense.doc_count) == [3]

    with pytest.raises(ValueError, match="fixed-offset"):
        date_histogram(df, "ts", DAY, time_zone="America/Los_Angeles")


def test_calendar_histogram_named_timezone_dst(spark):
    from anomaly_detection_spark.query.aggs import date_histogram_calendar

    # US DST change 2025-03-09: America/Los_Angeles is UTC-8 before,
    # UTC-7 after.  Events at 07:30 UTC on Mar 8 (23:30 local Mar 7!)
    # and 07:30 UTC on Mar 10 (00:30 local Mar 10).
    t1 = int(pd.Timestamp("2025-03-08T07:30:00Z").value // 10**6)
    t2 = int(pd.Timestamp("2025-03-10T07:30:00Z").value // 10**6)
    df = _events(spark, [t1, t2])
    out = date_histogram_calendar(
        df, "ts", "month", time_zone="America/Los_Angeles").toPandas()
    # both fall in local March; the month bucket starts at local
    # Mar-1 midnight = 08:00 UTC (PST)
    assert list(out.doc_count) == [2]
    assert pd.Timestamp(out.bucket_start.iloc[0]) == pd.Timestamp(
        "2025-03-01T08:00:00")

    # body compiler wiring
    from anomaly_detection_spark.query.aggs_body import run_aggs

    got = run_aggs(df, {"aggs": {"m": {"date_histogram": {
        "field": "ts", "calendar_interval": "month",
        "time_zone": "America/Los_Angeles"}}}})["m"].toPandas()
    assert list(got.doc_count) == [2]


# --- suggest_interval (IntervalCalculation parity) ---------------------------


def test_suggest_interval_recovers_cadence(spark):
    from anomaly_detection_spark.validation import suggest_interval

    base = 1_740_787_200_000
    # clean 10-minute cadence, 500 points
    ten = _events(spark, [base + i * 600_000 for i in range(500)])
    got = suggest_interval(ten, "ts")
    assert got is not None and 5 <= got <= 20, got

    # hourly cadence with jitter ±2 min
    import random

    rng = random.Random(7)
    hourly = _events(spark, [base + i * HOUR
                             + rng.randint(-120_000, 120_000)
                             for i in range(300)])
    got_h = suggest_interval(hourly, "ts")
    assert got_h is not None and 30 <= got_h <= 120, got_h

    # degenerate inputs → None
    assert suggest_interval(_events(spark, [base]), "ts") is None
    assert suggest_interval(_events(spark, [base, base]), "ts") is None


def test_validate_detector_reports_issues_and_interval(spark, tmp_path):
    from anomaly_detection_spark.detector import Detector
    from anomaly_detection_spark.validation import validate_detector

    base = 1_740_787_200_000
    src = str(tmp_path / "ev")
    _events(spark, [base + i * 600_000 for i in range(200)]) \
        .write.parquet(src)

    ok = Detector(detector_id="d", indices=src,
                  feature_specs={"v_avg": {"avg": {"field": "v"}}},
                  time_field="ts")
    rep = validate_detector(spark, ok)
    assert rep["issues"] == {}
    assert 5 <= rep["suggested_interval_minutes"] <= 20

    bad = Detector(detector_id="d", indices=src,
                   feature_specs={"f": {"avg": {"field": "nope"}},
                                  "g": {"median": {"field": "v"}}},
                   time_field="event_id",
                   filter_query={"frobnicate": {"x": 1}},
                   category_fields=("missing_col",))
    rep2 = validate_detector(spark, bad)
    assert "time_field" in rep2["issues"]
    assert "filter_query" in rep2["issues"]
    assert "feature:f" in rep2["issues"] and "feature:g" in rep2["issues"]
    assert "category:missing_col" in rep2["issues"]

    gone = validate_detector(spark, Detector(
        detector_id="d", indices=str(tmp_path / "nope"),
        feature_specs={"v": {"avg": {"field": "v"}}}))
    assert "indices" in gone["issues"]


# --- IVF ANN (the clustering-structure scale path) ---------------------------


def test_ivf_ann_recall_and_determinism(spark):
    from anomaly_detection_spark.pipeline import (
        cosine_topk_bruteforce, ivf_ann_topk, ivf_assign, ivf_centroids)

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk_bruteforce(embs, queries, k=5).toPandas()

    got = ivf_ann_topk(embs, queries, k=5, n_lists=16, n_probe=6,
                       seed=13).toPandas()
    # candidates are exact-reranked → emitted (query, vec, cosine)
    # triples are a subset of the truth's score values
    exact_pairs = {(r.query_id, r.vec_id): r.cosine
                   for r in exact.itertuples()}
    hits = sum((r.query_id, r.vec_id) in exact_pairs
               for r in got.itertuples())
    recall = hits / len(exact)
    assert recall >= 0.6, recall
    for r in got.itertuples():
        if (r.query_id, r.vec_id) in exact_pairs:
            assert abs(r.cosine - exact_pairs[(r.query_id, r.vec_id)]) < 1e-9

    # deterministic: same seed → identical results
    again = ivf_ann_topk(embs, queries, k=5, n_lists=16, n_probe=6,
                         seed=13).toPandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), again.reset_index(drop=True))

    # probing every list ≡ brute force (sanity: rerank is exact)
    full = ivf_ann_topk(embs, queries, k=5, n_lists=8, n_probe=8,
                        seed=13).toPandas()
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), exact.reset_index(drop=True))

    # amortized index reuse path gives identical answers
    cents = ivf_centroids(embs, n_lists=16, seed=13)
    assigned = ivf_assign(embs, cents).persist()
    reuse = ivf_ann_topk(embs, queries, k=5, n_probe=6,
                         centroids=cents, assigned=assigned).toPandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), reuse.reset_index(drop=True))
    assigned.unpersist()


# --- streaming detector (realtime detection as one stateful stream) ----------


def test_streaming_detector_matches_preview(spark, tmp_path):
    """Raw events stream → one applyInPandasWithState operator doing
    bucket partials + trailing-z scoring in state; emitted rows must
    match detector.preview exactly.  Files arrive one per trigger so
    the watermark advances across micro-batches and event-time
    timeouts flush quiet entities."""
    from anomaly_detection_spark.detector import Detector, preview
    from anomaly_detection_spark.streaming.stateful import streaming_detector

    base = pd.Timestamp("2025-03-01")
    rows = []
    eid = 0
    for ent in ("A", "B"):
        for h in range(20):
            n = 100 if (ent == "B" and h == 15) else 5
            for i in range(n):
                rows.append((eid, ent,
                             base + pd.Timedelta(hours=h, minutes=i % 50),
                             float(10 + i % 3)))
                eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "service", "ts", "value"])
    src_path = str(tmp_path / "stream_src")
    # several single files in STRICT time order (explicit mtimes: the
    # file source orders by modification time, and a late-arriving
    # early file would be dropped by the watermark) → several
    # micro-batches → the watermark actually advances between triggers
    import glob
    import os
    import shutil
    import time as _time

    os.makedirs(src_path)
    t0 = _time.time()
    for part, lo in enumerate(range(0, 20, 4)):
        chunk = pdf[(pdf.ts >= base + pd.Timedelta(hours=lo))
                    & (pdf.ts < base + pd.Timedelta(hours=lo + 4))]
        wtmp = str(tmp_path / f"_w{part}")
        spark.createDataFrame(chunk).coalesce(1) \
            .write.mode("overwrite").parquet(wtmp)
        pf = glob.glob(wtmp + "/part-*.parquet")[0]
        dst = os.path.join(src_path, f"chunk-{part:03d}.parquet")
        shutil.copy(pf, dst)
        os.utime(dst, (t0 + part, t0 + part))

    det = Detector(
        detector_id="d", indices=src_path,
        feature_specs={"v_avg": {"avg": {"field": "value"}}},
        time_field="ts", interval_ms=3_600_000,
        category_fields=("service",), shingle_size=8)
    want = preview(spark, det).toPandas()
    want = want.set_index([want.service, want.bucket_start.map(pd.Timestamp)])

    batch_schema = spark.read.parquet(src_path).schema
    stream = (spark.readStream.schema(batch_schema)
              .option("maxFilesPerTrigger", 1).parquet(src_path))
    scored = streaming_detector(
        stream.withWatermark("ts", "1 minute"),
        ts_col="ts", interval_ms=3_600_000, agg="avg",
        value_col="value", entity_col="service", k=8)
    q = (scored.writeStream.outputMode("append").format("memory")
         .queryName("det_stream_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select * from det_stream_out").toPandas()

    # the final interval can stay open (watermark never passes it);
    # everything emitted must match preview bit-for-bit
    assert len(got) >= len(want) - 2, (len(got), len(want))
    for r in got.itertuples():
        w = want.loc[(r.service, pd.Timestamp(r.bucket_start))]
        assert abs(r.v - float(w.v_avg)) < 1e-9, r
        assert abs(r.anomaly_score - float(w.anomaly_score)) < 1e-9, r
        assert abs(r.anomaly_grade - float(w.anomaly_grade)) < 1e-9
        assert abs(r.confidence - float(w.confidence)) < 1e-9
    # the spike hour is flagged in-stream
    spike = got[got.anomaly_grade > 0]
    assert list(spike.service) == ["B"]
    assert pd.Timestamp(spike.bucket_start.iloc[0]) == base + pd.Timedelta(
        hours=15)


# --- second user-surface ring: adjacency_matrix / top_metrics / multi_terms /
# --- rate aggs + regexp / fuzzy queries --------------------------------------


def test_adjacency_matrix_and_multi_terms(spark):
    from anomaly_detection_spark.query.aggs_body import run_aggs

    df = spark.createDataFrame(pd.DataFrame({
        "t": ["a", "a", "b", "b", "c", None],
        "u": ["x", "y", "x", "x", "y", "x"],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]}))
    adj = run_aggs(df, {"aggs": {"m": {"adjacency_matrix": {"filters": {
        "hot": {"range": {"v": {"gte": 3.0}}},
        "ax": {"term": {"u": "x"}},
    }}}}})["m"].toPandas().set_index("key")
    # ax: u=x → rows 0,2,3,5 (4); hot: v>=3 → rows 2,3,4,5 (4);
    # ax&hot: rows 2,3,5 (3)
    assert adj.loc["ax"].doc_count == 4
    assert adj.loc["hot"].doc_count == 4
    assert adj.loc["ax&hot"].doc_count == 3

    mt = run_aggs(df, {"aggs": {"m": {
        "multi_terms": {"terms": [{"field": "t"}, {"field": "u"}],
                        "size": 2},
        "aggs": {"v_sum": {"sum": {"field": "v"}}}}}})["m"].toPandas()
    # (b,x) count 2 first; null t dropped; ties broken by keys asc
    assert (mt.iloc[0].t, mt.iloc[0].u, mt.iloc[0].doc_count) == ("b", "x", 2)
    assert mt.iloc[0].v_sum == 7.0
    assert len(mt) == 2 and mt.iloc[1].doc_count == 1


def test_top_metrics_and_rate(spark):
    from anomaly_detection_spark.query.aggs import date_histogram, rate_agg
    from anomaly_detection_spark.query.aggs_body import run_aggs

    df = spark.createDataFrame(pd.DataFrame({
        "g": ["a", "a", "b", "b"],
        "s": [1.0, 9.0, 5.0, 2.0],
        "v": [10.0, 20.0, 30.0, 40.0]}))
    tm = run_aggs(df, {"aggs": {"t": {"top_metrics": {
        "metrics": [{"field": "v"}], "sort": {"s": "desc"}}}}})["t"] \
        .toPandas()
    assert tm.s_top.iloc[0] == 9.0 and tm.v.iloc[0] == 20.0

    from anomaly_detection_spark.query.aggs import top_metrics_agg

    per_g = top_metrics_agg(df, ["v"], "s", order="asc",
                            group_cols=["g"]).toPandas().set_index("g")
    assert per_g.loc["a"].v == 10.0 and per_g.loc["b"].v == 40.0

    base = 1_740_787_200_000
    ev = spark.createDataFrame(
        [(i, base + i * 60_000) for i in range(120)],
        "id long, ms long").select(
        "id", F.timestamp_millis("ms").alias("ts"))
    h = date_histogram(ev, "ts", HOUR, min_doc_count=1)
    r = rate_agg(h, HOUR, 60_000).toPandas()  # per-minute rate
    assert (r.doc_count_rate == r.doc_count / 60.0).all()


def test_regexp_and_fuzzy_queries(spark):
    from anomaly_detection_spark.query.planner import compile_filter

    df = spark.createDataFrame(pd.DataFrame({
        "k": ["src1", "src10", "source", "src2", "abc"]}))
    # Lucene regexp is fully anchored: src[0-9] must NOT match src10
    got = df.filter(compile_filter(
        df, {"regexp": {"k": {"value": "src[0-9]"}}})).toPandas()
    assert sorted(got.k) == ["src1", "src2"]
    got2 = df.filter(compile_filter(
        df, {"regexp": {"k": "src.*"}})).toPandas()
    assert sorted(got2.k) == ["src1", "src10", "src2"]

    # fuzzy AUTO: len 4 → distance 1
    fz = df.filter(compile_filter(
        df, {"fuzzy": {"k": {"value": "srcX"}}})).toPandas()
    assert sorted(fz.k) == ["src1", "src2"]
    fz2 = df.filter(compile_filter(
        df, {"fuzzy": {"k": {"value": "source", "fuzziness": 2}}})).toPandas()
    assert sorted(fz2.k) == ["source"]


def test_stats_and_percentiles_bucket(spark):
    from anomaly_detection_spark.query.aggs import (
        percentiles_bucket, stats_bucket)

    buckets = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([10, 20, 30, 40, 100])],
        "b long, m double")
    st = stats_bucket(buckets, "m").toPandas().iloc[0]
    assert (st.m_count, st.m_min, st.m_max, st.m_sum) == (5, 10.0, 100.0, 200.0)
    assert abs(st.m_avg - 40.0) < 1e-9
    p = percentiles_bucket(buckets, "m", [50.0]).toPandas().iloc[0]
    assert p.m_percentiles == 30.0
    p2 = percentiles_bucket(buckets, "m", [25.0, 75.0]).toPandas().iloc[0]
    assert list(p2.m_percentiles) == [20.0, 40.0]


def test_streaming_detector_rcf_matches_preview(spark, tmp_path):
    """streaming_detector(scorer_factory=rcf_stream_factory(...)) —
    the serialized RCF model riding in streaming state — emits the
    same float sequence as preview with the matching rcf_scorer: the
    reference model family now runs identically on all three
    execution modes (preview / batch stateful / streaming)."""
    from anomaly_detection_spark.detector import Detector, preview
    from anomaly_detection_spark.features import (
        rcf_scorer,
        rcf_stream_factory,
    )
    from anomaly_detection_spark.streaming.stateful import streaming_detector

    import numpy as np

    rng = np.random.default_rng(97)
    base = pd.Timestamp("2025-05-01")
    rows = []
    eid = 0
    for h in range(60):
        n = 5
        bump = 40.0 if h == 50 else 0.0
        for i in range(n):
            rows.append((eid, "A",
                         base + pd.Timedelta(hours=h, minutes=i * 9),
                         float(10 + rng.normal(0, 0.3) + bump)))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "service", "ts",
                                      "value"])
    src_path = str(tmp_path / "stream_src")
    import glob
    import os
    import shutil
    import time as _time

    os.makedirs(src_path)
    t0 = _time.time()
    for part, lo in enumerate(range(0, 60, 12)):
        chunk = pdf[(pdf.ts >= base + pd.Timedelta(hours=lo))
                    & (pdf.ts < base + pd.Timedelta(hours=lo + 12))]
        wtmp = str(tmp_path / f"_w{part}")
        spark.createDataFrame(chunk).coalesce(1) \
            .write.mode("overwrite").parquet(wtmp)
        pf = glob.glob(wtmp + "/part-*.parquet")[0]
        dst = os.path.join(src_path, f"chunk-{part:03d}.parquet")
        shutil.copy(pf, dst)
        os.utime(dst, (t0 + part, t0 + part))

    conf = dict(shingle=4, n_trees=5, sample_size=32, min_samples=16,
                seed=17)
    det = Detector(
        detector_id="d", indices=src_path,
        feature_specs={"v_avg": {"avg": {"field": "value"}}},
        time_field="ts", interval_ms=3_600_000,
        category_fields=("service",))
    want = preview(spark, det, scorer=rcf_scorer(**conf)).toPandas()
    want = want.set_index([want.service,
                           want.bucket_start.map(pd.Timestamp)])

    batch_schema = spark.read.parquet(src_path).schema
    stream = (spark.readStream.schema(batch_schema)
              .option("maxFilesPerTrigger", 1).parquet(src_path))
    scored = streaming_detector(
        stream.withWatermark("ts", "1 minute"),
        ts_col="ts", interval_ms=3_600_000, agg="avg",
        value_col="value", entity_col="service",
        scorer_factory=rcf_stream_factory(**conf))
    q = (scored.writeStream.outputMode("append").format("memory")
         .queryName("det_stream_rcf")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select * from det_stream_rcf").toPandas()

    assert len(got) >= len(want) - 2 > 20, (len(got), len(want))
    for r in got.itertuples():
        w = want.loc[(r.service, pd.Timestamp(r.bucket_start))]
        assert abs(r.v - float(w.v_avg)) < 1e-9, r
        assert abs(r.anomaly_score - float(w.anomaly_score)) < 1e-9, r
        assert abs(r.anomaly_grade - float(w.anomaly_grade)) < 1e-9
        assert abs(r.confidence - float(w.confidence)) < 1e-9
    spike = got[got.anomaly_grade > 0]
    assert len(spike) >= 1
    assert pd.Timestamp(spike.bucket_start.iloc[0]) == \
        base + pd.Timedelta(hours=50)


def test_suggest_history_and_window_delay(spark, tmp_path):
    """HistorySuggest + suggestWindowDelay analogs
    (BaseSuggestConfigParamTransportAction)."""
    import pandas as pd

    from anomaly_detection_spark.detector import Detector
    from anomaly_detection_spark.validation import (
        MAX_HISTORY_INTERVALS, suggest_history, suggest_window_delay)

    base = pd.Timestamp("2025-01-01")
    t0 = int(base.value // 1_000_000)
    minute = 60_000
    pdf = pd.DataFrame({
        "ts": [base + pd.Timedelta(minutes=10 * i) for i in range(100)],
        "v": 1.0})
    src = str(tmp_path / "ev")
    spark.createDataFrame(pdf).write.parquet(src)
    det = Detector(detector_id="d", indices=src,
                   feature_specs={"f": {"avg": {"field": "v"}}},
                   time_field="ts", interval_ms=10 * minute,
                   shingle_size=8)
    now = t0 + 100 * 10 * minute
    # span = 99 intervals < default 32+8=40? no: 99 > 40 → history=99
    got = suggest_history(spark, det, now)
    assert got == {"history": 99, "interval_minutes": 10}
    # short span clamps UP to default_history = 32 + shingle
    got = suggest_history(spark, det, now, interval_minutes=60)
    assert got["history"] == 40           # 99*10min span = 16 hours
    # future-dated max caps at now; cap at MAX_HISTORY_INTERVALS
    got = suggest_history(spark, det, t0 + 5 * 10 * minute)
    assert got["history"] == 40 or got["history"] == max(40, 5)
    det1 = Detector(detector_id="d1", indices=src,
                    feature_specs={"f": {"avg": {"field": "v"}}},
                    time_field="ts", interval_ms=1,
                    shingle_size=8)
    assert suggest_history(spark, det1, now)["history"] == \
        MAX_HISTORY_INTERVALS

    # window delay: latest = t0+990min; now 25min past it with 10-min
    # intervals → ceil(25/10)=3 behind + 1 safety = 40 min
    got = suggest_window_delay(spark, det, t0 + (990 + 25) * minute)
    assert got == {"window_delay_minutes": 40}
    # future-dated data → 0
    got = suggest_window_delay(spark, det, t0)
    assert got == {"window_delay_minutes": 0}


def test_validate_model_root_cause_chain(spark, tmp_path):
    """ModelValidationActionHandler fail-fast chain with the
    reference's exact messages."""
    import pandas as pd

    from anomaly_detection_spark.detector import Detector
    from anomaly_detection_spark.validation import (
        CATEGORY_FIELD_TOO_SPARSE, FEATURE_QUERY_TOO_SPARSE,
        FILTER_QUERY_TOO_SPARSE, INTERVAL_REC, validate_model)

    base = pd.Timestamp("2025-01-01")
    t0 = int(base.value // 1_000_000)
    minute = 60_000
    # dense 1-minute stream for entity "a"; entity "b" is sparse;
    # v2 is null on most rows (sparse feature); src="x" keeps 1/5
    rows = []
    for i in range(600):
        rows.append(("a", base + pd.Timedelta(minutes=i), 1.0,
                     1.0 if i % 40 == 0 else None,
                     "x" if i % 5 == 0 else "y"))
        if i % 37 == 0:
            rows.append(("b", base + pd.Timedelta(minutes=i), 1.0,
                         None, "y"))
    src = str(tmp_path / "ev")
    spark.createDataFrame(pd.DataFrame(
        rows, columns=["service", "ts", "v", "v2", "src"])) \
        .write.parquet(src)
    now = t0 + 599 * minute          # == the latest data point

    def det(**kw):
        d = dict(detector_id="vm", indices=src,
                 feature_specs={"f": {"avg": {"field": "v"}}},
                 time_field="ts", interval_ms=minute, shingle_size=8)
        d.update(kw)
        return Detector(**d)

    # dense data at the configured interval → no issues
    assert validate_model(spark, det(), now) == {"issues": {}}
    # stale data → window delay recommendation (ceil minutes twice)
    got = validate_model(spark, det(), now + 30 * minute)
    assert "at least 30 minutes ago" in got["issues"]["window_delay"]
    assert "to at least 30 minutes" in got["issues"]["window_delay"]
    # a 10-minute-cadence view of 1-minute data recommends nothing
    # smaller; but 1-minute config over 37-minute-cadence entity data
    # (top entity = a, dense) stays fine — so drop to entity b only:
    # interval rec replaces the configured 1-minute interval
    got = validate_model(
        spark, det(filter_query={"term": {"service": {"value": "b"}}}),
        now)
    assert got["issues"].get("detection_interval", "").startswith(
        INTERVAL_REC)
    # the root-cause chain runs only when the interval rec is null
    # (processIntervalRecommendation:206-208) — force that branch to
    # test the fail-fast order: raw data and the dense feature pass,
    # the sparse feature fails WITH its name in the message
    import anomaly_detection_spark.validation as V
    orig = V.suggest_interval
    V.suggest_interval = lambda *a, **k: None
    try:
        got = validate_model(
            spark, det(feature_specs={"f": {"avg": {"field": "v"}},
                                      "g": {"avg": {"field": "v2"}}}),
            now)
        assert got["issues"]["feature_attributes"] == \
            f"{FEATURE_QUERY_TOO_SPARSE}: g"
        # HC chain: top entity "a" is dense → category passes; the
        # sparse feature still fails after it
        got = validate_model(
            spark, det(category_fields=("service",),
                       feature_specs={"g": {"avg": {"field": "v2"}}}),
            now)
        assert got["issues"]["feature_attributes"] == \
            f"{FEATURE_QUERY_TOO_SPARSE}: g"
    finally:
        V.suggest_interval = orig
    # empty source → raw-data issue
    empty = str(tmp_path / "empty")
    spark.read.parquet(src).limit(0).write.parquet(empty)
    got = validate_model(spark, det(indices=empty), now)
    assert got["issues"]["indices"].startswith("Source index data")


def test_streaming_detector_imputation_matches_preview(spark, tmp_path):
    """streaming_detector with imputation closes EVERY bucket between
    an entity's data buckets — synthesized values and scores equal the
    imputing preview; the imputed flag rides the output; impute_limit
    caps a quiet entity's synthetic run."""
    from anomaly_detection_spark.detector import Detector, preview
    from anomaly_detection_spark.streaming.stateful import \
        streaming_detector

    base = pd.Timestamp("2025-03-01")
    gaps = {9, 10, 14}
    rows = []
    eid = 0
    for h in range(20):
        if h in gaps:
            continue
        for i in range(4):
            rows.append((eid, "A", base + pd.Timedelta(hours=h, minutes=i),
                         float(10 + (h % 3) + i)))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "service", "ts", "value"])
    src_path = str(tmp_path / "stream_src")
    import glob
    import os
    import shutil
    import time as _time

    os.makedirs(src_path)
    t0 = _time.time()
    for part, lo in enumerate(range(0, 20, 4)):
        chunk = pd.DataFrame(
            pdf[(pdf.ts >= base + pd.Timedelta(hours=lo))
                & (pdf.ts < base + pd.Timedelta(hours=lo + 4))])
        if not len(chunk):
            continue
        wtmp = str(tmp_path / f"_w{part}")
        spark.createDataFrame(chunk).coalesce(1) \
            .write.mode("overwrite").parquet(wtmp)
        pf = glob.glob(wtmp + "/part-*.parquet")[0]
        dst = os.path.join(src_path, f"chunk-{part:03d}.parquet")
        shutil.copy(pf, dst)
        os.utime(dst, (t0 + part, t0 + part))

    det = Detector(
        detector_id="d", indices=src_path,
        feature_specs={"v_avg": {"avg": {"field": "value"}}},
        time_field="ts", interval_ms=3_600_000,
        category_fields=("service",), shingle_size=4,
        imputation_method="previous")
    want = preview(spark, det).toPandas()
    want = want.set_index(want.bucket_start.map(pd.Timestamp))

    batch_schema = spark.read.parquet(src_path).schema
    stream = (spark.readStream.schema(batch_schema)
              .option("maxFilesPerTrigger", 1).parquet(src_path))
    scored = streaming_detector(
        stream.withWatermark("ts", "1 minute"),
        ts_col="ts", interval_ms=3_600_000, agg="avg",
        value_col="value", entity_col="service", k=4,
        imputation_method="previous")
    q = (scored.writeStream.outputMode("append").format("memory")
         .queryName("det_stream_imp")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select * from det_stream_imp").toPandas()

    # the gap buckets are emitted, flagged, and preview-identical
    got_ts = {pd.Timestamp(b) for b in got.bucket_start}
    for g in gaps:
        assert base + pd.Timedelta(hours=g) in got_ts, g
    assert len(got) >= len(want) - 2
    for r in got.itertuples():
        w = want.loc[pd.Timestamp(r.bucket_start)]
        assert abs(r.v - float(w.v_avg)) < 1e-9, r
        assert abs(r.anomaly_score - float(w.anomaly_score)) < 1e-9, r
        wf = {e["feature_id"]: e["imputed"] for e in w.feature_imputed}
        assert r.imputed == wf["v_avg"], r

    # rejects
    with pytest.raises(NotImplementedError, match="linear"):
        streaming_detector(stream, ts_col="ts", interval_ms=1,
                           agg="avg", value_col="value",
                           entity_col="service",
                           imputation_method="linear")
    with pytest.raises(ValueError, match="imputation_value"):
        streaming_detector(stream, ts_col="ts", interval_ms=1,
                           agg="avg", value_col="value",
                           entity_col="service",
                           imputation_method="fixed_values")


def test_streaming_imputation_gap_before_first_close(spark, tmp_path):
    """A gap between two buckets that are BOTH still open when the
    first close happens must impute too (last_closed is unset at that
    point — the range starts from the first open bucket)."""
    from anomaly_detection_spark.streaming.stateful import \
        streaming_detector

    base = pd.Timestamp("2025-03-01")
    # hours 0,1,3,4 in ONE file (gap at 2); a second file at hour 8
    # advances the watermark past everything in one later trigger
    rows = [(h * 10 + j, "A", base + pd.Timedelta(hours=h, minutes=j),
             float(5 + j)) for h in (0, 1, 3, 4) for j in range(2)]
    late = [(900, "A", base + pd.Timedelta(hours=8), 5.0)]
    import glob
    import os
    import shutil
    import time as _time

    src_path = str(tmp_path / "src")
    os.makedirs(src_path)
    t0 = _time.time()
    for part, chunk in enumerate((rows, late)):
        wtmp = str(tmp_path / f"_w{part}")
        spark.createDataFrame(pd.DataFrame(
            chunk, columns=["eid", "service", "ts", "v"])) \
            .coalesce(1).write.mode("overwrite").parquet(wtmp)
        pf = glob.glob(wtmp + "/part-*.parquet")[0]
        dst = os.path.join(src_path, f"c{part}.parquet")
        shutil.copy(pf, dst)
        os.utime(dst, (t0 + part, t0 + part))

    batch_schema = spark.read.parquet(src_path).schema
    stream = (spark.readStream.schema(batch_schema)
              .option("maxFilesPerTrigger", 1).parquet(src_path))
    out = streaming_detector(
        stream.withWatermark("ts", "1 minute"), ts_col="ts",
        interval_ms=3_600_000, agg="avg", value_col="v",
        entity_col="service", k=2, imputation_method="previous")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("gap_first_close")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select * from gap_first_close "
                    "order by bucket_start").toPandas()
    by_ts = {pd.Timestamp(r.bucket_start): r for r in got.itertuples()}
    h2 = base + pd.Timedelta(hours=2)
    assert h2 in by_ts and by_ts[h2].imputed      # the early gap
    assert abs(by_ts[h2].v - 5.5) < 1e-9          # previous carry
    # hours 5 and 6 impute from the quiet-entity timeout path as well
    # (hour 7 stays open: the final watermark rests at 7:59)
    for h in (5, 6):
        t = base + pd.Timedelta(hours=h)
        assert t in by_ts and by_ts[t].imputed, h
