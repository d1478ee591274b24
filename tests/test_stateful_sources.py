import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.sources import delete_by_query, load_table
from anomaly_detection_spark.streaming.stateful import streaming_shingles


def test_streaming_shingles_stateful(spark, tmp_path):
    # two entities, 12 minute-buckets each, arriving across 3 micro-batches
    base = pd.Timestamp("2025-06-01")
    rows = []
    for ent in ("A", "B"):
        for i in range(12):
            rows.append((ent, base + pd.Timedelta(minutes=i), float(i)))
    pdf = pd.DataFrame(rows, columns=["entity", "window_start", "v"])
    src = str(tmp_path / "state_src")
    # 3 files → maxFilesPerTrigger=1 gives 3 micro-batches (state must carry)
    for j in range(3):
        spark.createDataFrame(pdf.iloc[j * 8:(j + 1) * 8]).coalesce(1) \
            .write.mode("append").parquet(src)

    stream = (spark.readStream.schema("entity string, window_start timestamp, v double")
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_shingles(stream, k=4)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("shingle_out")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select * from shingle_out").toPandas()
    a = got[got.entity == "A"].sort_values("window_start")
    # buckets 3..11 complete a 4-window → 9 shingles per entity
    assert len(a) == 9
    assert list(a.iloc[0].shingle) == [0.0, 1.0, 2.0, 3.0]
    assert list(a.iloc[-1].shingle) == [8.0, 9.0, 10.0, 11.0]
    b = got[got.entity == "B"]
    assert len(b) == 9


def test_load_and_delete_by_query(spark, tmp_path):
    src = str(tmp_path / "t.parquet")
    spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("grp")
    ).write.parquet(src)
    df = load_table(spark, src)
    assert df.count() == 100
    n = delete_by_query(spark, src, {"term": {"grp": 3}})
    assert n == 20
    after = load_table(spark, src)
    assert after.count() == 80
    assert after.filter(F.col("grp") == 3).count() == 0
    # deleting nothing is a no-op
    assert delete_by_query(spark, src, {"term": {"grp": 99}}) == 0
    with pytest.raises(RuntimeError, match="catalog"):
        load_table(spark, "catalog.db.missing")
