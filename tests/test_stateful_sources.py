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


def test_update_by_query(spark, tmp_path):
    from anomaly_detection_spark.sources import update_by_query

    src = str(tmp_path / "u.parquet")
    spark.createDataFrame(
        [(0, "sale", 10.0), (1, "cost", 3.0), (2, "sale", None),
         (3, None, 5.0)],
        "id long, type string, amount double").write.parquet(src)
    n = update_by_query(
        spark, src, {"term": {"type": "sale"}},
        "ctx._source.amount = ctx._source.amount * params.f",
        params={"f": 2.0})
    assert n == 2
    got = {r["id"]: r for r in load_table(spark, src).collect()}
    assert got[0]["amount"] == 20.0          # matched, doubled
    assert got[1]["amount"] == 3.0           # non-matching untouched
    assert got[2]["amount"] is None          # null stays null
    assert got[3]["amount"] == 5.0           # null-field row survives
    # += form and statement sequencing
    n = update_by_query(
        spark, src, {"range": {"id": {"gte": 0}}},
        "ctx._source.amount += 1; ctx._source.amount += 1")
    assert n == 4
    got = {r["id"]: r["amount"]
           for r in load_table(spark, src).collect()}
    assert got[1] == 5.0
    # schema type preserved (long column assigned an arith expr)
    dt = dict(load_table(spark, src).dtypes)
    assert dt["id"] == "bigint" and dt["amount"] == "double"
    # no match -> no rewrite
    assert update_by_query(
        spark, src, {"term": {"type": "nope"}},
        "ctx._source.amount = 0") == 0
    with pytest.raises(ValueError, match="unknown field"):
        update_by_query(spark, src, {"term": {"type": "sale"}},
                        "ctx._source.nope = 1")


def test_reindex(spark, tmp_path):
    from anomaly_detection_spark.sources import reindex

    src = str(tmp_path / "r_src.parquet")
    dst = str(tmp_path / "r_dst.parquet")
    spark.range(50).select(
        F.col("id").alias("docid"), (F.col("id") % 5).alias("grp"),
        (F.col("id") * 1.0).alias("v")).write.parquet(src)
    n = reindex(spark, src, dst, query={"term": {"grp": 3}},
                script="ctx._source.v = ctx._source.v + 100")
    assert n == 10
    out = load_table(spark, dst)
    assert out.count() == 10
    assert out.agg(F.min("v")).collect()[0][0] == 103.0
    # max_docs deterministic on docid; append mode accumulates
    n = reindex(spark, src, dst, max_docs=3)
    assert n == 3
    out = load_table(spark, dst)
    assert out.count() == 13
    assert sorted(r["docid"] for r in out.collect())[:4] == [0, 1, 2, 3]
    # overwrite mode replaces
    n = reindex(spark, src, dst, max_docs=5, mode="overwrite")
    assert n == 5 and load_table(spark, dst).count() == 5
