from pyspark.sql import functions as F

from anomaly_detection_spark.data import assign_docids, generate_transcripts


def test_schema_and_shape(tiny_transcripts):
    df = tiny_transcripts
    assert dict(df.dtypes)["conv_id"] == "string"
    assert dict(df.dtypes)["turn_idx"] == "int"
    assert dict(df.dtypes)["role"] == "string"
    assert dict(df.dtypes)["text"] == "string"
    assert dict(df.dtypes)["tool"] == "string"
    assert dict(df.dtypes)["ts"] == "timestamp"
    n = df.count()
    assert 1000 < n < 4000


def test_determinism_across_parallelism(spark):
    a = generate_transcripts(spark, 500, seed=7, n_partitions=2)
    b = generate_transcripts(spark, 500, seed=7, n_partitions=11)
    pa = a.orderBy("conv_id", "turn_idx").toPandas()
    pb = b.orderBy("conv_id", "turn_idx").toPandas()
    assert pa.equals(pb)


def test_unique_and_contiguous_turns(tiny_transcripts):
    df = tiny_transcripts
    dup = df.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
    assert dup == 0
    bad = (
        df.groupBy("conv_id")
        .agg(F.min("turn_idx").alias("lo"), F.max("turn_idx").alias("hi"),
             F.count("*").alias("n"))
        .filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
        .count()
    )
    assert bad == 0


def test_ts_monotone_per_conv(tiny_transcripts):
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bad = (
        tiny_transcripts.withColumn("prev", F.lag("ts").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("ts") <= F.col("prev")))
        .count()
    )
    assert bad == 0


def test_docids_dense_and_ordered(tiny_transcripts):
    df = tiny_transcripts
    n = df.count()
    r = df.agg(F.min("docid").alias("lo"), F.max("docid").alias("hi"),
               F.countDistinct("docid").alias("d")).collect()[0]
    assert r["lo"] == 0 and r["hi"] == n - 1 and r["d"] == n
    # docid order == (conv_id, turn_idx) order
    pdf = df.select("docid", "conv_id", "turn_idx").orderBy("docid").toPandas()
    assert pdf.sort_values(["conv_id", "turn_idx"]).docid.is_monotonic_increasing


def test_docid_stable_under_partitioning(spark):
    base = generate_transcripts(spark, 400, seed=3)
    a = assign_docids(base, n_partitions=2).select("conv_id", "turn_idx", "docid")
    b = assign_docids(base, n_partitions=9).select("conv_id", "turn_idx", "docid")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_role_tool_domains(tiny_transcripts):
    roles = {r["role"] for r in tiny_transcripts.select("role").distinct().collect()}
    assert roles <= {"user", "assistant", "system", "tool"}
    tools = {r["tool"] for r in tiny_transcripts.select("tool").distinct().collect()}
    assert None in tools and "bash" in tools
