import math

import numpy as np
import pandas as pd

from anomaly_detection_spark.functions.bm25 import (
    bm25_idf,
    bm25_max_score_ub,
    bm25_score,
    quantize_doc_len,
)
from anomaly_detection_spark.functions.tokenizer import tokenize_query, tokenize_texts


def test_tokenize_fixed_vectors():
    s = pd.Series([
        "Hello, World!",
        "",
        None,
        "éclair NAÏVE Über",
        "don't co-op x_1 3.14",
        "東京 🚀 test",
        "...!!!",
    ])
    out = tokenize_texts(s).tolist()
    assert out[0] == ["hello", "world"]
    assert out[1] == []
    assert out[2] == []
    assert out[3] == ["éclair", "naïve", "über"]
    assert out[4] == ["don", "t", "co", "op", "x_1", "3", "14"]
    assert out[5] == ["東京", "test"]  # emoji is not a word char
    assert out[6] == []


def test_query_and_doc_analyzers_agree():
    txt = "The Quick-Brown FOX, naïve 東京!"
    assert tokenize_query(txt) == tokenize_texts(pd.Series([txt]))[0]


def test_bm25_idf_formula():
    assert math.isclose(float(bm25_idf(1, 1)), math.log(1 + 0.5 / 1.5))
    assert math.isclose(float(bm25_idf(10, 1000)), math.log(1 + 990.5 / 10.5))


def test_bm25_score_monotone_in_tf_and_dl():
    s1 = bm25_score(np.array([1]), np.array([10]), np.array([20]), 1000, 20.0)
    s2 = bm25_score(np.array([5]), np.array([10]), np.array([20]), 1000, 20.0)
    s3 = bm25_score(np.array([1]), np.array([10]), np.array([80]), 1000, 20.0)
    assert s2 > s1 > s3


def test_block_max_ub_dominates():
    rng = np.random.RandomState(0)
    tfs = rng.randint(1, 50, 100)
    dls = rng.randint(1, 200, 100)
    exact = bm25_score(tfs, np.full(100, 37), dls, 10_000, 25.0)
    ub = bm25_max_score_ub(np.full(100, tfs.max()), np.full(100, 37), 10_000, 25.0)
    assert (ub >= exact - 1e-12).all()


def test_norm_quantization_monotone_and_small_exact():
    dl = np.arange(0, 24)
    assert (quantize_doc_len(dl) == dl).all()  # 0..23 exact (Lucene SmallFloat)
    big = np.arange(24, 200_000, 7)
    q = quantize_doc_len(big)
    assert (np.diff(q) >= 0).all()  # monotone
    assert (q <= big).all() and (q >= big - big // 8 - 1).all()  # ≤12.5% error
    # round-trip through the encoded byte is idempotent
    assert (quantize_doc_len(q) == q).all()


def test_jvm_tokenizer_matches_python(spark):
    """The codegen analyzer (regexp_extract_all) must produce exactly
    the Python \\w+ analyzer's tokens — the whole index build rides on
    this equivalence."""
    from pyspark.sql import functions as F

    from anomaly_detection_spark.data import generate_transcripts
    from anomaly_detection_spark.functions.tokenizer import tokenize_column

    edge = [
        "Hello, World! 42", "naïve Éclair—café", "ΣΙΣΥΦΟΣ σίσυφος",
        "under_score mixed_Case_9", "日本語のテキスト 中文 한국어",
        "İstanbul ıssız", "ß STRASSE straße", "a b\tc\nd",
        "emoji 🙂 split", "", None, "123 ١٢٣ Ⅻ", "x" * 5000,
        "danger.dots..and--dashes__ok",
    ]
    df = spark.createDataFrame([(t,) for t in edge], "text string").unionAll(
        generate_transcripts(spark, 500, seed=7).select("text"))
    mism = (df
            .withColumn("jvm", tokenize_column("text", engine="jvm"))
            .withColumn("py", tokenize_column("text", engine="python"))
            .filter(~(F.col("jvm") == F.col("py"))))
    assert mism.count() == 0
