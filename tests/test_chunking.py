"""chunk_documents (text_chunking processor twin): fixed_token_length
windows with overlap + delimiter splitting, replayed against a
python oracle."""

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.pipeline.chunking import chunk_documents


def _fixed_oracle(text, limit, overlap):
    words = text.split()
    if not words:
        return []
    step = max(1, int(limit * (1.0 - overlap)))
    out, s = [], 0
    while True:
        out.append(" ".join(words[s:s + limit]))
        if s + limit >= len(words):
            break
        s += step
    # windows fully past the end never start (the op's start grid may
    # skip the last partial step if the previous window reached the end)
    return out


def test_fixed_token_length_oracle(spark):
    texts = [
        (1, " ".join(f"w{i}" for i in range(10))),
        (2, "one two three"),
        (3, ""),
        (4, "solo"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = (chunk_documents(df, token_limit=4, overlap_rate=0.5)
           .orderBy("doc_id", "chunk_idx").collect())
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk"])
    assert by_doc[1] == _fixed_oracle(texts[0][1], 4, 0.5)
    assert by_doc[2] == ["one two three"]
    assert 3 not in by_doc
    assert by_doc[4] == ["solo"]
    # every chunk's token count column matches its own word count
    for r in got:
        assert r["chunk_tokens"] == len(r["chunk"].split())
    # chunk windows overlap by limit - step words
    c1 = by_doc[1]
    assert c1[0].split()[2:] == c1[1].split()[:2]


def test_fixed_no_overlap_and_tail(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(7)))],
        "doc_id long, text string")
    got = [r["chunk"] for r in
           chunk_documents(df, token_limit=3).orderBy("chunk_idx")
           .collect()]
    assert got == ["w0 w1 w2", "w3 w4 w5", "w6"]


def test_delimiter_algorithm(spark):
    df = spark.createDataFrame(
        [(1, "para one\n\npara two\n\npara three"),
         (2, "no delimiter here"),
         (3, "\n\ntrailing\n\n")],
        "doc_id long, text string")
    got = (chunk_documents(df, algorithm="delimiter")
           .orderBy("doc_id", "chunk_idx").collect())
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk"])
    assert by_doc[1] == ["para one\n\n", "para two\n\n", "para three"]
    assert by_doc[2] == ["no delimiter here"]
    assert by_doc[3] == ["trailing\n\n"]


def test_chunk_limits_and_rejections(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(30)))],
        "doc_id long, text string")
    # the guard is IN the plan (no extra eager job): it fires at
    # action time, like any data-dependent failure
    with pytest.raises(Exception, match="max_chunk_limit"):
        chunk_documents(df, token_limit=2, max_chunk_limit=3).count()
    ok = chunk_documents(df, token_limit=2, max_chunk_limit=-1)
    assert ok.count() == 15
    with pytest.raises(ValueError, match="overlap_rate"):
        chunk_documents(df, overlap_rate=0.9)
    with pytest.raises(ValueError, match="algorithm"):
        chunk_documents(df, algorithm="semantic")
    with pytest.raises(ValueError, match="token_limit"):
        chunk_documents(df, token_limit=0)


def test_chunking_repartition_deterministic(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(i % 9)))
         for i in range(200)],
        "doc_id long, text string")
    a = set((r["doc_id"], r["chunk_idx"], r["chunk"]) for r in
            chunk_documents(df, token_limit=3, overlap_rate=0.25)
            .collect())
    b = set((r["doc_id"], r["chunk_idx"], r["chunk"]) for r in
            chunk_documents(df.repartition(7), token_limit=3,
                            overlap_rate=0.25).collect())
    assert a == b and a
