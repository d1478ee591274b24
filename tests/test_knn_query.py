"""knn query kind: exact scored vector scan, twin-checked against
pipeline.similarity.cosine_topk_bruteforce and numpy oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.query.planner import search


@pytest.fixture(scope="module")
def vecs(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return df.withColumnRenamed("vec_id", "docid").persist()


def _np_corpus(vecs):
    pdf = vecs.select("docid", "embedding", "label").toPandas()
    return (pdf.docid.to_numpy(),
            np.stack(pdf.embedding.to_numpy()),
            pdf.label.to_numpy())


def test_knn_cosine_matches_similarity_twin(spark, vecs):
    ids, mat, _ = _np_corpus(vecs)
    qrow = vecs.filter(F.col("docid") == ids[0]).collect()[0]
    body = {"query": {"knn": {"embedding": {
        "vector": list(qrow["embedding"]), "k": 6}}}, "size": 6}
    got = search(vecs, body).select("docid", "score").collect()
    q = np.asarray(qrow["embedding"], dtype=np.float64)
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(ids)), key=lambda i: (-cos[i], ids[i]))[:6]
    assert [r["docid"] for r in got] == [int(ids[i]) for i in order]
    assert np.allclose([r["score"] for r in got],
                       [cos[i] for i in order], atol=1e-9)
    # the pipeline twin (rounds to 6dp, excludes the self-match)
    from anomaly_detection_spark.pipeline.similarity import (
        cosine_topk_bruteforce)

    queries = (vecs.filter(F.col("docid") == ids[0])
               .select(F.col("docid").alias("query_id"), "embedding"))
    twin = cosine_topk_bruteforce(
        vecs.withColumnRenamed("docid", "vec_id"), queries, k=5)
    twin_ids = [r["vec_id"] for r in twin.collect()]
    assert [r["docid"] for r in got if r["docid"] != ids[0]][:5] == twin_ids


@pytest.mark.parametrize("space", ["l2", "innerproduct"])
def test_knn_other_spaces_numpy_oracle(vecs, space):
    ids, mat, _ = _np_corpus(vecs)
    q = mat[3].astype(np.float64)
    body = {"query": {"knn": {"embedding": {
        "vector": q.tolist(), "k": 5, "space_type": space}}}, "size": 5}
    got = search(vecs, body).select("docid", "score").collect()
    if space == "l2":
        want = 1.0 / (1.0 + ((mat - q) ** 2).sum(axis=1))
    else:
        want = mat @ q
    order = sorted(range(len(ids)), key=lambda i: (-want[i], ids[i]))[:5]
    assert [r["docid"] for r in got] == [int(ids[i]) for i in order]
    assert np.allclose([r["score"] for r in got],
                       [want[i] for i in order], rtol=1e-6)


def test_knn_prefilter(vecs):
    ids, mat, labels = _np_corpus(vecs)
    q = mat[0].astype(np.float64)
    lbl = int(labels[1])
    body = {"query": {"knn": {"embedding": {
        "vector": q.tolist(), "k": 4,
        "filter": {"term": {"label": lbl}}}}}, "size": 4}
    got = search(vecs, body).select("docid", "score").collect()
    mask = labels == lbl
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted((i for i in range(len(ids)) if mask[i]),
                   key=lambda i: (-cos[i], ids[i]))[:4]
    assert [r["docid"] for r in got] == [int(ids[i]) for i in order]
    assert all(int(labels[list(ids).index(r["docid"])]) == lbl
               for r in got)


def test_knn_radial_min_score_cosine(vecs):
    ids, mat, _ = _np_corpus(vecs)
    q = mat[0].astype(np.float64)
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    floor = float(np.quantile(cos, 0.9))
    body = {"query": {"knn": {"embedding": {
        "vector": q.tolist(), "min_score": floor}}}, "size": 100_000}
    got = search(vecs, body).select("docid", "score").collect()
    want = sorted((i for i in range(len(ids)) if cos[i] >= floor),
                  key=lambda i: (-cos[i], ids[i]))
    assert [r["docid"] for r in got] == [int(ids[i]) for i in want]
    assert all(r["score"] >= floor - 1e-12 for r in got)


@pytest.mark.parametrize("space", ["l2", "cosinesimil", "innerproduct"])
def test_knn_radial_max_distance_numpy_oracle(vecs, space):
    ids, mat, _ = _np_corpus(vecs)
    q = mat[5].astype(np.float64)
    if space == "l2":
        dist = ((mat - q) ** 2).sum(axis=1)
        score = 1.0 / (1.0 + dist)
    elif space == "cosinesimil":
        cos = (mat @ q) / (np.linalg.norm(mat, axis=1)
                           * np.linalg.norm(q))
        dist, score = 1.0 - cos, cos
    else:
        dot = mat @ q
        dist, score = -dot, dot
    md = float(np.quantile(dist, 0.1))
    body = {"query": {"knn": {"embedding": {
        "vector": q.tolist(), "space_type": space,
        "max_distance": md}}}, "size": 100_000}
    got = search(vecs, body).select("docid", "score").collect()
    want = sorted((i for i in range(len(ids)) if dist[i] <= md + 1e-12),
                  key=lambda i: (-score[i], ids[i]))
    assert [r["docid"] for r in got] == [int(ids[i]) for i in want]
    assert len(got) > 0


def test_knn_radial_rejections(vecs):
    with pytest.raises(ValueError, match="not both"):
        search(vecs, {"query": {"knn": {"embedding": {
            "vector": [1.0, 0.0], "k": 3, "min_score": 0.5}}}})
    with pytest.raises(ValueError, match="max_distance OR min_score"):
        search(vecs, {"query": {"knn": {"embedding": {
            "vector": [1.0, 0.0], "max_distance": 0.5,
            "min_score": 0.5}}}})


def test_knn_rejections(spark, vecs):
    with pytest.raises(ValueError, match="space_type"):
        search(vecs, {"query": {"knn": {"embedding": {
            "vector": [1.0, 0.0], "space_type": "hamming"}}}})
    with pytest.raises(ValueError, match="non-zero"):
        search(vecs, {"query": {"knn": {"embedding": {
            "vector": [0.0, 0.0]}}}})
