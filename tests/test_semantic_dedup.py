"""SemDeDup (embedding k-means + within-cluster cosine prune).

Reference recipe: Abbas et al. 2023 (arXiv:2303.09540) — the engine's
semantic-dedup pipeline op.  Oracle = a full numpy replay: brute-force
all-pairs cosine at the threshold, connected components, and the
paper's keep-the-least-centroid-similar survivor policy.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.pipeline.dedup import semantic_dedup


def _corpus(spark, n_groups=12, dup_sizes=(1, 2, 3, 5), dim=16, seed=7):
    """Synthetic embedding corpus: n_groups well-separated base
    directions; group g has dup_sizes[g % len] members = base + tiny
    noise (pairwise cosine > 0.99); groups are near-orthogonal."""
    rng = np.random.RandomState(seed)
    bases = rng.randn(n_groups, dim)
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    rows, gid = [], []
    doc = 0
    for g in range(n_groups):
        for _ in range(dup_sizes[g % len(dup_sizes)]):
            v = bases[g] + rng.randn(dim) * 0.01
            rows.append((doc, [float(x) for x in v]))
            gid.append(g)
            doc += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "embedding"])
    df = spark.createDataFrame(pdf).withColumn(
        "embedding", F.col("embedding").cast("array<float>"))
    return df, np.array([r[1] for r in rows]), np.array(gid)


def _numpy_oracle(X, threshold):
    """All-pairs cosine components (the recall=1 reference)."""
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    n = len(X)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if S[i, j] >= threshold:
                pi, pj = find(i), find(j)
                if pi != pj:
                    parent[max(pi, pj)] = min(pi, pj)
    return np.array([find(i) for i in range(n)])


def test_semantic_dedup_keeps_one_per_group(spark):
    df, X, gid = _corpus(spark)
    out = semantic_dedup(df, threshold=0.95, n_lists=8,
                         train_size=1000, seed=13).toPandas()
    comp = _numpy_oracle(X, 0.95)
    n_groups = len(set(comp))
    assert len(out) == n_groups
    # every oracle component represented exactly once, with its size
    comp_of = {i: c for i, c in enumerate(comp)}
    sizes = pd.Series(comp).value_counts().to_dict()
    seen = set()
    for _, r in out.iterrows():
        c = comp_of[r.doc_id]
        assert c not in seen
        seen.add(c)
        assert r.cluster_size == sizes[c]


def test_semantic_dedup_centroid_far_policy(spark):
    """The survivor is the member with the LOWEST cosine to its
    k-means centroid (paper §3), verified by numpy replay against the
    same centroids the op used."""
    from anomaly_detection_spark.pipeline.similarity import ivf_centroids

    df, X, gid = _corpus(spark)
    C = ivf_centroids(df, n_lists=8, id_col="doc_id", train_size=1000,
                      seed=13)
    out = semantic_dedup(df, threshold=0.95, n_lists=8, centroids=C,
                         train_size=1000, seed=13).toPandas()
    comp = _numpy_oracle(X, 0.95)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    csim = (Xn @ np.asarray(C).T).max(axis=1)  # sim to NEAREST centroid
    for c in set(comp):
        members = np.where(comp == c)[0]
        # expected survivor: lowest centroid sim, ties by id
        exp = members[np.lexsort((members, np.round(csim[members], 9)))][0]
        got = out[out.doc_id.isin(members)].doc_id.iloc[0]
        assert got == exp, (c, members.tolist(), exp, got)


def test_semantic_dedup_min_id_and_determinism(spark):
    df, X, _ = _corpus(spark)
    out1 = semantic_dedup(df, threshold=0.95, n_lists=8, keep="min_id",
                          train_size=1000).toPandas()
    comp = _numpy_oracle(X, 0.95)
    exp_keep = sorted({int(np.min(np.where(comp == c)[0]))
                       for c in set(comp)})
    assert sorted(out1.doc_id) == exp_keep
    # determinism under repartition
    out2 = semantic_dedup(df.repartition(7), threshold=0.95, n_lists=8,
                          keep="min_id", train_size=1000).toPandas()
    assert sorted(out2.doc_id) == exp_keep


def test_semantic_dedup_bucket_cap_identical(spark):
    """Splitting hot k-means cells into capped chunk tasks must not
    change the result set."""
    df, X, _ = _corpus(spark)
    a = semantic_dedup(df, threshold=0.95, n_lists=2, keep="min_id",
                       bucket_cap=3, train_size=1000).toPandas()
    b = semantic_dedup(df, threshold=0.95, n_lists=2, keep="min_id",
                       bucket_cap=5_000, train_size=1000).toPandas()
    assert sorted(a.doc_id) == sorted(b.doc_id)


def test_semantic_dedup_single_cell_equals_bruteforce(spark):
    """n_lists=1 removes the clustering approximation — the kept set
    must exactly match the all-pairs numpy oracle even at a loose
    threshold where groups start merging."""
    df, X, _ = _corpus(spark, n_groups=6, dup_sizes=(2, 4), seed=3)
    out = semantic_dedup(df, threshold=0.9, n_lists=1, keep="min_id",
                         train_size=1000).toPandas()
    comp = _numpy_oracle(X, 0.9)
    exp = sorted({int(np.min(np.where(comp == c)[0])) for c in set(comp)})
    assert sorted(out.doc_id) == exp


def test_semantic_dedup_zero_norm_passthrough(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "embedding": [[1.0, 0.0], [1.0, 0.001], [0.0, 0.0]],
    })
    df = spark.createDataFrame(pdf).withColumn(
        "embedding", F.col("embedding").cast("array<float>"))
    out = semantic_dedup(df, threshold=0.99, n_lists=1, keep="min_id",
                         train_size=10).toPandas()
    assert sorted(out.doc_id) == [0, 2]          # 1 deduped into 0
    assert out[out.doc_id == 2].cluster_size.iloc[0] == 1


def test_semantic_dedup_rejects_bad_policy(spark):
    df, _, _ = _corpus(spark, n_groups=2)
    with pytest.raises(ValueError, match="keep policy"):
        semantic_dedup(df, keep="random")
