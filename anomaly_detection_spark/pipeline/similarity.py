"""Similarity search over an embedding column (array<float>).

- ``cosine_topk_bruteforce``: exact top-k neighbors per query vector —
  broadcast the (small) query set against the corpus, dot products via
  ``F.zip_with``/``F.aggregate`` (JVM-side), per-query top-k via a
  window.  The correctness baseline.
- ``lsh_ann_topk``: random-hyperplane LSH — deterministic seeded
  planes, signature = packed sign bits (JVM-side dot via zip_with),
  candidates share a signature band, rerank candidates exactly.  The
  scale path: candidate generation touches only bucket collisions, and
  buckets are hash-partitioned (no N×N join).  Recall < 1 by design;
  measured against the brute-force baseline in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from ..localdf import local_df


def band_hashes(vec_col, planes: np.ndarray, bands: int) -> F.Column:
    """``array<long>`` of LSH band hashes for a vector column: sign bits
    against the hyperplanes, packed per band and salted with the band
    index (disjoint hash spaces across bands).

    One Arrow-batched matmul instead of ``n_planes × dim`` literal
    expressions — at dim ≥ 768 the literal-array form blows up codegen.
    """
    planes = np.asarray(planes, dtype=np.float64)
    n_planes = planes.shape[0]
    rows = n_planes // bands
    pows = (np.int64(1) << np.arange(rows, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _bh(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        M = np.array(vs.tolist(), dtype=np.float64)         # (n, dim)
        bits = (M @ planes.T) >= 0                           # (n, n_planes)
        out = np.empty((len(vs), bands), dtype=np.int64)
        for bnd in range(bands):
            chunk = bits[:, bnd * rows:(bnd + 1) * rows]
            out[:, bnd] = (np.int64(bnd) << np.int64(rows)) | (chunk @ pows)
        return pd.Series(list(out))

    return _bh(vec_col)


def _norm(col) -> F.Column:
    return F.sqrt(F.aggregate(col, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x))


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, rank, vec_id, cosine).
    Ties break by vec_id ascending.  Self-matches (same id) excluded
    when query ids live in the same id space."""
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("_cv"), _norm(vec_col).alias("_cn")) \
        .filter(F.col("_cn") > 0)
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv"), _norm(vec_col).alias("_qn")) \
        .filter(F.col("_qn") > 0)
    joined = c.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    scored = joined.withColumn(
        "cosine", F.round(_dot(F.col("_qv"), F.col("_cv"))
                          / (F.col("_qn") * F.col("_cn")), 6))
    return _topk_per_query(scored, k)


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).round(6).tolist()


def _topk_per_query(scored: DataFrame, k: int,
                    score_col: str = "cosine") -> DataFrame:
    """Per-query top-k in two stages: partition-local heads first
    (partitionBy(query, input partition)), then the global rank over
    ≤ k × n_partitions survivors — so no single task ever sorts one
    query's ENTIRE candidate set (a hot LSH bucket or a full-corpus
    scan would otherwise funnel millions of rows into one window
    task).  Ties break by vec_id in both stages → results identical
    to the single-window form."""
    order = [F.desc(score_col), F.asc("vec_id")]
    local_w = Window.partitionBy("query_id", "_part").orderBy(*order)
    final_w = Window.partitionBy("query_id").orderBy(*order)
    return (scored.withColumn("_part", F.spark_partition_id())
            .withColumn("_r", F.row_number().over(local_w))
            .filter(F.col("_r") <= k).drop("_r", "_part")
            .withColumn("rank", F.row_number().over(final_w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id", score_col)
            .orderBy("query_id", "rank"))


def ivf_centroids(
    corpus: DataFrame,
    n_lists: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_size: int = 10_000,
    n_iter: int = 10,
    seed: int = 13,
) -> np.ndarray:
    """Train IVF coarse-quantizer centroids (unit-normalized, cosine
    metric) on a bounded DETERMINISTIC sample — the FAISS posture:
    k-means quality saturates on a sample long before corpus scale, so
    training cost is O(train_size), independent of the corpus.  Sample
    = first ``train_size`` non-zero vectors by id (stable across runs
    and cluster layouts); seeded k-means++ init, ``n_iter`` Lloyd
    steps in one numpy batch on the driver."""
    rows = (corpus.select(F.col(id_col).alias("_id"),
                          F.col(vec_col).alias("_v"))
            .filter(_norm(F.col("_v")) > 0)
            .orderBy("_id").limit(train_size).collect())
    if not rows:
        raise ValueError(
            "ivf_centroids: no non-zero vectors to train on (empty "
            "corpus or all-zero embeddings)")
    X = np.array([r["_v"] for r in rows], dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    n_lists = min(n_lists, len(X))
    rng = np.random.RandomState(seed)
    # k-means++ seeding
    cent = [X[rng.randint(len(X))]]
    d2 = np.full(len(X), np.inf)
    for _ in range(1, n_lists):
        d2 = np.minimum(d2, 1.0 - X @ cent[-1])
        probs = np.maximum(d2, 1e-12)
        cent.append(X[rng.choice(len(X), p=probs / probs.sum())])
    C = np.array(cent)
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(n_lists):
            m = assign == j
            if m.any():
                c = X[m].mean(axis=0)
                nrm = np.linalg.norm(c)
                if nrm > 0:
                    C[j] = c / nrm
    return C


def ivf_assign(corpus: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding") -> DataFrame:
    """Add ``_list`` (nearest-centroid id, cosine) — one Arrow matmul
    per batch, the distributed IVF list assignment."""
    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.IntegerType())
    def _assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        M = np.array(vs.tolist(), dtype=np.float64)
        nrm = np.linalg.norm(M, axis=1, keepdims=True)
        M = M / np.maximum(nrm, 1e-12)
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    return corpus.withColumn("_list", _assign(F.col(vec_col)))


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 64,
    n_probe: int = 8,
    train_size: int = 10_000,
    seed: int = 13,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    centroids: np.ndarray | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate cosine top-k: coarse-quantize the corpus into
    ``n_lists`` inverted lists, probe each query's ``n_probe`` nearest
    lists, rerank candidates exactly.  The scale path that prunes by
    CLUSTER STRUCTURE (vs ``lsh_ann_topk``'s random hyperplanes):
    candidate generation is an equi-join on the list id — per query
    only ~``n_probe/n_lists`` of the corpus is touched, and lists are
    hash-partitioned (no N×N work).  Recall < 1 by design, measured in
    tests.  Pass ``centroids``/``assigned`` (from
    :func:`ivf_centroids` / :func:`ivf_assign`, persisted) to amortize
    the index across query batches."""
    if centroids is None:
        centroids = ivf_centroids(corpus, n_lists=n_lists,
                                  vec_col=vec_col, id_col=id_col,
                                  train_size=train_size, seed=seed)
    C = np.asarray(centroids, dtype=np.float64)
    n_probe = min(n_probe, len(C))

    c = (assigned if assigned is not None
         else ivf_assign(corpus, C, vec_col)) \
        .select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"),
                _norm(F.col(vec_col)).alias("_cn"), "_list") \
        .filter(F.col("_cn") > 0)

    npb = n_probe

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _probes(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        M = np.array(vs.tolist(), dtype=np.float64)
        nrm = np.linalg.norm(M, axis=1, keepdims=True)
        M = M / np.maximum(nrm, 1e-12)
        sims = M @ C.T
        top = np.argpartition(-sims, npb - 1, axis=1)[:, :npb]
        return pd.Series([row.astype(np.int32) for row in top])

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"), _norm(F.col(vec_col)).alias("_qn"),
        _probes(F.col(vec_col)).alias("_probes")) \
        .filter(F.col("_qn") > 0) \
        .select("query_id", "_qv", "_qn",
                F.explode("_probes").alias("_list"))

    cand = (c.join(F.broadcast(q), "_list")
            .filter(F.col("vec_id") != F.col("query_id")))
    scored = cand.withColumn(
        "cosine", F.round(_dot(F.col("_qv"), F.col("_cv"))
                          / (F.col("_qn") * F.col("_cn")), 6))
    return _topk_per_query(scored, k)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 13,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k: hyperplane-LSH buckets → exact rerank
    of candidates.  Bands of ``n_planes/bands`` sign bits; a candidate
    must share at least one full band with the query."""
    assert n_planes % bands == 0
    if dim is None:
        # convenience for small corpora; pass dim explicitly at scale
        # (a first() here is one extra tiny job, not a correctness issue)
        dim = len(corpus.select(vec_col).first()[0])
    planes = np.asarray(_planes(dim, n_planes, seed))

    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"),
                      _norm(vec_col).alias("_cn"),
                      band_hashes(F.col(vec_col), planes, bands).alias("_bands")) \
        .filter(F.col("_cn") > 0)
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv"), _norm(vec_col).alias("_qn"),
                       band_hashes(F.col(vec_col), planes, bands).alias("_bands")) \
        .filter(F.col("_qn") > 0)

    c_st = c.select("vec_id", "_cv", "_cn", F.explode("_bands").alias("_bv"))
    q_st = q.select("query_id", "_qv", "_qn", F.explode("_bands").alias("_bv"))
    cand = (c_st.join(F.broadcast(q_st), "_bv")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "_qv", "_qn", "vec_id", "_cv", "_cn")
            .distinct())
    scored = cand.withColumn(
        "cosine", F.round(_dot(F.col("_qv"), F.col("_cv"))
                          / (F.col("_qn") * F.col("_cn")), 6))
    return _topk_per_query(scored, k)


# --------------------------------------------------------------- IVF-PQ


def pq_train_books(
    corpus: DataFrame,
    centroids: np.ndarray,
    m_sub: int | None = None,
    n_codes: int = 256,
    train_size: int = 10_000,
    n_iter: int = 10,
    seed: int = 13,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train product-quantizer codebooks on coarse-quantization
    RESIDUALS (the FAISS IVFPQ posture): the same bounded deterministic
    sample as :func:`ivf_centroids`, residual r = x̂ − c_list, dims
    split into ``m_sub`` subspaces (default d/2 → 2 dims each, 8×
    compression at 8-bit codes vs float32), seeded Lloyd k-means per
    subspace — all one numpy batch on the driver, O(train_size)
    regardless of corpus scale.  Returns ``books[m_sub, n_codes,
    d_sub]`` (unused code slots repeat the last trained codeword so
    lookups stay dense)."""
    C = np.asarray(centroids, dtype=np.float64)
    rows = (corpus.select(F.col(id_col).alias("_id"),
                          F.col(vec_col).alias("_v"))
            .filter(_norm(F.col("_v")) > 0)
            .orderBy("_id").limit(train_size).collect())
    if not rows:
        raise ValueError("pq_train_books: no non-zero vectors to train on")
    X = np.array([r["_v"] for r in rows], dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    d = X.shape[1]
    M = m_sub if m_sub is not None else d // 2
    if d % M != 0:
        raise ValueError(f"dim {d} not divisible by m_sub {M}")
    dsub = d // M
    R = X - C[np.argmax(X @ C.T, axis=1)]
    rng = np.random.RandomState(seed)
    books = np.empty((M, n_codes, dsub))
    for m in range(M):
        sub = R[:, m * dsub:(m + 1) * dsub]
        kk = min(n_codes, len(sub))
        init = rng.choice(len(sub), size=kk, replace=False)
        B = sub[init].copy()
        for _ in range(n_iter):
            # squared-L2 assignment, vectorized: argmin ||r − b||²
            d2 = (-2.0 * sub @ B.T
                  + (B * B).sum(axis=1)[None, :])
            assign = np.argmin(d2, axis=1)
            for j in range(kk):
                msk = assign == j
                if msk.any():
                    B[j] = sub[msk].mean(axis=0)
        books[m, :kk] = B
        if kk < n_codes:
            books[m, kk:] = B[kk - 1]
    return books


def pq_encode(
    corpus: DataFrame,
    centroids: np.ndarray,
    books: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode the corpus to (vec_id, _list, _code): coarse list id +
    one byte per subquantizer (binary column — the ≥8× compressed
    representation that ships instead of raw vectors).  One Arrow
    matmul batch per partition; zero-norm vectors are dropped like the
    exact path."""
    C = np.asarray(centroids, dtype=np.float64)
    B = np.asarray(books, dtype=np.float64)
    M, n_codes, dsub = B.shape
    if n_codes > 256:
        raise ValueError("pq_encode packs one byte per subquantizer; "
                         "n_codes must be <= 256")
    out_schema = T.StructType([
        T.StructField("vec_id", corpus.schema[id_col].dataType),
        T.StructField("_list", T.IntegerType()),
        T.StructField("_code", T.BinaryType()),
    ])
    # flat (M·n_codes, dsub) codebook with per-row squared norms: one
    # argmin per subspace over a strided view
    Bn2 = (B * B).sum(axis=2)                     # (M, n_codes)

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["_v"].tolist(), dtype=np.float64)
            nrm = np.linalg.norm(X, axis=1)
            keep = nrm > 0
            if not keep.any():
                continue
            X = X[keep] / nrm[keep, None]
            lists = np.argmax(X @ C.T, axis=1)
            R = X - C[lists]
            n = len(X)
            codes = np.empty((n, M), dtype=np.uint8)
            for m in range(M):
                sub = R[:, m * dsub:(m + 1) * dsub]
                d2 = -2.0 * sub @ B[m].T + Bn2[m][None, :]
                codes[:, m] = np.argmin(d2, axis=1).astype(np.uint8)
            yield pd.DataFrame({
                "vec_id": pdf[id_col].to_numpy()[keep],
                "_list": lists.astype(np.int32),
                "_code": [c.tobytes() for c in codes],
            })

    src = corpus.select(F.col(id_col).alias(id_col),
                        F.col(vec_col).alias("_v"))
    return src.mapInPandas(enc, schema=out_schema)


def ivfpq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 64,
    n_probe: int = 8,
    m_sub: int | None = None,
    train_size: int = 10_000,
    seed: int = 13,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    centroids: np.ndarray | None = None,
    books: np.ndarray | None = None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k by inner product of normalized vectors
    (≈ cosine): probe ``n_probe`` lists per query, score candidates by
    asymmetric distance computation — score = q·c_list + Σ_m
    table_q[m, code_m] with per-query lookup tables q_m · books[m]ᵀ —
    WITHOUT touching raw vectors (the 100 TB memory posture: the
    encoded corpus is the ~8×-compressed codes, nothing is reranked
    raw).  Deterministic end to end; recall floors measured in
    tests/test_pipeline_ops.py.  Pass ``centroids``/``books``/
    ``encoded`` to amortize the index across query batches."""
    if centroids is None:
        centroids = ivf_centroids(corpus, n_lists=n_lists,
                                  vec_col=vec_col, id_col=id_col,
                                  train_size=train_size, seed=seed)
    C = np.asarray(centroids, dtype=np.float64)
    if books is None:
        books = pq_train_books(corpus, C, m_sub=m_sub,
                               train_size=train_size, seed=seed,
                               vec_col=vec_col, id_col=id_col)
    B = np.asarray(books, dtype=np.float64)
    M, n_codes, dsub = B.shape
    n_probe = min(n_probe, len(C))
    enc = encoded if encoded is not None \
        else pq_encode(corpus, C, B, vec_col=vec_col, id_col=id_col)

    # driver-side query prep (queries are the small broadcast side):
    # normalized vectors, probe lists, ADC tables per query
    qrows = (queries.select(F.col(query_id_col).alias("_qid"),
                            F.col(vec_col).alias("_qv"))
             .filter(_norm(F.col("_qv")) > 0).collect())
    if not qrows:
        return local_df(corpus.sparkSession,
            [], f"query_id {queries.schema[query_id_col].dataType.simpleString()},"
                f" rank long, vec_id {corpus.schema[id_col].dataType.simpleString()},"
                f" score double")
    qids = [r["_qid"] for r in qrows]
    Q = np.array([r["_qv"] for r in qrows], dtype=np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    qc = Q @ C.T                                   # (nq, n_lists)
    probes = np.argpartition(-qc, n_probe - 1, axis=1)[:, :n_probe]
    # tables[i]: (M, n_codes) — q_m · books[m]ᵀ
    tables = np.einsum("qmd,mcd->qmc",
                       Q.reshape(len(Q), M, dsub), B)
    spark = corpus.sparkSession
    probe_rows = [(qid, int(l)) for i, qid in enumerate(qids)
                  for l in probes[i]]
    qdf = local_df(
        spark, probe_rows,
        f"query_id {queries.schema[query_id_col].dataType.simpleString()},"
        f" _list long")

    cand = enc.join(F.broadcast(qdf), "_list") \
        .filter(F.col("vec_id") != F.col("query_id"))
    qindex = {qid: i for i, qid in enumerate(qids)}

    out_schema = T.StructType([
        T.StructField("query_id", queries.schema[query_id_col].dataType),
        T.StructField("vec_id", corpus.schema[id_col].dataType),
        T.StructField("score", T.DoubleType()),
    ])

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf["_code"]), dtype=np.uint8).reshape(-1, M)
            qi = pdf["query_id"].map(qindex).to_numpy(np.int64)
            lists = pdf["_list"].to_numpy(np.int64)
            s = qc[qi, lists]
            cols = np.arange(M)
            s = s + tables[qi[:, None], cols[None, :],
                           codes.astype(np.int64)].sum(axis=1)
            yield pd.DataFrame({"query_id": pdf["query_id"],
                                "vec_id": pdf["vec_id"],
                                "score": s})

    scored = cand.mapInPandas(score, schema=out_schema) \
        .withColumn("score", F.round("score", 6))
    return _topk_per_query(scored, k, score_col="score")
