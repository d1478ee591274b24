"""Round-5 advisor/verdict fixes: fuzzy OSA distance, negative
date_histogram offset, adjacency_matrix sub-agg guard, top_metrics
tie-breaker, merger positional-mix guard, duplicate_clusters
logarithmic convergence."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.functions.fuzzy import (
    osa_distance_batch,
    parse_fuzziness,
)
from anomaly_detection_spark.query.planner import compile_filter


# ---------------------------------------------------------------- fuzzy

def test_osa_counts_transposition_as_one():
    s = pd.Series(["ba", "ab", "abc", "acb", "axc", "xy", None])
    d = osa_distance_batch(s, "ab").tolist()
    assert d[0] == 1          # transposition = 1 (plain lev says 2)
    assert d[1] == 0
    d2 = osa_distance_batch(s, "abc").tolist()
    assert d2[3] == 1         # 'acb' ~ 'abc' transposition
    assert d2[4] == 1         # substitution
    assert d2[5] == 3


def test_osa_matches_levenshtein_when_no_transpositions():
    # random strings vs a query: OSA <= lev always, equal when the
    # optimal alignment uses no transposition
    rng = np.random.default_rng(7)
    alpha = "abcd"
    strs = ["".join(rng.choice(list(alpha), size=rng.integers(0, 8)))
            for _ in range(200)]

    def lev(a, b):
        m, n = len(a), len(b)
        D = np.zeros((m + 1, n + 1), dtype=int)
        D[:, 0] = np.arange(m + 1)
        D[0, :] = np.arange(n + 1)
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                D[i, j] = min(D[i - 1, j] + 1, D[i, j - 1] + 1,
                              D[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
        return D[m, n]

    q = "abca"
    got = osa_distance_batch(pd.Series(strs), q).to_numpy()
    ref = np.array([lev(s, q) for s in strs])
    assert (got <= ref).all()
    assert (got >= ref - 1).all()  # one transposition saves at most... (sanity)


def test_fuzzy_query_matches_transposition(spark):
    df = spark.createDataFrame(
        [("ba",), ("ab",), ("zz",), ("abx",)], ["k"])
    cond = compile_filter(df, {"fuzzy": {"k": {"value": "ab",
                                               "fuzziness": 1}}})
    got = sorted(r["k"] for r in df.filter(cond).collect())
    assert got == ["ab", "abx", "ba"]


def test_fuzzy_auto_low_high_parsing():
    assert parse_fuzziness("AUTO", "ab") == 0
    assert parse_fuzziness("AUTO", "abcd") == 1
    assert parse_fuzziness("AUTO", "abcdef") == 2
    assert parse_fuzziness("AUTO:2,4", "a") == 0
    assert parse_fuzziness("AUTO:2,4", "abc") == 1
    assert parse_fuzziness("AUTO:2,4", "abcd") == 2
    assert parse_fuzziness(2, "whatever") == 2
    with pytest.raises(ValueError, match="AUTO:low,high"):
        parse_fuzziness("AUTO:x,y", "abc")
    with pytest.raises(ValueError, match="unsupported fuzziness"):
        parse_fuzziness("AUTO;3,6", "abc")
    with pytest.raises(ValueError):
        parse_fuzziness("AUTO:5,2", "abc")


# ------------------------------------------------- date_histogram offset

def test_offset_ms_accepts_negative():
    from anomaly_detection_spark.query.aggs_body import offset_ms

    assert offset_ms("-1h") == -3600_000
    assert offset_ms("+30m") == 1800_000
    assert offset_ms("15s") == 15_000
    with pytest.raises(ValueError, match="offset"):
        offset_ms("-1w")


def test_body_date_histogram_negative_offset(spark):
    from anomaly_detection_spark.query.aggs_body import run_aggs

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(6)], ["n", "v"]
    ).withColumn("ts", F.timestamp_millis(F.col("n") * 3600_000))
    body = {"size": 0, "aggs": {"h": {"date_histogram": {
        "field": "ts", "fixed_interval": "2h", "offset": "-1h"}}}}
    out = run_aggs(df, body)["h"].orderBy("bucket_start").collect()
    # buckets shifted back 1h: [-1h,1h) gets hour 0; [1h,3h) hours 1,2 …
    counts = [r["doc_count"] for r in out]
    assert counts == [1, 2, 2, 1]


# ------------------------------------------------- adjacency_matrix guard

def test_adjacency_matrix_subaggs_raise(spark):
    from anomaly_detection_spark.query.aggs_body import run_aggs

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["v", "t"])
    body = {"size": 0, "aggs": {"am": {
        "adjacency_matrix": {"filters": {
            "x": {"term": {"t": "a"}}, "y": {"range": {"v": {"gte": 2}}}}},
        "aggs": {"m": {"avg": {"field": "v"}}}}}}
    with pytest.raises(ValueError, match="adjacency_matrix sub-agg"):
        run_aggs(df, body)


# ------------------------------------------------- top_metrics tie-break

def test_top_metrics_tie_breaker_deterministic(spark):
    from anomaly_detection_spark.query.aggs import top_metrics_agg

    rows = [(i, 5.0, float(100 + i)) for i in range(50)]  # all tie on s
    df = spark.createDataFrame(rows, ["rid", "s", "m"]).repartition(8)
    out = top_metrics_agg(df, ["m", "rid"], "s", order="desc",
                          tie_breaker_col="rid").collect()[0]
    # highest rid among the tied rows wins, consistently across metrics
    assert out["rid"] == 49 and out["m"] == 149.0 and out["s_top"] == 5.0
    out2 = top_metrics_agg(df, ["m", "rid"], "s", order="asc",
                           tie_breaker_col="rid").collect()[0]
    assert out2["rid"] == 0 and out2["m"] == 100.0


# ------------------------------------------------- merger positional mix

def test_merge_raises_on_mixed_positional_blocks():
    from anomaly_detection_spark.index.merger import _merge_new_seg

    pdf = pd.DataFrame({
        "term": ["t", "t"], "seg_id": [0, 1], "block_id": [0, 0],
        "new_seg": [0, 0], "first_docid": [0, 4], "last_docid": [1, 5],
        "n": [2, 2],
        "gaps": [bytes([0, 1]), bytes([0, 1])],
        "tfs": [bytes([1, 1]), bytes([1, 1])],
        "pos": [bytes([0, 0]), None],   # one block lacks positions
    })
    with pytest.raises(ValueError, match="mixes positional"):
        _merge_new_seg(pdf, block_size=128, src_seg_size=4, new_seg_size=8,
                       bucket_size=4, positions_expected=True)


# ------------------------------------------------- duplicate_clusters

def test_duplicate_clusters_chain_converges_logarithmically(spark):
    from anomaly_detection_spark.pipeline.dedup import duplicate_clusters

    # 120-hop chain: min-label alone needs ~120 rounds; pointer doubling
    # must close it within 10
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], ["id_a", "id_b"])
    out = duplicate_clusters(pairs, max_iter=10).collect()
    assert len(out) == 121
    assert all(r["cluster_id"] == 0 for r in out)
    assert all(r["cluster_size"] == 121 for r in out)


def test_duplicate_clusters_raises_instead_of_splitting(spark):
    from anomaly_detection_spark.pipeline.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(pairs, max_iter=2)


def test_duplicate_clusters_multi_components_unchanged(spark):
    from anomaly_detection_spark.pipeline.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        ["id_a", "id_b"])
    out = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
           for r in duplicate_clusters(pairs).collect()}
    assert out[1] == (1, 3) and out[3] == (1, 3)
    assert out[11] == (10, 2)
    assert out[20] == (20, 3) and out[22] == (20, 3)


# ------------------------------------------------- cardinality fold

def test_cardinality_hll_accuracy(spark):
    """A3 cardinality (HLL++): the approx_count_distinct estimate must
    land within the default rsd (~5%, 3-sigma margin) of the exact
    distinct count — the gate entry folded into this check."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    approx = ev.agg(F.approx_count_distinct("user_id")).collect()[0][0]
    exact = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert abs(approx - exact) <= max(3, 0.15 * exact), (approx, exact)


# ------------------------------------------------- IVF-PQ (stretch)

def test_ivfpq_recall_compression_determinism(spark):
    """IVF-PQ: recall@10 >= 0.9 of exact cosine with >= 8x vector
    compression, scoring candidates from CODES only (no raw-vector
    rerank), fully deterministic."""
    import numpy as np
    from pyspark.sql import functions as F

    from anomaly_detection_spark.pipeline import (
        cosine_topk_bruteforce,
        ivf_centroids,
        ivfpq_ann_topk,
        pq_encode,
        pq_train_books,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").persist()
    qv = emb.limit(8).select(F.col("vec_id").alias("query_id"),
                             "embedding")
    from anomaly_detection_spark.pipeline import ivf_ann_topk

    exact = cosine_topk_bruteforce(emb, qv, k=10).toPandas()

    def recall(got):
        hits = tot = 0
        for qid, grp in exact.groupby("query_id"):
            want = set(grp.vec_id)
            have = set(got[got.query_id == qid].vec_id)
            hits += len(want & have)
            tot += len(want)
        return hits / tot

    got = ivfpq_ann_topk(emb, qv, k=10, n_lists=16, n_probe=6,
                         train_size=500).toPandas()
    got2 = ivfpq_ann_topk(emb, qv, k=10, n_lists=16, n_probe=6,
                          train_size=500).toPandas()
    assert got.equals(got2), "ivfpq must be deterministic"

    # the PQ claim in isolation (full probe removes the coarse-probe
    # loss, which these near-random synthetic vectors maximize and
    # which is identical for plain IVF): codes-only scoring keeps
    # recall@10 >= 0.9 of exact
    full = ivfpq_ann_topk(emb, qv, k=10, n_lists=16, n_probe=16,
                          train_size=500).toPandas()
    assert recall(full) >= 0.9, recall(full)
    # at a partial probe, PQ scoring loses <= 0.05 recall vs the same
    # probes reranked on raw vectors
    ivf_same = ivf_ann_topk(emb, qv, k=10, n_lists=16, n_probe=6,
                            train_size=500).toPandas()
    assert recall(got) >= recall(ivf_same) - 0.05, \
        (recall(got), recall(ivf_same))

    # compression: one byte per subquantizer (d/2 of them) vs d float32
    C = ivf_centroids(emb, n_lists=16, train_size=500)
    books = pq_train_books(emb, C, train_size=500)
    enc = pq_encode(emb, C, books)
    row = enc.limit(1).collect()[0]
    d = len(emb.limit(1).collect()[0]["embedding"])
    assert len(row["_code"]) == d // 2
    assert (d * 4) / len(row["_code"]) >= 8.0
    assert enc.count() == emb.count()

    # amortized-index path matches the end-to-end call
    got3 = ivfpq_ann_topk(emb, qv, k=10, n_lists=16, n_probe=6,
                          train_size=500, centroids=C, books=books,
                          encoded=enc).toPandas()
    assert got3.equals(got)


# ------------------------------------------------- code-review fixes

def test_seasonal_forecaster_horizon_beyond_period():
    import numpy as np

    from anomaly_detection_spark.forecast import seasonal_naive_forecaster

    vals = np.tile([1.0, 2.0, 3.0, 4.0], 5)          # period 4, n=20
    fc = seasonal_naive_forecaster(period=4, horizon=8, n_periods=3)
    out, lo, hi = fc(vals)
    assert len(out) == 8 and not np.isnan(out).any()
    # same-slot medians repeat the seasonal pattern across BOTH periods
    assert np.allclose(out, [1, 2, 3, 4, 1, 2, 3, 4])
    assert (lo <= out).all() and (hi >= out).all()


def test_query_string_field_qualified_phrase():
    from anomaly_detection_spark.query import compile_query_string

    dsl = compile_query_string(
        {"query": 'message:"error timeout"~1',
         "analyzed_fields": ["message"]})
    assert dsl == {"match_phrase": {"message": {"query": "error timeout",
                                                "slop": 1}}}


def test_query_string_unterminated_quote_raises_strict():
    import pytest as _pt

    from anomaly_detection_spark.query import compile_query_string

    with _pt.raises(ValueError, match="unterminated|unparsable"):
        compile_query_string({"query": 'hello "world of data'})
    # lenient mode degrades instead
    dsl = compile_query_string({"query": 'hello "world of data'},
                               simple=True)
    assert dsl == {"match": {"text": "hello world of data"}}


def test_simple_query_string_dangling_operator_never_raises():
    from anomaly_detection_spark.query import compile_query_string

    assert compile_query_string({"query": "foo |"}, simple=True) \
        == {"match": {"text": "foo"}}
    assert compile_query_string({"query": "foo -"}, simple=True) \
        == {"match": {"text": "foo"}}
    import pytest as _pt

    with _pt.raises(ValueError, match="dangling"):
        compile_query_string({"query": "foo AND"})


def test_query_string_multi_field_term_bag():
    import pytest as _pt

    from anomaly_detection_spark.query import compile_query_string

    dsl = compile_query_string({"query": "error timeout",
                                "fields": ["title", "body"]})
    assert dsl == {"multi_match": {"query": "error timeout",
                                   "fields": ["title", "body"]}}
    with _pt.raises(ValueError, match="multi-field"):
        compile_query_string({"query": '"a phrase"',
                              "fields": ["title", "body"]})
    # lenient multi-field degrades to the multi_match bag
    dsl2 = compile_query_string({"query": '"a phrase"',
                                 "fields": ["title", "body"]},
                                simple=True)
    assert dsl2 == {"multi_match": {"query": "a phrase",
                                    "fields": ["title", "body"]}}


def test_rcf_expected_uses_preabsorb_stats():
    import numpy as np

    from anomaly_detection_spark.features.rcf import RCFStream

    rng = np.random.default_rng(2)
    s = RCFStream(shingle=4, n_trees=10, sample_size=32, min_samples=8)
    for v in rng.normal(100.0, 1.0, 200):
        s.update(v)
    mean_before = s.in_mean[0]
    _, exp = s.update(100000.0)               # massive spike
    # expected must reflect the PRE-spike level, not be dragged toward
    # the anomaly by absorbing it into the stats first
    assert abs(exp - mean_before) < 50.0, (exp, mean_before)
