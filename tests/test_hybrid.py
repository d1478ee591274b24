"""hybrid query: normalization + combination formulas vs an
independent pandas replay over the engine's own sub-score sets."""

import math

import pytest

from anomaly_detection_spark.query.hybrid import (_sub_scores,
                                                  hybrid_search)


@pytest.fixture(scope="module")
def corpus(spark):
    from anomaly_detection_spark.query import analyze_docs

    rows = [
        (0, "spark query engine", [1.0, 0.0]),
        (1, "query data spark spark", [0.9, 0.1]),
        (2, "lazy dog sleeps", [0.0, 1.0]),
        (3, "spark", [0.5, 0.5]),
    ]
    df = spark.createDataFrame(
        rows, "docid long, text string, emb array<double>")
    an = analyze_docs(df)
    if "emb" not in an.columns:
        an = an.join(df.select("docid", "emb"), "docid")
    return an.persist()


SUBS = [{"match": {"text": "spark query"}},
        {"knn": {"emb": {"vector": [1.0, 0.0],
                         "space_type": "cosinesimil"}}}]


def _replay(score_sets, weights, normalization, combination, window=None):
    normed = []
    for s in score_sets:
        s = dict(s)
        if window is not None:
            top = sorted(s.items(), key=lambda kv: (-kv[1], kv[0]))
            s = dict(top[:window])
        if not s:
            normed.append({})
            continue
        vals = list(s.values())
        if normalization == "min_max":
            lo, hi = min(vals), max(vals)
            normed.append({d: 1.0 if hi == lo else (v - lo) / (hi - lo)
                           for d, v in s.items()})
        else:
            nrm = math.sqrt(sum(v * v for v in vals))
            normed.append({d: v / nrm for d, v in s.items()})
    docs = set().union(*[set(n) for n in normed])
    out = {}
    for d in docs:
        if combination == "arithmetic_mean":
            out[d] = sum(w * n.get(d, 0.0)
                         for w, n in zip(weights, normed)) / sum(weights)
        elif combination == "geometric_mean":
            ws = [(w, n[d]) for w, n in zip(weights, normed)
                  if n.get(d, 0.0) > 0]
            if not ws:     # no positive sub-score: dropped, like the
                continue   # engine's pos-filter
            out[d] = math.exp(sum(w * math.log(v) for w, v in ws)
                              / sum(w for w, _ in ws))
        else:
            ws = [(w, n[d]) for w, n in zip(weights, normed)
                  if n.get(d, 0.0) > 0]
            if not ws:
                continue
            out[d] = sum(w for w, _ in ws) / sum(w / v for w, v in ws)
    return out


def _score_sets(corpus):
    return [{r["docid"]: r["score"]
             for r in _sub_scores(corpus, q, "text").collect()}
            for q in SUBS]


@pytest.mark.parametrize("normalization", ["min_max", "l2"])
@pytest.mark.parametrize(
    "combination", ["arithmetic_mean", "geometric_mean",
                    "harmonic_mean"])
def test_hybrid_vs_replay(corpus, normalization, combination):
    weights = [0.7, 0.3]
    got = {r["docid"]: r["score"] for r in hybrid_search(
        corpus, SUBS, k=10, normalization=normalization,
        combination=combination, weights=weights).collect()}
    want = _replay(_score_sets(corpus), weights, normalization,
                   combination)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d]), (d, normalization,
                                                  combination)


def test_hybrid_missing_doc_semantics(corpus):
    # doc 2 matches only the knn sub-query (and tops it): arithmetic
    # mean dilutes it by the other sub-query's weight; geometric
    # averages over present sub-queries only and keeps its own scale
    subs = [SUBS[0],
            {"knn": {"emb": {"vector": [0.2, 1.0],
                             "space_type": "cosinesimil"}}}]
    sets = [{r["docid"]: r["score"]
             for r in _sub_scores(corpus, q, "text").collect()}
            for q in subs]
    assert 2 not in sets[0] and 2 in sets[1]
    arith = {r["docid"]: r["score"] for r in hybrid_search(
        corpus, subs, combination="arithmetic_mean").collect()}
    geo = {r["docid"]: r["score"] for r in hybrid_search(
        corpus, subs, combination="geometric_mean").collect()}
    assert arith[2] == pytest.approx(
        _replay(sets, [1, 1], "min_max", "arithmetic_mean")[2])
    assert geo[2] == pytest.approx(
        _replay(sets, [1, 1], "min_max", "geometric_mean")[2])
    assert geo[2] > arith[2]


def test_hybrid_window(corpus):
    got = {r["docid"]: r["score"] for r in hybrid_search(
        corpus, SUBS, window=2).collect()}
    want = _replay(_score_sets(corpus), [1, 1], "min_max",
                   "arithmetic_mean", window=2)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d])


def test_hybrid_rejections(corpus):
    with pytest.raises(ValueError, match="at least one"):
        hybrid_search(corpus, [])
    with pytest.raises(ValueError, match="normalization"):
        hybrid_search(corpus, SUBS, normalization="zscore")
    with pytest.raises(ValueError, match="combination"):
        hybrid_search(corpus, SUBS, combination="max")
    with pytest.raises(ValueError, match="weights"):
        hybrid_search(corpus, SUBS, weights=[1.0])
