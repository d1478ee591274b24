"""rank_feature scoring, field collapse, and the term suggester."""

import math

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.query import analyze_docs
from anomaly_detection_spark.query.brute_force import bm25_scores
from anomaly_detection_spark.query.compound import compound_scores
from anomaly_detection_spark.query.planner import compile_filter, search
from anomaly_detection_spark.query.suggest import suggest_terms


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "user", 5.0, "the quick brown fox jumps"),
        (1, "tool", 2.0, "quick query data"),
        (2, "user", 8.0, "slow query engine"),
        (3, "user", 0.0, "nothing relevant here"),
        (4, "tool", 1.0, "quick quick query data"),
        (5, "tool", 0.0, "quack sound data"),
    ]
    df = spark.createDataFrame(rows, ["docid", "role", "pri", "text"])
    return analyze_docs(df).persist()


# -------------------------------------------------------- rank_feature

def test_rank_feature_saturation_log_sigmoid(docs):
    got = {r["docid"]: r["score"] for r in compound_scores(docs, {
        "rank_feature": {"field": "pri",
                         "saturation": {"pivot": 4.0},
                         "boost": 2.0}}).collect()}
    assert 3 not in got  # zero feature doesn't match
    for d, x in ((0, 5.0), (1, 2.0), (2, 8.0), (4, 1.0)):
        assert got[d] == pytest.approx(2.0 * x / (x + 4.0))
    got = {r["docid"]: r["score"] for r in compound_scores(docs, {
        "rank_feature": {"field": "pri",
                         "log": {"scaling_factor": 3.0}}}).collect()}
    assert got[2] == pytest.approx(math.log(3.0 + 8.0))
    got = {r["docid"]: r["score"] for r in compound_scores(docs, {
        "rank_feature": {"field": "pri",
                         "sigmoid": {"pivot": 4.0,
                                     "exponent": 0.6}}}).collect()}
    x = 8.0 ** 0.6
    assert got[2] == pytest.approx(x / (x + 4.0 ** 0.6))
    with pytest.raises(ValueError, match="pivot"):
        compound_scores(docs, {"rank_feature": {"field": "pri"}})
    # filter context: positive feature values match
    assert sorted(
        r["docid"] for r in docs.filter(compile_filter(
            docs, {"rank_feature": {"field": "pri"}})).collect()) == \
        [0, 1, 2, 4]


# ------------------------------------------------------------ collapse

def test_collapse_scored_keeps_best_per_group(docs):
    out = search(docs, {"query": {"match": {"text": "quick query"}},
                        "collapse": {"field": "role"}, "size": 5})
    rows = out.collect()
    base = {r["docid"]: r["score"]
            for r in bm25_scores(docs, "quick query").collect()}
    # best per role among matching docs, ranked by score
    roles = {0: "user", 1: "tool", 2: "user", 4: "tool"}
    best = {}
    for d, s in base.items():
        g = roles[d]
        if g not in best or (s, -d) > (best[g][1], -best[g][0]):
            best[g] = (d, s)
    want = sorted(best.values(), key=lambda t: (-t[1], t[0]))
    assert [r["docid"] for r in rows] == [d for d, _ in want]
    assert len(rows) == 2  # one per role


def test_collapse_filter_context_with_sort(docs):
    out = search(docs, {"query": {"range": {"pri": {"gte": 0}}},
                        "sort": [{"pri": "desc"}, {"docid": "asc"}],
                        "collapse": {"field": "role"}, "size": 5})
    # best pri per role: user→docid 2 (pri 8), tool→docid 1 (pri 2)
    assert [r["docid"] for r in out.collect()] == [2, 1]
    with pytest.raises(ValueError, match="sort"):
        search(docs, {"query": {"range": {"pri": {"gte": 0}}},
                      "collapse": {"field": "role"}})


# ------------------------------------------------------------- suggest

def test_suggest_missing_mode_corrects_typos(docs):
    got = suggest_terms(docs, "quik data", size=3).toPandas()
    # "data" is in the dictionary → missing mode skips it
    assert set(got.input_term) == {"quik"}
    assert got.iloc[0].option == "quick" and got.iloc[0].distance == 1
    # transposition counts one edit
    got = suggest_terms(docs, "qiuck", size=3).toPandas()
    assert got.iloc[0].option == "quick" and got.iloc[0].distance == 1


def test_suggest_modes_and_ranking(docs):
    # always mode suggests even for dictionary words; ranking is
    # (distance, -df, term)
    got = suggest_terms(docs, "quick", size=5,
                        suggest_mode="always").toPandas()
    assert "quack" in set(got.option)
    assert "quick" not in set(got.option)  # never suggests the input
    # popular mode requires higher df than the input term
    pop = suggest_terms(docs, "jumps", size=5,
                        suggest_mode="popular").toPandas()
    dfs = {r["term"]: r["df"]
           for r in docs.select(F.explode(F.array_distinct("tokens"))
                                .alias("term"))
           .groupBy("term").agg(F.count("*").alias("df")).collect()}
    for _, r in pop.iterrows():
        assert dfs[r.option] > dfs["jumps"]
    with pytest.raises(ValueError, match="suggest_mode"):
        suggest_terms(docs, "x", suggest_mode="nope")
    with pytest.raises(ValueError, match="max_edits"):
        suggest_terms(docs, "x", max_edits=3)


def test_suggest_on_index(spark, docs):
    import shutil
    import tempfile

    from anomaly_detection_spark.index import build_index
    from anomaly_detection_spark.query import IndexReader

    tmp = tempfile.mkdtemp(prefix="adspark_sug_")
    try:
        paths = build_index(docs.drop("tokens", "doc_len"),
                            f"{tmp}/idx", seg_size=16, block_size=8,
                            segments_per_batch=2)
        reader = IndexReader(spark, paths.root)
        got = suggest_terms(reader, "quik", size=3).toPandas()
        assert got.iloc[0].option == "quick"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
