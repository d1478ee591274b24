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


# ------------------------------------------------------ phrase suggest

@pytest.fixture(scope="module")
def phrase_corpus(spark):
    # bigram-heavy corpus: "nobel prize" is the dominant collocation,
    # "noble man" legitimizes "noble" as a dictionary word
    rows = ([(i, f"the nobel prize ceremony item{i}")
             for i in range(8)]
            + [(100 + i, f"a noble man walked item{100 + i}")
               for i in range(4)]
            + [(200, "prize money data"), (201, "nobel laureate data")])
    df = spark.createDataFrame(rows, ["docid", "text"])
    return analyze_docs(df).persist()


def test_phrase_suggest_bigram_context_beats_dictionary(phrase_corpus):
    from anomaly_detection_spark.query.suggest import suggest_phrases

    # "noble" IS in the dictionary — only the bigram LM can know that
    # "nobel prize" is the right phrase
    got = suggest_phrases(phrase_corpus, "noble prize",
                          size=3).toPandas()
    assert got.suggestion[0] == "nobel prize"
    assert "noble prize" in set(got.suggestion)  # original kept, ranked lower
    top = got[got.suggestion == "nobel prize"].iloc[0]
    orig = got[got.suggestion == "noble prize"].iloc[0]
    assert top.score > orig.score and top.n_changes == 1


def test_phrase_suggest_stupid_backoff_formula(phrase_corpus):
    from anomaly_detection_spark.query.suggest import suggest_phrases

    got = suggest_phrases(phrase_corpus, "nobel prize",
                          size=1).toPandas()
    # hand-computed: corpus tokens -> uni(nobel)=9, uni(prize)=9,
    # bigram(nobel prize)=8, total tokens = 8*5 + 4*5 + 3 + 3 = 66
    # first-term P = 0.4 * 9/66 (unigram backoff, no context);
    # second-term P = 8/9; both kept in-dict terms x 0.95 channel
    want = (math.log10(0.4 * 9 / 66 * 0.95)
            + math.log10(8 / 9 * 0.95))
    assert got.suggestion[0] == "nobel prize"
    assert got.score[0] == pytest.approx(want, rel=1e-9)


def test_phrase_suggest_max_errors_budget(phrase_corpus):
    from anomaly_detection_spark.query.suggest import suggest_phrases

    # two typos but a budget of one substitution: the top suggestion
    # can fix at most one of them
    got = suggest_phrases(phrase_corpus, "nobl prze",
                          max_errors=0.5, size=10).toPandas()
    assert (got.n_changes <= 1).all()
    full = suggest_phrases(phrase_corpus, "nobl prze",
                           max_errors=1.0, size=10).toPandas()
    assert full.suggestion[0] == "nobel prize"
    assert full[full.suggestion == "nobel prize"].n_changes.iloc[0] == 2


def test_phrase_suggest_collects_are_candidate_bounded(spark, monkeypatch):
    """No driver collect may scale with the corpus term dictionary: the
    unigram pass is vocab-filtered and the token total is a scalar agg,
    so every collect is bounded by the candidate set (VERDICT r5 #1)."""
    from pyspark.sql.classic.dataframe import DataFrame

    from anomaly_detection_spark.query.suggest import suggest_phrases

    rows = [(i, "nobel prize " + " ".join(
        f"filler{i}w{j}" for j in range(5))) for i in range(120)]
    corpus = analyze_docs(
        spark.createDataFrame(rows, ["docid", "text"]))
    # corpus vocabulary is ~600 distinct terms; candidates for a
    # 2-term query are ≤ 2 × (1 + candidates_per_term=5) words
    sizes = []
    orig = DataFrame.collect
    monkeypatch.setattr(
        DataFrame, "collect",
        lambda self: (lambda out: (sizes.append(len(out)), out)[1])(
            orig(self)))
    got = suggest_phrases(corpus, "noble prize", size=3)
    top = orig(got)[0]
    assert top["suggestion"] == "nobel prize"
    assert sizes and max(sizes) <= 60


def test_phrase_suggest_rejects_index_target(spark, phrase_corpus):
    import shutil
    import tempfile

    from anomaly_detection_spark.index import build_index
    from anomaly_detection_spark.query import IndexReader
    from anomaly_detection_spark.query.suggest import suggest_phrases

    tmp = tempfile.mkdtemp(prefix="adspark_psg_")
    try:
        paths = build_index(
            phrase_corpus.select("docid", "text"), f"{tmp}/idx",
            seg_size=64, block_size=16, segments_per_batch=2)
        reader = IndexReader(phrase_corpus.sparkSession, paths.root)
        with pytest.raises(ValueError, match="forward index"):
            suggest_phrases(reader, "noble prize")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_completion_suggester(phrase_corpus):
    from anomaly_detection_spark.query.suggest import (
        suggest_completions)

    got = suggest_completions(phrase_corpus, "no", size=3).toPandas()
    # df order: nobel appears in 9 docs, noble in 4
    assert list(got.option[:2]) == ["nobel", "noble"]
    assert got.df[0] == 9 and got.df[1] == 4
    assert list(got["rank"]) == [1, 2]
    # analyzer normalization + empty prefix
    up = suggest_completions(phrase_corpus, "NO", size=1).toPandas()
    assert list(up.option) == ["nobel"]
    assert suggest_completions(phrase_corpus, "  ").count() == 0
    with pytest.raises(ValueError, match="one token"):
        suggest_completions(phrase_corpus, "no bel")


def test_collapse_inner_hits(spark):
    from anomaly_detection_spark.query import analyze_docs
    from anomaly_detection_spark.query.planner import search

    rows = [
        (0, "g1", "spark spark spark"),   # g1 best
        (1, "g1", "spark spark"),
        (2, "g1", "spark"),
        (3, "g1", "spark x y z w q r s"),  # g1 4th (long doc, low tf)
        (4, "g2", "spark other"),
        (5, "g3", "nothing here"),
    ]
    an = analyze_docs(spark.createDataFrame(
        rows, "docid long, grp string, text string"))
    body = {"query": {"match": {"text": "spark"}},
            "collapse": {"field": "grp",
                         "inner_hits": {"size": 2}},
            "size": 10}
    got = search(an, body).collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r["grp"], []).append(r)
    # g1 returns exactly 2 inner hits (its best two), g2 one
    assert [r["docid"] for r in by_grp["g1"]] == [0, 1]
    assert [r["_inner_rank"] for r in by_grp["g1"]] == [1, 2]
    assert [r["docid"] for r in by_grp["g2"]] == [4]
    assert "g3" not in by_grp            # no match, no group
    # group blocks ordered by head score: g1's head outscores g2's
    assert [r["grp"] for r in got][:2] == ["g1", "g1"]
    # plain collapse still returns one row per group
    body2 = {"query": {"match": {"text": "spark"}},
             "collapse": {"field": "grp"}, "size": 10}
    plain = search(an, body2).collect()
    assert sorted(r["docid"] for r in plain) == [0, 4]
    # custom inner sort rejects
    import pytest as _pt
    with _pt.raises(ValueError, match="inner_hits"):
        search(an, {"query": {"match": {"text": "spark"}},
                    "collapse": {"field": "grp",
                                 "inner_hits": {"sort": [{"docid": "asc"}],
                                                "size": 2}}})


def test_collapse_inner_hits_filter_context(spark):
    from anomaly_detection_spark.query.planner import search

    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2], i * 1.0) for i in range(10)],
        "docid long, grp string, v double")
    body = {"query": {"range": {"v": {"gte": 2.0}}},
            "collapse": {"field": "grp", "inner_hits": {"size": 2}},
            "sort": [{"v": {"order": "desc"}}], "size": 10}
    got = search(df, body).collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r["grp"], []).append(r["docid"])
    assert by_grp["a"] == [8, 6]   # top-2 by v desc among v>=2, grp a
    assert by_grp["b"] == [9, 7]
