"""sample_corpus / sample_to_token_budget / paragraph_dedup."""

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.pipeline.curation import (
    mix_to_token_budget, pack_sequences, paragraph_dedup, sample_corpus,
    sample_to_token_budget)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, ["web", "code", "books"][i % 3], 100 + (i % 7) * 10,
             1.0 if i % 2 else 0.25) for i in range(3000)]
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long, "
              "quality double").persist()


def test_sample_corpus_deterministic_and_calibrated(corpus):
    a = sample_corpus(corpus, rate=0.3)
    got = a.count()
    # hash-uniform: expect ~900 of 3000 (binomial 3sigma ~ 75)
    assert abs(got - 900) < 120
    # identical set under repartitioning (the property sample() lacks)
    b = sample_corpus(corpus.repartition(13), rate=0.3)
    assert sorted(r["doc_id"] for r in a.collect()) == \
        sorted(r["doc_id"] for r in b.collect())
    # different seed -> different set, same calibration
    c = sample_corpus(corpus, rate=0.3, seed=7)
    assert sorted(r["doc_id"] for r in c.collect()) != \
        sorted(r["doc_id"] for r in a.collect())


def test_sample_corpus_stratified_and_weighted(corpus):
    s = sample_corpus(corpus, rates_by=("source", {"web": 0.1,
                                                   "code": 1.0}))
    by = {r["source"]: r["n"] for r in
          s.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by["code"] == 1000          # rate 1.0 keeps everything
    assert 60 < by.get("web", 0) < 145  # ~100
    assert "books" not in by           # no rate, no default -> 0
    # weighted: p = rate * quality (0.5*1.0 vs 0.5*0.25)
    w = sample_corpus(corpus, rate=0.5, weight_col="quality")
    byq = {r["quality"]: r["n"] for r in
           w.groupBy("quality").agg(F.count("*").alias("n")).collect()}
    assert abs(byq[1.0] - 750) < 110      # 1500 * 0.5
    assert abs(byq[0.25] - 187) < 80      # 1500 * 0.125
    with pytest.raises(ValueError, match="rate"):
        sample_corpus(corpus)


def test_sample_to_token_budget(corpus):
    total = corpus.agg(F.sum("n_tokens")).collect()[0][0]
    out = sample_to_token_budget(corpus, budget=total // 4)
    got = out.agg(F.sum("n_tokens")).collect()[0][0]
    assert abs(got - total // 4) / (total // 4) < 0.15
    # under-budget corpus returns unchanged
    assert sample_to_token_budget(corpus, budget=total * 2).count() \
        == 3000
    # stratified with explicit mixing weights
    out = sample_to_token_budget(
        corpus, budget=total // 4, strata_col="source",
        strata_weights={"web": 3.0, "code": 1.0, "books": 0.0})
    mass = {r["source"]: r["t"] for r in out.groupBy("source")
            .agg(F.sum("n_tokens").alias("t")).collect()}
    assert mass.get("books", 0) == 0
    assert mass["web"] / max(mass["code"], 1) == pytest.approx(
        3.0, rel=0.35)


def test_mix_to_token_budget_upsamples_scarce_strata(corpus):
    total = corpus.agg(F.sum("n_tokens")).collect()[0][0]
    # equal target mass per domain at 2x total budget: web/code/books
    # each hold ~total/3 tokens, so each needs rate ~2 -> upsampling
    out = mix_to_token_budget(
        corpus, budget=total * 2, strata_col="source",
        strata_weights={"web": 1.0, "code": 1.0, "books": 1.0})
    mass = {r["source"]: r["t"] for r in out.groupBy("source")
            .agg(F.sum("n_tokens").alias("t")).collect()}
    for s in ("web", "code", "books"):
        assert mass[s] == pytest.approx(total * 2 / 3, rel=0.1), s
    # epoch column: integral copies share a doc_id with distinct epochs
    dup = (out.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.countDistinct("epoch").alias("ne")).collect())
    assert all(r["n"] == r["ne"] for r in dup)
    assert any(r["n"] >= 2 for r in dup)


def test_mix_to_token_budget_deterministic_and_downsamples(corpus):
    total = corpus.agg(F.sum("n_tokens")).collect()[0][0]
    a = mix_to_token_budget(corpus, budget=total // 3,
                            strata_col="source")
    b = mix_to_token_budget(corpus.repartition(11), budget=total // 3,
                            strata_col="source")
    key = lambda df: sorted((r["doc_id"], r["epoch"])  # noqa: E731
                            for r in df.collect())
    assert key(a) == key(b)
    got = a.agg(F.sum("n_tokens")).collect()[0][0]
    assert got == pytest.approx(total // 3, rel=0.1)
    assert a.agg(F.max("epoch")).collect()[0][0] == 0  # rates < 1


def test_mix_to_token_budget_max_repeat_guard(corpus):
    total = corpus.agg(F.sum("n_tokens")).collect()[0][0]
    with pytest.raises(ValueError, match="max_repeat"):
        mix_to_token_budget(
            corpus, budget=total * 500, strata_col="source",
            strata_weights={"web": 1.0, "code": 1.0, "books": 1.0})


def test_pack_sequences_fill_and_bounds(spark):
    rows = [(i, 50 + (i * 37) % 450) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, max_tokens=2048, num_shards=8).persist()
    # every doc exactly once
    assert out.count() == 4000
    assert out.select("doc_id").distinct().count() == 4000
    packs = out.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("t")).toPandas()
    assert (packs.t <= 2048).all()
    total = sum(t for _, t in rows)
    fill = total / (len(packs) * 2048)
    assert fill > 0.9, fill
    # determinism under repartition
    a = sorted((r.doc_id, r.pack_id) for r in out.collect())
    b = sorted((r.doc_id, r.pack_id) for r in pack_sequences(
        df.repartition(13), max_tokens=2048, num_shards=8).collect())
    assert a == b
    out.unpersist()


def test_pack_sequences_oversize_policies(spark):
    df = spark.createDataFrame(
        [(0, 100), (1, 5000), (2, 300)], "doc_id long, n_tokens long")
    own = pack_sequences(df, max_tokens=1024, num_shards=2).toPandas()
    assert len(own) == 3
    # the oversize doc sits alone in its pack
    big_pack = own[own.doc_id == 1].pack_id.iloc[0]
    assert (own.pack_id == big_pack).sum() == 1
    drop = pack_sequences(df, max_tokens=1024, oversize="drop",
                          num_shards=2).toPandas()
    assert sorted(drop.doc_id) == [0, 2]
    with pytest.raises(Exception, match="max_tokens"):
        pack_sequences(df, max_tokens=1024, oversize="error",
                       num_shards=2).collect()
    with pytest.raises(ValueError, match="oversize"):
        pack_sequences(df, max_tokens=1024, oversize="truncate")


def test_pack_shard_kernel_fuzz():
    """Property-fuzz the pure packing kernel (no Spark round-trip):
    every non-oversize doc assigned, no bin over capacity, fill never
    worse than first-fit on the same order (BFD dominates or ties),
    oversize isolation."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from anomaly_detection_spark.pipeline.curation import _pack_shard

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=3000),
                    min_size=0, max_size=120),
           st.integers(min_value=1, max_value=2048))
    def _prop(sizes, mt):
        toks = np.sort(np.array(sizes, dtype=np.int64))[::-1]
        assign = _pack_shard(toks, mt, "own")
        assert (assign >= 0).all()
        per_bin: dict = {}
        for t, a in zip(toks, assign):
            per_bin[a] = per_bin.get(a, 0) + int(t)
        for a, tot in per_bin.items():
            # an oversize doc sits alone in its own bin
            assert tot <= mt or \
                (assign == a).sum() == 1 and tot > mt
        # drop policy removes exactly the oversize docs
        d = _pack_shard(toks, mt, "drop")
        assert ((d >= 0) == (toks <= mt)).all()

    _prop()


def test_paragraph_dedup(spark):
    docs = spark.createDataFrame(
        [(0, "alpha one\n\nshared boiler\n\nbeta two"),
         (1, "shared boiler\n\ngamma three"),
         (2, "shared boiler"),
         (3, "x\n\nunique tail")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           paragraph_dedup(docs, min_chars=2).collect()}
    # first occurrence (doc 0) keeps the shared paragraph
    assert out[0]["text"] == "alpha one\n\nshared boiler\n\nbeta two"
    assert out[1]["text"] == "gamma three"
    assert out[2]["text"] == "" and out[2]["n_paras"] == 0
    # short paragraph ("x" < min_chars) is whitelisted verbatim
    assert out[3]["text"] == "x\n\nunique tail"
    # deterministic under repartition
    out2 = {r["doc_id"]: r["text"] for r in
            paragraph_dedup(docs.repartition(5), min_chars=2).collect()}
    assert {k: v["text"] for k, v in out.items()} == out2


def test_duplicate_ngram_spans(spark):
    from anomaly_detection_spark.pipeline.curation import (
        duplicate_ngram_spans)

    boiler = "all rights reserved contact us for more information"
    docs = spark.createDataFrame(
        [(0, f"alpha beta gamma {boiler} tail words here"),
         (1, f"{boiler} and then something original entirely"),
         (2, "completely unique text with no repeats at all ok"),
         (3, f"start {boiler} middle {boiler} end")],
        "doc_id long, text string")
    out = duplicate_ngram_spans(docs, n=8, min_count=2)
    spans = {}
    for r in out.collect():
        spans.setdefault(r["doc_id"], []).append(
            (r["start_tok"], r["end_tok"]))
    # boiler = 8 tokens -> exactly one 8-gram window per occurrence
    assert spans[0] == [(3, 11)]
    assert spans[1] == [(0, 8)]
    assert 2 not in spans
    # doc 3 has two separated occurrences -> two merged spans
    assert len(spans[3]) == 2
    # deterministic under repartition
    out2 = duplicate_ngram_spans(docs.repartition(7), n=8, min_count=2)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, out2.collect()))
