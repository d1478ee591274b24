"""End-to-end training-data curation pipeline — the composition a real
corpus build runs, over the driver-generated documents table:

    language filter → quality floor → corpus paragraph dedup →
    MinHash near-dup dedup (survivor policy) → eval-set
    decontamination → token-budget sample → sequence packing

Each stage's invariants hold at every step AND the composition is
deterministic end-to-end (same kept ids, same pack assignment, any
partitioning)."""

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.pipeline.curation import (
    decontaminate, pack_sequences, paragraph_dedup, sample_to_token_budget)
from anomaly_detection_spark.pipeline.dedup import dedup_corpus
from anomaly_detection_spark.pipeline.text import (
    language_id, quality_scores, token_counts)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").persist()
    yield df
    df.unpersist()


def _run(docs, eval_df):
    lang = language_id(docs).select("doc_id", "lang_pred")
    qual = quality_scores(docs).select("doc_id", "quality")
    kept = (docs.join(lang, "doc_id").join(qual, "doc_id")
            .filter((F.col("lang_pred") == "en")
                    & (F.col("quality") >= 0.3))
            .drop("lang_pred", "quality"))
    kept = paragraph_dedup(kept).filter(F.col("n_paras") > 0) \
        .drop("n_paras")
    kept = dedup_corpus(kept, threshold=0.5, keep="min_id")
    decon = decontaminate(kept, eval_df, n=13)
    kept = (kept.join(decon.select("doc_id", "contaminated"), "doc_id")
            .filter(~F.col("contaminated")).drop("contaminated"))
    kept = kept.join(token_counts(kept).select("doc_id", "word_tokens"),
                     "doc_id")
    sampled = sample_to_token_budget(kept, budget=20_000,
                                     token_col="word_tokens")
    packed = pack_sequences(sampled, max_tokens=1024,
                            token_col="word_tokens", num_shards=4)
    return packed


def test_curation_pipeline_composes(spark, documents):
    # eval set = a handful of real docs → guaranteed contamination hits
    eval_df = documents.orderBy("doc_id").limit(5) \
        .select(F.col("doc_id").alias("eval_id"),
                F.col("text").alias("text"))
    packed = _run(documents, eval_df).persist()
    n_in = documents.count()
    rows = packed.count()
    assert 0 < rows < n_in
    # stage invariants survive the composition:
    # (a) the 5 eval-source docs are gone (they collide with themselves
    #     unless already removed as near-dups — either way absent)
    eval_ids = [r.eval_id for r in eval_df.collect()]
    assert packed.filter(F.col("doc_id").isin(eval_ids)).count() == 0
    # (b) no duplicate doc survived into packing
    assert packed.select("doc_id").distinct().count() == rows
    # (c) packs respect the token budget
    over = (packed.groupBy("pack_id")
            .agg(F.sum("word_tokens").alias("t"))
            .filter(F.col("t") > 1024).count())
    assert over == 0
    # (d) total token mass ≈ the sample budget (docs can be dropped by
    #     earlier stages, so only an upper-tolerance check is sound)
    mass = packed.agg(F.sum("word_tokens")).collect()[0][0]
    assert mass <= 20_000 * 1.25
    # (e) deterministic end-to-end under repartition
    again = _run(documents.repartition(7), eval_df)
    a = sorted((r.doc_id, r.pack_id) for r in packed.collect())
    b = sorted((r.doc_id, r.pack_id) for r in again.collect())
    assert a == b
    packed.unpersist()
