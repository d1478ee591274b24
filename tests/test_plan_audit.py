"""Physical-plan regressions: the plans that make the engine viable at
100 TB must stay shaped this way (see PLANS.md)."""

import contextlib
import io
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.index import build_index
from anomaly_detection_spark.query import (
    IndexReader,
    bm25_topk_indexed,
    fetch_docs,
)
from anomaly_detection_spark.query.aggs import date_histogram


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def reader(spark, tiny_transcripts):
    tmp = tempfile.mkdtemp(prefix="adspark_plan_")
    paths = build_index(tiny_transcripts, f"{tmp}/idx", seg_size=512,
                        block_size=64, segments_per_batch=4)
    yield IndexReader(spark, paths.root)
    shutil.rmtree(tmp, ignore_errors=True)


def test_postings_scan_pushes_term_filter(reader):
    p = _plan(reader.postings().filter(F.col("term").isin(["spark", "merge"]))
              .select("term", "seg_id", "gaps"))
    assert "PushedFilters: [In(term, [merge,spark])]" in p
    # column pruning: tfs/max_tf not read when not selected
    assert "ReadSchema: struct<term:string,seg_id:int,gaps:binary>" in p


def test_doc_stats_scan_pushes_filters_and_prunes(reader):
    p = _plan(reader.doc_stats()
              .filter((F.col("role") == "user") & (F.col("turn_idx") > 3))
              .select("docid", "doc_len"))
    assert "EqualTo(role,user)" in p and "GreaterThan(turn_idx,3)" in p
    assert "text" not in p.split("ReadSchema")[1].splitlines()[0]


def test_pure_match_uses_norms_not_doc_stats(reader):
    p = _plan(bm25_topk_indexed(reader, "spark merge", k=5))
    assert "docid_gaps" in p          # norms blobs on the doc side
    assert "doc_len" not in p         # no doc_stats shuffle
    assert "FlatMapCoGroupsInPandas" in p
    assert "TakeOrderedAndProject" in p


def test_filtered_match_pushes_filter_to_doc_stats(reader):
    p = _plan(bm25_topk_indexed(reader, "spark", k=5,
                                filter_cond=F.col("role") == "user"))
    assert "EqualTo(role,user)" in p


def test_fetch_broadcasts_topk(reader):
    p = _plan(fetch_docs(reader, bm25_topk_indexed(reader, "spark", k=3)))
    assert "BroadcastHashJoin" in p


def test_top_entities_plan_is_take_ordered(spark):
    """The top-entities gate path must be limit-then-rank: global top-10
    via TakeOrderedAndProject (per-partition heap + tiny exchange), never
    a single-partition window over every entity group."""
    import __spark_entry__ as em

    df = em.queries()["top_entities_by_severity"](spark, "/root/testdata/sf0.001")
    p = _plan(df)
    assert "TakeOrderedAndProject" in p
    df2 = em.queries()["composite_entity_script"](spark, "/root/testdata/sf0.001")
    p2 = _plan(df2)
    assert "TakeOrderedAndProject" in p2


def test_date_histogram_partial_agg_and_pruned_scan(spark):
    spark.catalog.clearCache()  # plan shape must come from a real scan
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = _plan(date_histogram(ev, "ts", 3600_000, min_doc_count=1))
    # map-side combine: two HashAggregates around one exchange
    assert p.count("HashAggregate") >= 2
    read = p.split("ReadSchema:")[1].splitlines()[0]
    assert "ts" in read and "value" not in read


def test_multi_match_plan_no_cartesian_take_ordered(spark, tiny_transcripts):
    """multi_match: per-field score frames full-outer join on docid
    (query-sized inputs), top-k via TakeOrderedAndProject, and never a
    cartesian/BNLJ."""
    from anomaly_detection_spark.query import multi_match_topk

    docs = tiny_transcripts.withColumn("alt", F.col("text"))
    plan = _plan(multi_match_topk(docs, "spark query", ["text", "alt"], k=5))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_agg_broadcasts_bucket_list(spark):
    """Numeric range agg joins against a broadcast VALUES-sized bucket
    list — no shuffle of the fact side onto range keys."""
    import pandas as pd

    from anomaly_detection_spark.query.aggs import range_agg

    df = spark.createDataFrame(pd.DataFrame({"v": [1.0, 5.0, 9.0]}))
    plan = _plan(range_agg(df, "v", [{"to": 5.0}, {"from": 2.0}]))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_histogram_partial_agg(spark):
    """histogram: hash aggregate with a map-side partial before the
    exchange (min_doc_count=1 path — pure agg, no grid join)."""
    import pandas as pd

    from anomaly_detection_spark.query.aggs import histogram_agg

    df = spark.createDataFrame(pd.DataFrame({"v": [1.0, 5.0, 9.0]}))
    plan = _plan(histogram_agg(df, "v", 2.0, min_doc_count=1))
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_combined_fields_plan_no_cartesian_take_ordered(spark,
                                                        tiny_transcripts):
    from anomaly_detection_spark.query.combined_fields import (
        combined_fields_topk,
    )

    out = combined_fields_topk(tiny_transcripts, "the user data",
                               ["text", "role^2"], k=10)
    p = _plan(out)
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p
    # the per-term stats frame broadcasts into the contribution join
    assert "BroadcastHashJoin" in p


def test_mad_broadcasts_median_back(spark):
    from anomaly_detection_spark.query.aggs import mad_agg

    df = spark.range(100).select(
        (F.col("id") % 5).alias("g"), F.col("id").cast("double").alias("v"))
    p = _plan(mad_agg(df, "v", ["g"]))
    assert "BroadcastHashJoin" in p and "CartesianProduct" not in p


def test_cumulative_cardinality_no_cartesian(spark, tiny_transcripts):
    from anomaly_detection_spark.query.aggs import (
        bucketize,
        cumulative_cardinality,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = cumulative_cardinality(df, "user_id", bucketize("ts", 3_600_000))
    p = _plan(out)
    assert "CartesianProduct" not in p
    # partial aggregation reaches the value-keyed shuffle (the only
    # corpus-sized exchange)
    assert "partial_count" in p or "HashAggregate" in p


def test_mix_to_token_budget_plan_is_one_narrow_filter_explode(spark):
    from anomaly_detection_spark.pipeline.curation import mix_to_token_budget

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .withColumn("n_tokens", F.length("text"))
    out = mix_to_token_budget(df, budget=100_000, strata_col="source")
    p = _plan(out)
    # the data path is filter + generate over the scan — no shuffle,
    # no Python eval; the mass agg ran eagerly before planning
    assert "Exchange" not in p
    assert "Generate" in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_pack_sequences_plan_single_shard_shuffle(spark):
    from anomaly_detection_spark.pipeline.curation import pack_sequences

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .withColumn("n_tokens", F.length("text"))
    p = _plan(pack_sequences(df, max_tokens=4096, num_shards=8))
    # exactly one exchange: hash by the deterministic shard key into
    # the Arrow packing groups ("formatted" prints each node twice —
    # tree line + detail block — so count the partitioning argument)
    assert p.count("hashpartitioning(_shard") == 1
    assert "FlatMapGroupsInPandas" in p


def test_semantic_dedup_pairs_no_cartesian(spark):
    """The within-cell candidate join must stay an equi-join on the
    k-means cell (plus chunk ids on the capped path) — never a
    cartesian/broadcast-nested-loop over the corpus."""
    import numpy as np

    from anomaly_detection_spark.pipeline.dedup import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .withColumnRenamed("vec_id", "doc_id")
    out = semantic_dedup(emb, threshold=0.95, n_lists=4, train_size=200)
    p = _plan(out)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_chunk_documents_plan_is_narrow_explode(spark):
    from anomaly_detection_spark.pipeline.chunking import chunk_documents

    # a single-file table plans a one-task scan; the conditional
    # width-spread (pipeline/spread.py, r6) adds exactly ONE exchange
    # there so the codegen window chain runs cluster-wide
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = chunk_documents(df, token_limit=64, overlap_rate=0.25,
                          max_chunk_limit=-1)
    p = _plan(out)
    # "Exchange (" counts tree nodes (the detail heading is "(n) Exchange")
    assert p.count("Exchange (") <= 1
    assert "Generate" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    # an input already at cluster width passes through SHUFFLE-FREE —
    # the spread must be a no-op on wide production tables (the
    # original no-shuffle contract, now conditional)
    par = spark.sparkContext.defaultParallelism
    wide = df.repartition(par, "doc_id")
    p2 = _plan(chunk_documents(wide, token_limit=64, overlap_rate=0.25,
                               max_chunk_limit=-1))
    assert p2.count("Exchange (") == 1  # only the caller's own repartition
    assert "BatchEvalPython" not in p2 and "ArrowEvalPython" not in p2


def test_sparse_encode_plan_is_narrow(spark):
    from anomaly_detection_spark.pipeline.text import sparse_encode

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = _plan(sparse_encode(df))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
