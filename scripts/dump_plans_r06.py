#!/usr/bin/env python
"""Dump .explain("formatted") for the round-6-touched operators.

Run from a repo tree (round-start tree for *_before.txt, final tree for
*_after.txt):

    python scripts/dump_plans_r06.py /root/repo/plans/r06 before|after

Uses sf0.01 testdata (plan SHAPE is scale-independent) and local[4] so
it can run alongside other work.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

from pyspark.sql import functions as F


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = "/root/testdata/sf0.01"

    from anomaly_detection_spark.session import get_spark

    spark = get_spark("plans-r06", master="local[4]", shuffle_partitions=4,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})

    def dump(name: str, df) -> None:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("dumped", name)

    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embeddings = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    from anomaly_detection_spark.pipeline.curation import (
        duplicate_ngram_spans, repetition_metrics)
    from anomaly_detection_spark.pipeline.dedup import (minhash_lsh_pairs,
                                                        semantic_dedup)
    from anomaly_detection_spark.pipeline import decontaminate

    dump("decontaminate",
         decontaminate(documents, documents.filter(F.col("doc_id") % 7 == 0)))
    dump("dup_spans", duplicate_ngram_spans(documents, n=8, min_count=2))
    dump("repetition", repetition_metrics(documents))
    dump("minhash", minhash_lsh_pairs(documents, threshold=0.5))
    semb = embeddings.withColumnRenamed("vec_id", "doc_id")
    dump("semantic_dedup",
         semantic_dedup(semb, threshold=0.95, n_lists=4, train_size=500))

    from anomaly_detection_spark.query import analyze_docs
    from anomaly_detection_spark.query.hybrid import hybrid_search

    emb = embeddings.withColumnRenamed("vec_id", "docid")
    qvec = emb.orderBy("docid").limit(1).collect()[0]["embedding"]
    demb = documents.join(
        emb.select(F.col("docid").alias("doc_id"), "embedding"),
        "doc_id", "inner")
    dan = analyze_docs(demb.select(F.col("doc_id").alias("docid"),
                                   "text", "embedding"))
    dump("hybrid", hybrid_search(dan, [
        {"match": {"text": "the data"}},
        {"knn": {"embedding": {"vector": list(qvec)}}}],
        k=10, weights=[0.6, 0.4]))

    # merge batch scan: build a tiny index, show the per-batch postings
    # filter exactly as merge_segments constructs it
    import shutil
    import tempfile

    from anomaly_detection_spark.index import build_index
    from anomaly_detection_spark.index.storage import IndexPaths, read_meta

    tmp = tempfile.mkdtemp(prefix="plans_idx_")
    ddocs = documents.select(F.col("doc_id").alias("docid"), "text")
    build_index(ddocs, tmp, seg_size=256, block_size=128,
                segments_per_batch=2, keep_cols=())
    meta = read_meta(tmp)
    factor, spb, k = 4, 2, 0
    posts = spark.read.parquet(IndexPaths(tmp).postings).withColumn(
        "new_seg", (F.col("seg_id") / factor).cast("int"))
    lo, hi = k * spb, (k + 1) * spb
    if suffix == "before":
        sub = posts.filter((F.col("new_seg") >= lo) & (F.col("new_seg") < hi))
    else:
        sub = posts.filter((F.col("seg_id") >= lo * factor)
                           & (F.col("seg_id") < hi * factor))
    dump("merge_batch_scan", sub)
    shutil.rmtree(tmp, ignore_errors=True)

    # the manifest/lineage write path (LocalRelation vs pickled RDD):
    # plan of a 1-row lineage-shaped frame
    try:
        from anomaly_detection_spark.localdf import local_df
        lin = local_df(spark, [("s", 0, 0, 0, 0, 0, 0.0, 0.0)],
                       "stage string, batch int, docid_lo long, "
                       "docid_hi long, rows long, bytes long, "
                       "wall_s double, ts double")
    except ImportError:
        lin = spark.createDataFrame([("s", 0, 0, 0, 0, 0, 0.0, 0.0)],
                                    "stage string, batch int, docid_lo long, "
                                    "docid_hi long, rows long, bytes long, "
                                    "wall_s double, ts double")
    dump("lineage_row", lin)

    spark.stop()


if __name__ == "__main__":
    main()
