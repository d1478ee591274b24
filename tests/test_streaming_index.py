"""Structured Streaming incremental index build: stream-built index ≡
one-shot batch build; the foreachBatch writer is exactly-once under
replay at every crash boundary (intent ledger + idempotent append)."""

import glob
import os
import shutil
import tempfile

import numpy as np
from pyspark.sql import functions as F

from anomaly_detection_spark.data import assign_docids, generate_transcripts
from anomaly_detection_spark.index import build_index
from anomaly_detection_spark.index.storage import read_meta
from anomaly_detection_spark.query import IndexReader, bm25_topk_indexed
from anomaly_detection_spark.streaming.index_stream import (
    _read_ledger, _write_ledger, index_stream_writer, start_index_stream)

QUERIES = ["spark query data", "the", "error result table join"]


def _conv_slices(docs, n):
    """Split by sorted conv_id ranges so stream arrival order matches
    the global (conv_id, turn_idx) sort → docids identical to the
    one-shot assign_docids."""
    convs = sorted(r["conv_id"] for r in
                   docs.select("conv_id").distinct().collect())
    return [docs.filter(F.col("conv_id").isin(
        [str(c) for c in part]))
        for part in np.array_split(np.array(convs), n)]


def _topk(spark, idx_dir, q):
    return [(r.docid, round(r.score, 6)) for r in
            bm25_topk_indexed(IndexReader(spark, idx_dir), q,
                              k=10).collect()]


def test_streaming_index_build_equals_batch(spark):
    tmp = tempfile.mkdtemp(prefix="adspark_stream_")
    try:
        docs = generate_transcripts(spark, 2500, seed=11)
        src = f"{tmp}/src"
        os.makedirs(src)
        for i, sl in enumerate(_conv_slices(docs, 3)):
            d = f"{tmp}/slice_{i}"
            sl.coalesce(1).write.parquet(d)
            part, = glob.glob(f"{d}/part-*.parquet")
            dst = f"{src}/slice_{i}.parquet"
            shutil.move(part, dst)
            os.utime(dst, (1_700_000_000 + i * 100,) * 2)
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = start_index_stream(stream, f"{tmp}/sidx", f"{tmp}/ckpt",
                               seg_size=512, block_size=64,
                               segments_per_batch=2)
        q.awaitTermination()

        build_index(assign_docids(docs), f"{tmp}/fidx", seg_size=512,
                    block_size=64, segments_per_batch=2)
        sm, fm = read_meta(f"{tmp}/sidx"), read_meta(f"{tmp}/fidx")
        assert sm.n_docs == fm.n_docs == docs.count()
        assert abs(sm.avgdl - fm.avgdl) < 1e-9
        assert len(_read_ledger(f"{tmp}/sidx")) == 3  # one entry/batch
        for qs in QUERIES:
            assert _topk(spark, f"{tmp}/sidx", qs) == \
                _topk(spark, f"{tmp}/fidx", qs), qs
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_writer_replay_idempotent(spark):
    tmp = tempfile.mkdtemp(prefix="adspark_replay_")
    try:
        docs = generate_transcripts(spark, 1200, seed=5)
        b0, b1, b2 = _conv_slices(docs, 3)
        idx = f"{tmp}/idx"
        w = index_stream_writer(idx, seg_size=256, block_size=64,
                                segments_per_batch=2)
        w(b0, 0)
        w(b1, 1)
        n1 = read_meta(idx).n_docs
        before = {q: _topk(spark, idx, q) for q in QUERIES}
        # fully-applied replay (ack lost after meta refresh): no-op
        w(b1, 1)
        assert read_meta(idx).n_docs == n1
        assert {q: _topk(spark, idx, q) for q in QUERIES} == before
        # empty batch: no-op, no ledger entry
        w(b2.filter(F.lit(False)), 9)
        assert "9" not in _read_ledger(idx)
        # intent-recorded-but-unapplied replay (crash right after the
        # ledger write): the writer must apply at the RECORDED lo
        n2 = b2.count()
        led = _read_ledger(idx)
        led["2"] = [n1, n1 + n2]
        _write_ledger(idx, led)
        w(b2, 2)
        assert read_meta(idx).n_docs == n1 + n2
        # a second delivery of the same batch is again a no-op
        w(b2, 2)
        assert read_meta(idx).n_docs == n1 + n2
        # final index answers like a one-shot build
        build_index(assign_docids(docs), f"{tmp}/full", seg_size=256,
                    block_size=64, segments_per_batch=2)
        for q in QUERIES:
            assert _topk(spark, idx, q) == _topk(spark, f"{tmp}/full", q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_replay_resumes_mid_build_crash(spark):
    """A crash during the FIRST batch's build leaves a draft meta
    carrying the final n_docs — the replay must RESUME the build (not
    fast-skip on n_docs, not route to append_index)."""
    import json

    from anomaly_detection_spark.index.storage import IndexPaths

    tmp = tempfile.mkdtemp(prefix="adspark_crash_")
    try:
        docs = generate_transcripts(spark, 1200, seed=13)
        writer = index_stream_writer(f"{tmp}/idx", seg_size=256,
                                     block_size=64,
                                     segments_per_batch=2)
        writer(docs, 0)
        want = {q: _topk(spark, f"{tmp}/idx", q) for q in QUERIES}
        meta_done = read_meta(f"{tmp}/idx")

        # simulate the mid-build crash state: ledger intent recorded,
        # draft meta present (final n_docs, avgdl 0), finalize marker
        # gone — exactly what a kill between draft-meta and finalize
        # leaves behind
        paths = IndexPaths(f"{tmp}/idx")
        os.remove(paths.ckpt("finalize"))
        with open(f"{tmp}/idx/_meta.json") as f:
            m = json.load(f)
        m["avgdl"] = 0.0
        with open(f"{tmp}/idx/_meta.json", "w") as f:
            json.dump(m, f)

        writer(docs, 0)                      # the replay
        got = {q: _topk(spark, f"{tmp}/idx", q) for q in QUERIES}
        assert got == want
        m2 = read_meta(f"{tmp}/idx")
        assert abs(m2.avgdl - meta_done.avgdl) < 1e-9   # re-finalized
        # and a replay of the now-complete batch is a clean no-op
        writer(docs, 0)
        assert {q: _topk(spark, f"{tmp}/idx", q) for q in QUERIES} \
            == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
