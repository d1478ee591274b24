"""Frame-of-reference posting codec (round 4): `codec="for"` indexes
must answer every query identically to the default varint codec, and
the codec must survive merge / append / resume (geometry-pinned)."""

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.functions.codecs import for_decode, for_encode
from anomaly_detection_spark.index import build_index, merge_segments
from anomaly_detection_spark.query import (
    IndexReader,
    analyze_docs,
    bm25_topk_bruteforce,
    bm25_topk_indexed,
    corpus_stats,
)
from anomaly_detection_spark.query.index_search import (
    match_phrase_topk_indexed,
)

QUERIES = ["spark query data merge", "the", "index merge the a", "the the"]


def test_for_codec_roundtrip_properties():
    rng = np.random.RandomState(3)
    cases = [
        np.empty(0, np.uint64),
        np.zeros(9, np.uint64),
        np.array([2**63, 0, 2**64 - 1, 5], np.uint64),
        rng.randint(0, 300, 4096).astype(np.uint64),
        rng.randint(0, 2**50, 777).astype(np.uint64),
    ]
    for c in cases:
        got = for_decode(for_encode(c))
        assert np.array_equal(got, c)
    # typical gap blocks pack tighter than varints
    from anomaly_detection_spark.functions.codecs import varint_encode

    gaps = rng.randint(1, 200, 4096).astype(np.uint64)
    assert len(for_encode(gaps)) < len(varint_encode(gaps))


@pytest.fixture(scope="module")
def for_env(spark, tiny_transcripts):
    tmp = tempfile.mkdtemp(prefix="adspark_for_")
    paths = build_index(
        tiny_transcripts, f"{tmp}/idx", seg_size=512, block_size=64,
        segments_per_batch=2, positions=True, codec="for",
    )
    reader = IndexReader(spark, paths.root)
    analyzed = analyze_docs(tiny_transcripts).persist()
    stats = corpus_stats(analyzed)
    yield reader, analyzed, stats, tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_for_index_matches_bruteforce(for_env):
    reader, analyzed, stats, _ = for_env
    assert reader.meta.codec == "delta-gap+for"
    for q in QUERIES:
        got = bm25_topk_indexed(reader, q, k=10).toPandas()
        want = bm25_topk_bruteforce(analyzed, q, k=10, stats=stats).toPandas()
        assert list(got.docid) == list(want.docid), q
        if len(got):
            assert (got.score - want.score).abs().max() < 1e-9, q


def test_for_index_phrase_and_merge(spark, for_env):
    from anomaly_detection_spark.query.brute_force import match_phrase_topk

    reader, analyzed, _, tmp = for_env
    row = analyzed.filter(F.size("tokens") >= 4).orderBy("docid").first()
    phrases = [" ".join(row["tokens"][0:2]), " ".join(row["tokens"][1:4])]
    for ph in phrases:
        got = match_phrase_topk_indexed(reader, ph, k=10).toPandas()
        want = match_phrase_topk(analyzed, ph, k=10).toPandas()
        assert list(got.docid) == list(want.docid), ph
        if len(got):
            assert (got.score - want.score).abs().max() < 1e-9, ph

    merged = merge_segments(spark, reader.index_dir, f"{tmp}/merged",
                            factor=4)
    mreader = IndexReader(spark, merged.root)
    assert mreader.meta.codec == "delta-gap+for"
    for q in QUERIES[:2]:
        a = bm25_topk_indexed(reader, q, k=10).toPandas()
        b = bm25_topk_indexed(mreader, q, k=10).toPandas()
        assert list(a.docid) == list(b.docid), q
    a = match_phrase_topk_indexed(reader, phrases[0], k=10).toPandas()
    b = match_phrase_topk_indexed(mreader, phrases[0], k=10).toPandas()
    assert list(a.docid) == list(b.docid)


def test_for_codec_resume_pinned(spark, tiny_transcripts, for_env):
    """A resumed build keeps the original codec (like seg_size — the
    on-disk geometry always wins on resume, so formats can never mix),
    and unknown codecs fail fast."""
    reader, _, _, _ = for_env
    build_index(tiny_transcripts, reader.index_dir, seg_size=512,
                block_size=64, segments_per_batch=2, positions=True,
                codec="for")  # no-op resume
    assert IndexReader(spark, reader.index_dir).meta.codec == "delta-gap+for"
    # resume asking for a DIFFERENT codec: the pinned on-disk codec
    # wins (identical posture to seg_size/bucket_size on resume)
    build_index(tiny_transcripts, reader.index_dir, seg_size=512,
                block_size=64, segments_per_batch=2, positions=True,
                codec="leb128")
    r2 = IndexReader(spark, reader.index_dir)
    assert r2.meta.codec == "delta-gap+for"
    got = bm25_topk_indexed(r2, QUERIES[0], k=5).toPandas()
    assert len(got) == 5
    with pytest.raises(ValueError, match="codec"):
        build_index(tiny_transcripts, "/tmp/adspark_badcodec",
                    codec="zstd")
