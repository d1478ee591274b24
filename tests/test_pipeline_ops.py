import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.pipeline import (
    cosine_topk_bruteforce,
    doc_fingerprints,
    embedding_neardup_pairs,
    exact_duplicates,
    language_id,
    lsh_ann_topk,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    quality_scores,
    simhash_neardup_pairs,
    token_counts,
)
from anomaly_detection_spark.pipeline.multimodal import (
    attach_media,
    extract_features,
    frame_sample,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def _shingle_sets(pdf, n=3):
    out = {}
    for _, r in pdf.iterrows():
        toks = re.findall(r"[^\W]+", (r.text or "").lower(), re.UNICODE)
        out[r.doc_id] = {" ".join(toks[i:i + n]) for i in range(max(0, len(toks) - n + 1))}
    return out


def test_token_counts_and_quality(docs):
    out = token_counts(docs).toPandas().set_index("doc_id")
    pdf = docs.toPandas()
    for _, r in pdf.head(20).iterrows():
        ws = len([t for t in re.split(r"\s+", r.text or "") if t])
        assert out.loc[r.doc_id].ws_tokens == ws
        assert out.loc[r.doc_id].n_chars == len(r.text or "")
    q = quality_scores(docs).toPandas()
    assert ((q.quality >= 0) & (q.quality <= 1)).all()
    assert (q.n_words >= 0).all()


def test_language_id_deterministic(docs):
    out = language_id(docs).toPandas()
    assert set(out.lang_pred) <= {"en", "es", "fr", "de", "und"}
    # 'the/a/and' soup → overwhelmingly en for nonempty docs with hits
    hits = out[out.hits_en >= 2]  # the token soup only contains 'a'/'the'
    assert len(hits) > 50
    assert (hits.lang_pred == "en").mean() > 0.9


def test_fingerprints_group_exact_dups(spark):
    rows = [(1, "Hello,   world!"), (2, "hello world"), (3, "different text here"),
            (4, "hello world"), (5, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = doc_fingerprints(df).toPandas().set_index("doc_id")
    assert fp.loc[1].fp_md5 == fp.loc[2].fp_md5 == fp.loc[4].fp_md5
    assert fp.loc[3].fp_md5 != fp.loc[1].fp_md5
    assert fp.loc[1].fp_roll == fp.loc[2].fp_roll
    dups = exact_duplicates(df).toPandas()
    assert set(dups.doc_id) == {1, 2, 4}
    assert (dups.group_id == 1).all() and (dups.group_size == 3).all()


def test_ngram_jaccard_matches_pandas(spark, docs):
    sub = docs.limit(120).persist()
    got = ngram_jaccard_pairs(sub, threshold=0.2, n=3).toPandas()
    pdf = sub.toPandas()
    sets = _shingle_sets(pdf, 3)
    want = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if round(j, 6) >= 0.2:
                want.append((a, b, round(j, 6)))
    got_t = [(r.id_a, r.id_b, r.jaccard) for r in got.itertuples()]
    assert sorted(got_t) == sorted(want)


def test_minhash_lsh_verified_subset(spark, docs):
    sub = docs.limit(120).persist()
    exact = ngram_jaccard_pairs(sub, threshold=0.5, n=3).toPandas()
    lsh = minhash_lsh_pairs(sub, threshold=0.5, num_hashes=64, bands=16, n=3).toPandas()
    exact_pairs = set(zip(exact.id_a, exact.id_b))
    lsh_pairs = set(zip(lsh.id_a, lsh.id_b))
    # verified → precision 1 (lsh pairs all truly ≥ τ)
    assert lsh_pairs <= exact_pairs
    # at τ=0.5 with 16 bands of 4 rows, collision prob ≥ 1-(1-0.5^4)^16 ≈ .65;
    # shingle sets here are either near-identical or far, so expect high recall
    if exact_pairs:
        assert len(lsh_pairs) / len(exact_pairs) >= 0.5


def test_simhash_near_dups(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely unrelated content about spark query engines"),
            (4, "the quick brown fox jumps over the lazy dog today")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_neardup_pairs(df, max_hamming=12).toPandas()
    got = set(zip(pairs.id_a, pairs.id_b))
    assert (1, 4) in got
    ham = dict(zip(zip(pairs.id_a, pairs.id_b), pairs.hamming))
    assert ham[(1, 4)] == 0
    assert (1, 3) not in got and (2, 3) not in got and (3, 4) not in got


def test_embedding_neardup_and_topk(spark, embs):
    pdf = embs.toPandas()
    mat = np.stack(pdf.embedding.to_numpy())
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat.T) / np.outer(norms, norms)
    ids = pdf.vec_id.to_numpy()

    got = embedding_neardup_pairs(embs, threshold=0.95).toPandas()
    want = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if round(sims[i, j], 6) >= 0.95:
                want.append((ids[i], ids[j]))
    assert sorted(zip(got.id_a, got.id_b)) == sorted(want)

    queries = embs.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    topk = cosine_topk_bruteforce(embs, queries, k=10).toPandas()
    for qid in topk.query_id.unique():
        qi = np.where(ids == qid)[0][0]
        s = sims[qi].copy()
        s[qi] = -np.inf
        order = sorted(range(len(ids)), key=lambda j: (-round(s[j], 6), ids[j]))[:10]
        want_ids = [ids[j] for j in order]
        got_ids = list(topk[topk.query_id == qid].sort_values("rank").vec_id)
        assert got_ids == want_ids


def test_lsh_ann_recall(spark, embs):
    queries = embs.limit(8).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk_bruteforce(embs, queries, k=5).toPandas()
    approx = lsh_ann_topk(embs, queries, k=5, n_planes=16, bands=8).toPandas()
    recalls = []
    for qid in exact.query_id.unique():
        e = set(exact[exact.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # ANN: recall traded for candidate pruning


def test_multimodal_plumbing(spark, docs):
    media = attach_media(
        docs.limit(20).withColumn("payload", F.encode("text", "utf-8")),
        "doc_id", "payload", kind="image", mime="image/fake")
    feats = extract_features(media, dim=8, fake=True).toPandas()
    assert len(feats) == 20
    assert feats.feature.map(len).eq(8).all()
    # deterministic: same payload → same feature
    f2 = extract_features(media, dim=8, fake=True).toPandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("media_id").reset_index(drop=True),
        f2.sort_values("media_id").reset_index(drop=True))
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        extract_features(media, dim=8, fake=False).collect()
    frames = frame_sample(media, every_ms=1000, fake=True).toPandas()
    assert (frames.groupby("media_id").frame_idx.count() >= 1).all()


def test_dedup_corpus_one_call(spark):
    from anomaly_detection_spark.pipeline.dedup import dedup_corpus

    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the forest all day long")
    rows = [
        (0, base),                                   # cluster with 1
        (1, base + " extra tail words here"),        # near-dup of 0, longer
        (2, "completely different content about engines and parquet"),
        (3, base + " extra tail"),                   # near-dup, mid length
        (4, "another unique document with its own words entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup_corpus(df, threshold=0.5).toPandas().sort_values(
        "doc_id").reset_index(drop=True)
    # cluster {0,1,3} -> keep 1 (longest); 2 and 4 survive alone
    assert sorted(out.doc_id) == [1, 2, 4]
    assert int(out[out.doc_id == 1].cluster_size.iloc[0]) == 3
    assert set(out[out.doc_id != 1].cluster_size) == {1}
    # min_id policy keeps the canonical label instead
    out2 = dedup_corpus(df, threshold=0.5, keep="min_id").toPandas()
    assert sorted(out2.doc_id) == [0, 2, 4]
    import pytest as _pt

    with _pt.raises(ValueError, match="keep"):
        dedup_corpus(df, keep="newest")
