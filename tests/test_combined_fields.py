"""combined_fields (BM25F merged pseudo-field): formula vs a pandas
hand-oracle, brute ≡ index score identity, weights, search() routing.
"""

import math
import shutil
import tempfile
from collections import Counter

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.functions.tokenizer import (
    tokenize_query,
    tokenize_texts,
)
from anomaly_detection_spark.index import build_index
from anomaly_detection_spark.query import IndexReader
from anomaly_detection_spark.query.combined_fields import (
    combined_fields_topk,
    parse_field_boosts,
)
from anomaly_detection_spark.query.planner import search


@pytest.fixture(scope="module")
def env(spark, tiny_transcripts):
    tmp = tempfile.mkdtemp(prefix="adspark_cf_")
    docs = tiny_transcripts.limit(600).persist()
    docs.count()
    tpaths = build_index(docs, f"{tmp}/idx_text", seg_size=256,
                         block_size=64, segments_per_batch=2)
    rpaths = build_index(docs, f"{tmp}/idx_role", seg_size=256,
                         block_size=64, segments_per_batch=2,
                         text_col="role")
    readers = {"text": IndexReader(spark, tpaths.root),
               "role": IndexReader(spark, rpaths.root)}
    yield docs, readers, tmp
    docs.unpersist()
    shutil.rmtree(tmp, ignore_errors=True)


def _oracle(pdf, query, fields, k1=1.2, b=0.75):
    """Pure-pandas merged-field BM25 (module docstring formula)."""
    specs = parse_field_boosts(fields)
    toks = {f: tokenize_texts(pdf[f]) for f, _ in specs}
    qterms = tokenize_query(query)
    mult = Counter(qterms)
    lens = {}
    tfc = {}
    for i in pdf.index:
        lens[i] = sum(w * len(toks[f][i]) for f, w in specs)
        for t in set(qterms):
            v = sum(w * toks[f][i].count(t) for f, w in specs)
            if v:
                tfc[(i, t)] = v
    n = len(pdf)
    avgdl = sum(lens.values()) / n
    dfs = {t: sum((i, t) in tfc for i in pdf.index) for t in set(qterms)}
    out = {}
    for i in pdf.index:
        s = 0.0
        for t in set(qterms):
            tf = tfc.get((i, t), 0.0)
            if not tf or not dfs[t]:
                continue
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += mult[t] * idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * lens[i] / avgdl))
        if s:
            out[int(pdf.docid[i])] = s
    return out


def test_combined_fields_matches_hand_oracle(env):
    docs, _, _ = env
    pdf = docs.select("docid", "text", "role").toPandas()
    for q, fields in [("the user data", ["text", "role"]),
                      ("user query", ["text", "role^2.5"])]:
        got = combined_fields_topk(docs, q, fields, k=10).collect()
        want = _oracle(pdf, q, fields)
        want_top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert [r["docid"] for r in got] == [d for d, _ in want_top], q
        for r, (_, s) in zip(got, want_top):
            assert r["score"] == pytest.approx(s, rel=1e-9)


def test_combined_fields_brute_equals_index(env):
    docs, readers, _ = env
    for q in ["the user data", "assistant tool query", "the the"]:
        brute = combined_fields_topk(docs, q, ["text", "role^2"],
                                     k=15).toPandas()
        idx = combined_fields_topk(readers, q, ["text", "role^2"],
                                   k=15).toPandas()
        assert list(brute.docid) == list(idx.docid), q
        assert (brute.score - idx.score).abs().max() < 1e-9


def test_combined_fields_through_search(env):
    docs, readers, _ = env
    body = {"query": {"combined_fields": {
        "query": "the user data", "fields": ["text", "role"]}},
        "size": 5}
    out_b = search(docs, body)
    out_i = search(readers["text"], body, field_readers=readers)
    b = out_b.select("docid", "score").toPandas()
    i = out_i.select("docid", "score").toPandas()
    assert list(b.docid) == list(i.docid) and len(b) == 5
    assert (b.score - i.score).abs().max() < 1e-9
    with pytest.raises(ValueError, match="field_readers"):
        search(readers["text"], {"query": {"combined_fields": {
            "query": "x", "fields": ["text", "nope"]}}})
