"""Index-backed BM25 top-k with block-max pruning (SURVEY.md §2.6 L4/L5).

Execution shape (scale-first):

- term_stats lookup for the query's terms → per-term idf (tiny, driver).
- postings scan filtered to query terms — postings files are sorted by
  term, so Parquet row-group min/max stats prune everything else.
- doc_stats scan projected to (docid, doc_len) + the filter predicate —
  column-pruned and pushed down; range-partitioned by docid.
- cogroup both by ``seg_id`` → one Arrow batch per segment → numpy
  scorer: block-max upper bounds per bucket of docids, seed a threshold
  θ from the most promising bucket, prune buckets whose UB sum < θ
  (the block-max WAND idea at bucket granularity, vectorized — like
  Lucene's BMW this only *skips* work, never changes results), then
  dense score-at-a-time accumulation over surviving blocks.
- per-segment top-k under the total order (score desc, docid asc) →
  global ``orderBy(...).limit(k)`` (TakeOrderedAndProject; only
  n_segments × k tiny rows cross the final exchange).

Filters (term/range on role/tool/ts) restrict candidate docs via the
doc_stats side; corpus stats stay index-wide, matching Lucene
(``track_total_hits(false)`` early-termination analog: S3/L5).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bm25 import B_DEFAULT, K1_DEFAULT, bm25_idf
from ..functions.codecs import varint_decode
from ..functions.tokenizer import tokenize_query
from ..index.storage import IndexMeta, IndexPaths, read_meta


@dataclass
class IndexReader:
    spark: SparkSession
    index_dir: str
    meta: IndexMeta = field(init=False)

    def __post_init__(self):
        self.meta = read_meta(self.index_dir)
        self.paths = IndexPaths(self.index_dir)

    def postings(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.postings)

    def doc_stats(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.doc_stats)

    def doc_norms(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.doc_norms)

    def term_stats(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.term_stats)

    def manifest(self) -> DataFrame:
        return self.spark.read.parquet(self.paths.manifest)


def _score_segment(
    posts: pd.DataFrame,
    docs: pd.DataFrame,
    weights: dict[str, float],
    seg_size: int,
    avgdl: float,
    k: int,
    k1: float,
    b: float,
    prune: bool,
    bucket: int = 1024,
    quantize_norms: bool = False,
) -> pd.DataFrame:
    empty = pd.DataFrame({"docid": pd.Series(dtype="int64"),
                          "score": pd.Series(dtype="float64")})
    if len(posts) == 0 or len(docs) == 0:
        return empty
    seg_base = int(posts["seg_id"].iloc[0]) * seg_size

    dl = np.full(seg_size, -1.0)
    if "docid_gaps" in docs.columns:
        # compact per-segment norms blob (no doc_stats shuffle)
        docids = np.cumsum(varint_decode(docs["docid_gaps"].iloc[0])).astype(np.int64)
        dls = varint_decode(docs["dls"].iloc[0]).astype(np.float64)
        dl[docids - seg_base] = dls
    else:
        dl[docs["docid"].to_numpy(dtype=np.int64) - seg_base] = \
            docs["doc_len"].to_numpy(dtype=np.float64)
    if quantize_norms:
        from ..functions.bm25 import quantize_doc_len

        present = dl >= 0
        dl[present] = quantize_doc_len(dl[present].astype(np.int64))

    terms = posts["term"].to_numpy(dtype=object)
    firsts = posts["first_docid"].to_numpy(dtype=np.int64)
    lasts = posts["last_docid"].to_numpy(dtype=np.int64)
    max_tfs = posts["max_tf"].to_numpy(dtype=np.float64)
    w_arr = np.array([weights[t] for t in terms])

    # per-block score upper bound at the block's smallest doc length
    # (w is decreasing in dl, so min_dl gives a tight, valid UB; indexes
    # without min_dl fall back to 0 = the loosest bound)
    if "min_dl" in posts.columns:
        min_dls = posts["min_dl"].to_numpy(dtype=np.float64)
    else:
        min_dls = np.zeros(len(posts))
    if quantize_norms:
        from ..functions.bm25 import quantize_doc_len as _q

        min_dls = _q(min_dls.astype(np.int64)).astype(np.float64)
    ub = w_arr * (max_tfs * (k1 + 1.0)) / (
        max_tfs + k1 * (1.0 - b + b * min_dls / max(avgdl, 1e-12)))

    n_buckets = (seg_size + bucket - 1) // bucket
    bf = (firsts - seg_base) // bucket
    bl = (lasts - seg_base) // bucket

    def decode_accumulate(block_idx: np.ndarray, lo: int | None = None,
                          hi: int | None = None) -> np.ndarray:
        """Dense scores over [lo, hi) local docids from the given blocks."""
        lo = 0 if lo is None else lo
        hi = seg_size if hi is None else hi
        scores = np.zeros(hi - lo)
        gaps_col = posts["gaps"].to_numpy(dtype=object)
        tfs_col = posts["tfs"].to_numpy(dtype=object)
        for i in block_idx:
            d = np.cumsum(varint_decode(gaps_col[i])).astype(np.int64) + firsts[i]
            loc = d - seg_base
            tf = varint_decode(tfs_col[i]).astype(np.float64)
            m = (loc >= lo) & (loc < hi)
            loc, tf = loc[m], tf[m]
            dlv = dl[loc]
            ok = dlv >= 0
            loc, tf, dlv = loc[ok], tf[ok], dlv[ok]
            contrib = w_arr[i] * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dlv / max(avgdl, 1e-12)))
            scores[loc - lo] += contrib  # docids unique within a block
        return scores

    all_blocks = np.arange(len(posts))
    if prune and len(posts) >= 16:  # pruning overhead only pays at volume
        # bucket UB sums via a difference array (per-term blocks are
        # docid-disjoint; boundary-bucket overlap only loosens the UB)
        diff = np.zeros(n_buckets + 1)
        np.add.at(diff, bf, ub)
        np.add.at(diff, bl + 1, -ub)
        s_bucket = np.cumsum(diff)[:-1]
        seed = int(np.argmax(s_bucket))
        seed_blocks = all_blocks[(bf <= seed) & (bl >= seed)]
        seed_scores = decode_accumulate(seed_blocks, seed * bucket,
                                        min((seed + 1) * bucket, seg_size))
        pos = seed_scores[seed_scores > 0]
        theta = float(np.sort(pos)[-k]) if len(pos) >= k else -np.inf
        surv = s_bucket >= theta
        cnt = np.concatenate(([0], np.cumsum(surv)))
        keep = (cnt[bl + 1] - cnt[bf]) > 0
        blocks = all_blocks[keep]
    else:
        blocks = all_blocks

    scores = decode_accumulate(blocks)
    cand = np.flatnonzero(scores > 0)
    if len(cand) == 0:
        return empty
    sc = scores[cand]
    order = np.lexsort((cand, -sc))[:k]
    return pd.DataFrame({"docid": cand[order] + seg_base, "score": sc[order]})


def bm25_topk_indexed(
    reader: IndexReader,
    query_text: str,
    k: int = 10,
    filter_cond: Column | None = None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    prune: bool = True,
    quantize_norms: bool = False,
) -> DataFrame:
    """Top-k (docid, score) via the posting index; rank/score-identical
    to :func:`bm25_topk_bruteforce` by construction (tested)."""
    spark = reader.spark
    meta = reader.meta
    qcounts = Counter(tokenize_query(query_text))
    uniq = sorted(qcounts)
    empty = spark.createDataFrame([], "docid long, score double")
    if not uniq:
        return empty

    stats = {r["term"]: r["df"]
             for r in reader.term_stats().filter(F.col("term").isin(uniq)).collect()}
    present = [t for t in uniq if t in stats]
    if not present:
        return empty
    # duplicate query terms sum their contribution (bool SHOULD), so the
    # per-term weight is idf × multiplicity
    weights = {t: float(bm25_idf(stats[t], meta.n_docs)) * qcounts[t]
               for t in present}

    post_cols = ["term", "seg_id", "first_docid", "last_docid", "gaps",
                 "tfs", "max_tf"]
    src = reader.postings()
    if "min_dl" in src.columns:
        post_cols.append("min_dl")
    posts = src.filter(F.col("term").isin(present)).select(*post_cols)
    if filter_cond is None:
        # pure match: per-segment norms blobs (~1 byte/doc) instead of a
        # full doc_stats shuffle — the hot path at corpus scale
        docs = reader.doc_norms().select("seg_id", "docid_gaps", "dls")
    else:
        docs = reader.doc_stats().filter(filter_cond).select(
            "docid", "doc_len",
            (F.col("docid") / meta.seg_size).cast("int").alias("seg_id"))

    seg_size, avgdl = meta.seg_size, meta.avgdl

    def _score(pleft: pd.DataFrame, pright: pd.DataFrame) -> pd.DataFrame:
        return _score_segment(pleft, pright, weights, seg_size, avgdl,
                              k, k1, b, prune, quantize_norms=quantize_norms)

    local = (
        posts.groupBy("seg_id")
        .cogroup(docs.groupBy("seg_id"))
        .applyInPandas(_score, schema="docid long, score double")
    )
    return local.orderBy(F.desc("score"), F.asc("docid")).limit(k)


def fetch_docs(reader: IndexReader, topk: DataFrame) -> DataFrame:
    """Join top-k hits back to their stored identity/filter columns —
    the ``_source`` fetch path (broadcast: top-k is tiny)."""
    return (
        F.broadcast(topk)
        .join(reader.doc_stats(), "docid")
        .orderBy(F.desc("score"), F.asc("docid"))
    )
