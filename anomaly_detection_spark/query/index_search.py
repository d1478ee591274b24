"""Index-backed BM25 top-k with block-max pruning (SURVEY.md §2.6 L4/L5).

Execution shape (scale-first):

- term_stats lookup for the query's terms → per-term idf (tiny, driver).
- postings scan filtered to query terms — postings files are sorted by
  term, so Parquet row-group min/max stats prune everything else.
- doc_stats scan projected to (docid, doc_len) + the filter predicate —
  column-pruned and pushed down; range-partitioned by docid.
- cogroup both by ``seg_id`` → one Arrow batch per segment → numpy
  scorer: block-max upper bounds summed per bucket of docids; buckets
  visited in descending-UB order with a running top-k threshold θ and
  a per-block decode cache — once θ (the k-th best accumulated score)
  reaches the next bucket's UB, all remaining buckets' undecoded blocks
  are skipped (block-max WAND at bucket granularity, vectorized — like
  Lucene's BMW this only *skips* work, never changes results).
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
from ..localdf import local_df

from ..functions.bm25 import B_DEFAULT, K1_DEFAULT, bm25_idf
from ..functions.codecs import BLOB_DECODERS, codec_name, varint_decode
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

    def lineage(self) -> DataFrame:
        """Build/merge lineage rows (stage, batch, docid range, rows,
        bytes, wall) — the Spark-queryable task-state table."""
        return self.spark.read.parquet(self.paths.lineage)


def _segment_doclens(docs: pd.DataFrame, seg_base: int,
                     seg_size: int, quantize_norms: bool) -> np.ndarray:
    """Per-local-docid doc lengths for one segment (−1 = filtered out /
    absent), from either compact norms blobs or filtered doc_stats
    rows.  Shared by the BM25 and the positional phrase scorers."""
    dl = np.full(seg_size, -1.0)
    if "docid_gaps" in docs.columns:
        # compact per-segment norms blobs (no doc_stats shuffle).  A
        # segment normally has ONE blob, but an appended boundary
        # segment carries one per batch dir (disjoint docid ranges) —
        # decode them all.
        for gi in range(len(docs)):
            docids = np.cumsum(
                varint_decode(docs["docid_gaps"].iloc[gi])).astype(np.int64)
            dls = varint_decode(docs["dls"].iloc[gi]).astype(np.float64)
            dl[docids - seg_base] = dls
    else:
        dl[docs["docid"].to_numpy(dtype=np.int64) - seg_base] = \
            docs["doc_len"].to_numpy(dtype=np.float64)
    if quantize_norms:
        from ..functions.bm25 import quantize_doc_len

        present = dl >= 0
        dl[present] = quantize_doc_len(dl[present].astype(np.int64))
    return dl


def _score_segment(
    posts: pd.DataFrame,
    docs: pd.DataFrame,
    weights: dict[str, float],
    seg_size: int,
    avgdl: float,
    k: int | None,
    k1: float,
    b: float,
    prune: bool,
    bucket: int = 1024,
    quantize_norms: bool = False,
    theta_init: float = -np.inf,
    n_required: int = 0,
    decode=None,
) -> pd.DataFrame:
    if decode is None:
        # resolved at CALL time through the module global so test
        # instrumentation (and future codec swaps) see every decode
        decode = varint_decode
    empty = pd.DataFrame({"docid": pd.Series(dtype="int64"),
                          "score": pd.Series(dtype="float64")})
    if len(posts) == 0 or len(docs) == 0:
        return empty
    if k is None:
        prune = False  # all-candidates mode: dense scoring, no cut
    seg_base = int(posts["seg_id"].iloc[0]) * seg_size
    dl = _segment_doclens(docs, seg_base, seg_size, quantize_norms)

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

    gaps_col = posts["gaps"].to_numpy(dtype=object)
    tfs_col = posts["tfs"].to_numpy(dtype=object)

    def decode_block(i: int) -> tuple[np.ndarray, np.ndarray]:
        """(local docids, BM25 contributions) of one posting block,
        filter mask (dl < 0) applied."""
        d = np.cumsum(decode(gaps_col[i])).astype(np.int64) + firsts[i]
        loc = d - seg_base
        tf = decode(tfs_col[i]).astype(np.float64)
        dlv = dl[loc]
        ok = dlv >= 0
        loc, tf, dlv = loc[ok], tf[ok], dlv[ok]
        contrib = w_arr[i] * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * dlv / max(avgdl, 1e-12)))
        return loc, contrib

    if prune and len(posts) >= 16 and theta_init == -np.inf:
        # Cheap skip-potential gate (O(blocks), before any impact-table
        # flattening): skipping exists only where some term's postings
        # are CONCENTRATED in docid space (topical clustering) — then
        # tail buckets lack that term's mass and fall below θ.  If every
        # term's blocks touch ≈ as many buckets as they possibly could
        # (iid spread), no exact bound can skip anything (Lucene BMW
        # skips ~nothing on such data either) — score densely and save
        # the bucket machinery.  With a θ_init floor (two-phase), keep
        # pruning: a cross-segment θ can cut uniform tails too.
        if ("bm_buckets" in posts.columns
                and posts["bm_buckets"].notna().all()):
            bmb = posts["bm_buckets"].to_numpy(dtype=object)
            lens_g = np.fromiter((len(x) for x in bmb), np.int64, len(posts))
            if lens_g.sum():
                tid = pd.factorize(terms)[0]
                n_terms_q = int(tid.max()) + 1
                flat_t = np.repeat(tid, lens_g)
                flat_b = np.concatenate(bmb).astype(np.int64)
                # distinct buckets each TERM's postings touch, vs the
                # most it could touch given its df (a term spread over
                # ~every reachable bucket has no concentration for any
                # exact bound to exploit)
                pair = np.unique(flat_t * np.int64(n_buckets) + flat_b)
                touched_t = np.bincount(pair // n_buckets,
                                        minlength=n_terms_q)
                n_term = np.zeros(n_terms_q, dtype=np.int64)
                np.add.at(n_term, tid, posts["n"].to_numpy(np.int64))
                possible = np.minimum(np.maximum(n_term, 1), n_buckets)
                cov_t = touched_t / np.maximum(possible, 1)
                if (cov_t >= 0.85).all():
                    prune = False

    if prune and len(posts) >= 16:  # pruning overhead only pays at volume
        # --- block-max WAND at bucket granularity -------------------------
        # Bucket UB = Σ_terms max(block UB over the term's blocks
        # overlapping the bucket) — a doc in the bucket sits in exactly
        # one block per term, so the per-term MAX (not sum) is the
        # valid tight bound.  Buckets are then visited in DESCENDING UB
        # order with a running top-k threshold θ: once the k-th best
        # accumulated score reaches the next bucket's UB, every
        # remaining bucket is provably below the cut and its
        # not-yet-decoded blocks are skipped (results identical — like
        # Lucene BMW this only skips work).  Each block is decoded at
        # most once (cache), so pruned decode count ≤ unpruned,
        # strictly less whenever a tail bucket holds blocks no
        # processed bucket touched.
        term_ids = pd.factorize(terms)[0]
        n_posts = len(posts)
        # bm columns count as present only when non-null for EVERY row:
        # an index mixing pre-impact-table batches with new ones (parquet
        # schema union null-fills the old rows) must fall back wholesale
        # to the legacy block-level bound instead of raising on
        # np.asarray(None).
        has_bm = ("bm_buckets" in posts.columns
                  and posts["bm_buckets"].notna().all())
        if has_bm:
            # per-bucket impact tables (Lucene-impacts analog): bound =
            # w · f(bucket max_tf, bucket min_dl), only where the term
            # actually has postings — a rare term's single segment-wide
            # block no longer paints every bucket with its global max.
            # Flattened once: one concat + one ufunc per column, no
            # per-block Python loop.
            bm_b = posts["bm_buckets"].to_numpy(dtype=object)
            lens_e = np.fromiter((len(x) for x in bm_b), np.int64, n_posts)
            all_b = (np.concatenate(bm_b).astype(np.int64) if lens_e.sum()
                     else np.empty(0, np.int64))
            all_t = np.concatenate(
                posts["bm_tf"].to_numpy(dtype=object)).astype(np.float64) \
                if lens_e.sum() else np.empty(0)
            all_d = np.concatenate(
                posts["bm_dl"].to_numpy(dtype=object)).astype(np.float64) \
                if lens_e.sum() else np.empty(0)
            if quantize_norms:
                from ..functions.bm25 import quantize_doc_len as _qq

                all_d = _qq(all_d.astype(np.int64)).astype(np.float64)
            blk_rep = np.repeat(np.arange(n_posts), lens_e)
            all_u = w_arr[blk_rep] * (all_t * (k1 + 1.0)) / (
                all_t + k1 * (1.0 - b + b * all_d / max(avgdl, 1e-12)))
        else:
            # legacy blocks: block-level (max_tf, min_dl) painted over
            # the whole docid span — expand each block's bucket range
            lens_e = (bl - bf + 1).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(lens_e[:-1])))
            all_b = (np.repeat(bf, lens_e)
                     + np.arange(int(lens_e.sum()), dtype=np.int64)
                     - np.repeat(starts, lens_e))
            blk_rep = np.repeat(np.arange(n_posts), lens_e)
            all_u = np.repeat(ub, lens_e)
        tb_ub = np.zeros((int(term_ids.max()) + 1, n_buckets))
        np.maximum.at(tb_ub, (term_ids[blk_rep], all_b), all_u)
        s_bucket = tb_ub.sum(axis=0)
        # CSR bucket → blocks (replaces per-entry Python list appends)
        eorder = np.argsort(all_b, kind="stable")
        csr_blocks = blk_rep[eorder]
        boff = np.concatenate(
            ([0], np.cumsum(np.bincount(all_b, minlength=n_buckets))))
        visit = np.argsort(-s_bucket, kind="stable")

        # Bucket rounds of geometrically-growing size: each round takes
        # the next slice of the UB-descending visit order, drops the
        # provably-dead tail (UB < θ — everything after it is dead too),
        # decodes ONLY the not-yet-decoded blocks touching the round's
        # buckets (each decode adds into one persistent dense score
        # array — add-once, so bucket scores are complete the moment all
        # its blocks are in), collects the round's candidates with one
        # masked flatnonzero, and tightens θ.  Small early rounds grow θ
        # fast; big late rounds amortize the Python per-round cost —
        # sequential-walk cutting power at array speed.
        col_doc: list[np.ndarray] = []
        col_sc: list[np.ndarray] = []
        best = np.empty(0)          # up to k largest scores seen so far
        # θ starts from the caller's cross-segment floor when given
        # (two-phase search: the densest segment's k-th score is a
        # valid global lower bound — Lucene MaxScoreAccumulator analog)
        theta = theta_init
        full = np.zeros(seg_size)
        decoded_blk = np.zeros(n_posts, dtype=bool)
        n_decoded = 0
        pos_v = 0
        round_sz = 1
        # weakest bucket that actually holds postings: while θ ≤ s_min
        # no bucket can ever fail the UB test, so nothing is skippable
        nz = s_bucket[s_bucket > 0]
        s_min = float(nz.min()) if len(nz) else 0.0
        while pos_v < len(visit):
            take = visit[pos_v:pos_v + round_sz]
            pos_v += round_sz
            round_sz = min(round_sz * 4, 1024)
            take = take[s_bucket[take] > 0]
            if theta > -np.inf:
                take = take[s_bucket[take] >= theta]
            if len(take) == 0:
                break               # visit order is UB-descending: done
            segs = [csr_blocks[boff[b]:boff[b + 1]] for b in take]
            need = np.unique(np.concatenate(segs)) if segs else []
            for i in need:
                i = int(i)
                if not decoded_blk[i]:
                    loc, contrib = decode_block(i)
                    full[loc] += contrib
                    decoded_blk[i] = True
                    n_decoded += 1
            bmask = np.zeros(n_buckets, dtype=bool)
            bmask[take] = True
            flat = np.repeat(bmask, bucket)[:seg_size]
            cand_r = np.flatnonzero((full > 0) & flat)
            if len(cand_r) == 0:
                continue
            col_doc.append(cand_r)
            col_sc.append(full[cand_r])
            best = np.sort(np.concatenate([best, full[cand_r]]))[-k:]
            if len(best) >= k:
                theta = max(theta, float(best[0]))
                if theta <= s_min and pos_v < len(visit):
                    # prune-hostile bail-out: a full top-k whose θ still
                    # can't reach even the weakest bucket's UB means the
                    # UB spread is too flat for ANY exact bound to skip —
                    # decode everything once and collect the remaining
                    # buckets in one shot (≈ the dense path's cost,
                    # instead of paying per-round masking for nothing)
                    rest = visit[pos_v:]
                    rest = rest[s_bucket[rest] > 0]
                    if len(rest):
                        for i in np.flatnonzero(~decoded_blk):
                            loc, contrib = decode_block(int(i))
                            full[loc] += contrib
                            n_decoded += 1
                        bmask = np.zeros(n_buckets, dtype=bool)
                        bmask[rest] = True
                        flat = np.repeat(bmask, bucket)[:seg_size]
                        cand_r = np.flatnonzero((full > 0) & flat)
                        if len(cand_r):
                            col_doc.append(cand_r)
                            col_sc.append(full[cand_r])
                    break
        if not col_doc:
            return empty
        cand = np.concatenate(col_doc)
        sc = np.concatenate(col_sc)
    else:
        scores = np.zeros(seg_size)
        cnts = np.zeros(seg_size, dtype=np.int32) if n_required else None
        for i in range(len(posts)):
            loc, contrib = decode_block(i)
            scores[loc] += contrib  # docids unique within a block
            if cnts is not None:
                # one block per (term, doc) in a segment, so this counts
                # distinct matched terms (conjunctive match support)
                cnts[loc] += 1
        if cnts is not None:
            cand = np.flatnonzero((scores > 0) & (cnts == n_required))
        else:
            cand = np.flatnonzero(scores > 0)
        if len(cand) == 0:
            return empty
        sc = scores[cand]

    if k is None:
        return pd.DataFrame({"docid": cand + seg_base, "score": sc})
    order = np.lexsort((cand, -sc))[:k]
    return pd.DataFrame({"docid": cand[order] + seg_base, "score": sc[order]})


def _docs_side(reader: IndexReader, filter_cond: Column | None) -> DataFrame:
    """Doc-length side of a scored query: compact norms blobs (~1
    byte/doc, no doc_stats shuffle) on pure match; filtered doc_stats
    rows when a filter context restricts candidates."""
    if filter_cond is None:
        return reader.doc_norms().select("seg_id", "docid_gaps", "dls")
    return reader.doc_stats().filter(filter_cond).select(
        "docid", "doc_len",
        (F.col("docid") / reader.meta.seg_size).cast("int").alias("seg_id"))


def bm25_topk_indexed(
    reader: IndexReader,
    query_text: str,
    k: int = 10,
    filter_cond: Column | None = None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    prune: bool = True,
    quantize_norms: bool = False,
    bucket: int | None = None,
    two_phase: bool = False,
    conjunctive: bool = False,
) -> DataFrame:
    """Top-k (docid, score) via the posting index; rank/score-identical
    to :func:`bm25_topk_bruteforce` by construction (tested).

    ``bucket`` is the block-max pruning granularity in docids; indexes
    carrying per-bucket impact tables pin it to ``meta.bucket_size``
    (the grid the tables were cut on).

    ``two_phase`` scores the densest segment first and broadcasts its
    k-th score as every other segment's starting θ (the cross-segment
    competitive-score propagation Lucene does with MaxScoreAccumulator)
    — identical results, strictly more skipping, one extra tiny job."""
    spark = reader.spark
    meta = reader.meta
    qcounts = Counter(tokenize_query(query_text))
    uniq = sorted(qcounts)
    empty = local_df(spark, [], "docid long, score double")
    if not uniq:
        return empty

    stats = {r["term"]: r["df"]
             for r in reader.term_stats().filter(F.col("term").isin(uniq)).collect()}
    present = [t for t in uniq if t in stats]
    if not present:
        return empty
    if conjunctive:
        # match operator:and — a query term absent from the corpus means
        # no doc can satisfy every clause (OpenSearch semantics)
        if len(present) < len(uniq):
            return empty
        # the conjunctive candidate set is already tiny; block-max
        # pruning's OR-shaped upper bounds don't model the AND filter,
        # so score densely and filter on matched-term count instead
        prune = False
        two_phase = False
    # duplicate query terms sum their contribution (bool SHOULD), so the
    # per-term weight is idf × multiplicity
    weights = {t: float(bm25_idf(stats[t], meta.n_docs)) * qcounts[t]
               for t in present}

    post_cols = ["term", "seg_id", "first_docid", "last_docid", "gaps",
                 "tfs", "max_tf", "n"]
    src = reader.postings()
    if "min_dl" in src.columns:
        post_cols.append("min_dl")
    if "bm_buckets" in src.columns:
        post_cols += ["bm_buckets", "bm_tf", "bm_dl"]
        bucket = meta.bucket_size  # the grid the impact tables live on
    elif bucket is None:
        bucket = 1024
    posts = src.filter(F.col("term").isin(present)).select(*post_cols)
    docs = _docs_side(reader, filter_cond)

    seg_size, avgdl = meta.seg_size, meta.avgdl
    dec = BLOB_DECODERS[codec_name(meta.codec)]

    n_required = len(uniq) if conjunctive else 0

    def _cogroup_score(p, d, theta_init=-np.inf):
        def _score(pleft: pd.DataFrame, pright: pd.DataFrame) -> pd.DataFrame:
            return _score_segment(pleft, pright, weights, seg_size, avgdl,
                                  k, k1, b, prune, bucket=bucket,
                                  quantize_norms=quantize_norms,
                                  theta_init=theta_init,
                                  n_required=n_required, decode=dec)

        return (p.groupBy("seg_id").cogroup(d.groupBy("seg_id"))
                .applyInPandas(_score, schema="docid long, score double"))

    if two_phase and prune:
        seed = (posts.groupBy("seg_id").agg(F.sum("n").alias("_n"))
                .orderBy(F.desc("_n"), F.asc("seg_id")).first())
        if seed is not None:
            seed_seg = seed["seg_id"]
            seed_rows = _cogroup_score(
                posts.filter(F.col("seg_id") == seed_seg),
                docs.filter(F.col("seg_id") == seed_seg)).collect()
            theta0 = (min(r["score"] for r in seed_rows)
                      if len(seed_rows) >= k else -np.inf)
            rest = _cogroup_score(posts.filter(F.col("seg_id") != seed_seg),
                                  docs.filter(F.col("seg_id") != seed_seg),
                                  theta_init=theta0)
            both = rest if not seed_rows else rest.unionByName(
                local_df(spark, seed_rows, "docid long, score double"))
            return both.orderBy(F.desc("score"), F.asc("docid")).limit(k)

    local = _cogroup_score(posts, docs)
    return local.orderBy(F.desc("score"), F.asc("docid")).limit(k)


def bm25_scores_indexed(
    reader: IndexReader,
    query_text: str,
    filter_cond: Column | None = None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Per-doc BM25 scores of EVERY matching doc via the posting index
    (no top-k cut) — the index twin of ``brute_force.bm25_scores``.
    Cost is bounded by the query terms' posting lists (a scan of only
    those parquet row groups), never a corpus re-analysis; the
    combining consumer (multi_match) needs full score sets, so no
    pruning applies.  Returns (docid, score), unordered."""
    spark = reader.spark
    meta = reader.meta
    qcounts = Counter(tokenize_query(query_text))
    uniq = sorted(qcounts)
    empty = local_df(spark, [], "docid long, score double")
    if not uniq:
        return empty
    stats = {r["term"]: r["df"] for r in reader.term_stats()
             .filter(F.col("term").isin(uniq)).collect()}
    present = [t for t in uniq if t in stats]
    if not present:
        return empty
    weights = {t: float(bm25_idf(stats[t], meta.n_docs)) * qcounts[t]
               for t in present}
    post_cols = ["term", "seg_id", "first_docid", "last_docid", "gaps",
                 "tfs", "max_tf", "n"]
    posts = (reader.postings().filter(F.col("term").isin(present))
             .select(*post_cols))
    docs = _docs_side(reader, filter_cond)
    seg_size, avgdl = meta.seg_size, meta.avgdl
    dec = BLOB_DECODERS[codec_name(meta.codec)]

    def _score(p: pd.DataFrame, d: pd.DataFrame) -> pd.DataFrame:
        return _score_segment(p, d, weights, seg_size, avgdl, None,
                              k1, b, prune=False, decode=dec)

    return (posts.groupBy("seg_id").cogroup(docs.groupBy("seg_id"))
            .applyInPandas(_score, schema="docid long, score double"))


def match_phrase_topk_indexed(
    reader: IndexReader,
    phrase: str,
    k: int = 10,
    filter_cond: Column | None = None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    slop: int = 0,
    slop_semantics: str = "anchor",
) -> DataFrame:
    """Scored ``match_phrase`` via positional postings (Lucene
    PhraseQuery over the positions index): reads ONLY the phrase
    terms' posting blocks + positions instead of re-analyzing the
    corpus per query (the brute-force path's cost).  Score-identical
    to ``brute_force.match_phrase_topk``: tf = positional phrase
    frequency, weight = Σ idf over phrase positions, BM25 saturation.

    Per segment: each phrase offset j contributes the set
    {(docid, pos − j)} of its term's occurrences; the intersection
    across offsets is exactly the phrase start positions (overlapping
    occurrences counted, like Lucene's position enumeration) —
    m−1 sorted ``intersect1d`` passes, fully vectorized.

    ``slop > 0`` switches to the sloppy anchor-nearest semantics of
    :func:`~anomaly_detection_spark.query.brute_force.
    sloppy_phrase_freq` (score-identical to that brute-force twin):
    instead of intersecting, each anchor key of offset 0 looks up its
    NEAREST neighbor in every other offset's sorted key set (two
    ``searchsorted`` probes per offset), matchLength = Σ distances,
    tf = Σ 1/(1+matchLength) over anchors within slop — still one
    pass over only the phrase terms' postings.

    ``slop_semantics="lucene"`` runs the reference-exact
    SloppyPhraseScorer sweep instead (:mod:`.sloppy`): candidate docs
    (those containing every phrase term) are found with the same
    vectorized key intersection, then each candidate's adjusted
    position lists are sliced out of the sorted key arrays and swept —
    score-identical to ``match_phrase_topk(slop_semantics="lucene")``,
    distinct terms only."""
    from ..functions.codecs import decode_positions

    if slop_semantics not in ("anchor", "lucene"):
        raise ValueError(
            f"slop_semantics must be 'anchor' or 'lucene': "
            f"{slop_semantics!r}")
    if slop > 0 and slop_semantics == "lucene":
        from .sloppy import require_distinct

        require_distinct(tokenize_query(phrase))
    spark = reader.spark
    meta = reader.meta
    if not meta.positions:
        raise ValueError(
            f"index at {reader.index_dir} was built without positions; "
            f"rebuild with build_index(..., positions=True) for scored "
            f"match_phrase, or use the brute-force path")
    terms = tokenize_query(phrase)
    empty = local_df(spark, [], "docid long, score double")
    if not terms:
        return empty
    m = len(terms)
    uniq = sorted(set(terms))
    stats = {r["term"]: r["df"] for r in reader.term_stats()
             .filter(F.col("term").isin(uniq)).collect()}
    if any(t not in stats for t in terms):
        return empty  # a phrase term absent from the corpus ⇒ no match
    import math

    idf_sum = sum(
        math.log(1.0 + (meta.n_docs - stats[t] + 0.5) / (stats[t] + 0.5))
        for t in terms)

    posts = (reader.postings().filter(F.col("term").isin(uniq))
             .select("term", "seg_id", "first_docid", "gaps", "tfs", "pos"))
    docs = _docs_side(reader, filter_cond)
    seg_size, avgdl = meta.seg_size, meta.avgdl
    cname = codec_name(meta.codec)
    dec = BLOB_DECODERS[cname]
    kk1, bb = k1, b
    STRIDE = np.int64(1) << np.int64(32)   # local docid ⊕ position key

    def _phrase(p: pd.DataFrame, d: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({"docid": pd.Series(dtype="int64"),
                                  "score": pd.Series(dtype="float64")})
        if len(p) == 0 or len(d) == 0:
            return out_empty
        seg_base = int(p["seg_id"].iloc[0]) * seg_size
        dl = _segment_doclens(d, seg_base, seg_size, False)
        # decode each term's (docid, position) occurrence stream
        occ: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for t, grp in p.groupby("term", sort=False):
            locs, poss = [], []
            for i in range(len(grp)):
                docids = (np.cumsum(dec(grp["gaps"].iloc[i]))
                          .astype(np.int64) + grp["first_docid"].iloc[i])
                tfs = dec(grp["tfs"].iloc[i]).astype(np.int64)
                pos = decode_positions(grp["pos"].iloc[i], tfs, codec=cname)
                locs.append(np.repeat(docids - seg_base, tfs))
                poss.append(pos)
            occ[t] = (np.concatenate(locs), np.concatenate(poss))
        if any(t not in occ for t in terms):
            return out_empty
        if slop > 0 and slop_semantics == "lucene":
            # reference-exact sweep: intersect candidate docids
            # vectorized, then slice each candidate's adjusted
            # positions out of the packed sorted keys (one
            # searchsorted pair per term per doc) and sweep
            from .sloppy import lucene_sloppy_freq

            sets = []
            cand = None
            for j, t in enumerate(terms):
                loc, pos = occ[t]
                sets.append(np.sort(loc * STRIDE + (pos - j) + m))
                u = np.unique(loc)
                cand = u if cand is None else np.intersect1d(
                    cand, u, assume_unique=True)
            if cand is None or len(cand) == 0:
                return out_empty
            pf = np.zeros(len(cand), dtype=np.float64)
            for ci, dloc in enumerate(cand):
                lo_key, hi_key = dloc * STRIDE, (dloc + 1) * STRIDE
                pls = []
                for kj in sets:
                    a, bnd = np.searchsorted(kj, (lo_key, hi_key))
                    pls.append(kj[a:bnd] - lo_key - m)
                pf[ci] = lucene_sloppy_freq(pls, slop)
            keepc = pf > 0.0
            if not keepc.any():
                return out_empty
            cand, pf = cand[keepc].astype(np.int64), pf[keepc]
        elif slop > 0:
            # sloppy: anchors are offset-0 keys; every other offset
            # contributes its nearest same-doc neighbor's distance.
            # Keys pack (local docid, adjusted pos + m) so adjusted
            # positions (≥ −m) stay non-negative; a neighbor from a
            # different doc lands ≥ STRIDE−2m away and can never pass
            # a sane slop.
            sets = []
            for j, t in enumerate(terms):
                loc, pos = occ[t]
                sets.append(np.sort(loc * STRIDE + (pos - j) + m))
            anchors = sets[0]
            ml = np.zeros(len(anchors), dtype=np.float64)
            for kj in sets[1:]:
                idx = np.searchsorted(kj, anchors)
                left = np.abs(anchors - kj[np.clip(idx - 1, 0, len(kj) - 1)])
                right = np.abs(kj[np.clip(idx, 0, len(kj) - 1)] - anchors)
                ml += np.minimum(left, right).astype(np.float64)
            w = np.where(ml <= slop, 1.0 / (1.0 + ml), 0.0)
            keep = w > 0.0
            if not keep.any():
                return out_empty
            loc = (anchors[keep] // STRIDE).astype(np.int64)
            cand, inv = np.unique(loc, return_inverse=True)
            pf = np.bincount(inv, weights=w[keep])
        else:
            keys = None
            for j, t in enumerate(terms):
                loc, pos = occ[t]
                ok = pos >= j
                # blocks arrive in arbitrary order (multiple batch dirs
                # per segment) — sort each offset's key set before
                # intersecting
                kj = np.sort(loc[ok] * STRIDE + (pos[ok] - j))
                keys = kj if keys is None else np.intersect1d(
                    keys, kj, assume_unique=True)
                if len(keys) == 0:
                    return out_empty
            loc = (keys // STRIDE).astype(np.int64)
            cand, pf = np.unique(loc, return_counts=True)
        dlv = dl[cand]
        okd = dlv >= 0
        cand, pf, dlv = cand[okd], pf[okd].astype(np.float64), dlv[okd]
        if len(cand) == 0:
            return out_empty
        score = idf_sum * (pf * (kk1 + 1.0)) / (
            pf + kk1 * (1.0 - bb + bb * dlv / max(avgdl, 1e-12)))
        order = np.lexsort((cand, -score))[:k]
        return pd.DataFrame({"docid": cand[order] + seg_base,
                             "score": score[order]})

    local = (posts.groupBy("seg_id").cogroup(docs.groupBy("seg_id"))
             .applyInPandas(_phrase, schema="docid long, score double"))
    return local.orderBy(F.desc("score"), F.asc("docid")).limit(k)


def match_phrase_prefix_topk_indexed(
    reader: IndexReader,
    phrase: str,
    k: int = 10,
    filter_cond: Column | None = None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    max_expansions: int = 50,
) -> DataFrame:
    """Scored ``match_phrase_prefix`` over positional postings: the
    trailing prefix expands to the first ``max_expansions`` dictionary
    terms from term_stats (Lucene MultiPhraseQuery), the m−1 exact
    offsets intersect positionally as in
    :func:`match_phrase_topk_indexed`, and the last offset's key set
    is the UNION of the expansions' occurrence streams.  tf and the
    blended idf match the brute-force twin
    ``brute_force.match_phrase_prefix_topk`` exactly."""
    from ..functions.codecs import decode_positions

    spark = reader.spark
    meta = reader.meta
    if not meta.positions:
        raise ValueError(
            f"index at {reader.index_dir} was built without positions; "
            f"rebuild with build_index(..., positions=True) for scored "
            f"match_phrase_prefix, or use the brute-force path")
    terms = tokenize_query(phrase)
    empty = local_df(spark, [], "docid long, score double")
    if not terms:
        return empty
    first, prefix = terms[:-1], terms[-1]
    m = len(terms)
    exps = [r["term"] for r in reader.term_stats()
            .filter(F.col("term").startswith(prefix))
            .select("term").orderBy("term").limit(max_expansions)
            .collect()]
    if not exps:
        return empty
    uniq = sorted(set(first) | set(exps))
    stats = {r["term"]: r["df"] for r in reader.term_stats()
             .filter(F.col("term").isin(uniq)).collect()}
    if any(t not in stats for t in first):
        return empty
    import math

    def _idf(df: int) -> float:
        return math.log(1.0 + (meta.n_docs - df + 0.5) / (df + 0.5))

    idf_sum = sum(_idf(stats[t]) for t in first) \
        + _idf(max(stats.get(t, 0) for t in exps))

    posts = (reader.postings().filter(F.col("term").isin(uniq))
             .select("term", "seg_id", "first_docid", "gaps", "tfs", "pos"))
    docs = _docs_side(reader, filter_cond)
    seg_size, avgdl = meta.seg_size, meta.avgdl
    cname = codec_name(meta.codec)
    dec = BLOB_DECODERS[cname]
    kk1, bb = k1, b
    exp_set = set(exps)
    STRIDE = np.int64(1) << np.int64(32)

    def _pp(p: pd.DataFrame, d: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({"docid": pd.Series(dtype="int64"),
                                  "score": pd.Series(dtype="float64")})
        if len(p) == 0 or len(d) == 0:
            return out_empty
        seg_base = int(p["seg_id"].iloc[0]) * seg_size
        dl = _segment_doclens(d, seg_base, seg_size, False)
        occ: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for t, grp in p.groupby("term", sort=False):
            locs, poss = [], []
            for i in range(len(grp)):
                docids = (np.cumsum(dec(grp["gaps"].iloc[i]))
                          .astype(np.int64) + grp["first_docid"].iloc[i])
                tfs = dec(grp["tfs"].iloc[i]).astype(np.int64)
                pos = decode_positions(grp["pos"].iloc[i], tfs, codec=cname)
                locs.append(np.repeat(docids - seg_base, tfs))
                poss.append(pos)
            occ[t] = (np.concatenate(locs), np.concatenate(poss))
        if any(t not in occ for t in first):
            return out_empty
        keys = None
        for j, t in enumerate(first):
            loc, pos = occ[t]
            ok = pos >= j
            kj = np.sort(loc[ok] * STRIDE + (pos[ok] - j))
            keys = kj if keys is None else np.intersect1d(
                keys, kj, assume_unique=True)
            if len(keys) == 0:
                return out_empty
        # last offset: union of the expansions' adjusted keys
        j = m - 1
        parts = []
        for t in exp_set:
            if t in occ:
                loc, pos = occ[t]
                ok = pos >= j
                parts.append(loc[ok] * STRIDE + (pos[ok] - j))
        if not parts:
            return out_empty
        # expansions are distinct terms: a position can host only one
        # term, so the union is duplicate-free
        klast = np.sort(np.concatenate(parts))
        keys = (klast if keys is None
                else np.intersect1d(keys, klast, assume_unique=True))
        if len(keys) == 0:
            return out_empty
        loc = (keys // STRIDE).astype(np.int64)
        cand, pf = np.unique(loc, return_counts=True)
        dlv = dl[cand]
        okd = dlv >= 0
        cand, pf, dlv = cand[okd], pf[okd].astype(np.float64), dlv[okd]
        if len(cand) == 0:
            return out_empty
        score = idf_sum * (pf * (kk1 + 1.0)) / (
            pf + kk1 * (1.0 - bb + bb * dlv / max(avgdl, 1e-12)))
        order = np.lexsort((cand, -score))[:k]
        return pd.DataFrame({"docid": cand[order] + seg_base,
                             "score": score[order]})

    local = (posts.groupBy("seg_id").cogroup(docs.groupBy("seg_id"))
             .applyInPandas(_pp, schema="docid long, score double"))
    return local.orderBy(F.desc("score"), F.asc("docid")).limit(k)


def multi_match_topk_indexed(
    readers: dict[str, IndexReader],
    query_text: str,
    fields: list[str],
    k: int = 10,
    match_type: str = "best_fields",
    tie_breaker: float = 0.0,
    filter_cond: Column | None = None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """``multi_match`` over per-field posting indexes: each field is
    scored with its OWN index's corpus statistics (n_docs, avgdl, df —
    exactly one Lucene field index per field, like the brute-force
    twin) via :func:`bm25_scores_indexed`, then combined best_fields /
    most_fields.  No corpus re-analysis: per field, only the query
    terms' posting blocks are read."""
    from .brute_force import combine_field_scores

    missing = [f for f in fields if f not in readers]
    if missing:
        raise ValueError(
            f"multi_match over an index target needs one IndexReader "
            f"per field; missing {missing}")
    frames = [bm25_scores_indexed(readers[f], query_text,
                                  filter_cond=filter_cond, k1=k1, b=b)
              for f in fields]
    return combine_field_scores(frames, match_type, tie_breaker,
                                id_col="docid", k=k)


def term_doc_pairs(reader: IndexReader, terms: list[str]) -> DataFrame:
    """(term, docid) pairs decoded from the posting lists of ``terms``
    — bounded by those terms' postings only.  The building block for
    matched-term-count predicates (conjunctive compounds,
    more_like_this minimum_should_match)."""
    dec = BLOB_DECODERS[codec_name(reader.meta.codec)]
    posts = (reader.postings().filter(F.col("term").isin(list(terms)))
             .select("term", "first_docid", "gaps"))

    def _expand(it):
        for pdf in it:
            ts, ds = [], []
            for t, first, gaps in zip(pdf["term"], pdf["first_docid"],
                                      pdf["gaps"]):
                docids = dec(bytes(gaps)).cumsum() + int(first)
                ds.append(docids)
                ts.append([t] * len(docids))
            if not ts:
                yield pd.DataFrame({"term": pd.Series(dtype="object"),
                                    "docid": pd.Series(dtype="int64")})
                continue
            yield pd.DataFrame({
                "term": [x for sub in ts for x in sub],
                "docid": np.concatenate(ds).astype("int64")})

    return posts.mapInPandas(_expand, schema="term string, docid long")


def span_near_docs_indexed(
    reader: IndexReader,
    terms: list[str],
    slop: int = 0,
    in_order: bool = True,
    end: int | None = None,
    filter_cond: Column | None = None,
) -> DataFrame:
    """Docids matching a span_near/span_first over the positional
    postings (matching only — span scoring is out of subset).  Reads
    ONLY the clause terms' posting blocks + positions; candidate docs
    are pre-narrowed to those carrying every clause term with the
    required multiplicity before the per-doc span kernel runs
    (``functions/spans.py`` algorithms, identical to the brute path).

    Cost is bounded by the rarest clause term's postings — the same
    posture as the phrase kernels; never a corpus re-analysis."""
    from collections import Counter as _Counter

    from ..functions.codecs import decode_positions
    from ..functions.spans import _ordered_match, _unordered_match

    spark = reader.spark
    meta = reader.meta
    if not meta.positions:
        raise ValueError(
            f"index at {reader.index_dir} was built without positions; "
            f"rebuild with build_index(..., positions=True) for span "
            f"queries, or use the brute-force path")
    empty = local_df(spark, [], "docid long")
    if not terms:
        return empty
    req = _Counter(terms)
    uniq = sorted(req)
    present = {r["term"] for r in reader.term_stats()
               .filter(F.col("term").isin(uniq)).select("term").collect()}
    if any(t not in present for t in uniq):
        return empty
    posts = (reader.postings().filter(F.col("term").isin(uniq))
             .select("term", "seg_id", "first_docid", "gaps", "tfs",
                     "pos"))
    docs = _docs_side(reader, filter_cond)
    seg_size = meta.seg_size
    cname = codec_name(meta.codec)
    dec = BLOB_DECODERS[cname]
    terms_l, slop_i, ord_b, end_i = list(terms), int(slop), bool(in_order), end

    def _spans(p: pd.DataFrame, d: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({"docid": pd.Series(dtype="int64")})
        if len(p) == 0 or len(d) == 0:
            return out_empty
        seg_base = int(p["seg_id"].iloc[0]) * seg_size
        dl = _segment_doclens(d, seg_base, seg_size, False)
        occ: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for t, grp in p.groupby("term", sort=False):
            locs, poss = [], []
            for i in range(len(grp)):
                docids = (np.cumsum(dec(grp["gaps"].iloc[i]))
                          .astype(np.int64) + grp["first_docid"].iloc[i])
                tfs = dec(grp["tfs"].iloc[i]).astype(np.int64)
                pos = decode_positions(grp["pos"].iloc[i], tfs,
                                       codec=cname)
                locs.append(np.repeat(docids - seg_base, tfs))
                poss.append(pos)
            loc = np.concatenate(locs)
            ps = np.concatenate(poss)
            order = np.lexsort((ps, loc))
            occ[t] = (loc[order], ps[order])
        if any(t not in occ for t in uniq):
            return out_empty
        # candidate docs: enough occurrences of every clause term
        cand = None
        for t, c in req.items():
            docs_t, counts_t = np.unique(occ[t][0], return_counts=True)
            ok = docs_t[counts_t >= c]
            cand = ok if cand is None else np.intersect1d(
                cand, ok, assume_unique=True)
            if len(cand) == 0:
                return out_empty
        cand = cand[dl[cand] >= 0]
        hits = []
        for doc in cand:
            positions = {}
            for t in uniq:
                loc, ps = occ[t]
                a = np.searchsorted(loc, doc, side="left")
                b_ = np.searchsorted(loc, doc, side="right")
                positions[t] = ps[a:b_]
            if ord_b:
                m_ = _ordered_match([positions[t] for t in terms_l],
                                    slop_i, end_i)
            else:
                m_ = _unordered_match(terms_l, positions, slop_i, end_i)
            if m_:
                hits.append(int(doc) + seg_base)
        return pd.DataFrame({"docid": pd.Series(hits, dtype="int64")})

    local = (posts.groupBy("seg_id").cogroup(docs.groupBy("seg_id"))
             .applyInPandas(_spans, schema="docid long"))
    return local.orderBy("docid")


def _expand_span_preds(reader: IndexReader, node: dict,
                       max_expansions: int) -> dict:
    """Expand span_multi pred nodes against the term DICTIONARY
    (SpanMultiTermQueryWrapper's rewrite): per pred, a cheap codegen
    pre-filter narrows the dictionary scan (startswith for prefix and
    for wildcard's literal prefix, a length window for fuzzy), the
    exact Python matcher — the SAME one the brute path uses — decides
    driver-side, and expansions past ``max_expansions`` raise
    (Lucene's TooManyClauses posture, default 1024 =
    indices.query.bool.max_clause_count)."""
    from ..functions.spans import pred_matcher, rewrite_preds, tree_preds

    preds = tree_preds(node)
    if not preds:
        return node
    dictionary = reader.postings().select("term").distinct()
    exps: list[list[str]] = []
    for p in preds:
        d = dictionary
        if p["kind"] == "prefix":
            d = d.filter(F.col("term").startswith(p["val"].lower()))
        elif p["kind"] == "wildcard":
            lit = p["val"].lower().split("*")[0].split("?")[0]
            if lit and "\\" not in lit:
                d = d.filter(F.col("term").startswith(lit))
        elif p["kind"] == "fuzzy":
            me = int(p["max_edits"])
            d = d.filter(F.length("term").between(
                len(p["val"]) - me, len(p["val"]) + me))
        cand = pd.Series([r["term"] for r in d.collect()],
                         dtype="object")
        matched = (sorted(cand[pred_matcher(p)(cand)])
                   if len(cand) else [])
        if len(matched) > max_expansions:
            raise ValueError(
                f"span_multi {p['kind']} {p['val']!r} expands to "
                f"{len(matched)} terms > max_expansions "
                f"{max_expansions} (TooManyClauses)")
        exps.append(matched)
    return rewrite_preds(node, iter(exps))


def span_tree_docs_indexed(
    reader: IndexReader,
    node: dict,
    filter_cond: Column | None = None,
    max_expansions: int = 1024,
) -> DataFrame:
    """Docids matching a compound span tree (span_or / span_not /
    span_containing / span_within / span_multi, ``functions/spans.py``
    enum kernel) over the positional postings.  Reads ONLY the tree's
    terms' posting blocks; candidates are docs carrying at least one
    tree term (the per-doc kernel decides exactly) — a superset
    narrowing, still bounded by the tree terms' postings, never a
    corpus re-analysis.  span_multi preds are expanded against the
    term dictionary first (:func:`_expand_span_preds`)."""
    from ..functions.codecs import decode_positions
    from ..functions.spans import enum_spans, tree_terms

    spark = reader.spark
    meta = reader.meta
    if not meta.positions:
        raise ValueError(
            f"index at {reader.index_dir} was built without positions; "
            f"rebuild with build_index(..., positions=True) for span "
            f"queries, or use the brute-force path")
    from ..functions.spans import tree_leaf_fields

    if tree_leaf_fields(node) - {None}:
        raise ValueError(
            "field_masking_span trees mix fields — a single-field "
            "postings index cannot serve them; use the brute path "
            "(compile_filter / span_tree_match_expr_fields)")
    node = _expand_span_preds(reader, node, max_expansions)
    uniq = sorted(tree_terms(node))
    empty = local_df(spark, [], "docid long")
    if not uniq:
        return empty
    posts = (reader.postings().filter(F.col("term").isin(uniq))
             .select("term", "seg_id", "first_docid", "gaps", "tfs",
                     "pos"))
    docs = _docs_side(reader, filter_cond)
    seg_size = meta.seg_size
    cname = codec_name(meta.codec)
    dec = BLOB_DECODERS[cname]
    node_l = dict(node)

    def _spans(p: pd.DataFrame, d: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({"docid": pd.Series(dtype="int64")})
        if len(p) == 0 or len(d) == 0:
            return out_empty
        seg_base = int(p["seg_id"].iloc[0]) * seg_size
        dl = _segment_doclens(d, seg_base, seg_size, False)
        occ: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for t, grp in p.groupby("term", sort=False):
            locs, poss = [], []
            for i in range(len(grp)):
                docids = (np.cumsum(dec(grp["gaps"].iloc[i]))
                          .astype(np.int64) + grp["first_docid"].iloc[i])
                tfs = dec(grp["tfs"].iloc[i]).astype(np.int64)
                pos = decode_positions(grp["pos"].iloc[i], tfs,
                                       codec=cname)
                locs.append(np.repeat(docids - seg_base, tfs))
                poss.append(pos)
            loc = np.concatenate(locs)
            ps = np.concatenate(poss)
            order = np.lexsort((ps, loc))
            occ[t] = (loc[order], ps[order])
        if not occ:
            return out_empty
        cand = np.unique(np.concatenate([occ[t][0] for t in occ]))
        cand = cand[dl[cand] >= 0]
        hits = []
        for doc in cand:
            positions = {}
            for t in occ:
                loc, ps = occ[t]
                a = np.searchsorted(loc, doc, side="left")
                b_ = np.searchsorted(loc, doc, side="right")
                positions[t] = ps[a:b_]
            if len(enum_spans(positions, node_l)) > 0:
                hits.append(int(doc) + seg_base)
        return pd.DataFrame({"docid": pd.Series(hits, dtype="int64")})

    local = (posts.groupBy("seg_id").cogroup(docs.groupBy("seg_id"))
             .applyInPandas(_spans, schema="docid long"))
    return local.orderBy("docid")


def fetch_docs(reader: IndexReader, topk: DataFrame) -> DataFrame:
    """Join top-k hits back to their stored identity/filter columns —
    the ``_source`` fetch path (broadcast: top-k is tiny)."""
    return (
        F.broadcast(topk)
        .join(reader.doc_stats(), "docid")
        .orderBy(F.desc("score"), F.asc("docid"))
    )


def term_doc_tfs(reader: IndexReader, terms: list[str]) -> DataFrame:
    """(term, docid, tf) triples decoded from the posting lists of
    ``terms`` — ``term_doc_pairs`` plus the tf stream; the building
    block for merged-statistics scoring (combined_fields), still
    bounded by the query terms' postings only."""
    dec = BLOB_DECODERS[codec_name(reader.meta.codec)]
    posts = (reader.postings().filter(F.col("term").isin(list(terms)))
             .select("term", "first_docid", "gaps", "tfs"))

    def _expand(it):
        for pdf in it:
            ts, ds, fs = [], [], []
            for t, first, gaps, tfs in zip(
                    pdf["term"], pdf["first_docid"], pdf["gaps"],
                    pdf["tfs"]):
                docids = dec(bytes(gaps)).cumsum() + int(first)
                ds.append(docids)
                fs.append(dec(bytes(tfs)))
                ts.append([t] * len(docids))
            if not ts:
                yield pd.DataFrame({"term": pd.Series(dtype="object"),
                                    "docid": pd.Series(dtype="int64"),
                                    "tf": pd.Series(dtype="int64")})
                continue
            yield pd.DataFrame({
                "term": [x for sub in ts for x in sub],
                "docid": np.concatenate(ds).astype("int64"),
                "tf": np.concatenate(fs).astype("int64")})

    return posts.mapInPandas(_expand, schema="term string, docid long, tf long")
