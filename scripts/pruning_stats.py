#!/usr/bin/env python
"""Block-max pruning effectiveness report (SURVEY.md §2.6 L5).

For a set of match queries against a built index, count posting blocks
(and postings) decoded with pruning on vs off — via the same
``_score_segment`` kernel the cogroup scorer runs — and confirm the
top-k is identical.  Norms are pre-decoded outside the counted region
so the ratios measure posting-block work only.  Usage:

    python scripts/pruning_stats.py [index_dir] [k]

Builds a default 256k-turn index (64k-doc segments, 128-posting blocks)
under /tmp if no dir is given.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

import anomaly_detection_spark.query.index_search as ixs
from anomaly_detection_spark.functions.bm25 import bm25_idf
from anomaly_detection_spark.functions.tokenizer import tokenize_query
from anomaly_detection_spark.session import get_spark

from anomaly_detection_spark.data.transcripts import topic_words

# global-vocabulary queries: iid Zipf background, homogeneous along
# docid — nothing any exact bound can skip (Lucene BMW skips ~nothing
# on such shapes either); kept as the honest floor, and the bail-out
# keeps their pruned wall ≈ unpruned wall
GLOBAL_QUERIES = [
    "error spark merge query",
    "data table scan slow fast",
    "the a to",
    "naïve éclair window",
    "index merge batch stream column vector",
    " ".join(topic_words(120)[:2]),     # pure-topical: blocks are few
    topic_words(9)[0] + " error",       # and segment-wide → no skip
]
# the selective set: topical clause(s) + hot term(s) — the detector-
# style shape (subject match + common filter tokens) where θ is driven
# by in-topic conjunctions and the hot terms' bucket-local blocks are
# skippable everywhere the topic is absent.  This is the regime BMW
# exists for.
SELECTIVE_QUERIES = [
    " ".join(topic_words(40)[:2]) + " the",
    " ".join(topic_words(17)[:3]) + " the",
    " ".join(topic_words(3)[:2]) + " the a",
    " ".join(topic_words(9)[:2]) + " error the",
    " ".join(topic_words(75)[:2]) + " to",
]
QUERIES = [(q, False) for q in GLOBAL_QUERIES] + \
    [(q, True) for q in SELECTIVE_QUERIES]


def main() -> None:
    spark = get_spark("pruning-stats", master="local[8]", shuffle_partitions=8)
    if len(sys.argv) > 1:
        idx_dir = sys.argv[1]
    else:
        from anomaly_detection_spark.data import assign_docids, generate_transcripts
        from anomaly_detection_spark.index import build_index

        n_turns = int(os.environ.get("PRUNE_TURNS", 262144))
        idx_dir = f"/tmp/adspark_prune_idx_{n_turns}"
        docs = assign_docids(generate_transcripts(spark, n_turns, seed=42))
        try:
            build_index(docs, idx_dir, seg_size=65536, block_size=128,
                        segments_per_batch=4)
        except ValueError:  # stale cache from an older index format
            import shutil

            shutil.rmtree(idx_dir, ignore_errors=True)
            build_index(docs, idx_dir, seg_size=65536, block_size=128,
                        segments_per_batch=4)
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    reader = ixs.IndexReader(spark, idx_dir)
    meta = reader.meta
    # pre-decode norms into (docid, doc_len) frames so the counted
    # varint_decode calls are posting blocks only
    norm_rows = reader.doc_norms().collect()
    norms = {}
    for r in norm_rows:
        seg = r["seg_id"]
        docids = np.cumsum(ixs.varint_decode(r["docid_gaps"])).astype(np.int64)
        dls = ixs.varint_decode(r["dls"]).astype(np.int64)
        norms[seg] = pd.DataFrame({"docid": docids, "doc_len": dls,
                                   "seg_id": seg})

    report = []
    for qtext, selective in QUERIES:
        qcounts = Counter(tokenize_query(qtext))
        stats = {r["term"]: r["df"] for r in reader.term_stats()
                 .filter(ixs.F.col("term").isin(sorted(qcounts))).collect()}
        weights = {t: float(bm25_idf(stats[t], meta.n_docs)) * c
                   for t, c in qcounts.items() if t in stats}
        if not weights:
            continue
        cols = ["term", "seg_id", "first_docid", "last_docid",
                "gaps", "tfs", "max_tf", "min_dl", "n"]
        src = reader.postings()
        if "bm_buckets" in src.columns:
            cols += ["bm_buckets", "bm_tf", "bm_dl"]
        posts = (src.filter(ixs.F.col("term").isin(list(weights)))
                 .select(*cols).toPandas())

        total_blocks = len(posts)
        total_postings = int(posts["n"].sum())
        decoded = {}
        decoded_postings = {}
        walls = {}
        results = {}
        real_decode = ixs.varint_decode
        # cascade = the two-phase/theta-carry mode bm25_topk_indexed
        # exposes as two_phase=True: segments visited densest-first,
        # each seeded with the k-th best score seen so far
        for mode, prune in (("pruned", True), ("unpruned", False),
                            ("cascade", True)):
            calls = [0, 0]  # n_calls, total decoded ints

            def counting(blob, _real=real_decode, _c=calls):
                out = _real(blob)
                _c[0] += 1
                _c[1] += len(out)
                return out

            seg_order = (posts.groupby("seg_id")["n"].sum()
                         .sort_values(ascending=False).index)
            # wall = best of 3 trials (shared box; ms-scale timings are
            # noise-dominated otherwise); decode counts from the last
            for trial in range(3):
                calls[0] = calls[1] = 0
                ixs.varint_decode = counting
                t0 = time.perf_counter()
                rows = []
                theta = float("-inf")
                for seg in seg_order:
                    sp = posts[posts.seg_id == seg]
                    out = ixs._score_segment(
                        sp.reset_index(drop=True), norms[seg], weights,
                        meta.seg_size, meta.avgdl, k, 1.2, 0.75, prune,
                        bucket=meta.bucket_size,
                        theta_init=theta if mode == "cascade"
                        else float("-inf"))
                    rows.append(out)
                    if mode == "cascade":
                        acc = pd.concat(rows, ignore_index=True)
                        if len(acc) >= k:
                            theta = float(acc["score"].nlargest(k).iloc[-1])
                wall = time.perf_counter() - t0
                ixs.varint_decode = real_decode
                walls[mode] = min(walls.get(mode, float("inf")),
                                  round(wall, 3))
            allr = pd.concat(rows, ignore_index=True)
            allr = allr.sort_values(["score", "docid"],
                                    ascending=[False, True]).head(k)
            results[mode] = list(zip(allr.docid, allr.score.round(9)))
            # each block decode = 2 varint calls (gaps + tfs)
            decoded[mode] = calls[0] // 2
            decoded_postings[mode] = calls[1] // 2

        assert results["pruned"] == results["unpruned"] == results["cascade"], \
            f"pruning changed results: {qtext}"
        report.append({
            "query": qtext,
            "selective": selective,
            "total_blocks": int(total_blocks),
            "total_postings": total_postings,
            "decoded_pruned": decoded["pruned"],
            "decoded_unpruned": decoded["unpruned"],
            "decoded_cascade": decoded["cascade"],
            "skip_ratio": round(
                1 - decoded["pruned"] / max(decoded["unpruned"], 1), 3),
            "skip_ratio_cascade": round(
                1 - decoded["cascade"] / max(decoded["unpruned"], 1), 3),
            "postings_skip_ratio": round(
                1 - decoded_postings["pruned"]
                / max(decoded_postings["unpruned"], 1), 3),
            "wall_pruned_s": walls["pruned"],
            "wall_unpruned_s": walls["unpruned"],
            "identical_topk": True,
        })
        print(json.dumps(report[-1]))
    sel = [r["skip_ratio"] for r in report if r["selective"]]
    selc = [r["skip_ratio_cascade"] for r in report if r["selective"]]
    summary = {
        "selective_mean_skip_ratio": round(sum(sel) / max(len(sel), 1), 3),
        "selective_min_skip_ratio": round(min(sel), 3) if sel else None,
        "selective_mean_skip_ratio_cascade": round(
            sum(selc) / max(len(selc), 1), 3),
        "all_identical_topk": all(r["identical_topk"] for r in report),
    }
    print(json.dumps(summary))
    with open("PRUNING_STATS.json", "w") as f:
        json.dump({"queries": report, "summary": summary}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
