#!/usr/bin/env python
"""Block-max pruning effectiveness report (SURVEY.md §2.6 L5).

For a set of match queries against a built index, count posting blocks
decoded with pruning on vs off (per segment, via the same
``_score_segment`` kernel the cogroup scorer runs), and confirm the
top-k is identical.  Usage:

    python scripts/pruning_stats.py [index_dir] [k]

Builds a default 60k-turn transcripts index under /tmp if no dir given.
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import anomaly_detection_spark.query.index_search as ixs
from anomaly_detection_spark.functions.bm25 import bm25_idf
from anomaly_detection_spark.functions.tokenizer import tokenize_query
from anomaly_detection_spark.session import get_spark

QUERIES = [
    "error spark merge query",
    "data table scan slow fast",
    "the a to",
    "naïve éclair window",
    "index merge batch stream column vector",
]


def main() -> None:
    spark = get_spark("pruning-stats", master="local[8]", shuffle_partitions=8)
    if len(sys.argv) > 1:
        idx_dir = sys.argv[1]
    else:
        from anomaly_detection_spark.data import assign_docids, generate_transcripts
        from anomaly_detection_spark.index import build_index

        idx_dir = "/tmp/adspark_prune_idx_60000"
        docs = assign_docids(generate_transcripts(spark, 60000, seed=42))
        build_index(docs, idx_dir, seg_size=8192, block_size=256)
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    reader = ixs.IndexReader(spark, idx_dir)
    meta = reader.meta
    norms = {r["seg_id"]: r for r in reader.doc_norms().collect()}

    report = []
    for qtext in QUERIES:
        qcounts = Counter(tokenize_query(qtext))
        stats = {r["term"]: r["df"] for r in reader.term_stats()
                 .filter(ixs.F.col("term").isin(sorted(qcounts))).collect()}
        weights = {t: float(bm25_idf(stats[t], meta.n_docs)) * c
                   for t, c in qcounts.items() if t in stats}
        if not weights:
            continue
        posts = (reader.postings()
                 .filter(ixs.F.col("term").isin(list(weights)))
                 .select("term", "seg_id", "first_docid", "last_docid",
                         "gaps", "tfs", "max_tf")
                 .toPandas())

        decoded = {True: 0, False: 0}
        results = {}
        total_blocks = len(posts)
        real_decode = ixs.varint_decode
        for prune in (True, False):
            calls = [0]

            def counting(b, _real=real_decode, _c=calls):
                _c[0] += 1
                return _real(b)

            ixs.varint_decode = counting
            rows = []
            for seg, sp in posts.groupby("seg_id"):
                nrow = norms[seg]
                import pandas as pd
                ndf = pd.DataFrame([{ "seg_id": seg,
                                      "docid_gaps": nrow["docid_gaps"],
                                      "dls": nrow["dls"]}])
                out = ixs._score_segment(
                    sp.reset_index(drop=True), ndf, weights, meta.seg_size,
                    meta.avgdl, k, 1.2, 0.75, prune)
                rows.append(out)
            ixs.varint_decode = real_decode
            import pandas as pd
            allr = pd.concat(rows, ignore_index=True)
            allr = allr.sort_values(["score", "docid"],
                                    ascending=[False, True]).head(k)
            results[prune] = list(allr.docid)
            # each block decode = 2 varint calls (gaps + tfs); norms add
            # 2 per segment in both modes — report block-equivalents
            decoded[prune] = calls[0] // 2

        assert results[True] == results[False], f"pruning changed results: {qtext}"
        report.append({
            "query": qtext,
            "total_blocks": int(total_blocks),
            "decoded_pruned": decoded[True],
            "decoded_unpruned": decoded[False],
            "skip_ratio": round(1 - decoded[True] / max(decoded[False], 1), 3),
            "identical_topk": True,
        })
        print(json.dumps(report[-1]))
    with open("PRUNING_STATS.json", "w") as f:
        json.dump(report, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
