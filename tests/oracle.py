"""Slow, obviously-correct pure-pandas BM25 oracle for golden tests.

Independent of the Spark engine except for the shared analyzer (one
analyzer by design — parity with how OpenSearch applies one analyzer at
index and query time).  Formula per SURVEY.md §2.6 L4.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from anomaly_detection_spark.functions.tokenizer import tokenize_query, tokenize_texts


def bm25_oracle_topk(
    docs: pd.DataFrame,
    query_text: str,
    k: int = 10,
    mask: pd.Series | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "docid",
    quantize_norms: bool = False,
) -> pd.DataFrame:
    """Exhaustive BM25 top-k.  ``mask`` restricts candidates (filters);
    corpus stats always come from the full frame."""
    toks = tokenize_texts(docs[text_col])
    dls = toks.map(len)
    n = len(docs)
    avgdl = float(dls.mean()) if n else 0.0
    qterms = tokenize_query(query_text)
    if not qterms:
        return pd.DataFrame({id_col: [], "score": []})

    qset = set(qterms)
    dfreq = Counter()
    for tl in toks:
        for t in qset.intersection(tl):
            dfreq[t] += 1
    idf = {t: math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)) for t in qset}

    cand_idx = docs.index if mask is None else docs.index[mask.values]
    rows = []
    for i in cand_idx:
        tl = toks[i]
        if not tl:
            continue
        cnt = Counter(tl)
        dl = len(tl)
        if quantize_norms:
            from anomaly_detection_spark.functions.bm25 import quantize_doc_len

            dl = int(quantize_doc_len([dl])[0])
        s = 0.0
        for t in qterms:  # note: duplicates in query sum twice, like Lucene SHOULD
            tf = cnt.get(t, 0)
            if tf == 0:
                continue
            s += idf[t] * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * dl / avgdl))
        if s > 0.0:
            rows.append((docs[id_col][i], s))
    out = pd.DataFrame(rows, columns=[id_col, "score"])
    out = out.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
    return out.head(k).reset_index(drop=True)
