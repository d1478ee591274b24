"""BM25 (Lucene-faithful) scoring math, shared by every scorer.

Reference semantics: OpenSearch ``text`` fields default to Lucene's
``BM25Similarity`` with k1=1.2, b=0.75 (BASELINE.json pins these).  The
formula (SURVEY.md §2.6 L4):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q, d) = Σ_{t ∈ q} idf(t) * w(t, d)

Multi-term ``match`` = bool SHOULD over analyzed terms, scores summed
(SURVEY.md §7 R2).  Ties break by docid ascending (Lucene internal doc
order).  ``N`` and ``avgdl`` are index-wide (filters never change them,
matching Lucene).

Norms: Lucene quantizes doc length to 1 byte (``SmallFloat``); we default
to exact float lengths (``quantize_norms=False``) and expose the
quantized mode behind a flag for byte-level Lucene parity (SURVEY.md §7
R1).  Both modes are deterministic; golden files pin the default.

All functions are numpy-vectorized — they run inside Arrow pandas UDFs.
"""

from __future__ import annotations

import numpy as np

K1_DEFAULT = 1.2
B_DEFAULT = 0.75

# Lucene SmallFloat.intToByte4 / byte4ToInt semantics (public Lucene
# source, lucene/core .../util/SmallFloat.java): a 1-byte float with a
# 3-bit mantissa (plus implicit leading bit) and the first
# NUM_FREE_VALUES integers stored exactly.
_NUM_FREE_VALUES = 24  # 255 - longToInt4(Integer.MAX_VALUE)


def _long_to_int4(i: np.ndarray) -> np.ndarray:
    i = np.asarray(i, dtype=np.int64)
    num_bits = np.zeros_like(i)
    nz = i > 0
    num_bits[nz] = np.floor(np.log2(i[nz].astype(np.float64))).astype(np.int64) + 1
    # guard float rounding at powers of two
    over = nz & (i >= (np.int64(1) << np.minimum(num_bits, 62)))
    num_bits[over] += 1
    subnormal = num_bits < 4
    shift = np.maximum(num_bits - 4, 0)
    encoded = ((i >> shift) & 0x07) | ((shift + 1) << 3)
    return np.where(subnormal, i, encoded)


def _int4_to_long(e: np.ndarray) -> np.ndarray:
    e = np.asarray(e, dtype=np.int64)
    bits = e & 0x07
    shift = (e >> 3) - 1
    return np.where(shift == -1, bits, (bits | 0x08) << np.maximum(shift, 0))


def _int_to_byte4(i: np.ndarray) -> np.ndarray:
    i = np.asarray(i, dtype=np.int64)
    small = i < _NUM_FREE_VALUES
    enc = _NUM_FREE_VALUES + _long_to_int4(np.maximum(i - _NUM_FREE_VALUES, 0))
    return np.where(small, i, enc).astype(np.uint8)


def _byte4_to_int(b: np.ndarray) -> np.ndarray:
    b = np.asarray(b, dtype=np.int64) & 0xFF
    small = b < _NUM_FREE_VALUES
    dec = _NUM_FREE_VALUES + _int4_to_long(np.maximum(b - _NUM_FREE_VALUES, 0))
    return np.where(small, b, dec).astype(np.int64)


def quantize_doc_len(dl: np.ndarray) -> np.ndarray:
    """Round doc length through Lucene's 1-byte norm (lossy, monotone)."""
    return _byte4_to_int(_int_to_byte4(np.asarray(dl, dtype=np.int64)))


def bm25_idf(df: np.ndarray | float, n_docs: int) -> np.ndarray:
    """idf = ln(1 + (N - df + 0.5)/(df + 0.5))"""
    df = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term_weight(
    tf: np.ndarray,
    doc_len: np.ndarray,
    avgdl: float,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> np.ndarray:
    """tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))"""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(doc_len, dtype=np.float64)
    denom = tf + k1 * (1.0 - b + b * dl / max(avgdl, 1e-12))
    return tf * (k1 + 1.0) / denom


def bm25_score(
    tf: np.ndarray,
    df: np.ndarray,
    doc_len: np.ndarray,
    n_docs: int,
    avgdl: float,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> np.ndarray:
    """Per-(term,doc) contribution: idf(t) * w(t, d)."""
    return bm25_idf(df, n_docs) * bm25_term_weight(tf, doc_len, avgdl, k1, b)


def bm25_max_score_ub(
    max_tf: np.ndarray,
    df: np.ndarray,
    n_docs: int,
    avgdl: float,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> np.ndarray:
    """Block-max upper bound: score at the block's max tf with the most
    favorable doc length (dl → 0 ⇒ weight ↑).  Used by WAND skipping
    (SURVEY.md §2.6 L5): a true UB because w is increasing in tf and
    decreasing in dl."""
    max_tf = np.asarray(max_tf, dtype=np.float64)
    denom = max_tf + k1 * (1.0 - b)
    return bm25_idf(df, n_docs) * (max_tf * (k1 + 1.0) / denom)
