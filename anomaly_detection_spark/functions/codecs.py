"""Posting-list codecs: delta-gap + LEB128 varint, numpy-vectorized.

The Spark analog of Lucene's postings encoding (delta-compressed doc id
gaps + term frequencies per block).  These run inside Arrow pandas UDFs
during segment build/merge and inside the WAND scorer — no per-row
Python anywhere (BASELINE.json ``input_hint``; SURVEY.md §2.6 L2).

Format: unsigned LEB128 (7 data bits/byte, high bit = continuation).
Docids are encoded as gaps relative to ``base`` (the block's first docid
is stored in columnar block metadata, so gap[0] = docid[0] - base).
"""

from __future__ import annotations

import numpy as np

_U64_1 = np.uint64(1)
_U64_7 = np.uint64(7)


def varint_encode_with_widths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Like :func:`varint_encode` but also returns per-value byte widths
    (so callers can slice the stream at value boundaries, e.g. to cut
    posting blocks out of one encoded run)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    nbits = np.floor(np.log2(v.astype(np.float64) + (v == 0))).astype(np.int64) + 1
    nbits[v == 0] = 1
    # float log2 can under-round near powers of two for big ints; fix up
    big = v >= (_U64_1 << np.minimum(nbits.astype(np.uint64), np.uint64(63)))
    nbits[big] += 1
    widths = (nbits + 6) // 7
    offsets = np.concatenate(([0], np.cumsum(widths)[:-1]))
    out = np.zeros(int(widths.sum()), dtype=np.uint8)
    for j in range(int(widths.max())):
        mask = widths > j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = np.where(widths[mask] - 1 > j, 0x80, 0).astype(np.uint8)
        out[offsets[mask] + j] = chunk.astype(np.uint8) | cont
    return out.tobytes(), widths


def varint_encode(values: np.ndarray) -> bytes:
    """uint64 array → LEB128 bytes (vectorized: one pass per byte slot)."""
    return varint_encode_with_widths(values)[0]


def varint_decode(data: bytes) -> np.ndarray:
    """LEB128 bytes → uint64 array (vectorized via reduceat)."""
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    starts = np.concatenate(([0], np.flatnonzero(is_end)[:-1] + 1))
    pos_in_val = np.arange(b.size, dtype=np.int64) - np.repeat(
        starts, np.diff(np.concatenate((starts, [b.size]))))
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos_in_val.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


def delta_encode(sorted_vals: np.ndarray, base: int = 0) -> np.ndarray:
    """Strictly-increasing uint64 values → gaps relative to ``base``."""
    v = np.asarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    with np.errstate(over="ignore"):
        return np.diff(v, prepend=np.uint64(base))


def delta_decode(gaps: np.ndarray, base: int = 0) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.uint64)
    if g.size == 0:
        return g
    with np.errstate(over="ignore"):
        return np.cumsum(g) + np.uint64(base)


def for_encode(values: np.ndarray) -> bytes:
    """Frame-of-reference bit packing (the PForDelta family without the
    exception patch list): one header byte = bit width b (the max value
    width in the block), then all values packed at b bits, little
    endian.  Decode is pure word shifts/masks — no per-byte
    continuation scanning — which is why Lucene-family engines pack
    posting blocks this way; posting GAPS within a block are
    near-uniform, so per-block max-width costs little vs true PFor.

    Empty input → b'' ; all-zero input → header 0, no payload."""
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    mx = int(v.max())
    b = max(int(mx).bit_length(), 0)
    if b == 0:
        return bytes([0]) + n.to_bytes(4, "little")
    pos = np.arange(n, dtype=np.uint64) * np.uint64(b)
    word = (pos >> np.uint64(6)).astype(np.int64)
    off = pos & np.uint64(63)
    nwords = int((n * b + 63) // 64) + 1
    w = np.zeros(nwords, dtype=np.uint64)
    np.bitwise_or.at(w, word, v << off)
    # high bits that crossed the word boundary ((64-off)%64 keeps the
    # shift count defined when off==0; the where() discards that lane)
    sh = (np.uint64(64) - off) & np.uint64(63)
    hi = np.where(off != 0, v >> sh, np.uint64(0))
    np.bitwise_or.at(w, word + 1, hi)
    return bytes([b]) + n.to_bytes(4, "little") + w.tobytes()


def for_decode(blob: bytes) -> np.ndarray:
    """Inverse of :func:`for_encode` → uint64 array."""
    if len(blob) == 0:
        return np.empty(0, dtype=np.uint64)
    b = blob[0]
    n = int.from_bytes(blob[1:5], "little")
    if b == 0:
        return np.zeros(n, dtype=np.uint64)
    w = np.frombuffer(blob[5:], dtype=np.uint64)
    pos = np.arange(n, dtype=np.uint64) * np.uint64(b)
    word = (pos >> np.uint64(6)).astype(np.int64)
    off = pos & np.uint64(63)
    lo = w[word] >> off
    sh = (np.uint64(64) - off) & np.uint64(63)
    hi = np.where(off != 0, w[word + 1] << sh, np.uint64(0))
    mask = (np.uint64(1) << np.uint64(b)) - np.uint64(1) if b < 64 \
        else np.uint64(0xFFFFFFFFFFFFFFFF)
    return (lo | hi) & mask


# posting-blob codec registry: "leb128" (byte varints, default) and
# "for" (frame-of-reference bit packing — faster word-aligned decode).
# meta.codec strings are "delta-gap+<name>".
BLOB_DECODERS = {"leb128": varint_decode, "for": for_decode}


def codec_name(meta_codec: str) -> str:
    """IndexMeta.codec string → registry key ("delta-gap+for" → "for");
    unknown codecs fail fast rather than mis-decode."""
    name = meta_codec.rsplit("+", 1)[-1]
    if name not in BLOB_DECODERS:
        raise ValueError(f"unknown posting codec {meta_codec!r}")
    return name


def decode_positions(blob: bytes, tfs: np.ndarray,
                     codec: str = "leb128") -> np.ndarray:
    """Positional payload of one posting block → absolute in-document
    token positions (flat, grouped per posting in posting order).

    Encoding (see ``blocks_from_sorted``): per posting, the first
    position is absolute and the rest are deltas to the previous
    position — the Lucene proximity-payload shape.  ``tfs`` gives the
    per-posting occurrence counts that delimit the flat stream."""
    dp = BLOB_DECODERS[codec](blob).astype(np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    if dp.size == 0:
        return dp
    c = np.cumsum(dp)
    starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    base = c[starts] - dp[starts]
    return c - np.repeat(base, tfs)


def encode_postings(docids: np.ndarray, tfs: np.ndarray, base: int = 0) -> tuple[bytes, bytes]:
    """(sorted docids, tfs) → (gap varint bytes, tf varint bytes)."""
    return (
        varint_encode(delta_encode(docids, base)),
        varint_encode(np.asarray(tfs, dtype=np.uint64)),
    )


def decode_postings(gaps: bytes, tfs: bytes, base: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_postings` → (docids int64, tfs int64)."""
    docids = delta_decode(varint_decode(gaps), base).astype(np.int64)
    return docids, varint_decode(tfs).astype(np.int64)
