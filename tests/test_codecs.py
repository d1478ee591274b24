import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from anomaly_detection_spark.functions.codecs import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 300, 2**20, 2**35, 2**63 - 1], dtype=np.uint64)
    assert (varint_decode(varint_encode(vals)) == vals).all()


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (varint_decode(varint_encode(arr)) == arr).all()


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300),
       st.integers(min_value=0, max_value=100))
def test_delta_roundtrip_property(vals, base_off):
    arr = np.array(sorted(vals), dtype=np.uint64)
    base = max(0, int(arr[0]) - base_off)
    assert (delta_decode(delta_encode(arr, base), base) == arr).all()


def test_postings_roundtrip():
    docids = np.array([5, 6, 9, 100, 10_000_000], dtype=np.int64)
    tfs = np.array([1, 3, 2, 1, 120], dtype=np.int64)
    gaps, tfb = encode_postings(docids, tfs, base=5)
    d2, t2 = decode_postings(gaps, tfb, base=5)
    assert (d2 == docids).all() and (t2 == tfs).all()


def test_varint_boundary_widths():
    # values at every 7-bit width boundary
    vals = []
    for w in range(1, 10):
        vals += [(1 << (7 * w)) - 1, 1 << (7 * w)]
    arr = np.array([v for v in vals if v < 2**64], dtype=np.uint64)
    assert (varint_decode(varint_encode(arr)) == arr).all()
