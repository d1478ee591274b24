"""Lucene-exact sloppy phrase frequency (SloppyPhraseScorer sweep).

The engine's default ``slop > 0`` semantics is the anchor-nearest
formula (:func:`~anomaly_detection_spark.query.brute_force.
sloppy_phrase_freq`) — pure codegen, DuckDB-oracle-checkable, and
equal to Lucene for single-occurrence two-term phrases.  This module
adds the reference-exact alternative (``slop_semantics="lucene"``):
Lucene's SloppyPhraseScorer greedy sweep, which enumerates locally
minimal windows over the merged adjusted-position streams and scores
each window ``1/(1 + matchLength)`` where matchLength is the window
width in adjusted-position space.

The two semantics diverge once a phrase term occurs more than once in
a doc (the sweep consumes several occurrences into one minimized
window where anchor-nearest counts one match per anchor) and in some
``m >= 3`` configurations.  Divergence cases are locked in
``tests/test_sloppy_lucene.py``.

Repeating phrase terms ("to be or not to be") need Lucene's repeat
collision machinery (SloppyPhraseScorer.advanceRpts); they are
rejected by name under ``lucene`` semantics — anchor-nearest remains
available for them.

Reference: Lucene ``SloppyPhraseScorer.phraseFreq()`` (the published
algorithm; matchLength/slop behavior documented at
``PhraseQuery#setSlop``).  Cited for parity only — implemented from
the documented semantics, not translated.
"""

from __future__ import annotations

import heapq


def lucene_sloppy_freq(plists, slop: int) -> float:
    """One doc's sloppy phrase frequency, Lucene semantics.

    ``plists``: one ascending array/list of ADJUSTED positions
    (``pos - slot``) per phrase slot; slots must hold distinct terms.
    Returns ``sum 1/(1+matchLength)`` over the sweep's locally minimal
    windows with ``matchLength <= slop``; 0.0 when any slot is empty.

    The sweep keeps the current minimum slot popped off a (position,
    slot) min-heap; advancing it either tightens the current window
    (new position still <= the second-smallest) or closes the window
    (scores it if within slop) and re-heaps — each occurrence is
    visited once, O(P log m).
    """
    m = len(plists)
    heap = []
    end = None
    for j in range(m):
        arr = plists[j]
        if len(arr) == 0:
            return 0.0
        p0 = int(arr[0])
        heap.append((p0, j, 0))
        if end is None or p0 > end:
            end = p0
    if m == 1:
        return float(len(plists[0]))
    heapq.heapify(heap)
    freq = 0.0
    pos, j, idx = heapq.heappop(heap)
    match_len = end - pos
    next_pos = heap[0][0]
    while True:
        idx += 1
        arr = plists[j]
        if idx >= len(arr):
            break
        pos = int(arr[idx])
        if pos > end:
            end = pos
        if pos > next_pos:
            # done minimizing the current window
            if match_len <= slop:
                freq += 1.0 / (1.0 + match_len)
            heapq.heappush(heap, (pos, j, idx))
            pos, j, idx = heapq.heappop(heap)
            next_pos = heap[0][0]
            match_len = end - pos
        else:
            ml2 = end - pos
            if ml2 < match_len:
                match_len = ml2
    if match_len <= slop:
        freq += 1.0 / (1.0 + match_len)
    return freq


def build_plists(tokens, terms: list[str]):
    """Adjusted position lists for one doc's token sequence: slot j
    collects ``p - j`` for every position p where ``tokens[p] ==
    terms[j]`` (ascending by construction).  Returns None when any
    slot is empty (the doc cannot match)."""
    slot = {t: j for j, t in enumerate(terms)}
    pls: list[list[int]] = [[] for _ in terms]
    for p, tk in enumerate(tokens):
        j = slot.get(tk)
        if j is not None:
            pls[j].append(p - j)
    if any(not pl for pl in pls):
        return None
    return pls


def require_distinct(terms: list[str]) -> None:
    if len(set(terms)) != len(terms):
        raise ValueError(
            "slop_semantics='lucene' requires distinct phrase terms "
            "(Lucene's repeat-collision machinery is not implemented); "
            f"got {terms!r} — use the default anchor-nearest semantics "
            "for repeating phrases")
