"""Span queries: ``span_term`` / ``span_near`` / ``span_first``.

The Lucene span family the reference's search layer serves
(SpanNearQuery / SpanFirstQuery — public semantics):

- a ``span_term`` matches at every position p of the term, as the
  span [p, p+1);
- ``span_near`` (clauses, ``slop``, ``in_order``) matches a doc iff
  one sub-span per clause can be chosen, pairwise non-overlapping and
  clause-ordered when ``in_order``, whose enclosing window has
  total gap ``(window_len − Σ sub-span lengths) ≤ slop``;
- ``span_first`` restricts the inner span to end at position
  ``≤ end`` (span end is exclusive, Lucene convention).

Matching only (filter context / candidate generation) — span SCORING
is out of the supported subset, like the other filter-context rewrites
(``query/compound.py`` docstring).  Two execution paths share these
kernels: a batch pandas UDF over the analyzed token arrays (brute
path, positions are just array indices) and a positional-postings
kernel (``index_search.span_near_docs_indexed``) that reads only the
clause terms' postings.

Algorithms: ordered matching is a greedy nearest-successor chain from
each first-clause occurrence (greedy minimizes the window per start,
so existence is decided exactly); unordered is the classic minimal
covering window over the merged position stream with per-term
multiplicities (duplicate clause terms need as many distinct
positions).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["span_match", "span_match_expr", "parse_span_query"]


def _ordered_match(pos_lists: list[np.ndarray], slop: int,
                   end: int | None) -> bool:
    m = len(pos_lists)
    if any(len(ps) == 0 for ps in pos_lists):
        return False
    for p1 in pos_lists[0]:
        prev = p1
        ok = True
        for ps in pos_lists[1:]:
            i = int(np.searchsorted(ps, prev + 1))
            if i == len(ps):
                ok = False
                break
            prev = int(ps[i])
        if not ok:
            # chains start strictly later for later p1 — all fail too
            return False
        if (prev - int(p1) + 1) - m <= slop \
                and (end is None or prev + 1 <= end):
            return True
    return False


def _unordered_match(terms: list[str], positions: dict[str, np.ndarray],
                     slop: int, end: int | None) -> bool:
    req = Counter(terms)
    m = len(terms)
    if any(len(positions.get(t, ())) < c for t, c in req.items()):
        return False
    events = sorted(
        (int(p), t) for t in req for p in positions[t])
    cnt: Counter = Counter()
    have = 0
    lo = 0
    for hi, (p, t) in enumerate(events):
        cnt[t] += 1
        if cnt[t] <= req[t]:
            have += 1
        while have == m:
            p0, t0 = events[lo]
            if cnt[t0] > req[t0]:
                cnt[t0] -= 1
                lo += 1
                continue
            if (p - p0 + 1) - m <= slop \
                    and (end is None or p + 1 <= end):
                return True
            break
    return False


def span_match(tokens: list[str], terms: list[str], slop: int,
               in_order: bool, end: int | None = None) -> bool:
    """Match one doc's token list (positions = array indices)."""
    need = set(terms)
    positions: dict[str, list[int]] = {t: [] for t in need}
    for i, tok in enumerate(tokens):
        if tok in need:
            positions[tok].append(i)
    parr = {t: np.asarray(v, dtype=np.int64)
            for t, v in positions.items()}
    if in_order:
        return _ordered_match([parr[t] for t in terms], slop, end)
    return _unordered_match(terms, parr, slop, end)


def span_match_expr(tokens_col: Column, terms: list[str], slop: int,
                    in_order: bool, end: int | None = None) -> Column:
    """Boolean Column over an analyzed token-array column — one Arrow
    batch per partition, per-doc O(len) matching inside."""
    terms = list(terms)
    slop_i, ord_b, end_i = int(slop), bool(in_order), end

    @F.pandas_udf(T.BooleanType())
    def _f(tok_s: pd.Series) -> pd.Series:
        return pd.Series(
            [span_match(list(toks) if toks is not None else [],
                        terms, slop_i, ord_b, end_i)
             for toks in tok_s])

    return _f(tokens_col)


def parse_span_query(kind: str, body: dict) -> tuple[str, list[str], int,
                                                     bool, int | None]:
    """Normalize a span query to (field, clause_terms, slop, in_order,
    end).  Clauses must be ``span_term`` on one shared field, each
    analyzing to exactly one token."""
    from .tokenizer import tokenize_query

    def term_clause(c: dict) -> tuple[str, str]:
        if set(c) != {"span_term"}:
            raise ValueError(
                f"span_near/span_first clauses support span_term, "
                f"got {sorted(c)}")
        (fld, spec), = c["span_term"].items()
        val = spec.get("value") if isinstance(spec, dict) else spec
        toks = tokenize_query(str(val))
        if len(toks) != 1:
            raise ValueError(
                f"span_term value must analyze to one token: {val!r} "
                f"-> {toks}")
        return fld, toks[0]

    if kind == "span_term":
        fld, t = term_clause({"span_term": body})
        return fld, [t], 0, True, None
    if kind == "span_near":
        pairs = [term_clause(c) for c in body["clauses"]]
        if not pairs:
            raise ValueError("span_near requires at least one clause")
        fields = {f for f, _ in pairs}
        if len(fields) != 1:
            raise ValueError(
                f"span_near clauses must share one field: {sorted(fields)}")
        slop = int(body.get("slop", 0))
        if slop < 0:
            raise ValueError(f"span_near slop must be >= 0: {slop}")
        return (pairs[0][0], [t for _, t in pairs], slop,
                bool(body.get("in_order", True)), None)
    if kind == "span_first":
        e = int(body["end"])
        if e < 1:
            raise ValueError(f"span_first end must be >= 1: {e}")
        inner = body["match"]
        (ikind, ibody), = inner.items()
        if ikind not in ("span_term", "span_near"):
            raise ValueError(
                f"span_first match supports span_term/span_near, "
                f"got {ikind}")
        fld, terms, slop, in_order, _ = parse_span_query(ikind, ibody)
        return fld, terms, slop, in_order, e
    raise ValueError(f"not a span query: {kind}")
