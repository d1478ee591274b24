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

__all__ = ["span_match", "span_match_expr", "parse_span_query",
           "parse_span_tree", "tree_terms", "enum_spans",
           "span_tree_match", "span_tree_match_expr",
           "tree_preds", "pred_matcher", "rewrite_preds"]


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


# ---------------------------------------------------------------------------
# Compound span tree: span_or / span_not / span_containing / span_within
# (SpanOrQuery, SpanNotQuery, SpanContainingQuery, SpanWithinQuery —
# public Lucene semantics).  These need span ENUMERATION, not just
# existence, so they get their own kernel: ``enum_spans`` emits, per
# doc, the spans Lucene's iterators would enumerate — span_term at
# every position, span_near as the per-start greedy-minimal windows
# (NearSpansOrdered's posture), and the compounds as set algebra over
# those enumerations.  Near clauses are restricted to unit-length
# sub-spans (span_term / span_or of span_terms), the same subset the
# flat kernels support.

def _term_clause_any(c: dict) -> tuple[str, dict]:
    """Parse one tree node; returns (field, node)."""
    (kind, body), = c.items()
    return parse_span_tree(kind, body)


def parse_span_tree(kind: str, body: dict) -> tuple[str, dict]:
    """Normalize a compound span query to (field, node tree).  Node
    kinds: term / or / near / first / not / containing / within."""
    from .tokenizer import tokenize_query

    if kind == "span_term":
        (fld, spec), = body.items()
        val = spec.get("value") if isinstance(spec, dict) else spec
        toks = tokenize_query(str(val))
        if len(toks) != 1:
            raise ValueError(
                f"span_term value must analyze to one token: {val!r} "
                f"-> {toks}")
        return fld, {"k": "term", "t": toks[0]}
    if kind == "span_or":
        subs = [_term_clause_any(c) for c in body["clauses"]]
        if not subs:
            raise ValueError("span_or requires at least one clause")
        _one_field(subs)
        return subs[0][0], {"k": "or", "cl": [n for _, n in subs]}
    if kind == "span_near":
        subs = [_term_clause_any(c) for c in body["clauses"]]
        if not subs:
            raise ValueError("span_near requires at least one clause")
        _one_field(subs)
        for _, n in subs:
            if not _unit_len(n):
                raise ValueError(
                    "span_near clauses support span_term / span_or of "
                    "span_terms (unit-length sub-spans)")
        slop = int(body.get("slop", 0))
        if slop < 0:
            raise ValueError(f"span_near slop must be >= 0: {slop}")
        return subs[0][0], {"k": "near", "cl": [n for _, n in subs],
                            "slop": slop,
                            "ord": bool(body.get("in_order", True))}
    if kind == "span_first":
        e = int(body["end"])
        if e < 1:
            raise ValueError(f"span_first end must be >= 1: {e}")
        fld, inner = _term_clause_any(body["match"])
        return fld, {"k": "first", "inner": inner, "end": e}
    if kind == "span_not":
        fi, inc = _term_clause_any(body["include"])
        fe, exc = _term_clause_any(body["exclude"])
        if fi != fe:
            raise ValueError(
                f"span_not include/exclude must share one field: "
                f"{fi!r} vs {fe!r}")
        dist = int(body.get("dist", 0))
        return fi, {"k": "not", "inc": inc, "exc": exc,
                    "pre": int(body.get("pre", dist)),
                    "post": int(body.get("post", dist))}
    if kind == "span_multi":
        # SpanMultiTermQueryWrapper (public semantics): wraps a
        # multi-term query and rewrites it to a span_or over every
        # index term the predicate accepts.  Kept as a "pred" node
        # here; expansion happens per execution path — against the
        # doc/batch vocabulary on the brute path (exact: the terms a
        # doc can contribute ARE its tokens), against the term
        # dictionary with a max_expansions cap on the index path
        # (TooManyClauses parity).
        inner = body["match"]
        (mkind, mbody), = inner.items()
        if mkind not in ("prefix", "wildcard", "regexp", "fuzzy"):
            raise ValueError(
                f"span_multi supports prefix/wildcard/regexp/fuzzy, "
                f"got {mkind}")
        (fld, spec), = mbody.items()
        val = spec.get("value") if isinstance(spec, dict) else spec
        node = {"k": "pred", "kind": mkind, "val": str(val)}
        if mkind == "fuzzy":
            from .fuzzy import parse_fuzziness
            fz = (spec.get("fuzziness", "AUTO")
                  if isinstance(spec, dict) else "AUTO")
            node["max_edits"] = parse_fuzziness(fz, str(val))
        return fld, node
    if kind == "field_masking_span":
        # FieldMaskingSpanQuery (public semantics): the inner span
        # query runs against its OWN field's positions but REPORTS the
        # mask field, letting span compounds mix fields.  Leaves keep
        # their source field in "f"; the compound sees the mask field.
        # (Lucene warns the masked scores are not meaningful — this
        # engine's span family is matching-only anyway.)
        mask = body["field"]
        fld_inner, inner = _term_clause_any(body["query"])
        return mask, _set_leaf_fields(inner, fld_inner)
    if kind in ("span_containing", "span_within"):
        fl, little = _term_clause_any(body["little"])
        fb, big = _term_clause_any(body["big"])
        if fl != fb:
            raise ValueError(
                f"{kind} little/big must share one field: "
                f"{fl!r} vs {fb!r}")
        return fl, {"k": kind.removeprefix("span_"),
                    "little": little, "big": big}
    raise ValueError(f"not a span query: {kind}")


def _one_field(subs: list[tuple[str, dict]]) -> None:
    fields = {f for f, _ in subs}
    if len(fields) != 1:
        raise ValueError(
            f"span clauses must share one field: {sorted(fields)}")


def _unit_len(node: dict) -> bool:
    if node["k"] in ("term", "pred"):
        # pred expansions are single dictionary tokens
        return True
    return (node["k"] == "or"
            and all(_unit_len(c) for c in node["cl"]))


def tree_terms(node: dict) -> set[str]:
    """Fixed terms of the tree.  ``pred`` nodes (span_multi, not yet
    expanded) contribute none — expand with :func:`rewrite_preds`
    before any positions-map lookup."""
    k = node["k"]
    if k == "term":
        return {node["t"]}
    if k == "pred":
        return set()
    if k == "or":
        return set().union(*(tree_terms(c) for c in node["cl"]))
    if k == "near":
        return set().union(*(tree_terms(c) for c in node["cl"]))
    if k == "first":
        return tree_terms(node["inner"])
    if k == "not":
        return tree_terms(node["inc"]) | tree_terms(node["exc"])
    if k == "ifilter":
        return tree_terms(node["src"]) | tree_terms(node["flt"])
    return tree_terms(node["little"]) | tree_terms(node["big"])


def tree_preds(node: dict) -> list[dict]:
    """All ``pred`` (span_multi) nodes, DFS order — the SAME order
    :func:`rewrite_preds` visits, so expansions can be zipped."""
    k = node["k"]
    if k == "pred":
        return [node]
    if k == "term":
        return []
    if k in ("or", "near"):
        return [p for c in node["cl"] for p in tree_preds(c)]
    if k == "first":
        return tree_preds(node["inner"])
    if k == "not":
        return tree_preds(node["inc"]) + tree_preds(node["exc"])
    if k == "ifilter":
        return tree_preds(node["src"]) + tree_preds(node["flt"])
    return tree_preds(node["little"]) + tree_preds(node["big"])


def _set_leaf_fields(node: dict, field: str) -> dict:
    """Stamp ``field`` on term/pred leaves that don't carry one yet
    (nested field_masking_span keeps the inner stamp)."""
    k = node["k"]
    if k in ("term", "pred"):
        return node if node.get("f") else {**node, "f": field}
    if k in ("or", "near"):
        return {**node,
                "cl": [_set_leaf_fields(c, field) for c in node["cl"]]}
    if k == "first":
        return {**node, "inner": _set_leaf_fields(node["inner"], field)}
    if k == "not":
        return {**node, "inc": _set_leaf_fields(node["inc"], field),
                "exc": _set_leaf_fields(node["exc"], field)}
    if k == "ifilter":
        return {**node, "src": _set_leaf_fields(node["src"], field),
                "flt": _set_leaf_fields(node["flt"], field)}
    return {**node,
            "little": _set_leaf_fields(node["little"], field),
            "big": _set_leaf_fields(node["big"], field)}


def tree_leaf_fields(node: dict) -> set:
    """Source fields stamped on leaves (``None`` = the tree's default
    field).  Non-trivial only for field_masking_span trees."""
    k = node["k"]
    if k in ("term", "pred"):
        return {node.get("f")}
    if k in ("or", "near"):
        return set().union(*(tree_leaf_fields(c) for c in node["cl"]))
    if k == "first":
        return tree_leaf_fields(node["inner"])
    if k == "not":
        return tree_leaf_fields(node["inc"]) | tree_leaf_fields(
            node["exc"])
    if k == "ifilter":
        return tree_leaf_fields(node["src"]) | tree_leaf_fields(
            node["flt"])
    return tree_leaf_fields(node["little"]) | tree_leaf_fields(
        node["big"])


def _qualify_tree(node: dict, default_field: str) -> dict:
    """Rewrite term leaves to field-qualified keys
    (``field + '\\x00' + term``) so one positions map can hold several
    fields' occurrence streams; pred leaves get their effective field
    stamped (the matcher expands them against that field's vocab)."""
    k = node["k"]
    if k == "term":
        f = node.get("f") or default_field
        return {"k": "term", "t": f + "\x00" + node["t"]}
    if k == "pred":
        return {**node, "f": node.get("f") or default_field}
    if k in ("or", "near"):
        return {**node,
                "cl": [_qualify_tree(c, default_field)
                       for c in node["cl"]]}
    if k == "first":
        return {**node,
                "inner": _qualify_tree(node["inner"], default_field)}
    if k == "not":
        return {**node, "inc": _qualify_tree(node["inc"], default_field),
                "exc": _qualify_tree(node["exc"], default_field)}
    if k == "ifilter":
        return {**node, "src": _qualify_tree(node["src"], default_field),
                "flt": _qualify_tree(node["flt"], default_field)}
    return {**node,
            "little": _qualify_tree(node["little"], default_field),
            "big": _qualify_tree(node["big"], default_field)}


def span_tree_match_fields(tokens_by_field: dict[str, list[str]],
                           node: dict, default_field: str) -> bool:
    """Multi-field (field_masking_span) brute matcher: positions are
    keyed ``field\\x00term`` across every involved field; pred nodes
    expand against their own field's doc vocabulary."""
    qt = _qualify_tree(node, default_field)
    preds = tree_preds(qt)
    if preds:
        exps = []
        for p in preds:
            toks = tokens_by_field.get(p["f"]) or []
            vocab = pd.Series(sorted(set(toks)), dtype="object")
            matched = (sorted(vocab[pred_matcher(p)(vocab)])
                       if len(vocab) else [])
            exps.append([p["f"] + "\x00" + t for t in matched])
        qt = rewrite_preds(qt, iter(exps))
    need = tree_terms(qt)
    positions: dict[str, list[int]] = {t: [] for t in need}
    for f, toks in tokens_by_field.items():
        for i, tok in enumerate(toks or []):
            key = f + "\x00" + tok
            if key in positions:
                positions[key].append(i)
    parr = {t: np.asarray(v, dtype=np.int64)
            for t, v in positions.items()}
    return len(enum_spans(parr, qt)) > 0


def span_tree_match_expr_fields(tokens_cols: dict[str, Column],
                                node: dict,
                                default_field: str) -> Column:
    """Boolean Column for a multi-field span tree: one Arrow batch
    over every involved field's analyzed token array."""
    fields = list(tokens_cols)
    node_l = node

    @F.pandas_udf(T.BooleanType())
    def _f(*cols: pd.Series) -> pd.Series:
        out = []
        for row in zip(*cols):
            by_field = {f: (list(t) if t is not None else [])
                        for f, t in zip(fields, row)}
            out.append(span_tree_match_fields(by_field, node_l,
                                              default_field))
        return pd.Series(out)

    return _f(*tokens_cols.values())


def _wildcard_re(pat: str):
    """Lucene wildcard (``*``/``?``, ``\\`` escape) → anchored regex."""
    import re
    out, i = [], 0
    while i < len(pat):
        c = pat[i]
        if c == "\\" and i + 1 < len(pat):
            out.append(re.escape(pat[i + 1]))
            i += 2
            continue
        out.append(".*" if c == "*" else "." if c == "?"
                   else re.escape(c))
        i += 1
    return re.compile("".join(out), re.DOTALL)


def pred_matcher(node: dict):
    """Batch token predicate for one ``pred`` node:
    ``pd.Series[str] -> np.ndarray[bool]``.  Values are matched
    against ANALYZED tokens (already lowercased), so pattern inputs
    are lowercased to agree with the analyzer — the same convention
    the planner's term-level prefix/wildcard queries use."""
    import re
    kind, val = node["kind"], node["val"]
    if kind == "prefix":
        v = val.lower()
        return lambda s: s.str.startswith(v).to_numpy()
    if kind == "wildcard":
        rx = _wildcard_re(val.lower())
        return lambda s: s.map(
            lambda t: rx.fullmatch(t) is not None).to_numpy()
    if kind == "regexp":
        # Lucene regexp is ANCHORED (whole-term); tokens are already
        # lowercase so the pattern is matched case-sensitively
        rx = re.compile(val)
        return lambda s: s.map(
            lambda t: rx.fullmatch(t) is not None).to_numpy()
    if kind == "fuzzy":
        from .fuzzy import osa_distance_batch
        v = val.lower()
        me = int(node["max_edits"])
        return lambda s: (osa_distance_batch(s, v).to_numpy() <= me)
    raise ValueError(f"unknown span_multi predicate kind {kind!r}")


def rewrite_preds(node: dict, expansions) -> dict:
    """Replace each ``pred`` node with a span_or of term nodes.
    ``expansions`` is an iterator yielding one ``list[str]`` per pred,
    in :func:`tree_preds` DFS order (Lucene's SpanRewriteMethod →
    SpanOrQuery rewrite).  An empty expansion enumerates no spans."""
    k = node["k"]
    if k == "pred":
        terms = next(expansions)
        return {"k": "or", "cl": [{"k": "term", "t": t} for t in terms]}
    if k == "term":
        return node
    if k in ("or", "near"):
        out = dict(node)
        out["cl"] = [rewrite_preds(c, expansions) for c in node["cl"]]
        return out
    if k == "first":
        return {**node, "inner": rewrite_preds(node["inner"], expansions)}
    if k == "not":
        return {**node, "inc": rewrite_preds(node["inc"], expansions),
                "exc": rewrite_preds(node["exc"], expansions)}
    if k == "ifilter":
        return {**node, "src": rewrite_preds(node["src"], expansions),
                "flt": rewrite_preds(node["flt"], expansions)}
    return {**node,
            "little": rewrite_preds(node["little"], expansions),
            "big": rewrite_preds(node["big"], expansions)}


_EMPTY_SPANS = np.empty((0, 2), dtype=np.int64)


def _dedup_sorted(sp: np.ndarray) -> np.ndarray:
    if len(sp) == 0:
        return _EMPTY_SPANS
    order = np.lexsort((sp[:, 1], sp[:, 0]))
    sp = sp[order]
    keep = np.ones(len(sp), dtype=bool)
    keep[1:] = np.any(sp[1:] != sp[:-1], axis=1)
    return sp[keep]


def enum_spans(positions: dict[str, np.ndarray], node: dict) -> np.ndarray:
    """All spans (rows of [start, end), end exclusive) the node
    enumerates over one doc's term→positions map — sorted, deduped."""
    k = node["k"]
    if k == "pred":
        raise ValueError(
            "unexpanded span_multi pred node — rewrite_preds first")
    if k == "term":
        ps = positions.get(node["t"])
        if ps is None or len(ps) == 0:
            return _EMPTY_SPANS
        return np.stack([ps, ps + 1], axis=1).astype(np.int64)
    if k == "or":
        subs = [enum_spans(positions, c) for c in node["cl"]]
        return _dedup_sorted(np.concatenate([s for s in subs if len(s)]
                                            or [_EMPTY_SPANS]))
    if k == "near":
        cls = [enum_spans(positions, c) for c in node["cl"]]
        if any(len(c) == 0 for c in cls):
            return _EMPTY_SPANS
        pos_lists = [c[:, 0] for c in cls]  # unit-length spans
        m = len(pos_lists)
        out = []
        if node["ord"]:
            # per first-clause start: greedy nearest-successor chain
            # (the minimal window per start — NearSpansOrdered)
            for p1 in pos_lists[0]:
                prev = int(p1)
                ok = True
                for ps in pos_lists[1:]:
                    i = int(np.searchsorted(ps, prev + 1))
                    if i == len(ps):
                        ok = False
                        break
                    prev = int(ps[i])
                if not ok:
                    break
                if (prev - int(p1) + 1) - m <= node["slop"]:
                    out.append((int(p1), prev + 1))
        else:
            # minimal covering windows over the merged stream, one
            # position per clause (multiset semantics like
            # _unordered_match, emitting every qualifying window)
            # duplicate clauses (same positions list) need distinct
            # positions: group identical clauses into multiplicity
            uniq_cls: dict[bytes, int] = {}
            cl_of = []
            for ps in pos_lists:
                key = ps.tobytes()
                if key not in uniq_cls:
                    uniq_cls[key] = len(uniq_cls)
                cl_of.append(uniq_cls[key])
            req = Counter(cl_of)
            events = sorted({(int(p), cl_of[ci])
                             for ci, ps in enumerate(pos_lists)
                             for p in ps})
            need = len(cl_of)
            cnt: Counter = Counter()
            have = 0
            lo = 0
            for hi, (p, t) in enumerate(events):
                cnt[t] += 1
                if cnt[t] <= req[t]:
                    have += 1
                while have == need:
                    p0, t0 = events[lo]
                    if cnt[t0] > req[t0]:
                        cnt[t0] -= 1
                        lo += 1
                        continue
                    if (p - p0 + 1) - need <= node["slop"]:
                        out.append((p0, p + 1))
                    break
        return _dedup_sorted(np.asarray(out, dtype=np.int64).reshape(-1, 2))
    if k == "first":
        sp = enum_spans(positions, node["inner"])
        return sp[sp[:, 1] <= node["end"]]
    if k == "not":
        inc = enum_spans(positions, node["inc"])
        exc = enum_spans(positions, node["exc"])
        if len(inc) == 0 or len(exc) == 0:
            return inc
        keep = []
        for s, e in inc:
            lo_ = s - node["pre"]
            hi_ = e + node["post"]
            # overlap iff exc_s < hi_ and exc_e > lo_
            if not np.any((exc[:, 0] < hi_) & (exc[:, 1] > lo_)):
                keep.append((s, e))
        return np.asarray(keep, dtype=np.int64).reshape(-1, 2)
    if k == "ifilter":
        # intervals `filter` rules (IntervalsSourceProvider.Filter):
        # keep source spans by a positional relation to the filter's
        # spans — containment either way or overlap, plus negations
        src = enum_spans(positions, node["src"])
        flt = enum_spans(positions, node["flt"])
        rule = node["rule"]
        neg = rule.startswith("not_")
        base = rule[4:] if neg else rule
        if len(src) == 0:
            return _EMPTY_SPANS
        keep = []
        for s, e in src:
            if len(flt) == 0:
                hit = False
            elif base == "containing":
                hit = bool(np.any((flt[:, 0] >= s) & (flt[:, 1] <= e)))
            elif base == "contained_by":
                hit = bool(np.any((flt[:, 0] <= s) & (flt[:, 1] >= e)))
            elif base == "overlapping":
                hit = bool(np.any((flt[:, 0] < e) & (flt[:, 1] > s)))
            else:
                raise ValueError(f"unknown intervals filter rule "
                                 f"{rule!r}")
            if hit != neg:
                keep.append((int(s), int(e)))
        return np.asarray(keep, dtype=np.int64).reshape(-1, 2)
    if k in ("containing", "within"):
        little = enum_spans(positions, node["little"])
        big = enum_spans(positions, node["big"])
        if len(little) == 0 or len(big) == 0:
            return _EMPTY_SPANS
        if k == "containing":
            keep = [(s, e) for s, e in big
                    if np.any((little[:, 0] >= s) & (little[:, 1] <= e))]
        else:
            keep = [(s, e) for s, e in little
                    if np.any((big[:, 0] <= s) & (big[:, 1] >= e))]
        return np.asarray(keep, dtype=np.int64).reshape(-1, 2)
    raise ValueError(f"unknown span node kind {k!r}")


def span_tree_match(tokens: list[str], node: dict) -> bool:
    if tree_leaf_fields(node) - {None}:
        raise ValueError(
            "masked (field_masking_span) trees need every field's "
            "tokens — use span_tree_match_fields")
    preds = tree_preds(node)
    if preds:
        # expand against the doc's own vocabulary — exact: a doc can
        # only contribute spans of tokens it contains
        vocab = pd.Series(sorted(set(tokens)), dtype="object")
        exps = [sorted(vocab[pred_matcher(p)(vocab)])
                if len(vocab) else [] for p in preds]
        node = rewrite_preds(node, iter(exps))
    need = tree_terms(node)
    positions: dict[str, list[int]] = {t: [] for t in need}
    for i, tok in enumerate(tokens):
        if tok in need:
            positions[tok].append(i)
    parr = {t: np.asarray(v, dtype=np.int64)
            for t, v in positions.items()}
    return len(enum_spans(parr, node)) > 0


def span_tree_match_expr(tokens_col: Column, node: dict) -> Column:
    """Boolean Column over an analyzed token-array column (one Arrow
    batch per partition, like :func:`span_match_expr`).  span_multi
    preds are expanded ONCE per Arrow batch against the batch
    vocabulary (the fuzzy OSA kernel is batch-vectorized, so this is
    one DP over the batch's unique tokens, not one per doc); per doc,
    terms absent from the doc enumerate no spans, so the batch-level
    rewrite is exactly the per-doc one."""
    node_l = node
    has_preds = bool(tree_preds(node))

    @F.pandas_udf(T.BooleanType())
    def _f(tok_s: pd.Series) -> pd.Series:
        tree = node_l
        if has_preds:
            vocab: set[str] = set()
            for toks in tok_s:
                if toks is not None:
                    vocab.update(toks)
            vs = pd.Series(sorted(vocab), dtype="object")
            exps = [sorted(vs[pred_matcher(p)(vs)]) if len(vs) else []
                    for p in tree_preds(tree)]
            tree = rewrite_preds(tree, iter(exps))
        return pd.Series(
            [span_tree_match(list(toks) if toks is not None else [],
                             tree)
             for toks in tok_s])

    return _f(tokens_col)
