"""Search-hit highlighting (the ``highlight`` search-body section).

OpenSearch's unified highlighter re-analyzes the stored field and
wraps query-matched tokens in tags.  Same here, as ONE whole-stage
codegen ``regexp_replace`` over the (already top-k'd, tiny) result
frame: the analyzed query terms are joined into a single
case-insensitive alternation guarded by the analyzer's own token
boundaries (``[\\p{L}\\p{N}_]`` runs — ``functions/tokenizer.py``), so
highlighting can never split or partially match a token the analyzer
would not have produced.

Two modes, like the reference: ``number_of_fragments: 0`` returns the
whole field highlighted (one codegen regexp_replace);
``number_of_fragments: N`` (default 5, ``fragment_size`` default 100)
returns an ARRAY of snippet fragments — match-centered windows
snapped to analyzer token boundaries, overlapping windows merged,
document order (the unified highlighter's default order) — computed
in one Arrow batch UDF over the already top-k'd (tiny) result frame.
``pre_tags``/``post_tags`` default ``<em>``/``</em>``.  Output
column: ``<field>_highlight`` next to the original field, like a
hit's ``highlight`` section keyed by field.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tokenizer import tokenize_query

_MATCH_KINDS = ("match", "match_phrase", "match_phrase_prefix")


def query_terms(query: dict[str, Any] | None) -> list[str]:
    """Analyzed terms of every match-family clause in the query tree —
    what the unified highlighter would mark."""
    out: list[str] = []
    if not query:
        return out

    def walk(q):
        if not isinstance(q, dict):
            return
        for kind, body in q.items():
            if kind in _MATCH_KINDS:
                (_, spec), = body.items()
                text = (spec.get("query") if isinstance(spec, dict)
                        else spec)
                out.extend(tokenize_query(str(text)))
            elif kind == "multi_match":
                out.extend(tokenize_query(str(body["query"])))
            elif kind == "bool":
                for ctx in ("must", "should", "filter"):
                    subs = body.get(ctx) or []
                    for s in (subs if isinstance(subs, list) else [subs]):
                        walk(s)
            elif kind == "dis_max":
                for s in body.get("queries") or []:
                    walk(s)
            elif kind in ("constant_score",):
                walk(body.get("filter"))
            elif kind == "boosting":
                walk(body.get("positive"))
            elif kind == "function_score":
                walk(body.get("query"))
    walk(query)
    seen: set[str] = set()
    uniq = []
    for t in out:
        if t not in seen:
            seen.add(t)
            uniq.append(t)
    return uniq


def highlight_column(text_col: str, terms: list[str],
                     pre_tag: str = "<em>",
                     post_tag: str = "</em>"):
    """Codegen Column wrapping every analyzer-boundary occurrence of
    ``terms`` (case-insensitive) in the tags."""
    if not terms:
        return F.col(text_col)
    # analyzed terms are [\p{L}\p{N}_]+ runs — no regex metachars —
    # but escape defensively anyway
    import re as _re

    alts = "|".join(sorted((_re.escape(t) for t in terms),
                           key=len, reverse=True))
    pat = (r"(?i)(?<![\p{L}\p{N}_])(" + alts + r")(?![\p{L}\p{N}_])")
    repl = pre_tag.replace("$", r"\$") + "$1" + post_tag.replace("$", r"\$")
    return F.regexp_replace(F.col(text_col), pat, repl)


def _term_pattern(terms: list[str]) -> str:
    """Python-re form of the analyzer-boundary guard (tokens are
    ``\\w+`` runs — the tokenizer parity basis, tokenizer.py)."""
    import re as _re

    alts = "|".join(sorted((_re.escape(t) for t in terms),
                           key=len, reverse=True))
    return r"(?<!\w)(" + alts + r")(?!\w)"


def fragments_column(text_col: str, terms: list[str],
                     fragment_size: int, number_of_fragments: int,
                     pre_tag: str = "<em>", post_tag: str = "</em>"):
    """array<string> of highlighted snippet fragments: one window of
    ~``fragment_size`` chars centered per match, snapped outward to
    token boundaries, overlapping windows merged, capped at
    ``number_of_fragments``, document order."""
    import re as _re

    pat = _re.compile(_term_pattern(terms), _re.IGNORECASE)
    half = max(1, fragment_size // 2)

    def frags_of(text: str) -> list[str]:
        if text is None:
            return None
        spans = [(m.start(), m.end()) for m in pat.finditer(text)]
        if not spans:
            return []
        windows: list[list[int]] = []
        for s, e in spans:
            lo = max(0, (s + e) // 2 - half)
            hi = min(len(text), lo + fragment_size)
            # snap outward to whitespace so fragments never split words
            while lo > 0 and not text[lo - 1].isspace():
                lo -= 1
            while hi < len(text) and not text[hi].isspace():
                hi += 1
            lo, hi = min(lo, s), max(hi, e)
            if windows and lo <= windows[-1][1]:
                windows[-1][1] = max(windows[-1][1], hi)
            else:
                windows.append([lo, hi])
        out = []
        for lo, hi in windows[:number_of_fragments]:
            out.append(pat.sub(
                lambda m: pre_tag + m.group(1) + post_tag,
                text[lo:hi]))
        return out

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _f(s: pd.Series) -> pd.Series:
        return s.map(frags_of)

    return _f(F.col(text_col))


def apply_highlight(df: DataFrame, spec: dict[str, Any],
                    query: dict[str, Any] | None,
                    text_field: str = "text") -> DataFrame:
    """Apply a search-body ``highlight`` section to a result frame."""
    terms = query_terms(query)
    pre = (spec.get("pre_tags") or ["<em>"])[0]
    post = (spec.get("post_tags") or ["</em>"])[0]
    fields = spec.get("fields") or {text_field: {}}
    for fld, fspec in fields.items():
        if fld not in df.columns:
            raise ValueError(
                f"highlight field {fld!r} not in result columns "
                f"{df.columns} — scored search results carry the "
                f"fetched doc columns")
        fspec = fspec or {}
        nfrag = int(fspec.get("number_of_fragments",
                              spec.get("number_of_fragments", 0)))
        if nfrag > 0 and terms:
            fsize = int(fspec.get("fragment_size",
                                  spec.get("fragment_size", 100)))
            col = fragments_column(fld, terms, fsize, nfrag, pre, post)
        else:
            col = highlight_column(fld, terms, pre, post)
        df = df.withColumn(f"{fld}_highlight", col)
    return df
