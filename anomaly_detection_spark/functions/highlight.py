"""Search-hit highlighting (the ``highlight`` search-body section).

OpenSearch's unified highlighter re-analyzes the stored field and
wraps query-matched tokens in tags.  Same here, as ONE whole-stage
codegen ``regexp_replace`` over the (already top-k'd, tiny) result
frame: the analyzed query terms are joined into a single
case-insensitive alternation guarded by the analyzer's own token
boundaries (``[\\p{L}\\p{N}_]`` runs — ``functions/tokenizer.py``), so
highlighting can never split or partially match a token the analyzer
would not have produced.

Subset, documented: whole-field highlighting (the reference's
``number_of_fragments: 0`` mode) with ``pre_tags``/``post_tags``
(defaults ``<em>``/``</em>``); fragmenting is pagination-cosmetic and
out of scope.  Output column: ``<field>_highlight`` next to the
original field, like a hit's ``highlight`` section keyed by field.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def apply_highlight(df: DataFrame, spec: dict[str, Any],
                    query: dict[str, Any] | None,
                    text_field: str = "text") -> DataFrame:
    """Apply a search-body ``highlight`` section to a result frame."""
    terms = query_terms(query)
    pre = (spec.get("pre_tags") or ["<em>"])[0]
    post = (spec.get("post_tags") or ["</em>"])[0]
    for fld in (spec.get("fields") or {text_field: {}}):
        if fld not in df.columns:
            raise ValueError(
                f"highlight field {fld!r} not in result columns "
                f"{df.columns} — scored search results carry the "
                f"fetched doc columns")
        df = df.withColumn(f"{fld}_highlight",
                           highlight_column(fld, terms, pre, post))
    return df
