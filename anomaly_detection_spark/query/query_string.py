"""``query_string`` / ``simple_query_string`` → query-DSL compiler.

The reference exposes Lucene's query-string syntaxes as user-surface
query types (the plugin itself never issues them, but detector users
write them in ``filter_query`` routinely).  This module parses the
supported subset into the engine's OWN query-DSL dicts, so the whole
planner/scorer machinery (``plan_query`` / ``search``) is reused —
the compiler produces ``bool`` / ``match`` / ``match_phrase`` /
``match_phrase_prefix`` / ``term`` / ``prefix`` / ``wildcard`` /
``fuzzy`` leaves and nothing else.

Supported subset (``query_string``):
- bare terms on the default field (analyzed ``match``)
- ``"quoted phrases"`` with optional ``~N`` slop suffix
- ``field:value`` (non-analyzed fields → ``term``; analyzed → match)
- trailing ``*`` → ``match_phrase_prefix`` (analyzed) / ``prefix``
- embedded ``*``/``?`` on non-analyzed fields → ``wildcard``
- ``value~N`` fuzziness on non-analyzed fields → ``fuzzy``
- ranges: ``field:[a TO b]`` / ``{a TO b}`` (mixed brackets OK,
  ``[`` / ``]`` inclusive, ``{`` / ``}`` exclusive, ``*`` = open
  end, ``[* TO *]`` → ``exists``) and the ``field:>=v`` ``>v``
  ``<=v`` ``<v`` shorthands → ``range``; numeric-looking endpoints
  compare numerically, date-math strings (``now-7d/d``) resolve in
  the range compiler, everything else compares as the raw column
  value (no per-term analysis — Lucene's keyword-range posture)
- field grouping ``field:(a b "c d")`` — the group parses with the
  field as its default, so bare terms, phrases and modifiers inside
  all bind to it
- ``AND`` / ``OR`` / ``NOT`` (and ``&&`` ``||`` ``!``), parentheses,
  ``+``/``-`` clause modifiers; NOT binds tightest, then AND, then OR;
  adjacency = ``default_operator`` (OR, like OpenSearch).

``simple_query_string`` uses the same machinery with its operator set
(``+`` = and, ``|`` = or, ``-`` = not, quotes, trailing ``*``,
parentheses) and NEVER raises: any input that fails to parse
degrades to an OR bag of its plain terms, mirroring the reference's
lenient behavior.  Like Lucene's SimpleQueryParser it has NO field
or range syntax — ``field:value`` and ``[a TO b]`` are literal text
whose punctuation the match analyzer strips.  The ``flags`` param
(SimpleQueryStringBuilder.flags) restricts which operators the
syntax interprets — a disabled operator's character is literal text.

Out of scope (raise in query_string, ignored in simple_query_string):
boosts (``^2``), fuzzy/wildcard on analyzed fields (needs per-token
expansion at parse time).  ``simple_query_string`` has NO range
syntax in the reference either — range-looking input degrades to the
lenient term bag there.
"""

from __future__ import annotations

import re

_TOKEN = re.compile(r"""
    \s*(
        \(|\)
      | [^\s():"]+:"(?:[^"\\]|\\.)*"(?:~\d+)?
      | [^\s():"]+:[\[{][^\]}]*[\]}]
      | [\[{][^\]}]*[\]}]
      | "(?:[^"\\]|\\.)*"(?:~\d+)?
      | &&|\|\|
      | [^\s()"]+
    )""", re.VERBOSE)

_RANGE = re.compile(r"([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])\Z")

# SimpleQueryStringFlag names (SimpleQueryStringBuilder.flags) — which
# operators the simple syntax interprets; a disabled operator's
# character is literal text the analyzer strips.  WHITESPACE and
# ESCAPE are accepted but always effectively on (the lexer always
# splits on whitespace; escapes only occur inside quotes here).
_SQS_FLAGS = {"AND", "ESCAPE", "FUZZY", "NEAR", "NOT", "OR", "PHRASE",
              "PRECEDENCE", "PREFIX", "WHITESPACE"}


def _parse_flags(spec_val) -> frozenset:
    """``flags`` param → enabled-operator set.  ``ALL`` (default) /
    ``NONE`` / '|'-joined names; unknown names raise — a bad PARAMETER
    is a caller error even in the never-raising simple query mode."""
    if spec_val is None:
        return frozenset(_SQS_FLAGS)
    parts = [p.strip().upper() for p in str(spec_val).split("|")
             if p.strip()]
    out: set = set()
    for p in parts:
        if p == "ALL":
            out |= _SQS_FLAGS
        elif p == "NONE":
            pass
        elif p in _SQS_FLAGS:
            out.add(p)
        else:
            raise ValueError(
                f"unknown simple_query_string flag {p!r} "
                f"(known: ALL, NONE, {', '.join(sorted(_SQS_FLAGS))})")
    return frozenset(out)


def _range_value(s: str):
    """Range endpoint → comparable value: ints and floats compare
    numerically, anything else (date-math, ISO dates, keywords) rides
    through as a string for the range compiler to interpret."""
    s = s.strip('"')
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        return s


def _tokenize(q: str) -> list[str]:
    """Token stream; raises on input the lexer cannot consume (an
    unterminated quote) — silently dropping the tail would return
    quietly over-broad results in strict mode."""
    out, i = [], 0
    while i < len(q):
        m = _TOKEN.match(q, i)
        if not m:
            if q[i:].strip():
                raise ValueError(
                    f"unparsable query_string input near {q[i:i+30]!r} "
                    f"(unterminated quote?)")
            break
        out.append(m.group(1))
        i = m.end()
    return out


class _Parser:
    def __init__(self, toks: list[str], default_field: str,
                 analyzed_fields: set[str], simple: bool,
                 default_operator: str, flags: frozenset | None = None):
        self.toks = toks
        self.i = 0
        self.default_field = default_field
        self.analyzed = analyzed_fields
        self.simple = simple
        self.default_op = default_operator.lower()
        self.flags = flags          # simple mode only; None = ALL

    def _flag(self, name: str) -> bool:
        return self.flags is None or name in self.flags

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    # grammar: or_expr := and_expr ((OR | implicit-default) and_expr)*
    #          and_expr := not_expr (AND not_expr)*
    #          not_expr := NOT not_expr | clause
    #          clause := [+|-] atom ;  atom := '(' expr ')' | leaf
    def parse(self) -> dict:
        node = self.or_expr()
        if self.peek() is not None:
            raise ValueError(f"unparsed query_string tail at "
                             f"{self.toks[self.i:]}")
        return node

    def _is_or(self, t: str) -> bool:
        return (t == "|" and self._flag("OR") if self.simple
                else t in ("OR", "||"))

    def _is_and(self, t: str) -> bool:
        return (t == "+" and self._flag("AND") if self.simple
                else t in ("AND", "&&"))

    def _is_not(self, t: str) -> bool:
        return (t == "-" and self._flag("NOT") if self.simple
                else t in ("NOT", "!", "-"))

    def or_expr(self) -> dict:
        groups = [[self.and_expr()]]
        while True:
            t = self.peek()
            if t is None or t == ")":
                break
            if self._is_or(t):
                self.next()
                groups.append([self.and_expr()])
            elif self.default_op == "or":
                groups.append([self.and_expr()])
            else:
                groups[-1].append(self.and_expr())
        shoulds = [self._and_of(g) for g in groups]
        return self._bag(shoulds)

    def and_expr(self) -> dict:
        parts = [self.not_expr()]
        while True:
            t = self.peek()
            if t is not None and self._is_and(t):
                self.next()
                parts.append(self.not_expr())
            else:
                break
        return self._and_of(parts)

    def not_expr(self) -> dict:
        t = self.peek()
        if t is not None and self._is_not(t):
            self.next()
            return {"bool": {"must_not": [self.not_expr()]}}
        return self.clause()

    def clause(self) -> dict:
        t = self.peek()
        if not self.simple and t in ("+", "-"):
            # Lucene modifiers: +required / -prohibited
            self.next()
            atom = self.clause()
            if t == "-":
                return {"bool": {"must_not": [atom]}}
            return {"bool": {"must": [atom]}}
        if not self.simple and t and t.startswith("+") and len(t) > 1:
            self.toks[self.i] = t[1:]
            return {"bool": {"must": [self.clause()]}}
        if t and t.startswith("-") and len(t) > 1 \
                and (not self.simple or self._flag("NOT")):
            # attached negation: Lucene -term, simple_query_string -term
            self.toks[self.i] = t[1:]
            return {"bool": {"must_not": [self.clause()]}}
        if not self.simple and t and t.endswith(":") and len(t) > 1 \
                and self.toks[self.i + 1:self.i + 2] == ["("]:
            # Lucene field grouping "field:(a b)" — the group parses
            # with the field as its default, so bare terms, phrases
            # and +/- modifiers inside all bind to it
            self.next()
            self.next()
            saved = self.default_field
            self.default_field = t[:-1]
            try:
                node = self.or_expr()
            finally:
                self.default_field = saved
            if self.peek() != ")":
                raise ValueError("unbalanced parentheses in query_string")
            self.next()
            return node
        if t == "(":
            self.next()
            node = self.or_expr()
            if self.peek() != ")":
                raise ValueError("unbalanced parentheses in query_string")
            self.next()
            return node
        if t is None:
            raise ValueError("query_string ends with a dangling operator")
        return self.leaf(self.next())

    # -- leaves ------------------------------------------------------------

    def leaf(self, tok: str) -> dict:
        field = self.default_field
        body = tok
        # SimpleQueryParser has NO field/range syntax — ':' '[' '>='
        # are literal text there, and the analyzer strips them; only
        # the strict Lucene syntax interprets them
        if not self.simple \
                and not tok.startswith(('"', "[", "{")) and ":" in tok:
            field, body = tok.split(":", 1)
            if body == "":
                # "field:(...)" groups are consumed in clause(); a
                # bare "field:" reaching here is dangling input
                raise ValueError(f"dangling field prefix {tok!r}")
        if "^" in body and not body.startswith('"'):
            # boosts are documented out of subset: raise, never bake
            # '^2' into the term text (simple mode degrades)
            raise ValueError(
                f"query_string boosts ({body!r}) are unsupported")
        if body.startswith('"'):
            m = re.fullmatch(r'"((?:[^"\\]|\\.)*)"(?:~(\d+))?', body)
            if not m:
                raise ValueError(f"bad phrase {body!r}")
            text = m.group(1).replace('\\"', '"')
            slop = int(m.group(2)) if m.group(2) else 0
            if self.simple:
                if not self._flag("PHRASE"):
                    # quotes are literal text → analyzed term bag
                    return {"match": {field: text}}
                if not self._flag("NEAR"):
                    slop = 0        # the ~N suffix is literal text
            return {"match_phrase": {field: {"query": text, "slop": slop}}}
        if body[:1] in ("[", "{") and not self.simple:
            # Lucene range syntax: [ ] inclusive, { } exclusive (mixed
            # OK), * = open end
            m = _RANGE.fullmatch(body)
            if m is None:
                raise ValueError(
                    f"malformed query_string range {body!r} "
                    f"(expected [a TO b])")
            spec: dict = {}
            if m.group(2) != "*":
                spec["gte" if m.group(1) == "[" else "gt"] = \
                    _range_value(m.group(2))
            if m.group(3) != "*":
                spec["lte" if m.group(4) == "]" else "lt"] = \
                    _range_value(m.group(3))
            if not spec:
                # field:[* TO *] matches every doc carrying the field
                return {"exists": {"field": field}}
            return {"range": {field: spec}}
        if not self.simple:
            for op, key in ((">=", "gte"), ("<=", "lte"),
                            (">", "gt"), ("<", "lt")):
                if body.startswith(op) and len(body) > len(op):
                    return {"range": {field: {key: _range_value(
                        body[len(op):])}}}
        analyzed = field in self.analyzed
        fz = re.fullmatch(r"(.+?)~(\d+)?", body)
        if fz and not body.endswith("*"):
            if self.simple and not self._flag("FUZZY"):
                # ~ is literal text; the analyzer strips it
                return {"match" if analyzed else "term":
                        {field: fz.group(1)}}
            if analyzed:
                raise ValueError(
                    f"fuzzy ~ on the analyzed field {field!r} is "
                    f"unsupported (needs per-token expansion)")
            return {"fuzzy": {field: {
                "value": fz.group(1),
                "fuzziness": int(fz.group(2)) if fz.group(2) else "AUTO"}}}
        if body.endswith("*") and "*" not in body[:-1] \
                and "?" not in body[:-1]:
            stem = body[:-1]
            if self.simple and not self._flag("PREFIX"):
                # * is literal text; the analyzer strips it
                return {"match" if analyzed else "term": {field: stem}}
            if analyzed:
                return {"match_phrase_prefix": {field: {"query": stem}}}
            return {"prefix": {field: stem}}
        if "*" in body or "?" in body:
            if analyzed:
                raise ValueError(
                    f"embedded wildcard on the analyzed field {field!r} "
                    f"is unsupported (trailing * is)")
            return {"wildcard": {field: body}}
        if analyzed:
            return {"match": {field: body}}
        return {"term": {field: body}}

    # -- combinators -------------------------------------------------------

    def _and_of(self, parts: list[dict]) -> dict:
        if len(parts) == 1:
            return parts[0]
        # merge plain matches on the same analyzed field into ONE
        # conjunctive match so "a AND b" scores as operator:and
        merged: dict[str, list[str]] = {}
        rest = []
        for p in parts:
            if set(p) == {"match"}:
                (f, spec), = p["match"].items()
                if isinstance(spec, str):
                    merged.setdefault(f, []).append(spec)
                    continue
            rest.append(p)
        must = list(rest)
        for f, texts in merged.items():
            if len(texts) == 1:
                must.append({"match": {f: texts[0]}})
            else:
                must.append({"match": {f: {"query": " ".join(texts),
                                           "operator": "and"}}})
        if len(must) == 1:
            return must[0]
        return {"bool": {"must": must}}

    def _bag(self, shoulds: list[dict]) -> dict:
        if len(shoulds) == 1:
            return shoulds[0]
        # hoist must/must_not-only children (the +term/-term modifiers)
        # into the enclosing bool, like Lucene's flat clause list
        must, must_not, plain = [], [], []
        for s in shoulds:
            if set(s) == {"bool"}:
                b = s["bool"]
                if set(b) <= {"must", "must_not"}:
                    must.extend(b.get("must", []))
                    must_not.extend(b.get("must_not", []))
                    continue
            plain.append(s)
        out: dict = {}
        if plain:
            out["should"] = plain
        if must:
            out["must"] = must
        if must_not:
            out["must_not"] = must_not
        if set(out) == {"should"}:
            out["minimum_should_match"] = 1
        return {"bool": out}


def compile_query_string(spec: dict, simple: bool = False,
                         text_field: str = "text") -> dict:
    """``query_string`` / ``simple_query_string`` body → query DSL.

    ``spec``: {"query": str, "default_field"?: str, "fields"?: [str],
    "default_operator"?: "or"|"and", "analyzed_fields"?: [str],
    "flags"?: str (simple only)}.
    ``analyzed_fields`` defaults to {default_field} — fields whose
    leaves compile to analyzed match/phrase instead of keyword term.
    ``flags`` (SimpleQueryStringBuilder.flags): '|'-joined operator
    names / ``ALL`` / ``NONE`` — a disabled operator's character is
    literal text the analyzer strips; unknown names raise (a bad
    parameter is a caller error, unlike unparsable query TEXT).
    """
    q = spec["query"]
    flags = _parse_flags(spec.get("flags")) if simple else None
    if not simple and "flags" in spec:
        raise ValueError("flags is a simple_query_string parameter")
    flds = spec.get("fields")
    default_field = spec.get("default_field")
    if default_field is None:
        default_field = flds[0] if flds else text_field
    analyzed = set(spec.get("analyzed_fields", [default_field]))
    default_op = spec.get("default_operator", "or")

    def _fallback() -> dict:
        # the reference's lenient mode: degrade to a bag of the plain
        # terms with every syntax character stripped
        words = [w for w in re.split(r'[\s+|()":*~\[\]{}<>=-]+', q) if w]
        if not words:
            return {"match_all": {}}
        if flds and len(flds) > 1:
            return {"multi_match": {"query": " ".join(words),
                                    "fields": list(flds)}}
        return {"match": {default_field: " ".join(words)}}

    try:
        toks = _tokenize(q)
        if simple and flags is not None:
            # disabled operators' standalone tokens are literal text
            # the analyzer strips — dropping them is equivalent
            drop: set = set()
            if "PRECEDENCE" not in flags:
                drop |= {"(", ")"}
            if "OR" not in flags:
                drop.add("|")
            if "AND" not in flags:
                drop.add("+")
            if "NOT" not in flags:
                drop.add("-")
            if drop:
                toks = [t for t in toks if t not in drop]
        if not toks:
            return {"match_all": {}}
        if flds and len(flds) > 1:
            # multi-field mode: a PLAIN TERM BAG scores every field
            # (OpenSearch rewrites it to a per-field DisMax); any
            # richer syntax must field-qualify explicitly — silently
            # searching only fields[0] would drop matches
            # strict mode also screens range syntax ([a TO b] is one
            # token, >=5 / <5 shorthands start with the comparator);
            # simple mode keeps them literal (SimpleQueryParser has no
            # range syntax at all)
            plain = all(
                not t.startswith(('"', '(', '+', '-'))
                and (simple or not t.startswith(('[', '{', '<', '>')))
                and ":" not in t and "*" not in t and "?" not in t
                and "~" not in t and t not in ("AND", "OR", "NOT",
                                               "&&", "||", "!", "|", ")")
                for t in toks)
            if plain:
                return {"multi_match": {"query": " ".join(toks),
                                        "fields": list(flds)}}
            raise ValueError(
                "multi-field query_string supports a plain term bag "
                "(rewritten to multi_match); qualify other clauses "
                "with field: explicitly")
        return _Parser(toks, default_field, analyzed, simple,
                       default_op, flags).parse()
    except (ValueError, IndexError):
        if not simple:
            raise
        # simple_query_string never raises
        return _fallback()
