"""Analysis chain: lowercase + Unicode word-break tokenization.

This is the Spark-side analog of the analyzer OpenSearch applies to
``text``-mapped fields (reference: ``text`` mappings at
``src/main/resources/mappings/config.json:10-21``,
``anomaly-results.json:43-45``) — the default standard analyzer:
Unicode word boundaries, lowercased, no stopwords, no stemming.

We approximate UAX#29 word-break with the Unicode ``\\w+`` regex
(letters/digits/underscore runs), applied after NFC-agnostic
``str.lower()``.  One tokenizer implementation is shared by the index
build, the query analyzer and the test oracle, so analysis is identical
everywhere by construction.

Vectorized: pandas ``str`` ops over Arrow batches — no per-row Python
UDF (BASELINE.json ``input_hint``).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def tokenize_texts(texts: pd.Series) -> pd.Series:
    """pandas Series[str|None] → Series[list[str]] (shared analyzer)."""
    return texts.fillna("").str.lower().str.findall(TOKEN_RE)


def tokenize_query(text: str) -> list[str]:
    """Analyze query text with the exact same chain as documents."""
    return TOKEN_RE.findall((text or "").lower())


@F.pandas_udf(T.ArrayType(T.StringType()))
def _tokenize_udf(texts: pd.Series) -> pd.Series:
    return tokenize_texts(texts)


# Java-regex twin of the Python \w+ analyzer.  Python's re \w is
# isalnum-or-underscore = Unicode categories L* + N* + '_', which is
# exactly [\p{L}\p{N}_] in Java regex — the same expression the DuckDB
# oracle uses (regexp_extract_all(lower(text), '[\p{L}\p{N}_]+')), so
# all three analyzers agree by construction; test_tokenizer_bm25 locks
# the JVM↔Python equivalence on the corpus + unicode edge cases.
JAVA_TOKEN_RE = r"[\p{L}\p{N}_]+"


def tokenize_column(col: Column | str, engine: str = "jvm") -> Column:
    """Column[str] → Column[array<string>] with the shared analyzer.

    ``engine="jvm"`` (default) stays inside whole-stage codegen — no
    Arrow round-trip, no Python worker — which is what lets the index
    build scale with cores instead of with the Python/Arrow memory bus.
    ``engine="python"`` is the Arrow-batched reference implementation
    kept for parity testing.
    """
    c = F.col(col) if isinstance(col, str) else col
    if engine == "python":
        return _tokenize_udf(c)
    return F.regexp_extract_all(
        F.lower(F.coalesce(c, F.lit(""))), F.lit(JAVA_TOKEN_RE), 0)
