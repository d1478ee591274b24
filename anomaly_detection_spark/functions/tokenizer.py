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


def tokenize_column(col: Column | str) -> Column:
    """Column[str] → Column[array<string>] via the Arrow-batched analyzer."""
    return _tokenize_udf(F.col(col) if isinstance(col, str) else col)
