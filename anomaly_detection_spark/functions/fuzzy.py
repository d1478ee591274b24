"""Fuzzy-match distance: OSA (optimal string alignment) edit distance,
the restricted Damerau-Levenshtein variant where an adjacent
transposition costs ONE edit.

Lucene's FuzzyQuery defaults to ``transpositions=true`` and compiles a
Levenshtein automaton with the transposition primitive
(``org.apache.lucene.util.automaton.LevenshteinAutomata``); for the
max supported distance (2) that automaton accepts exactly the strings
within OSA distance.  Spark's built-in ``levenshtein`` counts a
transposition as 2 edits, so ``lev <= f`` is a strict SUBSET of the
reference semantics ('ab'~'ba' at fuzziness 1 matches in Lucene but
not under plain Levenshtein) — hence this batch-vectorized pandas UDF.

Vectorization shape: the DP table is computed with the Arrow batch as
the vector axis — ``len(query) × Lmax`` sequential steps, each an O(N)
numpy op over all rows at once.  Keyword values are short (Lmax ~ tens)
so the step count is tiny; no per-row Python in the recurrence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def osa_distance_batch(targets: pd.Series, query: str) -> pd.Series:
    """OSA distance from every string in ``targets`` to ``query``."""
    n = len(targets)
    if n == 0:
        return pd.Series([], dtype="int32")
    tl = targets.fillna("").astype(str)
    lens = tl.str.len().to_numpy(np.int64)
    lmax = int(lens.max())
    m = len(query)
    # codepoint matrix (batch prep; the DP below is loop-free over rows)
    mat = np.full((n, lmax), -1, dtype=np.int64)
    for r, s in enumerate(tl):
        if s:
            mat[r, : len(s)] = np.fromiter(map(ord, s), dtype=np.int64,
                                           count=len(s))
    q = np.fromiter(map(ord, query), dtype=np.int64, count=m)
    # D[i] has shape (n, lmax+1): distance from query[:i] to target[:j]
    prev2 = None
    prev = np.broadcast_to(np.arange(lmax + 1, dtype=np.int64),
                           (n, lmax + 1)).copy()
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        for j in range(1, lmax + 1):
            cost = (mat[:, j - 1] != q[i - 1]).astype(np.int64)
            d = np.minimum(prev[:, j] + 1, prev[:, j - 1] + cost)
            np.minimum(d, cur[:, j - 1] + 1, out=d)
            if i > 1 and j > 1:
                trans = (mat[:, j - 1] == q[i - 2]) \
                    & (mat[:, j - 2] == q[i - 1])
                d = np.where(trans, np.minimum(d, prev2[:, j - 2] + 1), d)
            cur[:, j] = d
        prev2, prev = prev, cur
    out = prev[np.arange(n), lens]
    # null targets never match (OpenSearch missing-field semantics)
    out = np.where(targets.isna().to_numpy(), np.iinfo(np.int32).max, out)
    return pd.Series(out.astype(np.int32))


def osa_distance(col: Column | str, query: str) -> Column:
    """Column of OSA distances from ``col`` to the literal ``query``."""
    @F.pandas_udf(T.IntegerType())
    def _osa(s: pd.Series) -> pd.Series:
        return osa_distance_batch(s, query)

    return _osa(F.col(col) if isinstance(col, str) else col)


def parse_fuzziness(fz, term: str) -> int:
    """OpenSearch ``fuzziness`` value → max edit count for ``term``.

    ``AUTO`` / ``AUTO:low,high``: 0 edits below ``low`` chars (default
    3), 1 below ``high`` (default 6), else 2 (Fuzziness#AUTO docs)."""
    if isinstance(fz, str) and fz.upper().startswith("AUTO"):
        low, high = 3, 6
        rest = fz[4:]
        if rest:
            if not rest.startswith(":"):
                raise ValueError(f"unsupported fuzziness {fz!r}")
            try:
                low_s, high_s = rest[1:].split(",")
                low, high = int(low_s), int(high_s)
            except ValueError:
                raise ValueError(
                    f"fuzziness {fz!r}: expected 'AUTO:low,high' with "
                    f"integer low,high") from None
            if not (0 <= low <= high):
                raise ValueError(
                    f"fuzziness {fz!r}: need 0 <= low <= high")
        n = len(term)
        return 0 if n < low else (1 if n < high else 2)
    try:
        v = int(fz)
    except (TypeError, ValueError):
        raise ValueError(f"unsupported fuzziness {fz!r}") from None
    if v < 0:
        raise ValueError(f"fuzziness must be >= 0: {fz!r}")
    return v
