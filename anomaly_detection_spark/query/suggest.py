"""Term suggester (the DirectSpellChecker-backed ``suggest`` section
of a search body): per misspelled input term, the closest dictionary
terms by OSA edit distance, ranked the reference way.

Semantics (TermSuggestionBuilder defaults, stated where they matter):

- the candidate set is the term DICTIONARY (index ``term_stats`` or
  the distinct analyzed tokens of a docs frame), never the corpus;
- ``prefix_length`` (default 1) requires the candidate to share the
  input's first characters (DirectSpellChecker's prefix requirement —
  also the pushdown that keeps the dictionary scan cheap);
- ``max_edits`` ≤ 2 (Lucene's LevenshteinAutomata bound), distance is
  OSA (adjacent transposition = one edit, like FuzzyQuery);
- ``suggest_mode``: ``missing`` (default — suggest only for input
  terms absent from the dictionary), ``popular`` (candidates must
  have higher df than the input term), ``always``;
- ranking: edit distance ascending, then doc frequency descending,
  then term ascending (the reference's score-then-frequency order for
  equal-length inputs).

The dictionary scan is one pass with codegen length/prefix
pre-filters below the Arrow OSA kernel; per-input top-N is a window
rank.  At 100 TB the dictionary is the vocabulary (millions, not
trillions) — the same object Lucene's automaton walks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.fuzzy import osa_distance
from ..functions.tokenizer import tokenize_query


def _dictionary(target) -> DataFrame:
    from .index_search import IndexReader

    if isinstance(target, IndexReader):
        return target.term_stats().select("term", "df")
    from ..functions.tokenizer import tokenize_column

    toks = (F.array_distinct("tokens") if "tokens" in target.columns
            else F.array_distinct(tokenize_column("text")))
    return (target.select(F.explode(toks).alias("term"))
            .groupBy("term").agg(F.count("*").alias("df")))


def suggest_terms(
    target,
    text: str,
    size: int = 5,
    max_edits: int = 2,
    prefix_length: int = 1,
    min_doc_freq: int = 1,
    suggest_mode: str = "missing",
) -> DataFrame:
    """(input_term, option, df, distance, rank) rows — up to ``size``
    ranked corrections per analyzed input term."""
    if not 1 <= max_edits <= 2:
        raise ValueError("max_edits must be 1 or 2 (Lucene bound)")
    if suggest_mode not in ("missing", "popular", "always"):
        raise ValueError(f"unsupported suggest_mode {suggest_mode!r}")
    terms = list(dict.fromkeys(tokenize_query(text)))
    from .index_search import IndexReader

    spark = (target.spark if isinstance(target, IndexReader)
             else target.sparkSession)
    empty = spark.createDataFrame(
        [], "input_term string, option string, df long, "
            "distance int, rank long")
    if not terms:
        return empty
    dictionary = _dictionary(target)
    in_dict = {r["term"]: r["df"] for r in dictionary.filter(
        F.col("term").isin(terms)).collect()}

    from pyspark.sql import Window

    outs = []
    for t in terms:
        if suggest_mode == "missing" and t in in_dict:
            continue
        cand = dictionary.filter(
            (F.length("term") >= F.lit(max(1, len(t) - max_edits)))
            & (F.length("term") <= F.lit(len(t) + max_edits))
            & (F.col("df") >= F.lit(min_doc_freq))
            & (F.col("term") != F.lit(t)))
        if prefix_length:
            cand = cand.filter(F.col("term").startswith(
                F.lit(t[:prefix_length])))
        if suggest_mode == "popular":
            cand = cand.filter(F.col("df") > F.lit(in_dict.get(t, 0)))
        cand = (cand.withColumn("distance", osa_distance("term", t))
                .filter(F.col("distance") <= F.lit(max_edits)))
        w = Window.orderBy(F.asc("distance"), F.desc("df"),
                           F.asc("term"))
        outs.append(cand
                    .withColumn("rank", F.row_number().over(w)
                                .cast("long"))
                    .filter(F.col("rank") <= size)
                    .select(F.lit(t).alias("input_term"),
                            F.col("term").alias("option"),
                            "df", "distance", "rank"))
    if not outs:
        return empty
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
