"""Brute-force (index-free) BM25 top-k over a document DataFrame.

This is the rank-truth every indexed path must match (SURVEY.md §7
step 3): tokenize → explode → per-(doc,term) tf → join per-term idf →
sum contributions → global top-k.  All scoring arithmetic is JVM-side
(whole-stage codegen); Python appears only in the Arrow tokenizer.

Semantics match OpenSearch ``match`` inside a ``bool`` with filters
(reference: ``SearchFeatureDao.java:295-302``, ``ParseUtils.java:321``):
filters restrict candidate docs but never change corpus statistics
(N, avgdl, df are index-wide, like Lucene); multi-term match = SHOULD,
scores summed; ties break (score desc, docid asc).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.bm25 import B_DEFAULT, K1_DEFAULT, quantize_doc_len
from ..functions.tokenizer import tokenize_column, tokenize_query


@dataclass(frozen=True)
class CorpusStats:
    n_docs: int
    avgdl: float


def analyze_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``tokens`` (analyzed text) and ``doc_len`` columns."""
    return docs.withColumn("tokens", tokenize_column(text_col)).withColumn(
        "doc_len", F.size("tokens")
    )


def _quantized_dl(col: Column) -> Column:
    """Lucene SmallFloat 1-byte norm round-trip as a Column (SURVEY.md §7
    R1 fidelity mode) — Arrow-batched, shared numpy implementation."""

    @F.pandas_udf("int")
    def _q(dl: pd.Series) -> pd.Series:
        return pd.Series(quantize_doc_len(dl.to_numpy()))

    return _q(col)


def corpus_stats(analyzed: DataFrame) -> CorpusStats:
    row = analyzed.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    return CorpusStats(n_docs=row["n"], avgdl=float(row["avgdl"] or 0.0))


def term_doc_freqs(analyzed: DataFrame, terms: list[str]) -> DataFrame:
    """Corpus-wide df per query term: (term, df).  Distinct terms per doc
    first so a term repeated in one doc counts once."""
    return (
        analyzed.select(F.explode(F.array_distinct("tokens")).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


def _idf_expr(n_docs: int) -> Column:
    return F.log(1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))


def bm25_topk_bruteforce(
    analyzed: DataFrame,
    query_text: str,
    k: int = 10,
    filter_cond: Column | None = None,
    stats: CorpusStats | None = None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    id_col: str = "docid",
    quantize_norms: bool = False,
    conjunctive: bool = False,
) -> DataFrame:
    """Top-k (docid, score) for an analyzed ``match`` query.

    ``analyzed`` must carry ``tokens``, ``doc_len`` and ``id_col``.
    Returns columns (docid, score) ordered by (score desc, docid asc).
    ``quantize_norms`` scores with Lucene's 1-byte doc-length norms
    (avgdl stays exact, as in Lucene).  ``conjunctive`` = match
    ``operator: and``: only docs containing every query term score
    (scores identical to OR for those docs, like Lucene).
    """
    terms = tokenize_query(query_text)
    if not terms:
        return analyzed.select(
            F.col(id_col), F.lit(0.0).alias("score")
        ).limit(0)
    stats = stats or corpus_stats(analyzed)  # exact avgdl, like Lucene
    if quantize_norms:
        analyzed = analyzed.withColumn("doc_len", _quantized_dl(F.col("doc_len")))

    # per-term idf × query multiplicity (a term repeated in the query is
    # a repeated SHOULD clause in Lucene — it scores once per repeat).
    from collections import Counter

    mult = analyzed.sparkSession.createDataFrame(
        list(Counter(terms).items()), "term string, mult long"
    )
    uniq = sorted(set(terms))
    idf = F.broadcast(
        term_doc_freqs(analyzed, uniq)
        .join(mult, "term")
        .withColumn("idf", _idf_expr(stats.n_docs) * F.col("mult"))
    )

    cand = analyzed
    if filter_cond is not None:
        cand = cand.filter(filter_cond)

    tf = (
        cand.select(id_col, "doc_len", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "doc_len", "term")
        .agg(F.count("*").alias("tf"))
    )
    contrib = tf.join(idf, "term").withColumn(
        "w",
        F.col("idf")
        * (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("doc_len") / F.lit(max(stats.avgdl, 1e-12)))
        ),
    )
    scored = contrib.groupBy(id_col).agg(
        F.sum("w").alias("score"),
        F.count("*").alias("_nt"))  # distinct matched terms (one row each)
    if conjunctive:
        # operator:and — every query term must match.  A query term
        # absent from the whole corpus ⇒ no doc can match.
        n_required = len(set(terms))
        scored = scored.filter(F.col("_nt") == n_required)
    return (
        scored.select(id_col, "score")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
