"""``combined_fields`` query: BM25 over a merged pseudo-field
(Lucene CombinedFieldQuery / BM25F with per-field weights).

Semantics, stated precisely because the reference approximates them:
all named fields are treated as ONE field whose statistics merge —

- tf_c(doc, t)  = Σ_f  w_f · tf_f(doc, t)
- len_c(doc)    = Σ_f  w_f · len_f(doc)
- avgdl_c       = mean of len_c over docs, N = doc count
- df_c(t)       = |{docs: t occurs in ANY field}|  (exact set-union;
  Lucene approximates this as max over per-field docFreqs because
  union df is expensive in its merge model — a relational engine
  computes the exact value for free, so we keep it exact and note
  the divergence here)
- score(doc)    = Σ_t idf(df_c, N) · mult_t ·
                  tf_c·(k1+1) / (tf_c + k1·(1−b+b·len_c/avgdl_c))

Field weights use the OpenSearch ``"field^boost"`` syntax.  Both
paths — brute (raw doc columns, analyzed here) and index (one
IndexReader per field, reading only the query terms' postings +
doc_stats) — evaluate the same formula and are locked score-identical
in ``tests/test_combined_fields.py``.

Reference surface: the user-facing query DSL ring
(ParseUtils.java:120-123 accepts any registered query type).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..localdf import local_df

from ..functions.bm25 import B_DEFAULT, K1_DEFAULT
from ..functions.tokenizer import tokenize_column, tokenize_query


def parse_field_boosts(fields: list[str]) -> list[tuple[str, float]]:
    """``["title^2", "text"]`` → [("title", 2.0), ("text", 1.0)]."""
    out = []
    for f in fields:
        if "^" in f:
            name, w = f.rsplit("^", 1)
            out.append((name, float(w)))
        else:
            out.append((f, 1.0))
    return out


def _idf(df_col: Column, n_docs: int) -> Column:
    return F.log(1.0 + (F.lit(float(n_docs)) - df_col + 0.5)
                 / (df_col + 0.5))


def combined_fields_topk(
    target,
    query_text: str,
    fields: list[str],
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    filter_cond: Column | None = None,
) -> DataFrame:
    """Top-k (docid, score) under the merged-field BM25 above.

    ``target``: a raw docs DataFrame (brute path — fields analyzed
    here) or a dict {field: IndexReader} (index path — per-field
    postings for the query terms + per-field doc_stats; never a
    corpus re-analysis).  The weighted (docid, term, tf) triples from
    every field union into ONE frame, so the combine is a single
    groupBy — no per-field joins."""
    specs = parse_field_boosts(fields)
    if not specs:
        raise ValueError("combined_fields requires at least one field")
    qcounts = Counter(tokenize_query(query_text))
    uniq = sorted(qcounts)
    is_index = isinstance(target, dict)
    if is_index:
        missing = [f for f, _ in specs if f not in target]
        if missing:
            raise ValueError(
                f"combined_fields index path needs a reader per field; "
                f"missing {missing}")
        spark = next(iter(target.values())).spark
    else:
        spark = target.sparkSession
    empty = local_df(spark, [], "docid long, score double")
    if not uniq:
        return empty

    tf_frames, len_frames = [], []
    tot_wlen, n_docs = 0.0, None
    for fld, w in specs:
        if is_index:
            from .index_search import term_doc_tfs

            rd = target[fld]
            tfs = term_doc_tfs(rd, uniq)
            lens = rd.doc_stats().select("docid",
                                         F.col("doc_len").alias("_len"))
        else:
            toks = tokenize_column(fld)
            an = target.select("docid", toks.alias("_toks"))
            tfs = (an.select("docid", F.explode("_toks").alias("term"))
                   .filter(F.col("term").isin(uniq))
                   .groupBy("docid", "term")
                   .agg(F.count("*").alias("tf")))
            lens = an.select("docid", F.size("_toks").alias("_len"))
        tf_frames.append(tfs.select(
            "docid", "term", (F.col("tf") * F.lit(w)).alias("_wtf")))
        len_frames.append(lens.select(
            "docid", (F.col("_len") * F.lit(w)).alias("_wlen")))
        # corpus stats accumulate per field (every field covers the
        # same doc set by construction), so the combined-length frame
        # is never materialized twice; the index meta already carries
        # them — no job at all on that path
        if is_index:
            n_docs = rd.meta.n_docs
            tot_wlen += w * rd.meta.avgdl * rd.meta.n_docs
        else:
            frow = lens.agg(F.count("*").alias("n"),
                            F.sum("_len").alias("s")).collect()[0]
            n_docs = int(frow["n"])
            tot_wlen += w * float(frow["s"] or 0.0)
    avgdl = tot_wlen / n_docs if n_docs else 0.0

    wtf = tf_frames[0]
    for fr in tf_frames[1:]:
        wtf = wtf.unionByName(fr)
    # one small frame (query terms only) consumed twice (df stats +
    # contributions) — checkpoint so the union of posting decodes /
    # tokenize scans runs once
    wtf = (wtf.groupBy("docid", "term")
           .agg(F.sum("_wtf").alias("tf_c"))
           .localCheckpoint(eager=False))

    wlen = len_frames[0]
    for fr in len_frames[1:]:
        wlen = wlen.unionByName(fr)
    wlen = wlen.groupBy("docid").agg(F.sum("_wlen").alias("len_c"))

    mult = local_df(spark, list(qcounts.items()),
                    "term string, mult long")
    dfs = (wtf.groupBy("term").agg(F.count("*").alias("df"))
           .join(mult, "term")
           .withColumn("idf", _idf(F.col("df"), n_docs) * F.col("mult")))

    cand = wtf.join(wlen, "docid")
    if filter_cond is not None:
        if is_index:
            base = next(iter(target.values())).doc_stats()
        else:
            base = target
        keep = base.filter(filter_cond).select("docid")
        cand = cand.join(keep, "docid", "left_semi")
    contrib = cand.join(F.broadcast(dfs), "term").withColumn(
        "_w",
        F.col("idf") * (F.col("tf_c") * (k1 + 1.0))
        / (F.col("tf_c")
           + k1 * (1.0 - b + b * F.col("len_c")
                   / F.lit(max(avgdl, 1e-12)))))
    return (contrib.groupBy("docid").agg(F.sum("_w").alias("score"))
            .orderBy(F.desc("score"), F.asc("docid")).limit(k))
