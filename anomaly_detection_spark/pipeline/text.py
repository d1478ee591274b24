"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All JVM-side (whole-stage codegen) except the rolling-hash variant,
which is a vectorized pandas UDF.  Every output column is aliased so
the same computation is expressible as ANSI SQL for the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_REGEX = r"[\p{L}\p{N}_]+"  # Java/RE2-compatible \w-run (unicode)

# per-language stopword lists (distinct-hit heuristic; deterministic).
# Shared words across languages are fine — the argmax over per-language
# DISTINCT hits is what discriminates.  The single source of truth:
# __spark_entry__'s oracle SQL is generated from this dict.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "for", "it",
           "was", "with", "as", "on", "be", "at", "by", "this", "have",
           "from", "or", "not", "but", "are", "they"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los",
           "se", "del", "las", "una", "su", "para", "es", "al", "como",
           "más", "pero", "sus", "le", "ya", "está"],
    "fr": ["le", "la", "de", "et", "un", "les", "des", "est", "dans",
           "pour", "une", "que", "qui", "sur", "pas", "plus", "par",
           "avec", "tout", "son", "ses", "mais", "comme", "nous", "aux"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "ein",
           "zu", "nicht", "sich", "auf", "für", "auch", "als", "eine",
           "des", "dem", "im", "aber", "noch", "wie", "bei", "nach"],
    "it": ["il", "di", "che", "la", "per", "non", "una", "sono", "con",
           "del", "gli", "della", "nel", "come", "anche", "più", "alla",
           "questo", "essere", "molto", "hanno", "dalla", "quando",
           "perché", "sia"],
    "pt": ["de", "que", "não", "uma", "para", "com", "os", "do", "da",
           "em", "um", "por", "mais", "das", "como", "mas", "foi", "ao",
           "ele", "isso", "ou", "ser", "quando", "muito", "há"],
    "nl": ["de", "het", "een", "van", "en", "in", "is", "dat", "op",
           "te", "zijn", "met", "voor", "niet", "aan", "er", "ook",
           "als", "maar", "om", "dan", "zou", "naar", "bij", "nog"],
    "id": ["yang", "dan", "di", "itu", "dengan", "ini", "untuk", "dari",
           "dalam", "tidak", "akan", "pada", "juga", "saya", "ke",
           "karena", "ada", "mereka", "sudah", "atau", "bisa", "kita",
           "tersebut", "seperti", "oleh"],
}


def _tokens(col: str) -> F.Column:
    return F.expr(
        f"filter(split(lower({col}), '[^\\\\p{{L}}\\\\p{{N}}_]+'), x -> x != '')"
    )


def token_counts(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + regex word count + char count per doc."""
    ws = F.size(F.expr(
        f"filter(split({text_col}, '\\\\s+'), x -> x != '')"))
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("ws_tokens"),
        F.size(_tokens(text_col)).cast("long").alias("word_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def quality_scores(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, punct ratio, stopword ratio,
    mean word length, and a composite [0,1] score (deterministic)."""
    toks = _tokens(text_col)
    n_words = F.size(toks)
    n_chars = F.length(text_col)
    n_alpha = F.length(F.regexp_replace(text_col, r"[^\p{L}\p{N}]", ""))
    punct_ratio = F.when(n_chars > 0,
                         (n_chars - n_alpha).cast("double") / n_chars).otherwise(0.0)
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), sw))
    stop_ratio = F.when(n_words > 0, n_stop.cast("double")
                        / F.least(n_words, F.lit(10))).otherwise(0.0)
    mean_wlen = F.when(n_words > 0,
                       n_alpha.cast("double") / n_words).otherwise(0.0)
    score = (
        F.least(n_words.cast("double") / 50.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(punct_ratio * 2.0, F.lit(1.0))) * 0.3
        + F.least(stop_ratio, F.lit(1.0)) * 0.3
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(score, 6).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """n-gram-free language heuristic: distinct stopword hits per
    language; argmax wins, lexicographically-first language on ties,
    'und' when nothing hits.  SQL-expressible by design."""
    toks = F.array_distinct(_tokens(text_col))
    out = df.select(F.col(id_col), toks.alias("_t"))
    hit_cols = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hit_cols[lang] = F.size(F.array_intersect(F.col("_t"), arr)).cast("long")
        out = out.withColumn(f"hits_{lang}", hit_cols[lang])
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier langs override later on ties
        pred = F.when((F.col(f"hits_{lg}") == best) & (best > 0), F.lit(lg)) \
            .otherwise(pred)
    return out.select(
        id_col, *[f"hits_{lg}" for lg in langs], pred.alias("lang_pred"))


def doc_fingerprints(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Two fingerprints per doc:

    - ``fp_md5``: md5 of the space-joined normalized tokens (portable —
      identical in any engine with md5; the canonical near-exact-dup key).
    - ``fp_roll``: 63-bit polynomial rolling hash over token bytes
      (numpy pandas UDF; order-sensitive, cheap to maintain in streams).
    """
    toks = _tokens(text_col)
    norm = F.concat_ws(" ", toks)

    @F.pandas_udf(T.LongType())
    def _roll(texts: pd.Series) -> pd.Series:
        # h = Σ byte_i · B^(n-1-i) mod 2^64, masked to 63 bits at the end
        B = np.uint64(1000003)
        out = np.zeros(len(texts), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i, s in enumerate(texts):
                data = np.frombuffer((s or "").encode("utf-8"), dtype=np.uint8)
                n = len(data)
                if n == 0:
                    continue
                pw = np.empty(n, dtype=np.uint64)
                pw[0] = 1
                if n > 1:
                    pw[1:] = B
                    np.cumprod(pw, out=pw)  # wraps mod 2^64 (uint64 overflow)
                out[i] = np.dot(data.astype(np.uint64), pw[::-1])
        return pd.Series((out & np.uint64((1 << 63) - 1)).astype(np.int64))

    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp_md5"),
        _roll(norm).alias("fp_roll"),
    )


def sparse_encode(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  weighting: str = "log_tf",
                  out_col: str = "sparse") -> DataFrame:
    """Deterministic sparse-vector encoding: ``term → weight`` map per
    doc, the doc side of :func:`~..query.planner.search`'s
    ``neural_sparse`` query (the OpenSearch neural-search plugin's
    sparse mode; the plugin's encoder is a learned model — this is the
    model-free stand-in with the same plumbing: a ``map<string,double>``
    column scored by weight dot-product).

    ``weighting``: ``log_tf`` (1 + ln tf, the classic sublinear tf) or
    ``tf`` (raw counts).  Pure codegen — distinct terms × counted via
    higher-order functions, NO shuffle and no UDF; per-doc cost is
    O(unique × tokens), fine for turn/document-sized texts (a scan
    stage, so it scales with partitions like any map-side op).
    """
    if weighting not in ("log_tf", "tf"):
        raise ValueError(
            f"unsupported sparse_encode weighting {weighting!r}; "
            f"expected 'log_tf' or 'tf'")

    from ..functions.hof import bind_once

    # token array lambda-bound: one tokenize per row, not one per
    # distinct term
    def entries(toks: F.Column) -> F.Column:
        def entry(t: F.Column) -> F.Column:
            cnt = F.size(F.filter(toks, lambda x: x == t))
            w = ((F.lit(1.0) + F.log(cnt.cast("double")))
                 if weighting == "log_tf" else cnt.cast("double"))
            return F.struct(t.alias("term"), w.alias("weight"))
        return F.map_from_entries(
            F.transform(F.array_distinct(toks), entry))

    return df.withColumn(out_col, bind_once(
        _tokens(text_col), entries))


def train_unigram_lm(df: DataFrame, text_col: str = "text",
                     vocab_size: int = 100_000,
                     smoothing_k: float = 1.0) -> DataFrame:
    """Train a unigram language model: ``(term, logp)`` for the
    ``vocab_size`` most frequent terms, add-k smoothed.

    The deterministic stand-in for CCNet-style LM quality filtering
    (CCNet scores with a KenLM 5-gram; the recipe — score perplexity
    against an LM trained on a clean reference corpus, bucket by
    percentile — is the same).  One explode + one count agg; the model
    is BOUNDED (≤ vocab_size rows), so scoring can broadcast it.

    logp(t) = ln((count(t) + k) / (N + k·(V + 1))); the +1 reserves
    one smoothed slot shared by all out-of-vocabulary terms, whose
    logp (``lm_oov_logp``) is derivable from any row:
    ln(k / (N + k·(V + 1))).
    """
    # conditional width-spread on the text itself: single-file tables
    # plan a one-task scan, serializing the tokenize (guide §2.5)
    from .spread import spread_narrow_scan

    toks = (spread_narrow_scan(df, F.col(text_col))
            .select(F.explode(_tokens(text_col)).alias("t")))
    counts = (toks.groupBy("t").agg(F.count("*").alias("c"))
              .orderBy(F.desc("c"), F.asc("t")).limit(int(vocab_size)))
    tot = toks.count()
    v = counts.count()
    denom = float(tot) + smoothing_k * (v + 1)
    return counts.select(
        F.col("t").alias("term"),
        F.log((F.col("c") + F.lit(smoothing_k)) / F.lit(denom))
        .alias("logp"),
        F.lit(float(np.log(smoothing_k / denom))).alias("oov_logp"),
    )


def perplexity_scores(df: DataFrame, lm: DataFrame,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-doc perplexity under a :func:`train_unigram_lm` model:
    exp(−mean logp over the doc's tokens).  Lower = more like the LM's
    training corpus (the CCNet keep signal).

    Shape: doc tokens explode → BROADCAST join with the bounded LM →
    one map-side-combinable per-doc mean.  The corpus shuffles once,
    keyed by ``id_col``; the LM never shuffles.  Empty docs score
    null.
    """
    oov = lm.select("oov_logp").first()
    if oov is None:
        raise ValueError("empty language model")
    oov = float(oov[0])
    from .spread import spread_narrow_scan

    toks = (spread_narrow_scan(df, id_col)
            .select(F.col(id_col),
                    F.explode(_tokens(text_col)).alias("term")))
    joined = toks.join(F.broadcast(lm.select("term", "logp")),
                       "term", "left")
    per_doc = (joined.groupBy(id_col)
               .agg(F.avg(F.coalesce(F.col("logp"), F.lit(oov)))
                    .alias("_mlp"),
                    F.count("*").alias("lm_tokens")))
    return (df.select(id_col).join(per_doc, id_col, "left")
            .select(id_col,
                    F.exp(-F.col("_mlp")).alias("perplexity"),
                    F.coalesce("lm_tokens", F.lit(0)).alias("lm_tokens")))
