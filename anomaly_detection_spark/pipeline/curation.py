"""Training-corpus curation: benchmark decontamination, Gopher-style
repetition metrics, PII redaction, deterministic splits.

The operations an LLM training-data pipeline runs between raw ingest
and tokenization, built Spark-first:

- :func:`decontaminate` — n-gram-collision test-set decontamination
  (the published GPT-3 / Llama recipe: flag a training doc when it
  shares any word n-gram, default 13-gram, with the evaluation set).
  Train side is a codegen shingle expression + hash; the eval shingle
  set is broadcast (benchmarks are small) or shuffle-joined.
- :func:`repetition_metrics` — the within-document repetition filters
  of Gopher (Rae et al. 2021, Table A1): duplicate line / paragraph
  fractions (by count and by character mass) and top/duplicated
  n-gram character fractions.  Per-doc and embarrassingly parallel —
  one Arrow ``mapInPandas`` pass, no shuffle.
- :func:`pii_redact` — regex redaction of emails, phone numbers,
  IPv4 addresses and card-like digit runs, with per-type counts.
  Pure whole-stage-codegen ``regexp_replace`` chains.
- :func:`hash_split` — deterministic train/val/test assignment by
  ``xxhash64`` bucket of the id column: stable under reruns,
  partition-count changes and row order, never a random() sample.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["decontaminate", "repetition_metrics", "pii_redact",
           "hash_split", "PII_PATTERNS"]


def _shingle_hashes(text_col: str, n: int) -> F.Column:
    """Distinct xxhash64 values of the word ``n``-grams of the
    analyzed token stream — one codegen expression, no UDF."""
    from ..functions.hof import bind_once

    # sequence(1, 0) would generate a DESCENDING [1, 0] — docs shorter
    # than n tokens must short-circuit to an empty shingle set; the
    # token array is lambda-bound so the tokenize chain runs once per
    # row, not once per window
    def windows(toks: F.Column) -> F.Column:
        return F.when(
            F.size(toks) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                    lambda i: F.xxhash64(
                        F.concat_ws(" ", F.slice(toks, i, n))))
            )).otherwise(F.array().cast("array<bigint>"))

    return bind_once(F.expr(
        f"filter(split(lower({text_col}), '[^\\\\p{{L}}\\\\p{{N}}_]+'), "
        f"x -> x != '')"), windows)


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Flag training documents sharing any word ``n``-gram with the
    evaluation corpus (GPT-3 appendix C / Llama decontamination).

    Returns one row per TRAIN doc: (id_col, collision_count,
    total_shingles, collision_frac, contaminated) where
    ``collision_count`` is the number of distinct train-side n-grams
    that also occur anywhere in the eval set and ``collision_frac`` =
    count / total distinct shingles (the Llama-2-style "fraction of
    the document contaminated" signal callers threshold on; the
    ``contaminated`` flag itself is the strict any-collision GPT-3
    rule).  Docs shorter than ``n`` tokens have no shingles and are
    clean (collision_frac 0.0).

    Scale shape: the eval shingle set (benchmarks: thousands of docs)
    is collected into a broadcast hash join against the exploded
    train shingles — no shuffle of the 100 TB side.  Pass
    ``broadcast_eval=False`` when the eval corpus is itself large; the
    plan becomes a shuffle join on the shingle hash, both sides
    pre-deduplicated.  Matching is on 64-bit xxhash of the shingle
    (false-positive probability ~2⁻⁶⁴ per pair — the standard trade
    for not shipping raw 13-grams).
    """
    eval_text_col = eval_text_col or text_col
    from .spread import spread_narrow_scan

    ev = (spread_narrow_scan(eval_df, F.col(eval_text_col)).select(
        F.explode(_shingle_hashes(eval_text_col, n)).alias("_sh"))
        .distinct().withColumn("_hit", F.lit(True)))
    if broadcast_eval:
        ev = F.broadcast(ev)
    # ONE tokenize+hash pass over the train side: explode_outer keeps
    # shingle-less docs (one null row → counts 0), the broadcast left
    # join marks collisions without shuffling the big side, and the
    # groupBy partial-aggregates map-side to ~one row per doc.  The
    # conditional width-spread ahead of it parallelizes the
    # tokenize+hash stage when the table is a narrow scan (and is a
    # no-op on wide production tables — guide §2.5)
    tr = spread_narrow_scan(train, id_col).select(
        F.col(id_col),
        F.explode_outer(_shingle_hashes(text_col, n)).alias("_sh"))
    agg = (tr.join(ev, "_sh", "left")
           .groupBy(id_col)
           .agg(F.count("_sh").alias("total_shingles"),
                F.count("_hit").alias("collision_count")))
    return agg.select(
        id_col,
        "collision_count",
        "total_shingles",
        F.when(F.col("total_shingles") > 0,
               F.col("collision_count") / F.col("total_shingles"))
        .otherwise(F.lit(0.0)).alias("collision_frac"),
        (F.col("collision_count") > 0).alias("contaminated"))


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dup_ngram: int = 5,
    top_ngrams: tuple[int, ...] = (2, 3, 4),
) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021, Table A1), per doc:

    - ``dup_line_frac`` / ``dup_para_frac`` — fraction of lines /
      paragraphs that are repeats of an earlier one (count-based);
    - ``dup_line_char_frac`` / ``dup_para_char_frac`` — fraction of
      characters inside lines / paragraphs whose content occurs more
      than once;
    - ``top{n}gram_char_frac`` for n in ``top_ngrams`` — characters
      covered by the single most frequent word n-gram;
    - ``dup{k}gram_char_frac`` for k=``dup_ngram`` — characters
      covered by word k-grams that occur more than once (overlapping
      occurrences counted once per token position, per the paper).

    One ``mapInPandas`` pass — per-document computation with no
    shuffle; each doc is O(len) with small constants.  Gopher's
    removal thresholds (e.g. dup_line_frac > 0.30) are the caller's
    policy; this op just measures.
    """
    import re

    word_re = re.compile(r"[^\W]+", re.UNICODE)
    tops = tuple(top_ngrams)
    k = dup_ngram
    out_cols = ([id_col, "dup_line_frac", "dup_line_char_frac",
                 "dup_para_frac", "dup_para_char_frac"]
                + [f"top{n}gram_char_frac" for n in tops]
                + [f"dup{k}gram_char_frac"])

    def _frac_units(units: list[str]) -> tuple[float, float]:
        if not units:
            return 0.0, 0.0
        counts = Counter(units)
        n_dup = sum(c - 1 for c in counts.values())
        chars_tot = sum(len(u) for u in units)
        chars_dup = sum(len(u) * c for u, c in counts.items() if c > 1)
        return (n_dup / len(units),
                (chars_dup / chars_tot) if chars_tot else 0.0)

    def _one(text: str) -> list[float]:
        lines = [l for l in (s.strip() for s in text.split("\n")) if l]
        paras = [p for p in (s.strip() for s in text.split("\n\n")) if p]
        lf, lcf = _frac_units(lines)
        pf, pcf = _frac_units(paras)
        words = word_re.findall(text.lower())
        wlen = [len(w) for w in words]
        total_chars = sum(wlen)
        row = [lf, lcf, pf, pcf]
        for n in tops:
            if len(words) < n or total_chars == 0:
                row.append(0.0)
                continue
            grams = Counter(
                tuple(words[i:i + n]) for i in range(len(words) - n + 1))
            top, cnt = max(grams.items(), key=lambda kv: (kv[1], kv[0]))
            row.append(cnt * sum(len(w) for w in top) / total_chars)
        if len(words) < k or total_chars == 0:
            row.append(0.0)
        else:
            grams = Counter(
                tuple(words[i:i + k]) for i in range(len(words) - k + 1))
            covered = [False] * len(words)
            for i in range(len(words) - k + 1):
                if grams[tuple(words[i:i + k])] > 1:
                    for j in range(i, i + k):
                        covered[j] = True
            row.append(
                sum(l for l, c in zip(wlen, covered) if c) / total_chars)
        return row

    def _batch(it):
        for pdf in it:
            rows = [[i] + _one(t if isinstance(t, str) else "")
                    for i, t in zip(pdf[id_col], pdf[text_col])]
            yield pd.DataFrame(rows, columns=out_cols)

    schema = ", ".join(
        [f"{id_col} {dict(df.dtypes)[id_col]}"]
        + [f"{c} double" for c in out_cols[1:]])
    # conditional width-spread before the per-doc Python pass: a
    # single-file table plans a one-task scan, which would run the
    # whole corpus through ONE Python worker (guide §2.5); no-op on
    # wide tables
    from .spread import spread_narrow_scan

    return (spread_narrow_scan(df.select(id_col, text_col), id_col)
            .mapInPandas(_batch, schema=schema))


# Redaction patterns: Java-regex (Spark) syntax, chosen to also be
# valid RE2/DuckDB patterns so the oracle can replay them verbatim.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"(?:\+?[0-9]{1,3}[-. (]{1,2})?[0-9]{3}[-. )]{1,2}[0-9]{3}[-. ]?[0-9]{4}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "card": r"\b(?:[0-9]{4}[- ]){3}[0-9]{4}\b",
}


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Redact PII-shaped spans and count them per type.

    Output: (id_col, redacted, n_<type>...) — each matched span is
    replaced by ``<TYPE>`` (e.g. ``<EMAIL>``).  Patterns apply — and
    are COUNTED — in the declared order on the progressively redacted
    string, so an email is not also counted as a phone number through
    its digits.  Pure codegen — no UDFs, no shuffle.
    """
    pats = patterns or PII_PATTERNS
    red = F.col(text_col)
    counts = []
    for name, pat in pats.items():
        counts.append(
            F.regexp_count(red, F.lit(pat)).alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return df.select(F.col(id_col), *counts, red.alias("redacted"))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic split assignment: bucket = xxhash64(id, seed) mod
    ``buckets``; cumulative weight thresholds map buckets to split
    names.  Stable under reruns, repartitioning and row order —
    the property ``randomSplit`` does NOT have (it re-samples per
    partition layout), which is why pipelines split on a hash of a
    stable id.  Adds a ``split`` column.
    """
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    b = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(buckets))
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = b < F.lit(int(round(acc * buckets)))
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def _hash_uniform(id_col: str, seed: int) -> F.Column:
    """Deterministic per-row uniform in [0, 1): xxhash64 of the stable
    id — the sampling primitive that survives reruns, repartitioning
    and row order (Bernoulli `sample()` does not)."""
    # xxhash64 is signed 64-bit; fold to [0, 2^63) then scale
    h = F.abs(F.xxhash64(F.col(id_col), F.lit(seed)))
    return h.cast("double") / F.lit(float(2 ** 63))


def sample_corpus(
    df: DataFrame,
    rate: float | None = None,
    rates_by: tuple[str, dict[str, float]] | None = None,
    weight_col: str | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic corpus sampling — keep a row iff its hash-uniform
    ``u(id) < p(row)``:

    - ``rate`` — uniform Bernoulli at ``rate``;
    - ``rates_by=(col, {value: rate})`` — stratified per-group rates
      (missing groups keep the ``rate`` default, or 0.0 without one);
    - ``weight_col`` — importance sampling: ``p = clamp(rate * w, 0,
      1)`` per row (quality-weighted corpus mixing, the DoReMi-style
      reweighting primitive).

    One codegen filter, no shuffle, no RNG state — the same row set at
    any partitioning and any cluster size."""
    u = _hash_uniform(id_col, seed)
    if rates_by is not None:
        col, table = rates_by
        default = rate if rate is not None else 0.0
        p = F.lit(float(default))
        for val, r in table.items():
            p = F.when(F.col(col) == F.lit(val), F.lit(float(r))) \
                .otherwise(p)
    elif rate is not None:
        p = F.lit(float(rate))
    else:
        raise ValueError("sample_corpus needs rate and/or rates_by")
    if weight_col is not None:
        p = F.least(F.greatest(p * F.col(weight_col).cast("double"),
                               F.lit(0.0)), F.lit(1.0))
    return df.filter(u < p)


def sample_to_token_budget(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    strata_col: str | None = None,
    strata_weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Sample down to ≈ ``budget`` total tokens, deterministically.

    One distributed agg computes per-stratum token mass; rates are
    allocated driver-side (proportional to ``strata_weights`` when
    given, else to current mass — i.e. a uniform global rate), then
    one :func:`sample_corpus` filter applies them.  The result's
    expected token mass is the budget; the hash filter makes the
    realized set reproducible.  Two jobs total, both shuffle-light
    (one map-side-combinable agg + one filter)."""
    if strata_col is None:
        total = df.agg(F.sum(token_col)).collect()[0][0] or 0
        if total <= budget:
            return df
        return sample_corpus(df, rate=budget / float(total),
                             id_col=id_col, seed=seed)
    mass = {r[strata_col]: r["t"] for r in
            df.groupBy(strata_col)
            .agg(F.sum(token_col).alias("t")).collect()}
    if strata_weights:
        wsum = float(sum(strata_weights.values()))
        want = {s: budget * (w / wsum)
                for s, w in strata_weights.items()}
    else:
        tot = float(sum(mass.values())) or 1.0
        want = {s: budget * (m / tot) for s, m in mass.items()}
    rates = {s: min(1.0, want.get(s, 0.0) / m)
             for s, m in mass.items() if m}
    return sample_corpus(df, rates_by=(strata_col, rates),
                         id_col=id_col, seed=seed)


def mix_to_token_budget(
    df: DataFrame,
    budget: int,
    strata_col: str,
    strata_weights: dict[str, float] | None = None,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 42,
    max_repeat: int = 100,
) -> DataFrame:
    """Domain mixing WITH upsampling — the epoch-style mixture a
    training run actually consumes (cf. the published Pile / Llama
    data recipes, where scarce high-weight domains repeat for multiple
    epochs while bulk web text is subsampled).

    Per-stratum mix rate = target token mass / available mass, where
    target = ``budget × weight_s / Σ weights`` (proportional to
    current mass when ``strata_weights`` is None — a uniform global
    rate).  Unlike :func:`sample_to_token_budget` the rate may EXCEED
    1: each row is emitted ``⌊rate⌋`` times plus one more iff its
    hash-uniform ``u(id) < frac(rate)``, so realized expected mass per
    stratum equals the target exactly, the row set is deterministic
    (reruns, repartitioning, any cluster size), and a 0-based
    ``epoch`` column distinguishes the copies.

    Shape: one map-side-combinable agg for the masses (driver gets one
    row per stratum), then a narrow ``explode(sequence(...))`` — no
    shuffle on the data path.  ``max_repeat`` guards against a
    runaway rate from a near-empty stratum with a large weight
    (raises rather than silently exploding the corpus)."""
    mass = {r[strata_col]: r["t"] for r in
            df.groupBy(strata_col)
            .agg(F.sum(token_col).alias("t")).collect()}
    if strata_weights:
        wsum = float(sum(strata_weights.values()))
        want = {s: budget * (w / wsum)
                for s, w in strata_weights.items()}
    else:
        tot = float(sum(mass.values())) or 1.0
        want = {s: budget * (m / tot) for s, m in mass.items()}
    rates = {s: want.get(s, 0.0) / m for s, m in mass.items() if m}
    over = {s: r for s, r in rates.items() if r > max_repeat}
    if over:
        raise ValueError(
            f"mix_to_token_budget: mix rate exceeds max_repeat="
            f"{max_repeat} for strata {sorted(over)} — a near-empty "
            f"stratum with a large weight; raise max_repeat only if "
            f"{max(over.values()):.0f}× repetition is intended")
    rate = F.lit(0.0)
    for val, r in rates.items():
        rate = F.when(F.col(strata_col) == F.lit(val),
                      F.lit(float(r))).otherwise(rate)
    u = _hash_uniform(id_col, seed)
    n = (F.floor(rate)
         + F.when(u < rate - F.floor(rate), F.lit(1)).otherwise(F.lit(0))
         ).cast("int")
    return (df.withColumn("_n_copies", n)
            .filter(F.col("_n_copies") > 0)
            .withColumn("epoch", F.explode(
                F.sequence(F.lit(0), F.col("_n_copies") - 1)))
            .drop("_n_copies"))


def _pack_shard(toks: np.ndarray, mt: int, ov: str) -> np.ndarray:
    """Best-fit-decreasing bin packing of one shard's token counts
    (MUST be sorted descending): local pack index per doc, −1 =
    dropped oversize.  Pure kernel, property-fuzzed directly in
    tests (``test_curation_sampling``) without a Spark round-trip."""
    import bisect

    if ov == "error" and len(toks) and toks[0] > mt:
        raise ValueError(
            f"pack_sequences: docs exceed max_tokens={mt}; "
            f"pass oversize='own' or 'drop'")
    caps: list[int] = []        # remaining capacities, ascending
    bins: list[int] = []        # parallel local pack index
    assign = np.full(len(toks), -1, dtype=np.int64)
    nxt = 0
    for i, t in enumerate(toks):
        t = int(t)
        if t > mt:
            if ov == "drop":
                continue
            assign[i] = nxt     # own pack, never reused (cap 0)
            nxt += 1
            continue
        j = bisect.bisect_left(caps, t)   # tightest bin that fits
        if j == len(caps):
            assign[i] = nxt
            rem = mt - t
            pos = bisect.bisect_left(caps, rem)
            caps.insert(pos, rem)
            bins.insert(pos, nxt)
            nxt += 1
        else:
            assign[i] = bins[j]
            rem = caps[j] - t
            del caps[j], bins[j]
            pos = bisect.bisect_left(caps, rem)
            caps.insert(pos, rem)
            bins.insert(pos, assign[i])
    return assign


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    oversize: str = "own",
    num_shards: int = 256,
    seed: int = 42,
) -> DataFrame:
    """Sequence packing — assign documents to training sequences so
    each pack's token total ≤ ``max_tokens`` with high fill (the
    pack-to-max_seq_len step of an LLM data pipeline, cf. the T5/GPT-3
    packing recipes).

    Distributed posture: docs are sharded by a DETERMINISTIC hash of
    the id (never ``spark_partition_id`` — that changes with the
    physical plan), and each shard packs independently with best-fit-
    decreasing (sort by size desc, place each doc in the fullest bin
    it fits via one bisect — O(n log n) per shard).  Sharded packing
    is the standard recipe: global bin packing is NP-hard and buys
    nothing once shards hold thousands of docs (fill is within a few
    ‰ of the global optimum when ``max_tokens`` ≫ the median doc).
    Size ``num_shards`` so a shard's (id, tokens) pairs fit one task
    comfortably — at corpus scale that's corpus_docs / ~10M.

    ``oversize`` (docs longer than ``max_tokens``): ``"own"`` gives
    each its own pack (chunk downstream), ``"drop"`` removes them,
    ``"error"`` raises.  Returns the input plus ``pack_id`` (globally
    unique long: shard ≪ 40 | local index)."""
    if oversize not in ("own", "drop", "error"):
        raise ValueError(f"unsupported oversize policy {oversize!r}")
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("pack_id", T.LongType())])
    mt, tc, ic, ov = int(max_tokens), token_col, id_col, oversize

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([tc, ic],
                              ascending=[False, True]).reset_index(drop=True)
        shard = int(pdf["_shard"].iloc[0])
        assign = _pack_shard(pdf[tc].to_numpy(dtype=np.int64), mt, ov)
        out = pdf[assign >= 0].drop(columns=["_shard"])
        out["pack_id"] = (np.int64(shard) << np.int64(40)) \
            | assign[assign >= 0]
        return out

    sharded = df.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)),
                         F.lit(int(num_shards))))
    return sharded.groupBy("_shard").applyInPandas(_pack, out_schema)


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-level exact paragraph deduplication (the C4 recipe:
    repeated lines/paragraphs across the corpus are kept ONCE, at
    their first occurrence, and dropped everywhere else).

    Shape: explode paragraphs with their (id, position), one
    groupBy(paragraph-hash) keeping the min (id, position) occurrence
    — never the paragraph STRINGS on the reduce side, only 64-bit
    hashes — then reassemble each doc's surviving paragraphs in
    original order.  Two shuffles (dedup agg + reassembly), both keyed
    well; documents whose every paragraph was seen earlier come back
    with empty text (filter on ``n_paras`` to drop them).  Paragraphs
    under ``min_chars`` are kept verbatim (boilerplate-fragment
    whitelist, like C4's length floor)."""
    paras = (df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(sep)))
        .alias("pos", "para")))
    hashed = paras.withColumn("h", F.xxhash64("para"))
    eligible = hashed.filter(F.length("para") >= int(min_chars))
    first = (eligible.groupBy("h")
             .agg(F.min(F.struct(id_col, "pos")).alias("keep")))
    survivors = (eligible.join(first, "h")
                 .filter((F.col(id_col) == F.col(f"keep.{id_col}"))
                         & (F.col("pos") == F.col("keep.pos")))
                 .select(id_col, "pos", "para"))
    short = (hashed.filter(F.length("para") < int(min_chars))
             .select(id_col, "pos", "para"))
    kept = survivors.unionByName(short)
    out = (kept.groupBy(id_col)
           .agg(F.array_join(
               F.transform(
                   F.array_sort(F.collect_list(
                       F.struct("pos", "para"))),
                   lambda s: s["para"]),
               sep).alias(text_col),
               F.count("*").alias("n_paras")))
    other = [c for c in df.columns if c not in (text_col,)]
    return (df.select(*other).join(out, id_col, "left")
            .withColumn(text_col, F.coalesce(F.col(text_col),
                                             F.lit("")))
            .withColumn("n_paras", F.coalesce(F.col("n_paras"),
                                              F.lit(0))))


def duplicate_ngram_spans(
    df: DataFrame,
    n: int = 13,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicate n-gram spans — the practical form of
    exact-substring deduplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": remove substrings
    repeated verbatim across the corpus; their suffix array finds
    length-50-char repeats, the common production recipe flags
    repeated word n-grams instead).

    Returns (id, start_tok, end_tok, n_windows) token-index spans per
    doc where every covered ``n``-gram window occurs ≥ ``min_count``
    times corpus-wide, adjacent/overlapping flagged windows merged.

    Shape: one codegen explode of (hash, id, pos) triples → one count
    agg keyed by the 64-bit hash (ONLY hashes shuffle — never text) →
    semi-join flagged hashes back (broadcast when the duplicate
    vocabulary is small, AQE decides) → per-doc merge of sorted
    window starts (one map-side-combinable collect per doc).  Cutting
    the spans out is the caller's policy decision (keep-first needs a
    global occurrence order; dropping everywhere loses one good copy
    — Lee et al. discuss both)."""
    from ..functions.hof import bind_once

    def windows(toks: F.Column) -> F.Column:
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                lambda i: F.xxhash64(
                    F.concat_ws(" ", F.slice(toks, i, n))))
        ).otherwise(F.array().cast("array<bigint>"))

    grams = bind_once(F.expr(
        f"filter(split(lower({text_col}), '[^\\\\p{{L}}\\\\p{{N}}_]+'), "
        f"x -> x != '')"), windows)
    # materialized once: the count agg and the semi-join below both
    # read it, and its lineage is the tokenize + per-window slice/
    # concat/hash chain — the dominant cost of this op, which would
    # otherwise execute twice (guide §2.4: share the pass, and the
    # checkpointed frame is (id, pos, hash) rows — hashes, never
    # text).  The conditional width-spread parallelizes that chain
    # when the table is a narrow scan (no-op on wide tables —
    # guide §2.5)
    from .spread import spread_narrow_scan

    win = (spread_narrow_scan(df, id_col)
           .select(F.col(id_col), F.posexplode(grams)
                   .alias("pos", "h"))
           .localCheckpoint(eager=False))
    counts = (win.groupBy("h")
              .agg(F.count("*").alias("c"))
              .filter(F.col("c") >= int(min_count))
              .select("h"))
    flagged = win.join(counts, "h", "left_semi")
    starts = (flagged.groupBy(id_col)
              .agg(F.array_sort(F.collect_list("pos")).alias("ps")))

    import pandas as pd

    @F.pandas_udf("array<struct<start_tok:int,end_tok:int,"
                  "n_windows:int>>")
    def _merge(ps_s: pd.Series) -> pd.Series:
        out = []
        for ps in ps_s:
            spans = []
            if ps is not None and len(ps):
                s = e = int(ps[0])
                cnt = 1
                for p in ps[1:]:
                    p = int(p)
                    if p <= e + n:      # windows overlap or touch
                        e = p
                        cnt += 1
                    else:
                        spans.append((s, e + n, cnt))
                        s = e = p
                        cnt = 1
                spans.append((s, e + n, cnt))
            out.append(spans)
        return pd.Series(out)

    return (starts.select(id_col, F.explode(_merge("ps"))
                          .alias("span"))
            .select(id_col, "span.start_tok", "span.end_tok",
                    "span.n_windows")
            .orderBy(id_col, "start_tok"))
