"""Document chunking: the ``text_chunking`` ingest processor's two
published algorithms (``fixed_token_length``, ``delimiter``) as one
narrow DataFrame op.

Reference surface: the neural-search plugin's TextChunkingProcessor
(algorithms ``fixed_token_length`` — token_limit / overlap_rate /
max_chunk_limit — and ``delimiter``).  The processor runs per ingested
doc; here it is a scan-stage transform: pure codegen (``sequence`` +
``slice`` + ``posexplode``), NO UDF and NO shuffle, so it scales with
input partitions like any map-side op — the right shape for chunking
a 100 TB corpus before embedding/packing.

Tokens for ``fixed_token_length`` are whitespace words (the
processor's default analyzer counts standard tokens; whitespace is the
deterministic stand-in, consistent with ``token_counts.ws_tokens``).
Chunk text is the words re-joined with single spaces — offset-faithful
reconstruction of original inter-word whitespace is not preserved,
documented here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents"]


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    algorithm: str = "fixed_token_length",
                    token_limit: int = 384,
                    overlap_rate: float = 0.0,
                    delimiter: str = "\n\n",
                    max_chunk_limit: int = 100) -> DataFrame:
    """Explode each doc into ``(id, chunk_idx, chunk, chunk_tokens)``
    rows.

    ``fixed_token_length``: windows of ``token_limit`` words advancing
    by ``token_limit·(1−overlap_rate)`` (overlap_rate ∈ [0, 0.5] like
    the processor); the final window keeps the tail even when short.
    ``delimiter``: split on the literal delimiter, each chunk keeping
    its trailing delimiter (the processor's semantics); empty chunks
    are dropped.  ``max_chunk_limit``: docs producing more chunks
    RAISE (the processor's default posture) unless -1 disables the
    check — at scale the check is a codegen filter feeding one guarded
    count, not a driver loop.
    """
    # conditional width-spread before the per-row window/split chain:
    # a single-file table plans a one-task scan, serializing the whole
    # chunking pass on one core; wide tables pass through shuffle-free
    # (guide §2.5)
    from .spread import spread_narrow_scan

    df = spread_narrow_scan(df, id_col)
    if algorithm == "fixed_token_length":
        if not 0.0 <= overlap_rate <= 0.5:
            raise ValueError(
                f"overlap_rate must be in [0, 0.5], got {overlap_rate}")
        if token_limit < 1:
            raise ValueError(f"token_limit must be >= 1, got {token_limit}")
        step = max(1, int(token_limit * (1.0 - overlap_rate)))

        from ..functions.hof import bind_once

        # window starts: 0, step, 2·step, … while start < n_words,
        # but never starting past the first window that reaches the
        # end (a full-overlap tail window duplicating the previous
        # one is skipped, matching the processor); the word array is
        # lambda-bound so the split runs once per row
        def windows(words: F.Column) -> F.Column:
            n = F.size(words)
            k = F.greatest(
                F.ceil((n - F.lit(token_limit)) / F.lit(step)),
                F.lit(0).cast("long"))
            starts = F.filter(
                F.transform(F.sequence(F.lit(0).cast("long"), k),
                            lambda i: (i * step).cast("int")),
                lambda s_: (s_ == 0) | (s_ < n))
            return F.transform(
                starts,
                lambda s_: F.concat_ws(
                    " ", F.slice(words, s_ + 1, token_limit)))

        words_expr = F.expr(
            f"filter(split({text_col}, '\\\\s+'), x -> x != '')")
        chunked = df.withColumn("_chunks",
                                bind_once(words_expr, windows))
    elif algorithm == "delimiter":
        if not delimiter:
            raise ValueError("delimiter must be non-empty")
        import re as _re

        parts = F.split(F.col(text_col), _re.escape(delimiter), -1)
        # re-append the delimiter to every part but the last, then
        # drop empty / bare-delimiter chunks ('a||b' → ['a|','|','b']
        # → ['a|','b'])
        n_parts = F.size(parts)
        rejoined = F.transform(
            parts,
            lambda p, i: F.when(i < n_parts - 1,
                                F.concat(p, F.lit(delimiter)))
            .otherwise(p))
        chunked = df.withColumn(
            "_chunks",
            F.filter(rejoined, lambda c: (c != "") & (c != delimiter)))
    else:
        raise ValueError(
            f"unsupported chunking algorithm {algorithm!r}; expected "
            f"'fixed_token_length' or 'delimiter'")

    if max_chunk_limit != -1:
        # the guard rides the SAME scan (raise_error inside the plan)
        # instead of an eager extra whole-corpus job; it fires at
        # action time like any data-dependent failure
        from ..functions.hof import bind_once

        def guard(c: F.Column) -> F.Column:
            msg = F.concat(
                F.lit("doc "), F.col(id_col).cast("string"),
                F.lit(f" exceeds max_chunk_limit={max_chunk_limit}; "
                      f"raise the limit or pass -1"))
            return F.when(F.size(c) > max_chunk_limit,
                          F.raise_error(msg).cast("array<string>")
                          ).otherwise(c)

        chunked = chunked.withColumn(
            "_chunks", bind_once(F.col("_chunks"), guard))
    out = (chunked
           .select(id_col, F.posexplode("_chunks")
                   .alias("chunk_idx", "chunk"))
           .filter(F.col("chunk") != ""))
    ws = "filter(split(chunk, '\\\\s+'), x -> x != '')"
    return out.withColumn("chunk_tokens",
                          F.expr(f"size({ws})").cast("long"))
