"""Deterministic synthetic ``transcripts`` table + stable docid assignment.

Schema (BASELINE.json ``input_hint``):
    conv_id string, turn_idx int, role string, text string,
    tool string, ts timestamp

Modeled on the reference's seeded benchmark generator
(``/root/reference/dataGeneration/generate-cosine-data-multi-entity.py`` —
deterministic seed, Zipf-skewed categorical entity fields) and its e2e
fixture style.  Every field is a pure function of (seed, conv, turn):
the table is identical regardless of parallelism, partition count or
task scheduling (SURVEY.md §7 R4).

Scale posture: conv/turn fan-out is JVM-side (``sequence`` +
``posexplode``); text synthesis is a vectorized Arrow pandas UDF; docid
assignment uses the partition-offset pattern (per-partition counts →
driver-side cumsum over P values → parallel within-partition
row_number), never a global single-task sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..localdf import local_df

# ---------------------------------------------------------------------------
# Vocabulary: ~5k words, Zipf-distributed (s = 1.07), fixed seed.
# ---------------------------------------------------------------------------

_VOCAB_SEED = 0x5EED_CAFE
_VOCAB_SIZE = 5000
_ZIPF_S = 1.07

_BASE_WORDS = (
    "the a to and of in it is you that for on with as this have be at or "
    "run test file spark query data index term score merge build token doc "
    "error result table join filter range match agg sort limit plan shuffle "
    "read write scan code line function class value key count time user "
    "assistant tool system please help need want make find show list get set "
    "call return check start stop open close create delete update insert"
).split()

_EDGE_TOKENS = [
    "éclair", "naïve", "über", "東京", "🚀", "café", "Ωmega", "ّversion",
    "don't", "co-op", "3.14", "x_1", "__init__", "foo@bar",
]

_PUNCT = [".", ",", "!", "?", ";", " —", ":"]

# --- per-conversation topics -------------------------------------------------
# Real transcripts are topically clustered: one conversation stays on one
# subject, so subject vocabulary is docid-local (docids are ordered by
# (conv_id, turn_idx)).  Each conversation draws a topic (Zipf over 256,
# popular topics dominate) and ~25% of its tokens come from that topic's
# 8-word sub-vocabulary (vocab ranks 600..2647 — mid-tail words whose
# background Zipf probability is tiny).  This is what makes block-max
# pruning meaningful: topical query terms concentrate in few docid
# ranges, exactly like real subjects/incidents do.
_N_TOPICS = 256
_TOPIC_WORDS = 8
_TOPIC_BASE = 600
_TOPIC_RATE = 0.25
_TOPIC_P = 1.0 / np.arange(1, _N_TOPICS + 1) ** 1.0
_TOPIC_CDF = np.cumsum(_TOPIC_P / _TOPIC_P.sum())


def topic_words(topic: int) -> list[str]:
    """The 8 subject words owned by one topic (for query construction
    in benchmarks/pruning studies)."""
    lo = _TOPIC_BASE + topic * _TOPIC_WORDS
    return _VOCAB[lo:lo + _TOPIC_WORDS].tolist()


def _build_vocab() -> list[str]:
    rng = np.random.RandomState(_VOCAB_SEED)
    words = list(_BASE_WORDS)
    syll = "ba be bi bo bu da de di do du ka ke ki ko ku la le li lo lu " \
        "ma me mi mo mu na ne ni no nu ra re ri ro ru sa se si so su " \
        "ta te ti to tu za ze zi zo zu".split()
    while len(words) < _VOCAB_SIZE:
        n = rng.randint(2, 5)
        w = "".join(rng.choice(syll) for _ in range(n))
        words.append(w)
    return words[:_VOCAB_SIZE]


_VOCAB = np.array(_build_vocab(), dtype=object)
# inverse-CDF table for Zipf sampling
_ZIPF_P = 1.0 / np.arange(1, _VOCAB_SIZE + 1) ** _ZIPF_S
_ZIPF_CDF = np.cumsum(_ZIPF_P / _ZIPF_P.sum())

_TOOLS = [
    "bash", "search", "browser", "editor", "python", "sql", "grep", "ls",
    "fetch", "compile", "deploy", "lint", "format", "diff", "patch",
    "render", "upload", "download", "notebook", "profiler",
]
# skew weights (Zipf-ish): bash/search dominate — the hot-term driver (R3)
_TOOL_SLOTS = (
    ["bash"] * 20 + ["search"] * 12 + ["browser"] * 8 + ["editor"] * 6
    + ["python"] * 5 + ["sql"] * 3 + _TOOLS[6:] * 1
)

_SPLITMIX_C1 = np.uint64(0x9E3779B97F4A7C15)
_SPLITMIX_C2 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C3 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the per-row PRNG (pure function of key)."""
    with np.errstate(over="ignore"):
        z = (x + _SPLITMIX_C1).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * _SPLITMIX_C2
        z = (z ^ (z >> np.uint64(27))) * _SPLITMIX_C3
        return z ^ (z >> np.uint64(31))


def _u01(x: np.ndarray) -> np.ndarray:
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _texts_for_keys(rkey: np.ndarray, ckey: np.ndarray) -> list[str]:
    """Vectorized text synthesis for a batch of (row key, conv key):
    Zipf token soup + the conversation topic's word overlay."""
    n = len(rkey)
    if n == 0:
        return []
    # conversation topic: Zipf over _N_TOPICS, pure function of conv key
    topic = np.searchsorted(
        _TOPIC_CDF, _u01(_splitmix64(ckey.astype(np.uint64))),
        side="left").clip(0, _N_TOPICS - 1)
    r0 = _splitmix64(rkey.astype(np.uint64))
    r1 = _splitmix64(r0)
    r2 = _splitmix64(r1)
    # doc length: 2% empty, else 4..~110 tokens with a heavy-ish tail
    base_len = 4 + (r0 % np.uint64(36)).astype(np.int64)
    tail = np.where(r1 % np.uint64(9) == 0, (r2 % np.uint64(70)).astype(np.int64), 0)
    lens = base_len + tail
    lens[_u01(r0) < 0.02] = 0
    max_len = int(lens.max()) if n else 0
    if max_len == 0:
        return [""] * n

    pos = np.arange(max_len, dtype=np.uint64)
    with np.errstate(over="ignore"):
        mat = rkey.astype(np.uint64)[:, None] * np.uint64(0x100000001B3) + pos[None, :]
    h = _splitmix64(mat)
    u = _u01(h)
    idx = np.searchsorted(_ZIPF_CDF, u, side="left").clip(0, _VOCAB_SIZE - 1)

    # topical overlay: ~25% of tokens come from the conv topic's words
    h3 = _splitmix64(mat ^ np.uint64(0xA5A5A5A5A5A5A5A5))
    tmask = _u01(h3) < _TOPIC_RATE
    tw = (_TOPIC_BASE + topic[:, None] * _TOPIC_WORDS
          + (h3 % np.uint64(_TOPIC_WORDS)).astype(np.int64))
    idx = np.where(tmask, tw, idx)
    words = _VOCAB[idx]

    # sprinkle unicode/emoji/punct edge tokens (~1.5%) + trailing punct (~8%)
    h2 = _splitmix64(h)
    u2 = _u01(h2)
    edge_mask = u2 < 0.015
    if edge_mask.any():
        edge_idx = (h2[edge_mask] % np.uint64(len(_EDGE_TOKENS))).astype(np.int64)
        words = words.copy()
        words[edge_mask] = np.array(_EDGE_TOKENS, dtype=object)[edge_idx]
    punct_mask = (u2 > 0.92)
    punct_idx = (h2 % np.uint64(len(_PUNCT))).astype(np.int64)

    out: list[str] = []
    punct_arr = np.array(_PUNCT, dtype=object)
    for i in range(n):
        ln = int(lens[i])
        if ln == 0:
            out.append("")
            continue
        ws = words[i, :ln]
        pm = punct_mask[i, :ln]
        if pm.any():
            ws = np.where(pm, ws + punct_arr[punct_idx[i, :ln]], ws)
        out.append(" ".join(ws.tolist()))
    return out


def generate_transcripts(
    spark: SparkSession,
    n_turns: int,
    seed: int = 42,
    avg_turns_per_conv: int = 20,
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcripts table with ~``n_turns`` rows.

    Everything but ``text`` is computed JVM-side from ``xxhash64`` of the
    (seed, conv, turn) identity; ``text`` is an Arrow-batched pandas UDF.
    """
    n_convs = max(1, n_turns // avg_turns_per_conv)
    if n_partitions is None:
        n_partitions = max(4, spark.sparkContext.defaultParallelism)

    convs = spark.range(0, n_convs, 1, min(n_partitions, max(1, n_convs)))
    hconv = F.xxhash64(F.lit(seed), F.lit("conv"), F.col("id"))
    # conv length 4..36 (avg ~20); conv start offset within a 7-day span
    convs = convs.select(
        F.col("id").alias("conv_seq"),
        F.format_string("conv-%08d", F.col("id")).alias("conv_id"),
        (F.lit(4) + F.pmod(hconv, F.lit(33))).cast("int").alias("conv_len"),
        F.pmod(F.xxhash64(F.lit(seed), F.lit("start"), F.col("id")),
               F.lit(7 * 24 * 3600)).alias("start_s"),
        (F.lit(5) + F.pmod(F.xxhash64(F.lit(seed), F.lit("step"), F.col("id")),
                           F.lit(240))).alias("step_s"),
    )

    turns = convs.select(
        "conv_seq", "conv_id", "start_s", "step_s",
        F.posexplode(F.sequence(F.lit(0), F.col("conv_len") - 1)).alias("pos", "turn_idx"),
    ).drop("pos")

    hturn = F.xxhash64(F.lit(seed), F.lit("turn"), F.col("conv_seq"), F.col("turn_idx"))
    role = (
        F.when((F.col("turn_idx") == 0) & (F.pmod(hturn, F.lit(10)) < 2), F.lit("system"))
        .when(F.pmod(hturn, F.lit(17)) == 0, F.lit("tool"))
        .when(F.pmod(F.col("turn_idx"), F.lit(2)) == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    tool_slots = F.array(*[F.lit(t) for t in _TOOL_SLOTS])
    htool = F.xxhash64(F.lit(seed), F.lit("tool"), F.col("conv_seq"), F.col("turn_idx"))
    tool = (
        F.when(
            role.isin("tool", "assistant") & (F.pmod(htool, F.lit(10)) < 4),
            F.element_at(tool_slots, (F.pmod(htool, F.lit(len(_TOOL_SLOTS))) + 1).cast("int")),
        ).otherwise(F.lit(None).cast("string"))
    )
    jitter = F.pmod(F.xxhash64(F.lit(seed), F.lit("jit"), F.col("conv_seq"), F.col("turn_idx")),
                    F.col("step_s"))
    base_epoch = 1748736000  # 2025-06-01T00:00:00Z
    ts = F.timestamp_seconds(
        F.lit(base_epoch) + F.col("start_s")
        + F.col("turn_idx").cast("long") * F.col("step_s") + jitter
    )

    turns = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        tool.alias("tool"),
        ts.alias("ts"),
        F.xxhash64(F.lit(seed), F.lit("text"), F.col("conv_seq"), F.col("turn_idx")).alias("_rkey"),
        F.xxhash64(F.lit(seed), F.lit("topic"), F.col("conv_seq")).alias("_ckey"),
    )

    @F.pandas_udf("string")
    def _gen_text(rkey: pd.Series, ckey: pd.Series) -> pd.Series:
        keys = rkey.to_numpy(dtype=np.int64).view(np.uint64)
        ckeys = ckey.to_numpy(dtype=np.int64).view(np.uint64)
        return pd.Series(_texts_for_keys(keys, ckeys))

    return turns.withColumn("text", _gen_text("_rkey", "_ckey")).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


def assign_docids(
    df: DataFrame,
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    out_col: str = "docid",
    n_partitions: int | None = None,
) -> DataFrame:
    """Stable global dense docid = rank over ``order_cols`` (unique keys).

    Scalable pattern (SURVEY.md §7 R4/R5): range-partition on the order
    key, count rows per partition (only P values hit the driver), cumsum
    those counts into per-partition offsets, then a parallel
    within-partition ``row_number``.  No global single-task sort; the
    docid values are independent of the partitioner's sampled boundaries
    because ranges are disjoint and ordered and the key is unique.

    The partitioned frame is ``localCheckpoint``-ed, not merely
    persisted: every action re-plans, and RangePartitioning re-SAMPLES
    its boundaries per plan — if a persisted copy were evicted, the
    offsets job and the rank job could silently see different
    partitionings (duplicate/missing docids).  Checkpointing freezes
    the partitioning; on a real cluster use ``checkpoint()`` to
    reliable storage instead.
    """
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = max(4, spark.sparkContext.defaultParallelism)
    parted = (
        df.repartitionByRange(n_partitions, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = F.broadcast(
        local_df(
            spark,
            [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    out = (
        parted.join(off_df, "_pid")
        .withColumn(out_col, (F.col("_offset") + F.row_number().over(w) - 1).cast("long"))
        .drop("_pid", "_offset")
    )
    return out
