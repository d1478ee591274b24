"""Curation ops (round 5 extra ring): decontamination vs a DuckDB
string-ngram oracle, Gopher repetition metrics vs a pure-Python
oracle, PII redaction vs DuckDB regexp replay, hash_split invariants."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.pipeline.curation import (
    PII_PATTERNS,
    decontaminate,
    hash_split,
    pii_redact,
    repetition_metrics,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .limit(300).persist())


def test_decontaminate_matches_duckdb_string_oracle(spark, docs):
    """Spark joins on xxhash64(13-gram); the oracle joins on the raw
    n-gram STRING in DuckDB — identical flag sets (hash collisions
    are ~2^-64)."""
    n = 13
    ev = docs.filter(F.col("doc_id") % 7 == 0)   # pretend benchmark
    got = (decontaminate(docs, ev, n=n).orderBy("doc_id").toPandas())

    con = duckdb.connect()
    con.execute(f"create view d as select * from "
                f"read_parquet('{SF}/documents.parquet') "
                f"order by doc_id limit 300")
    sh = f"""
      select doc_id, unnest(list_distinct(grams)) as g from (
        select doc_id,
          list_transform(
            list_slice(ts, 1, len(ts) - {n - 1}),
            (x, i) -> list_aggregate(list_slice(ts, i, i + {n - 1}),
                                     'string_agg', ' ')) as grams
        from (
          select doc_id,
            list_filter(
              regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+'),
              x -> x != '') as ts
          from d) where len(ts) >= {n})
    """
    want = con.execute(f"""
      with tr as ({sh}), ev as (
        select distinct g from ({sh}) where doc_id % 7 = 0),
      tot as (select doc_id, count(*) as ts from tr group by doc_id)
      select d.doc_id,
             coalesce(h.c, 0) as collision_count,
             coalesce(tot.ts, 0) as total_shingles,
             case when coalesce(tot.ts, 0) > 0
                  then coalesce(h.c, 0) / tot.ts else 0.0
             end as collision_frac,
             coalesce(h.c, 0) > 0 as contaminated
      from d left join (
        select tr.doc_id, count(*) as c
        from tr join ev using (g) group by tr.doc_id) h
      using (doc_id) left join tot using (doc_id) order by doc_id
    """).df()
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.collision_count) == list(want.collision_count)
    assert list(got.total_shingles) == list(want.total_shingles)
    assert np.allclose(got.collision_frac, want.collision_frac)
    assert list(got.contaminated) == list(want.contaminated)
    # the planted benchmark docs must all self-flag (len >= 13 tokens)
    flagged = set(got[got.contaminated].doc_id)
    planted = {r["doc_id"] for r in ev.collect()
               if len(r["text"].split()) >= n + 2}
    assert planted <= flagged


def test_decontaminate_clean_when_disjoint(spark):
    tr = spark.createDataFrame(
        [(1, "alpha beta gamma delta " * 10)], ["doc_id", "text"])
    ev = spark.createDataFrame(
        [(9, "completely different benchmark phrasing " * 10)],
        ["doc_id", "text"])
    out = decontaminate(tr, ev, n=13).collect()
    assert out[0]["contaminated"] is False
    # identical doc → contaminated, shuffle-join path agrees
    out2 = decontaminate(tr, tr, n=13, broadcast_eval=False).collect()
    assert out2[0]["contaminated"] is True


def _rep_oracle(text, tops=(2, 3, 4), k=5):
    """Independent reimplementation, straight from the Gopher text."""
    import re
    from collections import Counter

    def frac(units):
        if not units:
            return 0.0, 0.0
        c = Counter(units)
        dup = sum(v - 1 for v in c.values()) / len(units)
        tot = sum(len(u) for u in units)
        dupc = sum(len(u) * v for u, v in c.items() if v > 1)
        return dup, dupc / tot if tot else 0.0

    lines = [l for l in (s.strip() for s in text.split("\n")) if l]
    paras = [p for p in (s.strip() for s in text.split("\n\n")) if p]
    words = re.findall(r"\w+", text.lower(), re.UNICODE)
    tot = sum(map(len, words))
    row = [*frac(lines), *frac(paras)]
    for n in tops:
        if len(words) < n or not tot:
            row.append(0.0)
            continue
        g = Counter(tuple(words[i:i + n])
                    for i in range(len(words) - n + 1))
        top, cnt = max(g.items(), key=lambda kv: (kv[1], kv[0]))
        row.append(cnt * sum(map(len, top)) / tot)
    if len(words) < k or not tot:
        row.append(0.0)
    else:
        g = Counter(tuple(words[i:i + k])
                    for i in range(len(words) - k + 1))
        cov = set()
        for i in range(len(words) - k + 1):
            if g[tuple(words[i:i + k])] > 1:
                cov.update(range(i, i + k))
        row.append(sum(len(words[j]) for j in cov) / tot)
    return row


def test_repetition_metrics_match_oracle(spark, docs):
    got = repetition_metrics(docs).orderBy("doc_id").toPandas()
    src = docs.select("doc_id", "text").orderBy("doc_id").toPandas()
    cols = [c for c in got.columns if c != "doc_id"]
    want = np.array([_rep_oracle(t) for t in src.text])
    assert np.allclose(got[cols].to_numpy(dtype=float), want), \
        cols
    # a hand-built repeated doc hits the Gopher thresholds
    rep = spark.createDataFrame(
        [(0, "spam line\nspam line\nspam line\nunique tail")],
        ["doc_id", "text"])
    m = repetition_metrics(rep).collect()[0]
    assert m["dup_line_frac"] == pytest.approx(2 / 4)
    assert m["dup_line_char_frac"] == pytest.approx(
        27 / (27 + len("unique tail")))


def test_pii_redact_matches_duckdb(spark):
    rows = [
        (0, "mail me at jo.doe+x@corp.example.com or call 415-555-0199 now"),
        (1, "server 10.1.2.3 and card 4111 1111 1111 1111 leaked"),
        (2, "clean text, nothing to see"),
        (3, "two mails: a@b.co c@d.org; +1 (212) 555 0101"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = pii_redact(df).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.execute("create table t(doc_id int, text varchar)")
    con.executemany("insert into t values (?, ?)", rows)
    red = "text"
    sels = []
    for name, pat in PII_PATTERNS.items():
        sels.append(
            f"len(regexp_extract_all({red}, '{pat}')) as n_{name}")
        red = f"regexp_replace({red}, '{pat}', '<{name.upper()}>', 'g')"
    want = con.execute(
        f"select doc_id, {', '.join(sels)}, {red} as redacted "
        f"from t order by doc_id").df()
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c
    assert "<EMAIL>" in got.redacted[0] and "<PHONE>" in got.redacted[0]
    assert "<IPV4>" in got.redacted[1] and "<CARD>" in got.redacted[1]
    assert got.redacted[2] == rows[2][1]


def test_hash_split_deterministic_disjoint_proportional(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(docs, w).select("doc_id", "split").toPandas()
    b = (hash_split(docs.repartition(7), w)
         .select("doc_id", "split").toPandas())
    ma = dict(zip(a.doc_id, a.split))
    mb = dict(zip(b.doc_id, b.split))
    assert ma == mb                       # stable under repartition
    n = len(a)
    frac = a.split.value_counts(normalize=True)
    assert abs(frac.get("train", 0) - 0.8) < 0.1
    assert set(a.split) <= set(w)
    assert len(ma) == n                   # total, disjoint by construction
    # different seed → different assignment (almost surely)
    c = hash_split(docs, w, seed=7).select("doc_id", "split").toPandas()
    assert dict(zip(c.doc_id, c.split)) != ma
