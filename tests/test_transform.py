"""transform jobs: incremental rollup ≡ one-shot full aggregation,
crash-safe state, non-mergeable rejection."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.sources.transform import (
    transform_read, transform_run)

BODY = {
    "pivot": {
        "group_by": [
            {"terms": {"field": "role"}},
            {"date_histogram": {"field": "ts",
                                "fixed_interval": "1h",
                                "target_field": "hour"}},
        ],
        "aggregations": {
            "v_sum": {"sum": {"field": "v"}},
            "v_min": {"min": {"field": "v"}},
            "v_max": {"max": {"field": "v"}},
            "v_avg": {"avg": {"field": "v"}},
            "v_n": {"value_count": {"field": "v"}},
        },
    },
    "cursor_field": "ts",
}


def _mk(spark, lo, hi):
    base = dt.datetime(2025, 1, 1)
    rows = [(f"r{i % 3}", base + dt.timedelta(minutes=7 * i),
             float(i % 11)) for i in range(lo, hi)]
    return spark.createDataFrame(rows, "role string, ts timestamp, v double")


def _collect(spark, dest):
    out = transform_read(spark, dest, BODY)
    return sorted((r["role"], str(r["hour"]), r["_docs"], r["v_sum"],
                   r["v_min"], r["v_max"], round(r["v_avg"], 9),
                   r["v_n"]) for r in out.collect())


def test_incremental_equals_full(spark, tmp_path):
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    # three incremental runs over a growing table
    for hi in (100, 250, 400):
        transform_run(spark, _mk(spark, 0, hi), inc, BODY)
    # one-shot over everything (fresh dest)
    transform_run(spark, _mk(spark, 0, 400), full, BODY)
    assert _collect(spark, inc) == _collect(spark, full)
    # no-new-data run is a no-op on the summary
    st = transform_run(spark, _mk(spark, 0, 400), inc, BODY)
    assert st["runs"] == 4
    assert _collect(spark, inc) == _collect(spark, full)


def test_cursor_skips_old_rows_and_state(spark, tmp_path):
    dest = str(tmp_path / "t")
    st1 = transform_run(spark, _mk(spark, 0, 50), dest, BODY)
    assert st1["cursor"] is not None and st1["runs"] == 1
    before = _collect(spark, dest)
    # a second run over the SAME data adds nothing (all rows ≤ cursor)
    transform_run(spark, _mk(spark, 0, 50), dest, BODY)
    assert _collect(spark, dest) == before


def test_body_change_and_nonmergeable_reject(spark, tmp_path):
    dest = str(tmp_path / "t")
    transform_run(spark, _mk(spark, 0, 20), dest, BODY)
    other = {**BODY, "pivot": {
        "group_by": [{"terms": {"field": "role"}}],
        "aggregations": {"v_sum": {"sum": {"field": "v"}}}}}
    with pytest.raises(ValueError, match="body changed"):
        transform_run(spark, _mk(spark, 0, 30), dest, other)
    bad = {"pivot": {"group_by": [{"terms": {"field": "role"}}],
                     "aggregations": {
                         "p": {"percentiles": {"field": "v"}}}}}
    with pytest.raises(ValueError, match="not mergeable"):
        transform_run(spark, _mk(spark, 0, 10),
                      str(tmp_path / "bad"), bad)
    with pytest.raises(ValueError, match="group_by"):
        transform_run(spark, _mk(spark, 0, 10), str(tmp_path / "bad2"),
                      {"pivot": {"group_by": [
                          {"geotile_grid": {"field": "role"}}],
                          "aggregations": {}}})


def test_null_group_keys_merge_nullsafe(spark, tmp_path):
    dest = str(tmp_path / "n")
    body = {"pivot": {"group_by": [{"terms": {"field": "role"}}],
                      "aggregations": {
                          "v_sum": {"sum": {"field": "v"}}}},
            "cursor_field": "ts"}
    df1 = spark.createDataFrame(
        [(None, dt.datetime(2025, 1, 1), 1.0),
         ("a", dt.datetime(2025, 1, 1), 2.0)],
        "role string, ts timestamp, v double")
    df2 = spark.createDataFrame(
        [(None, dt.datetime(2025, 1, 2), 10.0)],
        "role string, ts timestamp, v double")
    transform_run(spark, df1, dest, body)
    transform_run(spark, df1.union(df2), dest, body)
    rows = {r["role"]: (r["_docs"], r["v_sum"]) for r in
            transform_read(spark, dest, body).collect()}
    # exactly ONE null-group row, with both runs' contributions merged
    assert len(rows) == 2
    assert rows[None] == (2, 11.0) and rows["a"] == (1, 2.0)


def test_crash_between_write_and_commit_is_a_clean_retry(spark,
                                                         tmp_path):
    import json as _json
    import os

    dest = str(tmp_path / "c")
    transform_run(spark, _mk(spark, 0, 100), dest, BODY)
    committed = _collect(spark, dest)
    with open(os.path.join(dest, "_transform.json")) as f:
        state_before = _json.load(f)

    # simulate a crash AFTER the new summary was written but BEFORE
    # the state commit: an orphan summary_v2 exists, state still v1
    import shutil
    shutil.copytree(os.path.join(dest, "summary_v1"),
                    os.path.join(dest, "summary_v2"))
    assert _collect(spark, dest) == committed       # reads are v1
    # the retry overwrites the orphan and commits normally
    transform_run(spark, _mk(spark, 0, 150), dest, BODY)
    full = str(tmp_path / "full")
    transform_run(spark, _mk(spark, 0, 150), full, BODY)
    assert _collect(spark, dest) == _collect(spark, full)
    with open(os.path.join(dest, "_transform.json")) as f:
        assert _json.load(f)["version"] == state_before["version"] + 1
    # old versions were garbage-collected
    assert sorted(d for d in os.listdir(dest)
                  if d.startswith("summary_v")) == ["summary_v2"]


def test_rollup_aggs_rebucket_equals_direct(spark, tmp_path):
    from anomaly_detection_spark.sources.transform import rollup_aggs

    dest = str(tmp_path / "r")
    df = _mk(spark, 0, 300)
    transform_run(spark, df, dest, BODY)
    # re-bucket the hourly rollup to 3h, by role — compare against a
    # direct aggregation of the raw rows
    got = rollup_aggs(spark, dest, BODY, {
        "group_by": [
            {"terms": {"field": "role"}},
            {"date_histogram": {"field": "ts",
                                "fixed_interval": "3h",
                                "target_field": "h3"}}],
        "aggregations": {
            "s": {"sum": {"field": "v"}},
            "mn": {"min": {"field": "v"}},
            "mx": {"max": {"field": "v"}},
            "a": {"avg": {"field": "v"}},
            "n": {"value_count": {"field": "v"}}},
    })
    want = (df.groupBy(
        F.col("role"),
        F.timestamp_millis((F.floor(F.unix_millis("ts") / 10_800_000)
                            * 10_800_000).cast("long")).alias("h3"))
        .agg(F.count("*").alias("doc_count"), F.sum("v").alias("s"),
             F.min("v").alias("mn"), F.max("v").alias("mx"),
             F.avg("v").alias("a"), F.count("v").alias("n")))
    g = sorted((r["role"], str(r["h3"]), r["doc_count"], r["s"],
                r["mn"], r["mx"], round(r["a"], 9), r["n"])
               for r in got.collect())
    w = sorted((r["role"], str(r["h3"]), r["doc_count"], r["s"],
                r["mn"], r["mx"], round(r["a"], 9), r["n"])
               for r in want.collect())
    assert g == w and g
    # a subset grouping (drop the date dimension) also works
    by_role = rollup_aggs(spark, dest, BODY, {
        "group_by": [{"terms": {"field": "role"}}],
        "aggregations": {"s": {"sum": {"field": "v"}}}})
    direct = {r["role"]: r["s"] for r in
              df.groupBy("role").agg(F.sum("v").alias("s")).collect()}
    assert {r["role"]: r["s"] for r in by_role.collect()} == direct
    # rejections: finer interval, unknown carrier
    import pytest as _pt
    with _pt.raises(ValueError, match="multiple"):
        rollup_aggs(spark, dest, BODY, {"group_by": [
            {"date_histogram": {"field": "ts",
                                "fixed_interval": "30m"}}]})
    with _pt.raises(ValueError, match="carrier"):
        rollup_aggs(spark, dest, BODY, {
            "group_by": [{"terms": {"field": "role"}}],
            "aggregations": {"x": {"sum": {"field": "nope"}}}})
