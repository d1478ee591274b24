"""Ingest pipelines: processor-by-processor twins of the documented
behavior, plus conditional gating and the codegen plan shape."""

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.sources.ingest import apply_ingest_pipeline


@pytest.fixture()
def rows(spark):
    return spark.createDataFrame(
        [(1, "  Hello World  ", "a,b,c", 7, "1700000000000"),
         (2, None, "x", -3, "2024-03-01 12:00:00"),
         (3, "MIXED case", "", 0, None)],
        "id long, txt string, csv string, v long, when string")


def _one(df, proc):
    return apply_ingest_pipeline(df, {"processors": [proc]})


def test_set_remove_rename(rows):
    out = apply_ingest_pipeline(rows, {"processors": [
        {"set": {"field": "src", "value": "web"}},
        {"set": {"field": "txt", "copy_from": "csv",
                 "override": False}},
        {"rename": {"field": "v", "target_field": "value"}},
        {"remove": {"field": "when"}},
    ]})
    got = {r["id"]: r for r in out.collect()}
    assert got[1]["src"] == "web" and got[3]["src"] == "web"
    assert got[1]["txt"] == "  Hello World  "   # override=False keeps
    assert got[2]["txt"] == "x"                 # null filled from csv
    assert "value" in out.columns and "v" not in out.columns
    assert "when" not in out.columns
    with pytest.raises(ValueError, match="not in"):
        _one(rows, {"remove": {"field": "nope"}})
    assert "nope" not in _one(
        rows, {"remove": {"field": "nope",
                          "ignore_missing": True}}).columns
    with pytest.raises(ValueError, match="already exists"):
        _one(rows, {"rename": {"field": "v", "target_field": "id"}})


def test_string_processors(rows):
    out = apply_ingest_pipeline(rows, {"processors": [
        {"trim": {"field": "txt", "ignore_missing": False}},
        {"lowercase": {"field": "txt"}},
        {"gsub": {"field": "txt", "pattern": "\\s+",
                  "replacement": "_"}},
        {"split": {"field": "csv", "separator": ",",
                   "target_field": "parts"}},
        {"join": {"field": "parts", "separator": "|",
                  "target_field": "joined"}},
    ]})
    got = {r["id"]: r for r in out.collect()}
    assert got[1]["txt"] == "hello_world"
    assert got[1]["parts"] == ["a", "b", "c"]
    assert got[1]["joined"] == "a|b|c"
    assert got[2]["txt"] is None


def test_convert_and_date(rows):
    out = apply_ingest_pipeline(rows, {"processors": [
        {"convert": {"field": "v", "type": "double",
                     "target_field": "v_d"}},
        {"date": {"field": "when",
                  "formats": ["epoch_millis",
                              "yyyy-MM-dd HH:mm:ss"]}},
    ]})
    got = {r["id"]: r for r in out.collect()}
    assert got[1]["v_d"] == 7.0
    assert got[1]["@timestamp"] is not None     # epoch_millis branch
    assert got[2]["@timestamp"].year == 2024    # pattern branch
    assert got[3]["@timestamp"] is None
    with pytest.raises(ValueError, match="unsupported type"):
        _one(rows, {"convert": {"field": "v", "type": "ip"}})
    # failed convert: ANSI cast raises; ignore_failure -> null
    bad = _one(rows, {"convert": {"field": "txt", "type": "long",
                                  "ignore_failure": True}})
    assert {r["txt"] for r in bad.collect()} == {None}


def test_append_drop_script_and_if(rows):
    out = apply_ingest_pipeline(rows, {"processors": [
        {"append": {"field": "tags", "value": ["t1", "t1"],
                    "allow_duplicates": False}},
        {"drop": {"if": "doc['v'].value < 0"}},
        {"script": {"source": "ctx._source.v = ctx._source.v * 10"}},
        {"set": {"field": "big", "value": "yes",
                 "if": "doc['v'].value >= 70"}},
    ]})
    got = {r["id"]: r for r in out.collect()}
    assert set(got) == {1, 3}               # id 2 dropped (v = -3)
    assert got[1]["tags"] == ["t1"]
    assert got[1]["v"] == 70 and got[3]["v"] == 0
    assert got[1]["big"] == "yes" and got[3]["big"] is None
    with pytest.raises(ValueError, match="'if' condition"):
        _one(rows, {"drop": {}})


def test_rejections_and_plan(rows):
    with pytest.raises(ValueError, match="unsupported ingest"):
        _one(rows, {"grok": {"field": "txt", "patterns": []}})
    with pytest.raises(ValueError, match="on_failure"):
        _one(rows, {"set": {"field": "a", "value": 1,
                            "on_failure": [{"set": {}}]}})
    with pytest.raises(ValueError, match="processors"):
        apply_ingest_pipeline(rows, {"description": "x"})
    # full pipeline stays one codegen project chain — no shuffle/UDF
    out = apply_ingest_pipeline(rows, {"processors": [
        {"set": {"field": "src", "value": "web"}},
        {"lowercase": {"field": "txt", "ignore_missing": False}},
        {"convert": {"field": "v", "type": "double"}},
        {"drop": {"if": "doc['v'].value < 0"}},
    ]})
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_reindex_with_pipeline(spark, tmp_path):
    import pyspark.sql.functions as F

    from anomaly_detection_spark.sources import reindex

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, None)], "id long, t string"
    ).write.parquet(src)
    n = reindex(spark, src, dst, pipeline={"processors": [
        {"lowercase": {"field": "t", "ignore_missing": False}},
        {"set": {"field": "ingested", "value": True}},
    ]})
    assert n == 3
    got = {r["id"]: r for r in spark.read.parquet(dst).collect()}
    assert got[1]["t"] == "a" and got[1]["ingested"] is True
    assert got[3]["t"] is None


def test_conditional_target_semantics(rows):
    # gsub with 'if' + target_field: non-matching rows get NULL in the
    # target, never the unprocessed source value
    out = _one(rows, {"gsub": {"field": "csv", "pattern": ",",
                               "replacement": ";",
                               "target_field": "clean",
                               "if": "doc['v'].value > 0"}})
    got = {r["id"]: r["clean"] for r in out.collect()}
    assert got[1] == "a;b;c" and got[2] is None and got[3] is None
    # type-changing processors refuse in-place row gating by name
    for proc in (
        {"split": {"field": "csv", "separator": ",",
                   "if": "doc['v'].value > 0"}},
        {"convert": {"field": "v", "type": "double",
                     "if": "doc['v'].value > 0"}},
    ):
        with pytest.raises(ValueError, match="type-changing"):
            _one(rows, proc)
    # ...but work with a fresh target
    ok = _one(rows, {"convert": {"field": "v", "type": "double",
                                 "target_field": "vd",
                                 "if": "doc['v'].value > 0"}})
    got = {r["id"]: r["vd"] for r in ok.collect()}
    assert got[1] == 7.0 and got[2] is None
    with pytest.raises(ValueError, match="rename processor"):
        _one(rows, {"rename": {"field": "v", "target_field": "w",
                               "if": "doc['v'].value > 0"}})


def test_script_literals_and_params_survive_rewrites(rows):
    from anomaly_detection_spark.query.compound import (
        compile_filter_script)

    df = rows.withColumn("tag", F.lit("a&&b"))
    # a literal containing && / == must not be rewritten
    n = df.filter(compile_filter_script(
        "doc['tag'].value == 'a&&b'", {}, set(df.columns))).count()
    assert n == df.count()
    # backslash-bearing string params survive substitution
    df2 = rows.withColumn("path", F.lit("dir\\name"))
    n2 = df2.filter(compile_filter_script(
        "doc['path'].value == params.p", {"p": "dir\\name"},
        set(df2.columns))).count()
    assert n2 == df2.count()
