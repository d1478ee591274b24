"""Search templates (mustache subset) and point-in-time snapshots."""

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.query.api import (PointInTime,
                                               open_point_in_time,
                                               render_template,
                                               search_template)


def test_render_template_vars_and_defaults():
    tpl = ('{"query": {"match": {"text": "{{q}}"}}, '
           '"size": {{size}}{{^size}}10{{/size}}}')
    body = render_template(tpl, {"q": "hello world", "size": 3})
    assert body == {"query": {"match": {"text": "hello world"}},
                    "size": 3}
    body = render_template(tpl, {"q": "hi"})
    assert body["size"] == 10


def test_render_template_tojson_and_sections():
    tpl = ('{"query": {"bool": {"filter": [{"terms": {"grp": '
           '{{#toJson}}grps{{/toJson}}}}'
           '{{#role}}, {"term": {"role": "{{role}}"}}{{/role}}]}}}')
    body = render_template(tpl, {"grps": [1, 2, 3], "role": "user"})
    assert body["query"]["bool"]["filter"] == [
        {"terms": {"grp": [1, 2, 3]}}, {"term": {"role": "user"}}]
    body = render_template(tpl, {"grps": [4]})
    assert body["query"]["bool"]["filter"] == [{"terms": {"grp": [4]}}]


def test_render_template_rejections():
    with pytest.raises(ValueError, match="toJson param"):
        render_template('{"a": {{#toJson}}x{{/toJson}}}', {})
    with pytest.raises(ValueError, match="list iteration"):
        render_template('{{#xs}}{{.}}{{/xs}}', {"xs": [1]})
    with pytest.raises(ValueError, match="structured"):
        render_template('{"a": "{{x}}"}', {"x": {"y": 1}})
    with pytest.raises(ValueError, match="not valid JSON"):
        render_template('{"a": {{missing}}}', {})


def test_search_template_end_to_end(spark):
    df = spark.createDataFrame(
        [(0, "user", "the quick fox"), (1, "tool", "lazy dog"),
         (2, "user", "quick brown")],
        "docid long, role string, text string")
    tpl = ('{"query": {"bool": {"filter": ['
           '{"term": {"role": "{{role}}"}}]}}, "size": 10}')
    got = search_template(df, tpl, {"role": "user"})
    assert got.count() == 2


def test_point_in_time_snapshot_isolation(spark, tmp_path):
    from anomaly_detection_spark.sources import (delete_by_query,
                                                 load_table)

    src = str(tmp_path / "pit.parquet")
    spark.range(20).select(F.col("id").alias("docid"),
                           (F.col("id") % 2).alias("grp")) \
        .write.parquet(src)
    pit = open_point_in_time(load_table(spark, src))
    assert isinstance(pit, PointInTime)
    n = delete_by_query(spark, src, {"term": {"grp": 1}})
    assert n == 10
    # fresh read sees the delete; the PIT does not
    assert load_table(spark, src).count() == 10
    assert pit.df.count() == 20
    got = pit.search({"query": {"term": {"grp": 1}}, "size": 100})
    assert got.count() == 10
    pit.close()
    with pytest.raises(ValueError, match="closed"):
        pit.search({"query": {"match_all": {}}})


def test_msearch_template(tiny_transcripts):
    from anomaly_detection_spark.query.api import (msearch_template,
                                                   search_template)

    tpl = {"query": {"term": {"role": "{{r}}"}}, "size": 10_000}
    import json as _json
    src = _json.dumps(tpl).replace('"{{r}}"', '"{{r}}"')
    outs = msearch_template(tiny_transcripts, [
        {"source": src, "params": {"r": "user"}},
        {"template": src, "params": {"r": "assistant"}},
    ])
    a = search_template(tiny_transcripts, src, {"r": "user"})
    assert sorted(r["docid"] for r in outs[0].collect()) \
        == sorted(r["docid"] for r in a.collect())
    roles = {r["role"] for r in outs[1].collect()}
    assert roles == {"assistant"}
    import pytest as _pt
    with _pt.raises(ValueError, match="source"):
        msearch_template(tiny_transcripts, [{"params": {}}])
