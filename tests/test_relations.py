"""has_child / has_parent / conversation_filter vs pandas replay."""

import pytest

from anomaly_detection_spark.query.relations import (
    conversation_filter, has_child, has_parent)


@pytest.fixture(scope="module")
def frames(spark):
    parents = spark.createDataFrame(
        [("c1", "support"), ("c2", "sales"), ("c3", "support")],
        ["conv_id", "queue"])
    children = spark.createDataFrame(
        [("c1", 0, "user", "hello"), ("c1", 1, "tool", "error boom"),
         ("c2", 0, "user", "buy stuff"), ("c2", 1, "tool", "error"),
         ("c2", 2, "tool", "error again"), ("c3", 0, "user", "fine")],
        ["conv_id", "turn_idx", "role", "text"])
    return parents.persist(), children.persist()


def test_has_child_counts(frames):
    parents, children = frames
    q = {"match": {"text": "error"}}
    got = sorted(r["conv_id"] for r in
                 has_child(parents, children, q).collect())
    assert got == ["c1", "c2"]
    # min_children=2: only c2 has two matching turns
    got = sorted(r["conv_id"] for r in
                 has_child(parents, children, q,
                           min_children=2).collect())
    assert got == ["c2"]
    # max_children=1 excludes c2
    got = sorted(r["conv_id"] for r in
                 has_child(parents, children, q,
                           max_children=1).collect())
    assert got == ["c1"]


def test_has_parent_and_conversation_filter(frames):
    parents, children = frames
    got = sorted((r["conv_id"], r["turn_idx"]) for r in
                 has_parent(children, parents,
                            {"term": {"queue": "support"}}).collect())
    assert got == [("c1", 0), ("c1", 1), ("c3", 0)]
    conv = sorted((r["conv_id"], r["turn_idx"]) for r in
                  conversation_filter(
                      children, {"match": {"text": "error"}}).collect())
    assert conv == [("c1", 0), ("c1", 1), ("c2", 0), ("c2", 1),
                    ("c2", 2)]
