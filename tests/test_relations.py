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


def test_children_agg(frames):
    from anomaly_detection_spark.query.relations import children_agg

    parents, children = frames
    # per parent queue: child turn counts + max child turn_idx
    rows = {r["queue"]: r for r in children_agg(
        parents, children, terms_field="queue",
        sub_specs={"max_turn": {"max": {"field": "turn_idx"}}}
    ).collect()}
    # support = c1 (2 turns) + c3 (1 turn); sales = c2 (3 turns)
    assert rows["support"]["doc_count"] == 3
    assert rows["support"]["max_turn"] == 1
    assert rows["sales"]["doc_count"] == 3
    assert rows["sales"]["max_turn"] == 2
    # parent query narrows scope before the context switch
    rows = children_agg(parents, children,
                        query={"term": {"queue": "sales"}}).collect()
    assert rows[0]["doc_count"] == 3
    # duplicate parent rows must not multiply children
    dup = parents.union(parents)
    rows = {r["queue"]: r["doc_count"] for r in children_agg(
        dup, children, terms_field="queue").collect()}
    assert rows == {"support": 3, "sales": 3}


def test_parent_agg(frames):
    from anomaly_detection_spark.query.relations import parent_agg

    parents, children = frames
    # per child role: distinct parents with >=1 such child
    rows = {r["role"]: r["doc_count"] for r in parent_agg(
        children, parents, terms_field="role").collect()}
    # user turns exist in c1,c2,c3; tool turns in c1,c2
    assert rows == {"user": 3, "tool": 2}
    # a parent with many children in one bucket counts ONCE
    q = {"match": {"text": "error"}}
    rows = parent_agg(children, parents, query=q).collect()
    assert rows[0]["doc_count"] == 2  # c1, c2 (c2 has two matches)
