"""Filtered aliases: registry CRUD, filtered resolution composing with
caller queries, write-through with is_write_index semantics."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.sources.aliases import (
    delete_alias, get_aliases, put_alias, resolve_alias,
    write_through_alias)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def reg(tmp_path):
    return str(tmp_path / "aliases.json")


def test_alias_crud_and_filtered_resolution(spark, reg):
    put_alias(reg, "events_small",
              f"{SF}/events.parquet",
              filter_query={"range": {"value": {"lt": 10}}},
              spark=spark)
    got = resolve_alias(spark, reg, "events_small")
    raw = spark.read.parquet(f"{SF}/events.parquet")
    assert got.count() == raw.filter(F.col("value") < 10).count()
    # caller query stacks on top of the alias filter (AND)
    stacked = got.filter(F.col("value") >= 5).count()
    assert stacked == raw.filter((F.col("value") < 10)
                                 & (F.col("value") >= 5)).count()
    # registry introspection + delete
    assert "events_small" in get_aliases(reg)
    delete_alias(reg, "events_small")
    with pytest.raises(KeyError):
        resolve_alias(spark, reg, "events_small")
    with pytest.raises(KeyError):
        delete_alias(reg, "events_small")


def test_alias_union_and_validation(spark, reg):
    # multi-member alias unions by name
    put_alias(reg, "both", [f"{SF}/events.parquet",
                            f"{SF}/events.parquet"])
    raw_n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert resolve_alias(spark, reg, "both").count() == 2 * raw_n
    # a bad filter fails at PUT time when spark is passed
    with pytest.raises(Exception):
        put_alias(reg, "bad", f"{SF}/events.parquet",
                  filter_query={"not_a_query": {}}, spark=spark)
    assert "bad" not in get_aliases(reg)
    with pytest.raises(ValueError, match="at least one"):
        put_alias(reg, "empty", [])


def test_write_through_alias(spark, reg, tmp_path):
    a = str(tmp_path / "a"); b = str(tmp_path / "b")
    df = spark.range(5).select(F.col("id").alias("v"))
    df.write.parquet(a)
    df.write.parquet(b)
    put_alias(reg, "rw", [a, b], write_table_ident=a)
    write_through_alias(df, reg, "rw")
    assert spark.read.parquet(a).count() == 10   # write went to a only
    assert spark.read.parquet(b).count() == 5
    assert resolve_alias(spark, reg, "rw").count() == 15
    # no write table → the reference's error shape
    put_alias(reg, "ro", [a, b])
    with pytest.raises(ValueError, match="no write table"):
        write_through_alias(df, reg, "ro")
    # write table must be a member
    with pytest.raises(ValueError, match="member"):
        put_alias(reg, "bad_w", [a], write_table_ident=b)


def test_rollover_alias(spark, tmp_path):
    from anomaly_detection_spark.sources.aliases import (
        get_aliases, put_alias, resolve_alias, rollover_alias,
        write_through_alias)

    reg = str(tmp_path / "reg.json")
    t1 = str(tmp_path / "logs-000001")
    spark.createDataFrame([(i, f"m{i}") for i in range(10)],
                          "id long, msg string").write.parquet(t1)
    put_alias(reg, "logs", [t1], write_table_ident=t1)

    # condition not met: no rollover
    r = rollover_alias(spark, reg, "logs",
                       conditions={"max_docs": 100})
    assert r == {"rolled_over": False,
                 "conditions": {"max_docs": False},
                 "old": t1, "new": None}

    # condition met: new generation, write table switches, old stays
    r = rollover_alias(spark, reg, "logs",
                       conditions={"max_docs": 10})
    assert r["rolled_over"] and r["conditions"]["max_docs"]
    t2 = r["new"]
    assert t2.endswith("logs-000002")
    spec = get_aliases(reg)["logs"]
    assert spec["write_table"] == t2 and t1 in spec["tables"]
    # reads still see everything; writes land in the new generation
    assert resolve_alias(spark, reg, "logs").count() == 10
    df = spark.createDataFrame([(99, "new")], "id long, msg string")
    write_through_alias(df, reg, "logs")
    assert resolve_alias(spark, reg, "logs").count() == 11
    assert spark.read.parquet(t2).count() == 1
    assert spark.read.parquet(t1).count() == 10

    # unconditional rollover increments the generation again
    r3 = rollover_alias(spark, reg, "logs")
    assert r3["rolled_over"] and r3["new"].endswith("logs-000003")
    with pytest.raises(ValueError, match="unsupported rollover"):
        rollover_alias(spark, reg, "logs",
                       conditions={"max_age": "7d"})
