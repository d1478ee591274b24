"""B7: composite-aggregation source computed from a script — entity
attribute extraction out of a nested ``_source`` field.

The reference's top-anomalies path groups results by an entity value it
pulls from the nested ``entity`` array with a painless script
(``SearchTopAnomalyResultTransportAction.java:509-514``; the script
itself is built in ``QueryUtil.java:23-45``:
``doc[entity].filter(e -> e.name == category)[0].value``).  The Spark
restatement is a pure array expression — whole-stage-codegen'd, no UDF
— usable directly as a groupBy key (composite source).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def entity_value(entity_col: Column | str, name: str) -> Column:
    """Value of the named attribute inside an
    ``array<struct<name,value>>`` entity column; null when absent.

    Equivalent painless: ``params._source.entity.stream()
    .filter(e -> e.name == name).findFirst().value`` — here:
    ``element_at(filter(entity, e -> e.name == name), 1).value``.
    """
    col = F.col(entity_col) if isinstance(entity_col, str) else entity_col
    hits = F.filter(col, lambda e: e["name"] == F.lit(name))
    return F.element_at(hits, 1)["value"]


def with_entity(df, attrs: dict[str, Column | str]):
    """Pack named columns into the reference's nested entity shape:
    ``array<struct<name,value>>`` (anomaly-results.json mapping: entity
    is a nested list of name/value pairs)."""
    structs = [
        F.struct(F.lit(n).alias("name"),
                 (F.col(c) if isinstance(c, str) else c)
                 .cast("string").alias("value"))
        for n, c in attrs.items()
    ]
    return df.withColumn("entity", F.array(*structs))
