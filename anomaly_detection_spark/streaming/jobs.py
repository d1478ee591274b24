"""Structured Streaming equivalent of the plugin's real-time detection
cadence (SURVEY.md §2.7).

Reference mapping:
- ``detection_interval`` job cadence (``JobProcessor.java:214-289``)
  → tumbling event-time window of the same length.
- ``window_delay`` — the plugin queries
  ``[now - delay - interval, now - delay)`` to let late data arrive
  (``Config.java:101``) → ``withWatermark(ts, delay)``.
- per-entity feature vectors per interval
  (``CompositeRetriever.java:154-183``) → window+entity groupBy with
  the same metric agg dispatch as the batch path.

The result stream appends one row per (entity, window) once the
watermark passes — exactly when the plugin's delayed query would have
run for that interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..query.aggs import metric_agg_column


def realtime_feature_stream(
    events: DataFrame,
    ts_col: str,
    interval: str,
    window_delay: str,
    feature_specs: dict[str, dict],
    entity_cols: tuple[str, ...] = (),
) -> DataFrame:
    """events (streaming DF) → per-(entity, interval window) feature rows.

    ``interval`` / ``window_delay`` are Spark duration strings
    (e.g. "10 minutes", "1 minute").
    """
    aggs = [metric_agg_column(s, a) for a, s in feature_specs.items()]
    return (
        events
        .withWatermark(ts_col, window_delay)
        .groupBy(F.window(F.col(ts_col), interval).alias("w"), *entity_cols)
        .agg(F.count("*").alias("doc_count"), *aggs)
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                *entity_cols, "doc_count",
                *[F.col(a) for a in feature_specs])
    )
