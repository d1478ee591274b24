"""Q10 completed: an arbitrary OpenSearch search body (``query`` +
``aggs`` JSON) compiled to DataFrames.

The plugin builds its feature/preview/top-anomaly requests as search
bodies — a filter query plus named aggregations with metric sub-aggs
(``ParseUtils.java``, ``AnomalyDetector.generateFeatureQuery``); users
write the same JSON in detector configs.  This module accepts that
shape directly:

    run_aggs(df, {
      "query": {"term": {"event_type": "error"}},
      "aggs": {
        "per_hour": {
          "date_histogram": {"field": "ts", "fixed_interval": "1h",
                              "min_doc_count": 1},
          "aggs": {"v_avg": {"avg": {"field": "value"}},
                   "diff": {"serial_diff": {"buckets_path": "v_avg"}}}},
        "top_users": {"terms": {"field": "user_id", "size": 5},
                      "aggs": {"v_max": {"max": {"field": "value"}}}},
        "n": {"value_count": {"field": "event_id"}}}})
    → {"per_hour": DataFrame, "top_users": DataFrame, "n": DataFrame}

Supported bucket aggs: date_histogram (fixed_interval, min_doc_count,
hard_bounds), auto_date_histogram, date_range, terms (size), composite
(terms sources, entity-script sources via ``entity_value``), filter;
metric aggs:
max/min/avg/sum/value_count/cardinality/percentiles; pipeline aggs
inside a bucket agg: serial_diff, min_bucket, bucket_sort.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .aggs import (
    auto_date_histogram,
    bucket_sort,
    composite_agg,
    date_histogram,
    date_range_agg,
    filter_agg,
    metric_agg_column,
    min_bucket,
    serial_diff,
    terms_agg,
)
from .planner import compile_filter

_METRIC_KINDS = {"max", "min", "avg", "sum", "value_count", "cardinality",
                 "percentiles"}
_PIPELINE_KINDS = {"serial_diff", "min_bucket", "bucket_sort"}

_DUR_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}


def interval_ms(spec: str | int) -> int:
    """OpenSearch fixed_interval duration string → milliseconds."""
    if isinstance(spec, int):
        return spec
    m = re.fullmatch(r"(\d+)(ms|s|m|h|d)", spec.strip())
    if not m:
        raise ValueError(f"unsupported fixed_interval {spec!r}")
    return int(m.group(1)) * _DUR_MS[m.group(2)]


# Calendar intervals that are fixed-width in a UTC session (the engine
# pins UTC): second/minute/hour/day.  week/month/quarter/year are
# anchor-dependent in OpenSearch (weeks start Monday; months vary) and
# would bucket differently than any fixed grid — fail fast instead of
# silently producing the wrong buckets.
_CAL_FIXED = {"second": "1s", "1s": "1s", "minute": "1m", "1m": "1m",
              "hour": "1h", "1h": "1h", "day": "1d", "1d": "1d"}


def _dh_interval_ms(kbody: dict[str, Any]) -> int:
    """date_histogram interval keys → fixed milliseconds, fail-fast."""
    if "fixed_interval" in kbody:
        return interval_ms(kbody["fixed_interval"])
    if "calendar_interval" in kbody:
        cal = str(kbody["calendar_interval"])
        if cal in _CAL_FIXED:
            return interval_ms(_CAL_FIXED[cal])
        raise ValueError(
            f"calendar_interval {cal!r} is not fixed-width; only "
            f"{sorted(set(_CAL_FIXED))} map to a fixed grid (the plugin "
            "itself uses fixed intervals, AggregationPrep.java:304-311)")
    if "interval" in kbody:  # legacy pre-7.x key, fixed semantics
        return interval_ms(kbody["interval"])
    raise ValueError(
        "date_histogram requires fixed_interval (or a fixed-width "
        "calendar_interval); refusing to default silently")


def _split(spec: dict[str, Any]) -> tuple[str, dict, dict, dict]:
    """One named agg body → (kind, body, metric sub-aggs, pipeline aggs)."""
    sub = dict(spec.get("aggs") or {})
    kinds = [k for k in spec if k != "aggs"]
    if len(kinds) != 1:
        raise ValueError(f"agg needs exactly one type, got {kinds}")
    kind = kinds[0]
    metrics = {n: s for n, s in sub.items()
               if next(iter(s)) in _METRIC_KINDS}
    pipes = {n: s for n, s in sub.items()
             if next(iter(s)) in _PIPELINE_KINDS}
    unknown = set(sub) - set(metrics) - set(pipes)
    if unknown:
        raise ValueError(f"unsupported sub-aggs: {sorted(unknown)}")
    return kind, spec[kind], metrics, pipes


def _apply_pipes(out: DataFrame, pipes: dict[str, dict],
                 order_col: str) -> DataFrame:
    for name, spec in pipes.items():
        (pk, pb), = spec.items()
        if pk == "serial_diff":
            out = serial_diff(out, pb["buckets_path"], order_col,
                              lag=pb.get("lag", 1), alias=name)
        elif pk == "min_bucket":
            out = min_bucket(out, pb["buckets_path"])
        elif pk == "bucket_sort":
            sort = [(list(s)[0], s[list(s)[0]].get("order", "asc"))
                    for s in pb.get("sort", [])]
            out = bucket_sort(out, sort or [(order_col, "asc")],
                              from_=pb.get("from", 0), size=pb.get("size"))
    return out


def run_aggs(df: DataFrame, body: dict[str, Any]) -> dict[str, DataFrame]:
    """Compile a search body's ``aggs`` over the (query-filtered) frame."""
    query = body.get("query")
    if query:
        df = df.filter(compile_filter(df, query))
    results: dict[str, DataFrame] = {}
    for name, spec in (body.get("aggs") or {}).items():
        kind, kbody, metrics, pipes = _split(spec)
        if kind in _METRIC_KINDS:
            results[name] = df.agg(metric_agg_column({kind: kbody}, name))
            continue
        if kind == "filter":
            results[name] = filter_agg(df, compile_filter(df, kbody), metrics)
            continue
        if kind == "terms":
            results[name] = terms_agg(df, kbody["field"],
                                      size=kbody.get("size", 10),
                                      sub_specs=metrics)
            continue
        if kind == "date_histogram":
            out = date_histogram(
                df, kbody["field"], _dh_interval_ms(kbody),
                sub_specs=metrics,
                min_doc_count=kbody.get("min_doc_count", 0),
                hard_bounds=(
                    (kbody["hard_bounds"]["min"], kbody["hard_bounds"]["max"])
                    if "hard_bounds" in kbody else None))
            results[name] = _apply_pipes(out, pipes, "bucket_start")
            continue
        if kind == "auto_date_histogram":
            out = auto_date_histogram(df, kbody["field"],
                                      kbody.get("buckets", 10),
                                      sub_specs=metrics)
            results[name] = _apply_pipes(out, pipes, "bucket_start")
            continue
        if kind == "date_range":
            ranges = [(int(r["from"]), int(r["to"]))
                      for r in kbody["ranges"]]
            results[name] = date_range_agg(df, kbody["field"], ranges,
                                           sub_specs=metrics)
            continue
        if kind == "composite":
            sources = []
            for src in kbody.get("sources", []):
                (sname, sspec), = src.items()
                if "terms" in sspec:
                    t = sspec["terms"]
                    if "field" in t:
                        sources.append(F.col(t["field"]).alias(sname))
                    elif "script" in t:
                        # the plugin's entity-extraction script source
                        # (QueryUtil.java:23-45) — field;category form
                        from ..functions.entity import entity_value
                        fld, cat = t["script"]["params"]["field"], \
                            t["script"]["params"]["category"]
                        sources.append(entity_value(fld, cat).alias(sname))
                    else:
                        raise ValueError(f"unsupported source {sspec}")
                else:
                    raise ValueError(f"unsupported source {sspec}")
            results[name] = composite_agg(df, sources, sub_specs=metrics)
            continue
        raise ValueError(f"unsupported aggregation kind {kind!r}")
    return results
