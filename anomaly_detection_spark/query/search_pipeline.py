"""Search pipelines: the ``_search/pipeline`` processor chains —
request processors rewrite the body BEFORE planning, response
processors reshape the hit frame AFTER, so the whole pipeline adds
zero execution paths (it composes ``search`` with body rewrites and
narrow DataFrame ops).

Reference surface: the search-pipelines feature (PUT
``_search/pipeline`` + ``?search_pipeline=``).  Implemented processor
subset:

request: ``filter_query`` (AND a filter into the query — the
documented use), ``oversample`` (``sample_factor`` × size, with the
original size stashed for truncate_hits), ``script`` REJECTED by name
(request mutation in painless is out of subset).

response: ``truncate_hits`` (``target_size``, defaulting to the
oversample-stashed original — the documented oversample/rerank/
truncate recipe), ``rename_field``, ``sort`` (re-sort hits by a field
or ``_score``), ``collapse`` (keep the best hit per field value,
response-level — the documented "collapse similar hits after
oversample" recipe).

The normalization processor (hybrid search) is ``query.hybrid`` —
referenced here for completeness, not duplicated.  Unknown processors
reject by name.
"""

from __future__ import annotations

import copy
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["search_with_pipeline"]


def _and_filter(body: dict[str, Any], extra: dict[str, Any]) -> dict:
    body = copy.deepcopy(body)
    q = body.get("query", {"match_all": {}})
    if len(q) == 1 and "bool" in q:
        b = dict(q["bool"])
        flt = b.get("filter") or []
        flt = flt if isinstance(flt, list) else [flt]
        b["filter"] = flt + [extra]
        body["query"] = {"bool": b}
    else:
        body["query"] = {"bool": {"must": [q], "filter": [extra]}}
    return body


def search_with_pipeline(target, body: dict[str, Any],
                         pipeline: dict[str, Any],
                         text_field: str = "text") -> DataFrame:
    """Run ``body`` through the pipeline's request processors, execute
    :func:`~.planner.search`, then apply the response processors."""
    from .planner import search

    req = pipeline.get("request_processors") or []
    resp = pipeline.get("response_processors") or []
    orig_size = int(body.get("size", 10))
    for proc in req:
        (kind, spec), = proc.items()
        if kind == "filter_query":
            body = _and_filter(body, spec["query"])
        elif kind == "oversample":
            f = float(spec["sample_factor"])
            if f < 1.0:
                raise ValueError(
                    f"oversample sample_factor must be >= 1, got {f}")
            body = {**copy.deepcopy(body),
                    "size": int(orig_size * f)}
        else:
            raise ValueError(
                f"unsupported request processor {kind!r} "
                f"(supported: filter_query oversample)")

    out = search(target, body, text_field=text_field)

    for proc in resp:
        (kind, spec), = proc.items()
        if kind == "truncate_hits":
            n = int(spec.get("target_size", orig_size))
            out = out.limit(n)
        elif kind == "rename_field":
            fld, tgt = spec["field"], spec["target_field"]
            if fld not in out.columns:
                raise ValueError(
                    f"rename_field: {fld!r} not in the hit frame")
            if tgt in out.columns:
                raise ValueError(
                    f"rename_field: target {tgt!r} already exists")
            out = out.withColumnRenamed(fld, tgt)
        elif kind == "sort":
            fld = spec["field"]
            col = (F.col("score") if fld == "_score"
                   else F.col(fld))
            order = (col.desc() if spec.get("order", "asc") == "desc"
                     else col.asc())
            tie = [F.asc("docid")] if "docid" in out.columns else []
            out = out.orderBy(order, *tie)
        elif kind == "collapse":
            fld = spec["field"]
            if fld not in out.columns:
                raise ValueError(
                    f"collapse: {fld!r} not in the hit frame")
            order = ([F.desc("score")] if "score" in out.columns
                     else []) + ([F.asc("docid")]
                                 if "docid" in out.columns else [])
            if not order:
                raise ValueError(
                    "collapse needs score or docid in the hit frame")
            w = Window.partitionBy(fld).orderBy(*order)
            out = (out.withColumn("_cr", F.row_number().over(w))
                   .filter(F.col("_cr") == 1).drop("_cr")
                   .orderBy(*order))
        else:
            raise ValueError(
                f"unsupported response processor {kind!r} (supported: "
                f"truncate_hits rename_field sort collapse; "
                f"normalization lives in query.hybrid)")
    return out
