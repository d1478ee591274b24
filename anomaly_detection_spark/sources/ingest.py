"""Ingest pipelines: the ``_ingest/pipeline`` processor chain compiled
to one narrow codegen Project chain — no UDF, no shuffle, so a
pipeline costs what the equivalent select() costs at any corpus size.

Reference surface: the core ingest processors OpenSearch ships
(PutPipeline + the processor registry).  Implemented subset, each an
exact twin of the documented behavior over columnar rows:

``set`` (value / copy_from / override), ``remove`` (ignore_missing),
``rename`` (ignore_missing), ``lowercase`` / ``uppercase`` / ``trim``,
``gsub`` (Java regex), ``split`` (regex separator), ``join``,
``convert`` (integer/long/float/double/string/boolean;
ignore_failure → null via try_cast, else ANSI cast raises like the
reference fails the doc), ``date`` (epoch_millis or an explicit
Java-time pattern → timestamp, default target ``@timestamp``),
``append`` (array append, allow_duplicates), ``drop`` (conditional
row drop), ``script`` (the engine's boolean/arith painless subset via
the ``ctx._source`` update-script compiler in ``sources.tables``).

Per-processor ``if`` conditions compile through the same painless
subset as the ``script`` query (``compile_filter_script``) and gate
the processor per row (``F.when``), exactly the reference's
conditional-processor semantics.  Unsupported processors (grok,
dissect, enrich, inference, …) and ``on_failure`` handlers reject BY
NAME — nothing silently no-ops.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_ingest_pipeline"]

_CONVERT_TYPES = {"integer": "int", "long": "long", "float": "float",
                  "double": "double", "string": "string",
                  "boolean": "boolean"}


def _cond(df: DataFrame, spec: dict[str, Any]) -> Column | None:
    painless = spec.get("if")
    if painless is None:
        return None
    from ..query.compound import compile_filter_script

    return compile_filter_script(painless, spec.get("params") or {},
                                 set(df.columns))


def _gated(df: DataFrame, spec: dict[str, Any], target: str,
           new: Column, kind: str = "",
           type_changing: bool = False) -> Column:
    """Apply ``new`` to ``target`` only where the processor's ``if``
    holds.  Rows failing the condition keep the TARGET's previous
    value (null when the target is a new column) — never the source
    field's value, which would leak unprocessed data into the target.
    A type-changing processor (split/join/convert) writing IN PLACE
    cannot be row-gated — one column cannot hold two types — so it
    raises by name instead of letting Spark coerce silently."""
    c = _cond(df, spec)
    if c is None:
        return new
    if type_changing and target in df.columns:
        raise ValueError(
            f"{kind} processor: a per-row 'if' on a type-changing "
            f"processor needs a fresh target_field (the existing "
            f"column {target!r} cannot hold both types)")
    old = F.col(target) if target in df.columns else F.lit(None)
    return F.when(c, new).otherwise(old)


def _require(df: DataFrame, field: str, kind: str,
             ignore_missing: bool) -> bool:
    """True when the processor should run; raises on a missing field
    unless ignore_missing (the reference's per-doc failure becomes a
    compile-time schema failure here — columns are the schema)."""
    if field in df.columns:
        return True
    if ignore_missing:
        return False
    raise ValueError(f"{kind} processor: field {field!r} not in "
                     f"schema {sorted(df.columns)}")


def apply_ingest_pipeline(df: DataFrame,
                          pipeline: dict[str, Any]) -> DataFrame:
    """Run ``pipeline`` = ``{"processors": [{kind: spec}, ...]}`` over
    ``df``, returning the transformed frame."""
    procs = pipeline.get("processors")
    if not isinstance(procs, list):
        raise ValueError("ingest pipeline needs a 'processors' list")
    for proc in procs:
        (kind, spec), = proc.items()
        if spec.get("on_failure"):
            raise ValueError(
                f"{kind} processor: on_failure handlers are "
                f"unsupported — failures raise")
        if kind == "set":
            fld = spec["field"]
            if "copy_from" in spec:
                val = F.col(spec["copy_from"])
            else:
                val = F.lit(spec["value"])
            if not spec.get("override", True) and fld in df.columns:
                val = F.coalesce(F.col(fld), val)
            df = df.withColumn(fld, _gated(df, spec, fld, val))
        elif kind == "remove":
            flds = spec["field"]
            flds = [flds] if isinstance(flds, str) else list(flds)
            if spec.get("if") is not None:
                raise ValueError(
                    "remove processor: per-row 'if' cannot drop a "
                    "COLUMN conditionally — null it with set instead")
            for fld in flds:
                if _require(df, fld, "remove",
                            spec.get("ignore_missing", False)):
                    df = df.drop(fld)
        elif kind == "rename":
            if spec.get("if") is not None:
                raise ValueError(
                    "rename processor: per-row 'if' cannot rename a "
                    "COLUMN conditionally — copy with set instead")
            fld, tgt = spec["field"], spec["target_field"]
            if tgt in df.columns:
                raise ValueError(
                    f"rename processor: target {tgt!r} already exists")
            if _require(df, fld, "rename",
                        spec.get("ignore_missing", False)):
                df = df.withColumnRenamed(fld, tgt)
        elif kind in ("lowercase", "uppercase", "trim"):
            fld = spec["field"]
            if not _require(df, fld, kind,
                            spec.get("ignore_missing", False)):
                continue
            fn = {"lowercase": F.lower, "uppercase": F.upper,
                  "trim": F.trim}[kind]
            df = df.withColumn(fld, _gated(df, spec, fld,
                                           fn(F.col(fld))))
        elif kind == "gsub":
            fld = spec["field"]
            tgt = spec.get("target_field", fld)
            new = F.regexp_replace(F.col(fld), spec["pattern"],
                                   spec["replacement"])
            df = df.withColumn(tgt, _gated(df, spec, tgt, new, "gsub"))
        elif kind == "split":
            fld = spec["field"]
            tgt = spec.get("target_field", fld)
            new = F.split(F.col(fld), spec["separator"])
            df = df.withColumn(tgt, _gated(df, spec, tgt, new,
                                           "split", type_changing=True))
        elif kind == "join":
            fld = spec["field"]
            tgt = spec.get("target_field", fld)
            new = F.concat_ws(spec["separator"], F.col(fld))
            df = df.withColumn(tgt, _gated(df, spec, tgt, new,
                                           "join", type_changing=True))
        elif kind == "convert":
            fld = spec["field"]
            if not _require(df, fld, "convert",
                            spec.get("ignore_missing", False)):
                continue
            t = spec["type"]
            if t == "auto" or t not in _CONVERT_TYPES:
                raise ValueError(
                    f"convert processor: unsupported type {t!r} "
                    f"(supported: {sorted(_CONVERT_TYPES)})")
            src = F.col(fld)
            tgt = spec.get("target_field", fld)
            new = (src.try_cast(_CONVERT_TYPES[t])
                   if spec.get("ignore_failure")
                   else src.cast(_CONVERT_TYPES[t]))
            df = df.withColumn(tgt, _gated(df, spec, tgt, new,
                                           "convert",
                                           type_changing=True))
        elif kind == "date":
            fld = spec["field"]
            tgt = spec.get("target_field", "@timestamp")
            fmts = spec.get("formats", ["ISO8601"])
            parsed = None
            for fmt in fmts:
                # try-casts throughout: the formats list is a fallback
                # chain, so a value matching a LATER format must not
                # fail the earlier branch (ANSI cast would raise)
                if fmt in ("epoch_millis", "UNIX_MS"):
                    p = F.timestamp_millis(F.col(fld).try_cast("long"))
                elif fmt in ("ISO8601",):
                    p = F.col(fld).try_cast("timestamp")
                else:
                    p = F.try_to_timestamp(F.col(fld), F.lit(fmt))
                parsed = p if parsed is None else F.coalesce(parsed, p)
            df = df.withColumn(tgt, _gated(df, spec, tgt, parsed,
                                           "date", type_changing=True))
        elif kind == "append":
            fld = spec["field"]
            vals = spec["value"]
            vals = vals if isinstance(vals, list) else [vals]
            arr = F.array(*[F.lit(v) for v in vals])
            if fld in df.columns:
                elem = df.schema[fld].dataType.elementType.simpleString()
                new = F.concat(
                    F.coalesce(F.col(fld),
                               F.array().cast(f"array<{elem}>")),
                    arr.cast(f"array<{elem}>"))
            else:
                new = arr
            if not spec.get("allow_duplicates", True):
                new = F.array_distinct(new)
            df = df.withColumn(fld, _gated(df, spec, fld, new))
        elif kind == "drop":
            c = _cond(df, spec)
            if c is None:
                raise ValueError(
                    "drop processor needs an 'if' condition (an "
                    "unconditional drop would empty the corpus)")
            df = df.filter(~F.coalesce(c, F.lit(False)))
        elif kind == "script":
            from .tables import _apply_update_script

            df = _apply_update_script(df, spec["source"],
                                      spec.get("params") or {},
                                      cond=_cond(df, spec))
        else:
            raise ValueError(
                f"unsupported ingest processor {kind!r} (supported: "
                f"set remove rename lowercase uppercase trim gsub "
                f"split join convert date append drop script)")
    return df
