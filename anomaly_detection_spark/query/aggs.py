"""Aggregation surface (SURVEY.md §2.2–2.4): the metric / bucket /
pipeline aggregations the reference plugin issues, as DataFrame ops.

Reference semantics worth preserving:

- ``date_histogram`` with ``minDocCount(0)`` emits empty buckets
  (``AggregationPrep.java:304-311``) → left join against a generated
  bucket sequence (``F.sequence``).
- ``terms`` top-N orders by doc count then key ascending
  (OpenSearch tie order), size-bounded (``SearchFeatureDao.java:305-306``).
- ``composite`` is just groupBy — the after_key pagination exists only
  because OpenSearch responses are bounded (``CompositeRetriever.java:
  163-232``); Spark needs no pages.
- ``bucket_sort`` is a global sort+slice here, strictly stronger than
  the per-page sort the plugin works around client-side
  (``SearchTopAnomalyResultTransportAction.java:339-452``).
- ``serial_diff``/``min_bucket`` pipeline aggs
  (``IntervalCalculation.java:683-689``) → window lag / global min.
- ``auto_date_histogram`` picks the smallest ladder interval producing
  ≤ the requested bucket count (``IntervalCalculation.java:680-682``).

Every computed column is explicitly aliased so results are directly
comparable against an ANSI-SQL oracle.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..localdf import local_df

# ---------------------------------------------------------------------------
# metric aggregations (§2.2) — dispatched from agg-JSON like the plugin's
# user feature definitions (ParseUtils.java:148-306, AbstractRetriever.java:78)
# ---------------------------------------------------------------------------

_METRIC_FNS = {
    "max": F.max,
    "min": F.min,
    "avg": F.avg,
    "sum": F.sum,
    "value_count": F.count,
}


def metric_agg_column(spec: dict[str, Any], alias: str) -> Column:
    """One OpenSearch metric-agg JSON → an aliased Column.

    Supports max/min/avg/sum/value_count/cardinality/percentiles and
    the single-bucket ``filter`` agg wrapper (A1–A6)."""
    (kind, body), = spec.items()
    if kind in _METRIC_FNS:
        f = body["field"]
        if isinstance(body, dict) and body.get("missing") is not None:
            # `missing` (ValuesSourceAggregationBuilder): null values
            # score as the substitute instead of being skipped
            return _METRIC_FNS[kind](
                F.coalesce(F.col(f), F.lit(body["missing"]))
            ).alias(alias)
        return _METRIC_FNS[kind](f).alias(alias)
    if kind == "cardinality":
        # HLL++ in both systems (approximate, like OpenSearch cardinality)
        return F.approx_count_distinct(body["field"]).alias(alias)
    if kind == "percentiles":
        # Default is APPROXIMATE (Spark's Greenwald-Khanna sketch) —
        # the scale-faithful twin of OpenSearch's t-digest percentiles
        # (AbstractRetriever.java:80-85): exact quantiles buffer every
        # group value and cannot hold at corpus scale.  ``exact: true``
        # opts into F.percentile for oracle-comparable small runs.
        pcts = [p / 100.0 for p in body.get("percents", [50.0])]
        if body.get("exact"):
            if len(pcts) == 1:
                return F.percentile(body["field"],
                                    F.lit(pcts[0])).alias(alias)
            return F.percentile(
                body["field"],
                F.array(*[F.lit(p) for p in pcts])).alias(alias)
        acc = F.lit(int(body.get("accuracy", 10_000)))
        if len(pcts) == 1:
            return F.percentile_approx(body["field"], F.lit(pcts[0]),
                                       acc).alias(alias)
        return F.percentile_approx(
            body["field"], F.array(*[F.lit(p) for p in pcts]),
            acc).alias(alias)
    if kind == "scripted_metric":
        return scripted_metric_column(body, alias)
    if kind == "weighted_avg":
        v = F.col(body["value"]["field"])
        w = F.col(body["weight"]["field"])
        ok = v.isNotNull() & w.isNotNull()
        return (F.sum(F.when(ok, v * w))
                / F.sum(F.when(ok, w))).alias(alias)
    if kind == "percentile_ranks":
        # exact form of OpenSearch's tdigest percentile_ranks: the % of
        # non-null values ≤ x, per requested x
        f = F.col(body["field"])
        vals = list(body["values"])
        rk = [F.avg(F.when(f.isNotNull(), (f <= F.lit(x)).cast("double")))
              * 100.0 for x in vals]
        if len(rk) == 1:
            return rk[0].alias(alias)
        return F.array(*rk).alias(alias)
    raise ValueError(f"unsupported metric agg: {kind}")


_SM_MATH = (("Math.log1p", "LOG1P"), ("Math.log", "LN"),
            ("Math.sqrt", "SQRT"), ("Math.exp", "EXP"),
            ("Math.abs", "ABS"), ("Math.max", "GREATEST"),
            ("Math.min", "LEAST"), ("Math.pow", "POWER"))


def _painless_arith(src: str, params: dict[str, Any]) -> str:
    """Painless arithmetic/boolean subset → a validated SQL expression
    string: ``doc['f'].value`` / ``doc.f.value`` field refs,
    ``params.p`` literal substitution, ``Math.*``, one non-nested
    ternary → ``IF``, ``&&``/``||``, comparisons (``==`` and ``!=``
    are native Spark SQL).  After substitution anything but pure
    arithmetic rejects (same posture as compound._compile_score_script
    — no unmapped name reaches Catalyst)."""
    import re

    expr = src.strip()
    q = expr.find("?")
    if q != -1 and not _in_quotes(expr, q):
        c, rest = expr[:q], expr[q + 1:]
        if "?" in rest:
            raise ValueError(
                f"nested ternaries unsupported in scripted_metric: "
                f"{src!r}")
        a, sep, b = rest.partition(":")
        if not sep:
            raise ValueError(f"malformed ternary: {src!r}")
        return (f"IF({_painless_arith(c, params)}, "
                f"{_painless_arith(a, params)}, "
                f"{_painless_arith(b, params)})")
    expr = re.sub(r"doc\['([^']+)'\]\.value", r"`\1`", expr)
    expr = re.sub(r"doc\.([A-Za-z_]\w*)\.value", r"`\1`", expr)

    def _param(m):
        name = m.group(1)
        if name not in params:
            raise ValueError(f"unknown scripted_metric param {name!r}")
        v = params[name]
        if isinstance(v, bool) or not isinstance(v, (int, float, str)):
            raise ValueError(
                f"scripted_metric param {name!r} must be a number or "
                f"string literal")
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(v)

    expr = re.sub(r"params\.([A-Za-z_]\w*)", _param, expr)
    for fn, sql in _SM_MATH:
        expr = expr.replace(fn, sql)
    expr = expr.replace("&&", " AND ").replace("||", " OR ")
    bare = re.sub(r"`[^`]*`", "", expr)
    bare = re.sub(r"'(?:[^']|'')*'", "", bare)
    bare = re.sub(
        r"\b(LOG1P|LN|SQRT|EXP|ABS|GREATEST|LEAST|POWER|AND|OR|IF|NOT)\b",
        "", bare)
    if re.search(r"[A-Za-z_`\[\]]", bare) or \
            not set(bare) <= set("0123456789. +-*/()%,<>=!"):
        raise ValueError(
            f"unsupported scripted_metric expression: {src!r}")
    return expr


def _in_quotes(s: str, i: int) -> bool:
    return s.count("'", 0, i) % 2 == 1


def _sm_statements(src: str) -> list[str]:
    """Split script source on ``;`` at brace depth 0."""
    out: list[str] = []
    depth, cur = 0, []
    for ch in src:
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        if ch == ";" and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [s.strip() for s in out if s.strip()]


def scripted_metric_column(body: dict[str, Any], alias: str) -> Column:
    """``scripted_metric`` — the DISTRIBUTIVE painless subset, compiled
    to pure-codegen aggregate expressions (map-side combinable, so the
    agg scales exactly like sum):

    - ``init_script``: ``state.v = 0`` declarations only (a non-zero
      per-shard init makes the result shard-count-dependent in
      OpenSearch itself — rejected here);
    - ``map_script``: ``state.v += <expr>`` statements, optionally
      guarded ``if (<cond>) { state.v += <expr>; }`` (compiled to
      ``IF(cond, expr, 0)``), with ``<expr>`` the painless arithmetic
      subset incl. one ternary, ``params.*``, ``Math.*``;
    - ``combine_script``: ``return state`` (shard states are summed —
      the only combine shape that is distributive);
    - ``reduce_script``: omitted (one accumulator → its sum; several →
      a struct of sums) or ``return <expr over state.v>`` evaluated on
      the summed accumulators.

    Anything outside this subset raises by name — never a silent
    approximation of general painless."""
    import re

    params = body.get("params") or {}
    declared: list[str] = []
    for st in _sm_statements(body.get("init_script") or ""):
        m = re.fullmatch(r"state\.([A-Za-z_]\w*)\s*=\s*(0|0\.0)", st)
        if not m:
            raise ValueError(
                f"scripted_metric init_script supports only "
                f"'state.v = 0' declarations (per-shard non-zero init "
                f"is shard-count-dependent): {st!r}")
        declared.append(m.group(1))
    combine = (body.get("combine_script") or "return state").strip()
    combine = combine.rstrip(";").strip()
    if combine not in ("return state", "state"):
        raise ValueError(
            f"scripted_metric combine_script subset: 'return state' "
            f"(accumulators are summed across partitions), got "
            f"{combine!r}")

    add_re = re.compile(r"state\.([A-Za-z_]\w*)\s*\+=\s*(.+)", re.S)
    if_re = re.compile(r"if\s*\((.+)\)\s*\{(.+)\}", re.S)
    exprs: dict[str, list[str]] = {v: [] for v in declared}

    def _add(var: str, sql: str) -> None:
        exprs.setdefault(var, []).append(sql)

    map_src = body.get("map_script")
    if not map_src:
        raise ValueError("scripted_metric requires a map_script")
    for st in _sm_statements(map_src):
        mi = if_re.fullmatch(st)
        if mi:
            cond = _painless_arith(mi.group(1), params)
            for inner in _sm_statements(mi.group(2)):
                ma = add_re.fullmatch(inner)
                if not ma:
                    raise ValueError(
                        f"scripted_metric guarded statements must be "
                        f"'state.v += expr': {inner!r}")
                _add(ma.group(1),
                     f"IF({cond}, "
                     f"{_painless_arith(ma.group(2), params)}, 0.0D)")
            continue
        ma = add_re.fullmatch(st)
        if not ma:
            raise ValueError(
                f"scripted_metric map_script statements must be "
                f"'state.v += expr' or 'if (cond) {{ ... }}': {st!r}")
        _add(ma.group(1), _painless_arith(ma.group(2), params))

    sums = {
        v: ("SUM(CAST(" + " + ".join(f"({e})" for e in es)
            + " AS DOUBLE))") if es else "CAST(0.0 AS DOUBLE)"
        for v, es in exprs.items()}

    reduce_src = (body.get("reduce_script") or "").strip().rstrip(";")
    if not reduce_src:
        if len(sums) == 1:
            return F.expr(next(iter(sums.values()))).alias(alias)
        inner = ", ".join(f"({sql}) AS {v}" for v, sql in sums.items())
        return F.expr(f"struct({inner})").alias(alias)
    m = re.fullmatch(r"return\s+(.+)", reduce_src, re.S)
    if not m:
        raise ValueError(
            f"scripted_metric reduce_script subset: "
            f"'return <expr over state.v>': {reduce_src!r}")
    red = m.group(1)
    red = re.sub(r"states?\.([A-Za-z_]\w*)", r"`state.\1`", red)
    red_sql = _painless_arith(red, params)
    for v, sql in sums.items():
        red_sql = red_sql.replace(f"`state.{v}`", f"({sql})")
    if "`state." in red_sql:
        bad = re.findall(r"`state\.(\w+)`", red_sql)
        raise ValueError(
            f"reduce_script references unknown accumulators {bad}")
    return F.expr(red_sql).alias(alias)


def metric_agg_cols(sub_specs: dict[str, dict]) -> list[Column]:
    """Named metric-agg specs → aliased Columns, expanding the
    multi-value kinds (``stats`` → count/min/max/avg/sum columns,
    ``extended_stats`` adds sum_of_squares/variance/std_deviation —
    population forms, like OpenSearch ExtendedStats) into
    ``{alias}_{stat}`` columns; single-value kinds pass through
    :func:`metric_agg_column`."""
    out: list[Column] = []
    for alias, spec in sub_specs.items():
        (kind, body), = spec.items()
        if kind == "boxplot":
            out += boxplot_cols(body["field"], alias,
                                exact=body.get("exact", False))
        elif kind in ("stats", "extended_stats"):
            f = body["field"]
            out += [F.count(f).alias(f"{alias}_count"),
                    F.min(f).alias(f"{alias}_min"),
                    F.max(f).alias(f"{alias}_max"),
                    F.avg(f).alias(f"{alias}_avg"),
                    F.sum(f).alias(f"{alias}_sum")]
            if kind == "extended_stats":
                out += [
                    F.sum(F.col(f) * F.col(f)).alias(
                        f"{alias}_sum_of_squares"),
                    F.var_pop(f).alias(f"{alias}_variance"),
                    F.stddev_pop(f).alias(f"{alias}_std_deviation"),
                ]
        else:
            out.append(metric_agg_column(spec, alias))
    return out


def filter_agg(df: DataFrame, cond: Column, sub_specs: dict[str, dict]) -> DataFrame:
    """Single-bucket ``filter`` agg (AbstractRetriever.java:66-75):
    sub-aggs evaluated over the predicate's scope + doc_count."""
    scoped = df.filter(cond)
    return scoped.agg(F.count("*").alias("doc_count"),
                      *metric_agg_cols(sub_specs))


def missing_agg(df: DataFrame, field: str,
                sub_specs: dict[str, dict] | None = None) -> DataFrame:
    """Single-bucket ``missing`` agg: docs where ``field`` is null."""
    return filter_agg(df, F.col(field).isNull(), sub_specs or {})


_COND_METRIC_FNS = {"max": F.max, "min": F.min, "avg": F.avg, "sum": F.sum,
                    "value_count": F.count}

_SAFE_IDENT = __import__("re").compile(r"[A-Za-z_][-A-Za-z0-9_]*\Z")


def require_safe_names(names, what: str) -> None:
    """Reject names that could escape a generated SQL expression
    (quotes, backticks, whitespace, leading digits).  ``-`` is allowed
    — every interpolation site backtick-quotes the name or
    single-quotes it as a string literal, so only quote characters can
    actually escape, and metric names like ``p95-latency`` keep
    working.  ``.`` stays rejected: downstream ``F.col`` parses dots
    as struct-field access.  Same posture as ``_compile_bucket_script``."""
    bad = [n for n in names if not _SAFE_IDENT.match(str(n))]
    if bad:
        raise ValueError(
            f"{what} must match [A-Za-z_][-A-Za-z0-9_]* "
            f"(no quotes/backticks/dots/whitespace): {bad}")


def filters_agg(df: DataFrame, named_conds: dict[str, Column],
                sub_specs: dict[str, dict] | None = None) -> DataFrame:
    """Named multi-bucket ``filters`` agg in ONE pass: every bucket's
    doc_count and metric sub-aggs are conditional aggregates of the
    same scan (buckets may overlap, like OpenSearch), then a ``stack``
    unpivot renders one row per named filter.  No per-filter jobs."""
    sub_specs = sub_specs or {}
    bad = [a for a, s in sub_specs.items()
           if next(iter(s)) not in _COND_METRIC_FNS]
    if bad:
        raise ValueError(
            f"filters sub-aggs support {sorted(_COND_METRIC_FNS)}; "
            f"got {bad}")
    require_safe_names(named_conds, "filters bucket names")
    require_safe_names(sub_specs, "filters sub-agg names")
    cols: list[Column] = []
    for fname, cond in named_conds.items():
        cond = F.coalesce(cond, F.lit(False))
        cols.append(F.sum(F.when(cond, 1).otherwise(0))
                    .alias(f"{fname}__doc_count"))
        for alias, spec in sub_specs.items():
            (kind, body), = spec.items()
            v = F.when(cond, F.col(body["field"]))
            cols.append(_COND_METRIC_FNS[kind](v)
                        .alias(f"{fname}__{alias}"))
    wide = df.agg(*cols)
    per_row = 1 + len(sub_specs)
    parts = []
    for fname in named_conds:
        vals = [f"`{fname}__doc_count`"] + [
            f"`{fname}__{a}`" for a in sub_specs]
        parts.append(f"'{fname}', " + ", ".join(vals))
    out_cols = ", ".join(["filter_key", "doc_count", *sub_specs])
    return wide.selectExpr(
        f"stack({len(named_conds)}, {', '.join(parts)}) "
        f"AS ({out_cols})")


def adjacency_matrix_agg(df: DataFrame,
                         named_conds: dict[str, Column]) -> DataFrame:
    """``adjacency_matrix``: doc_count of every named filter and every
    pairwise intersection (OpenSearch AdjacencyMatrixAggregationBuilder
    keys: ``a``, ``a&b``).  ONE conditional-aggregation pass over the
    scan — 0/1 indicator columns summed alone and pairwise — then a
    stack unpivot; empty intersections are omitted like OpenSearch."""
    require_safe_names(named_conds, "adjacency_matrix filter names")
    names = sorted(named_conds)
    ind = {n: F.coalesce(named_conds[n], F.lit(False)).cast("int")
           for n in names}
    cols = [F.sum(ind[n]).alias(f"__{n}") for n in names]
    keys = list(names)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            keys.append(f"{a}&{b}")
            cols.append(F.sum(ind[a] * ind[b]).alias(f"__{a}&{b}"))
    wide = df.agg(*cols)
    parts = ", ".join(f"'{k}', `__{k}`" for k in keys)
    out = wide.selectExpr(
        f"stack({len(keys)}, {parts}) AS (key, doc_count)")
    return out.filter(F.col("doc_count") > 0).orderBy("key")


def top_metrics_agg(df: DataFrame, metrics: list[str], sort_col: str,
                    order: str = "desc",
                    group_cols: list[str] | None = None,
                    tie_breaker_col: str | None = None) -> DataFrame:
    """``top_metrics``: the metric columns' values AT the row where
    ``sort_col`` is extreme (TopMetricsAggregationBuilder, size=1) —
    `max_by`/`min_by`, a streaming aggregate (no row buffering).

    Tie behavior: when several rows tie on ``sort_col``, ``max_by`` /
    ``min_by`` pick an arbitrary one — per metric independently — so
    repeated runs can differ.  Pass ``tie_breaker_col`` (a unique row
    id, e.g. ``docid``) to break ties deterministically AND from one
    single row across all metrics (the extreme struct(sort, tie) row).
    """
    fn = F.max_by if order.lower() == "desc" else F.min_by
    key = (F.struct(F.col(sort_col), F.col(tie_breaker_col))
           if tie_breaker_col else F.col(sort_col))
    agg_cols = [(F.max(sort_col) if order.lower() == "desc"
                 else F.min(sort_col)).alias(f"{sort_col}_top"),
                *[fn(F.col(m), key).alias(m) for m in metrics]]
    if group_cols:
        return df.groupBy(*group_cols).agg(*agg_cols)
    return df.agg(*agg_cols)


def multi_terms_agg(df: DataFrame, fields: list[str], size: int = 10,
                    sub_specs: dict[str, dict] | None = None) -> DataFrame:
    """``multi_terms``: top-N composite keys by doc count (count desc,
    then keys asc — MultiTermsAggregationBuilder order); null keys drop
    like OpenSearch terms."""
    cond = None
    for f_ in fields:
        c = F.col(f_).isNotNull()
        cond = c if cond is None else cond & c
    aggd = (df.filter(cond).groupBy(*fields)
            .agg(F.count("*").alias("doc_count"),
                 *metric_agg_cols(sub_specs or {})))
    return aggd.orderBy(F.desc("doc_count"),
                        *[F.asc(f_) for f_ in fields]).limit(size)


def rate_agg(bucketed: DataFrame, interval_ms: int, unit_ms: int,
             metric_col: str = "doc_count",
             alias: str | None = None) -> DataFrame:
    """``rate`` sub-agg of a date_histogram: the bucket metric rescaled
    to a per-``unit`` rate (RateAggregationBuilder) — pure arithmetic
    over already-bucketed rows."""
    alias = alias or f"{metric_col}_rate"
    return bucketed.withColumn(
        alias, F.col(metric_col) * (float(unit_ms) / float(interval_ms)))


def histogram_agg(
    df: DataFrame,
    field: str,
    interval: float,
    sub_specs: dict[str, dict] | None = None,
    min_doc_count: int = 0,
    offset: float = 0.0,
    extended_bounds: dict | None = None,
) -> DataFrame:
    """Numeric ``histogram`` agg: key = floor((v - offset)/interval) *
    interval + offset, minDocCount(0) dense grid over the data extent
    (grid generated by integer bucket INDEX so float steps can't drift);
    ``extended_bounds`` widens that grid."""
    import math
    if interval <= 0:
        raise ValueError("histogram interval must be > 0")
    sub_specs = sub_specs or {}
    idx = F.floor((F.col(field) - F.lit(offset)) / F.lit(interval))
    key = (idx * F.lit(interval) + F.lit(offset)).cast("double")
    aggd = (df.filter(F.col(field).isNotNull())
            .groupBy(key.alias("key"))
            .agg(F.count("*").alias("doc_count"),
                 *metric_agg_cols(sub_specs)))
    if min_doc_count > 0:
        return aggd.filter(F.col("doc_count") >= min_doc_count)
    lo = F.floor((F.min(field) - F.lit(offset)) / F.lit(interval))
    hi = F.floor((F.max(field) - F.lit(offset)) / F.lit(interval))
    if extended_bounds:
        # extended_bounds (HistogramAggregationBuilder): widen the
        # minDocCount=0 dense grid beyond the data extent (hard_bounds'
        # counterpart — extend, never shrink)
        blo = F.lit(int(math.floor(
            (float(extended_bounds["min"]) - offset) / interval)))
        bhi = F.lit(int(math.floor(
            (float(extended_bounds["max"]) - offset) / interval)))
        lo, hi = F.least(lo, blo), F.greatest(hi, bhi)
    grid = (
        df.filter(F.col(field).isNotNull())
        .select(lo.alias("lo"), hi.alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("i"))
        .select((F.col("i") * F.lit(interval) + F.lit(offset))
                .cast("double").alias("key"))
    )
    out = grid.join(aggd, ["key"], "left")
    return (out.withColumn("doc_count", F.coalesce("doc_count", F.lit(0)))
            .orderBy("key"))


# ---------------------------------------------------------------------------
# bucket aggregations (§2.3)
# ---------------------------------------------------------------------------

def to_millis(c: str | Column) -> Column:
    """Epoch millis of a timestamp column; tolerates TIMESTAMP_NTZ
    (session TZ is pinned UTC, so the cast is value-preserving)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.unix_millis(c.cast("timestamp"))


def bucketize(ts_col: str | Column, interval_ms: int,
              shift_ms: int = 0) -> Column:
    """Fixed-interval date_histogram bucket key (epoch-millis floor).

    ``shift_ms`` moves the rounding grid (OpenSearch ``time_zone`` +
    ``offset`` on date_histogram): boundaries sit at
    ``k·interval − shift`` in UTC — i.e. rounding happens in a frame
    shifted by ``shift_ms`` and the key is reported back in UTC."""
    millis = to_millis(ts_col)
    if shift_ms:
        m2 = millis + F.lit(shift_ms)
        return F.timestamp_millis(
            m2 - F.pmod(m2, F.lit(interval_ms)) - F.lit(shift_ms))
    return F.timestamp_millis((millis - F.pmod(millis, F.lit(interval_ms))))


def tz_offset_ms(time_zone: str) -> int:
    """Fixed-offset ``time_zone`` string (``+HH:MM`` / ``-HH:MM`` /
    ``UTC``) → milliseconds.  Named DST zones are supported only for
    calendar intervals (where ``convert_timezone`` rounds on true
    local boundaries); fixed intervals with a named zone raise, like
    the subset of Rounding.java this engine implements."""
    import re as _re

    if time_zone in ("UTC", "Z", "+00:00", "-00:00"):
        return 0
    m = _re.fullmatch(r"([+-])(\d{2}):(\d{2})", time_zone)
    if not m:
        raise ValueError(
            f"fixed-interval date_histogram supports fixed-offset "
            f"time_zone (+HH:MM); got {time_zone!r} (named zones are "
            f"supported on calendar intervals)")
    sign = 1 if m.group(1) == "+" else -1
    return sign * (int(m.group(2)) * 3600_000 + int(m.group(3)) * 60_000)


def date_histogram(
    df: DataFrame,
    ts_col: str,
    interval_ms: int,
    sub_specs: dict[str, dict] | None = None,
    min_doc_count: int = 0,
    hard_bounds: tuple[int, int] | None = None,
    group_cols: list[str] | None = None,
    dense: str = "global",
    max_dense_cells: int = 50_000_000,
    offset_ms: int = 0,
    time_zone: str | None = None,
) -> DataFrame:
    """date_histogram(fixed_interval) with minDocCount(0) semantics:
    empty buckets present (left join vs a generated sequence).

    ``time_zone`` (fixed offset, ``+HH:MM``) and ``offset_ms`` shift
    the rounding grid like OpenSearch Rounding: boundaries at local
    midnight + offset, keys reported in UTC.

    High-cardinality guard: with ``group_cols`` and ``min_doc_count=0``,
    the ``dense="global"`` grid materializes ``n_buckets × n_entities``
    rows — at the reference's own benchmark shape (1M entities × 1008
    buckets) that is 10⁹ rows, which OpenSearch itself never builds
    (empty buckets exist only within a composite page).  The global
    grid is therefore CAPPED at ``max_dense_cells`` (fail fast with
    alternatives) and ``dense="entity_span"`` provides the scalable
    shape: every present entity densified over its OWN [min, max]
    extent — output linear in real per-entity activity spans."""
    group_cols = group_cols or []
    sub_specs = sub_specs or {}
    # OpenSearch applies tz rounding first, then offset: grid boundary
    # = k·I − tz + offset in UTC ⇒ one combined shift
    shift_ms = (tz_offset_ms(time_zone) if time_zone else 0) - offset_ms
    bucket = bucketize(ts_col, interval_ms, shift_ms).alias("bucket_start")
    aggd = (
        df.groupBy(*group_cols, bucket)
        .agg(F.count("*").alias("doc_count"),
             *metric_agg_cols(sub_specs))
    )
    if min_doc_count > 0:
        return aggd.filter(F.col("doc_count") >= min_doc_count)

    step = F.lit(interval_ms)
    shift = F.lit(shift_ms)
    if group_cols and dense == "entity_span":
        # per-entity dense grid over each entity's own extent — no
        # cross join, row count = Σ_entity span_buckets(entity).
        # hard_bounds clamp each entity's extent (entities with no
        # overlap drop), so the requested window is honored here too.
        ext = df.groupBy(*group_cols).agg(
            F.min(to_millis(ts_col)).alias("lo"),
            F.max(to_millis(ts_col)).alias("hi"))
        if hard_bounds is not None:
            hb_lo, hb_hi = hard_bounds
            ext = (ext.select(
                *group_cols,
                F.greatest("lo", F.lit(hb_lo)).alias("lo"),
                F.least("hi", F.lit(hb_hi - 1)).alias("hi"))
                .filter(F.col("lo") <= F.col("hi")))
        grid = ext.select(
            *group_cols,
            F.explode(F.sequence(
                F.col("lo") + shift - F.pmod(F.col("lo") + shift, step)
                - shift,
                F.col("hi") + shift - F.pmod(F.col("hi") + shift, step)
                - shift,
                step)).alias("bucket_ms")
        ).select(*group_cols,
                 F.timestamp_millis(F.col("bucket_ms")).alias("bucket_start"))
        out = grid.join(aggd, [*group_cols, "bucket_start"], "left")
        return out.withColumn("doc_count", F.coalesce("doc_count", F.lit(0)))

    # minDocCount=0: dense bucket grid over [lo, hi] (hard_bounds or data extent)
    probed_extent = None
    if group_cols:
        # global dense grid × entities: bound the materialized cells
        probe = [F.approx_count_distinct(F.struct(*group_cols))
                 .alias("n_ents")]
        if hard_bounds is None:
            probe += [F.min(to_millis(ts_col)).alias("lo"),
                      F.max(to_millis(ts_col)).alias("hi")]
        row = df.agg(*probe).collect()[0]
        lo, hi = (hard_bounds if hard_bounds is not None
                  else (row["lo"], row["hi"]))
        if hard_bounds is None and lo is not None:
            # the guard already scanned min/max — reuse them for the
            # grid instead of re-aggregating the table a second time
            probed_extent = (int(lo), int(hi))
        if lo is not None:
            hb = hi - 1 if hard_bounds is not None else hi
            n_buckets = ((hb - hb % interval_ms)
                         - (lo - lo % interval_ms)) // interval_ms + 1
            cells = n_buckets * int(row["n_ents"])
            if cells > max_dense_cells:
                raise ValueError(
                    f"date_histogram(min_doc_count=0) dense grid would "
                    f"materialize ~{cells:,} (bucket × entity) cells "
                    f"(> max_dense_cells={max_dense_cells:,}).  Use "
                    f"dense='entity_span' (per-entity extents), "
                    f"min_doc_count=1, tighter hard_bounds, or raise "
                    f"max_dense_cells explicitly.")
    if hard_bounds is not None:
        lo, hi = hard_bounds
        grid_src = df.sparkSession.range(1).select(
            F.lit(lo).alias("lo"), F.lit(hi - 1).alias("hi"))
    elif probed_extent is not None:
        grid_src = df.sparkSession.range(1).select(
            F.lit(probed_extent[0]).alias("lo"),
            F.lit(probed_extent[1]).alias("hi"))
    else:
        grid_src = df.select(
            F.min(to_millis(ts_col)).alias("lo"),
            F.max(to_millis(ts_col)).alias("hi"))
    grid = grid_src.select(
        F.explode(F.sequence(
            F.col("lo") + shift - F.pmod(F.col("lo") + shift, step) - shift,
            F.col("hi") + shift - F.pmod(F.col("hi") + shift, step) - shift,
            step)).alias("bucket_ms")
    ).select(F.timestamp_millis(F.col("bucket_ms")).alias("bucket_start"))
    if group_cols:
        grid = grid.crossJoin(df.select(*group_cols).distinct())
    out = grid.join(aggd, [*group_cols, "bucket_start"], "left")
    return out.withColumn("doc_count", F.coalesce("doc_count", F.lit(0)))


# calendar_interval units that are NOT a fixed number of milliseconds
# (variable month lengths / leap years / DST-less UTC weeks); OpenSearch
# DateHistogramInterval buckets these on calendar boundaries.  Spark's
# date_trunc uses the same boundaries as OpenSearch UTC rounding
# (weeks start Monday, ISO-8601 — Rounding.java's WEEK_OF_WEEKYEAR).
CALENDAR_UNITS = {"week": "week", "1w": "week",
                  "month": "month", "1M": "month",
                  "quarter": "quarter", "1q": "quarter",
                  "year": "year", "1y": "year"}
_CAL_STEP = {"week": "interval 1 week", "month": "interval 1 month",
             "quarter": "interval 3 months", "year": "interval 1 year"}


def bucketize_calendar(ts_col: str | Column, unit: str,
                       time_zone: str | None = None) -> Column:
    """Calendar-interval date_histogram bucket key.  Default = UTC
    boundaries; with ``time_zone`` (named zones incl. DST, any Java/
    Spark tz id), the truncation happens on TRUE local calendar
    boundaries and the key is reported back in UTC — OpenSearch
    Rounding's tz-aware calendar rounding."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    c = c.cast("timestamp")
    if time_zone:
        local = F.convert_timezone(F.lit("UTC"), F.lit(time_zone), c)
        trunc = F.date_trunc(CALENDAR_UNITS[unit], local)
        return F.convert_timezone(F.lit(time_zone), F.lit("UTC"), trunc)
    return F.date_trunc(CALENDAR_UNITS[unit], c)


def date_histogram_calendar(
    df: DataFrame,
    ts_col: str,
    unit: str,
    sub_specs: dict[str, dict] | None = None,
    min_doc_count: int = 0,
    time_zone: str | None = None,
) -> DataFrame:
    """date_histogram(calendar_interval) for variable-width units
    (week/month/quarter/year).  Same shape as :func:`date_histogram`;
    the minDocCount(0) dense grid steps by the calendar interval
    (``sequence`` with a month/year step follows calendar boundaries,
    so a Jan-31 start never lands mid-month).  ``time_zone`` rounds on
    local calendar boundaries (named zones, DST-correct)."""
    unit = CALENDAR_UNITS[unit]
    sub_specs = sub_specs or {}
    bucket = bucketize_calendar(ts_col, unit, time_zone) \
        .alias("bucket_start")
    aggd = (
        df.groupBy(bucket)
        .agg(F.count("*").alias("doc_count"),
             *metric_agg_cols(sub_specs))
    )
    if min_doc_count > 0:
        return aggd.filter(F.col("doc_count") >= min_doc_count)
    if time_zone:
        # step the grid in LOCAL time (a calendar step across a DST
        # change is not a fixed UTC width), convert keys back to UTC
        grid = (
            df.select(
                F.convert_timezone(
                    F.lit("UTC"), F.lit(time_zone),
                    bucketize_calendar(F.min(F.col(ts_col)), unit,
                                       time_zone)).alias("lo"),
                F.convert_timezone(
                    F.lit("UTC"), F.lit(time_zone),
                    bucketize_calendar(F.max(F.col(ts_col)), unit,
                                       time_zone)).alias("hi"))
            .select(F.explode(F.expr(
                f"sequence(lo, hi, {_CAL_STEP[unit]})")).alias("_local"))
            .select(F.convert_timezone(
                F.lit(time_zone), F.lit("UTC"),
                F.col("_local")).alias("bucket_start"))
        )
    else:
        grid = (
            df.select(bucketize_calendar(F.min(F.col(ts_col)), unit)
                      .alias("lo"),
                      bucketize_calendar(F.max(F.col(ts_col)), unit)
                      .alias("hi"))
            .select(F.explode(F.expr(
                f"sequence(lo, hi, {_CAL_STEP[unit]})")).alias("bucket_start"))
        )
    out = grid.join(aggd, ["bucket_start"], "left")
    return out.withColumn("doc_count", F.coalesce("doc_count", F.lit(0)))


# OpenSearch-style rounding ladder for auto_date_histogram (seconds)
AUTO_LADDER_S = [1, 5, 10, 30, 60, 300, 600, 1800, 3600, 3 * 3600,
                 12 * 3600, 86400, 7 * 86400, 30 * 86400, 90 * 86400, 365 * 86400]


def auto_date_histogram(
    df: DataFrame, ts_col: str, num_buckets: int,
    sub_specs: dict[str, dict] | None = None,
) -> DataFrame:
    """Pick the smallest ladder interval so bucket count ≤ num_buckets,
    then a plain fixed-interval histogram (buckets with docs only,
    matching auto_date_histogram's non-empty output)."""
    row = df.agg(F.min(to_millis(ts_col)).alias("lo"),
                 F.max(to_millis(ts_col)).alias("hi")).collect()[0]
    if row["lo"] is None:
        return date_histogram(df, ts_col, 1000, sub_specs, min_doc_count=1)
    span_ms = row["hi"] - row["lo"] + 1
    interval_ms = next(
        (s * 1000 for s in AUTO_LADDER_S if span_ms / (s * 1000) <= num_buckets),
        AUTO_LADDER_S[-1] * 1000,
    )
    out = date_histogram(df, ts_col, interval_ms, sub_specs, min_doc_count=1)
    return out.withColumn("interval_ms", F.lit(interval_ms))


def date_range_agg(
    df: DataFrame,
    ts_col: str,
    ranges: list[tuple[int, int]],
    sub_specs: dict[str, dict] | None = None,
) -> DataFrame:
    """Explicit half-open [from, to) ms bucket list with sub-aggs per
    bucket (ParseUtils.java:338-361; buckets parsed sorted by `from`,
    SearchFeatureDao.java:812-841).  Ranges may overlap (cold-start
    sampling does) → broadcast range join, never F.when chains."""
    sub_specs = sub_specs or {}
    spark = df.sparkSession
    rdf = F.broadcast(local_df(
        spark, [(i, lo, hi) for i, (lo, hi) in enumerate(ranges)],
        "range_id int, from_ms long, to_ms long"))
    ms = to_millis(ts_col)
    joined = df.join(rdf, (ms >= F.col("from_ms")) & (ms < F.col("to_ms")))
    out = (joined.groupBy("range_id", "from_ms", "to_ms")
           .agg(F.count("*").alias("doc_count"),
                *metric_agg_cols(sub_specs)))
    return out.orderBy("from_ms", "range_id")


def significant_terms_agg(
    background: DataFrame,
    foreground: DataFrame,
    field: str,
    size: int = 10,
    min_doc_count: int = 3,
    analyzed: bool = False,
    heuristic: str = "jlh",
) -> DataFrame:
    """``significant_terms``: terms over-represented in the foreground
    (query scope) vs the background (index), scored with the JLH
    heuristic ((fg% − bg%) · fg%/bg%, OpenSearch's default).

    ``heuristic`` selects among the reference's significance
    heuristics (published formulas over the same 2×2 contingency
    counts — supersetFreq/Size, subsetFreq/Size):

    - ``jlh`` (default): (fg% − bg%) · fg%/bg%
    - ``percentage``: fg_count / bg_count (docs in the subset as a
      share of the term's docs)
    - ``chi_square``: (|ad − bc| )² · N / ((a+b)(c+d)(a+c)(b+d)) over
      the contingency cells with
      ``include_negatives=false``-style sign guard (negative
      association scores 0, like the reference's default filter on
      subset% > superset%)
    - ``gnd``: Google Normalized Distance turned into a similarity —
      1 − NGD(class, term) over the co-occurrence triple
      (fx = subset size, fy = term's superset df, fxy = term's subset
      df, N = superset size), clamped at 0

    ``analyzed=True`` tokenizes a text column and counts each term once
    per doc (doc frequency, like the terms enum); ``False`` treats the
    field value itself as the term (keyword semantics).  Two term-count
    aggregations (foreground and background) joined on term — fg terms
    are a subset of bg terms because the foreground is a filter of the
    background, which is how ``run_aggs`` calls it.
    """
    if analyzed:
        from ..functions.tokenizer import tokenize_column

        term_col = F.explode(F.array_distinct(tokenize_column(field)))
    else:
        term_col = F.col(field)

    def counts(df: DataFrame, cname: str) -> DataFrame:
        return (df.select(term_col.alias("term"))
                .filter(F.col("term").isNotNull())
                .groupBy("term").agg(F.count("*").alias(cname)))

    fg_n = foreground.count()
    bg_n = background.count()
    if fg_n == 0 or bg_n == 0:
        return counts(background, "bg_count").limit(0) \
            .withColumn("fg_count", F.lit(0)) \
            .withColumn("score", F.lit(0.0))
    fg = counts(foreground, "fg_count")
    bg = counts(background, "bg_count")
    j = bg.join(fg, "term", "left").fillna({"fg_count": 0})
    fg_pct = F.col("fg_count") / F.lit(float(fg_n))
    bg_pct = F.col("bg_count") / F.lit(float(bg_n))
    if heuristic == "jlh":
        score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
    elif heuristic == "percentage":
        score = F.col("fg_count") / F.col("bg_count")
    elif heuristic == "chi_square":
        a = F.col("fg_count").cast("double")
        b = F.lit(float(fg_n)) - a
        c = F.col("bg_count").cast("double") - a
        d = F.lit(float(bg_n - fg_n)) - c
        n = F.lit(float(bg_n))
        num = n * (a * d - b * c) * (a * d - b * c)
        den = (a + b) * (c + d) * (a + c) * (b + d)
        # positive-association guard: negative deviations score 0
        score = F.when((fg_pct > bg_pct) & (den > 0), num / den) \
            .otherwise(F.lit(0.0))
    elif heuristic == "gnd":
        fx = F.lit(float(fg_n))
        fy = F.col("bg_count").cast("double")
        fxy = F.col("fg_count").cast("double")
        n = F.lit(float(bg_n))
        gnd = ((F.greatest(F.log(fx), F.log(fy)) - F.log(fxy))
               / (F.log(n) - F.least(F.log(fx), F.log(fy))))
        score = F.greatest(F.lit(1.0) - gnd, F.lit(0.0))
    else:
        raise ValueError(
            f"unsupported significance heuristic {heuristic!r} "
            f"(jlh/percentage/chi_square/gnd)")
    out = (j.filter(F.col("fg_count") >= min_doc_count)
           .withColumn("score", score)
           .filter(F.col("score") > 0))
    return (out.select("term", "fg_count", "bg_count",
                       F.col("score").cast("double").alias("score"))
            .orderBy(F.desc("score"), F.asc("term")).limit(size))


def range_agg(
    df: DataFrame,
    field: str,
    ranges: list[dict],
    sub_specs: dict[str, dict] | None = None,
) -> DataFrame:
    """Numeric ``range`` agg: half-open [from, to) buckets, open-ended
    when ``from``/``to`` is omitted (RangeAggregationBuilder).  Ranges
    may overlap → broadcast range join, like :func:`date_range_agg`."""
    sub_specs = sub_specs or {}
    spark = df.sparkSession
    rows = [(i, r.get("from"), r.get("to")) for i, r in enumerate(ranges)]
    rdf = F.broadcast(local_df(
        spark, rows, "range_id int, from_v double, to_v double"))
    v = F.col(field)
    cond = (v.isNotNull()
            & (F.col("from_v").isNull() | (v >= F.col("from_v")))
            & (F.col("to_v").isNull() | (v < F.col("to_v"))))
    joined = df.join(rdf, cond)
    out = (joined.groupBy("range_id", "from_v", "to_v")
           .agg(F.count("*").alias("doc_count"),
                *metric_agg_cols(sub_specs)))
    return out.orderBy("range_id")


def _ipv4_long(col: Column) -> Column:
    """Dotted-quad IPv4 string → long, pure codegen (invalid / IPv6
    strings come back null and never bucket)."""
    p = F.split(col, r"\.")
    oct_ = [p.getItem(i).cast("long") for i in range(4)]
    valid = (F.size(p) == 4)
    for o in oct_:
        valid = valid & o.isNotNull() & (o >= 0) & (o <= 255)
    val = (oct_[0] * F.lit(16_777_216) + oct_[1] * F.lit(65_536)
           + oct_[2] * F.lit(256) + oct_[3])
    return F.when(valid, val)


def ip_range_agg(
    df: DataFrame,
    field: str,
    ranges: list[dict],
    sub_specs: dict[str, dict] | None = None,
) -> DataFrame:
    """``ip_range`` agg (IpRangeAggregationBuilder): half-open
    [from, to) buckets over dotted-quad IPv4 strings, or CIDR
    ``mask`` entries ([network base, base + 2^(32−bits))).  Same
    broadcast range-join shape as :func:`range_agg` — the ip→long
    conversion is whole-stage codegen, so the scan column stays a
    plain string.  IPv6 raises (the engine stores IPv4 quads)."""
    import ipaddress

    sub_specs = sub_specs or {}
    spark = df.sparkSession

    def bound(v):
        if v is None:
            return None
        ip = ipaddress.ip_address(v)
        if ip.version != 4:
            raise ValueError(f"ip_range supports IPv4 only: {v!r}")
        return int(ip)

    rows = []
    for i, r in enumerate(ranges):
        if "mask" in r:
            net = ipaddress.ip_network(r["mask"], strict=False)
            if net.version != 4:
                raise ValueError(
                    f"ip_range supports IPv4 only: {r['mask']!r}")
            rows.append((i, str(r["mask"]),
                         int(net.network_address),
                         int(net.network_address) + net.num_addresses))
        else:
            key = f"{r.get('from', '*')}-{r.get('to', '*')}"
            rows.append((i, key, bound(r.get("from")),
                         bound(r.get("to"))))
    rdf = F.broadcast(local_df(
        spark, rows, "range_id int, key string, from_v long, to_v long"))
    v = _ipv4_long(F.col(field))
    cond = (v.isNotNull()
            & (F.col("from_v").isNull() | (v >= F.col("from_v")))
            & (F.col("to_v").isNull() | (v < F.col("to_v"))))
    joined = df.join(rdf, cond)
    return (joined.groupBy("range_id", "key")
            .agg(F.count("*").alias("doc_count"),
                 *metric_agg_cols(sub_specs))
            .orderBy("range_id"))


def _ipv4_str(col: Column) -> Column:
    """Long → dotted-quad IPv4 string, pure codegen."""
    return F.concat_ws(
        ".",
        F.shiftright(col, 24).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(col, 16).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(col, 8).bitwiseAND(F.lit(255)).cast("string"),
        col.bitwiseAND(F.lit(255)).cast("string"))


def ip_prefix_agg(
    df: DataFrame,
    field: str,
    prefix_length: int,
    is_ipv6: bool = False,
    append_prefix_length: bool = False,
    min_doc_count: int = 1,
    sub_specs: dict[str, dict] | None = None,
) -> DataFrame:
    """``ip_prefix`` agg (IpPrefixAggregationBuilder): one bucket per
    network prefix of the IPv4 field at ``prefix_length`` bits, keyed
    by the network address (``append_prefix_length`` appends
    ``/<len>`` like the reference), sorted ascending by address.

    The mask is a single codegen ``bitwiseAND`` over the same
    string→long conversion as :func:`ip_range_agg` — one map-side
    combinable groupBy over a ≤2^prefix_length key space, so the
    shape is a plain partial-agg shuffle at any corpus size.
    Invalid / null addresses never bucket (the reference's missing
    handling); ``is_ipv6`` raises (the engine stores IPv4 quads)."""
    if is_ipv6:
        raise ValueError("ip_prefix supports IPv4 only (is_ipv6=true)")
    if not 0 <= int(prefix_length) <= 32:
        raise ValueError(
            f"ip_prefix prefix_length must be in [0, 32]: "
            f"{prefix_length}")
    sub_specs = sub_specs or {}
    mask = (0xFFFFFFFF << (32 - int(prefix_length))) & 0xFFFFFFFF
    v = _ipv4_long(F.col(field))
    net = v.bitwiseAND(F.lit(mask))
    key = _ipv4_str(F.col("_net"))
    if append_prefix_length:
        key = F.concat(key, F.lit(f"/{int(prefix_length)}"))
    out = (df.withColumn("_net", net)
           .filter(F.col("_net").isNotNull())
           .groupBy("_net")
           .agg(F.count("*").alias("doc_count"),
                *metric_agg_cols(sub_specs)))
    if min_doc_count > 1:
        out = out.filter(F.col("doc_count") >= min_doc_count)
    return (out.withColumn("key", key)
            .orderBy("_net")
            .drop("_net")
            .select("key", "doc_count",
                    *[c for c in out.columns
                      if c not in ("_net", "doc_count")]))


def top_hits_agg(
    df: DataFrame,
    group_cols: list[str],
    sort: list[tuple[str, str]],
    size: int = 3,
    select: list[str] | None = None,
) -> DataFrame:
    """``top_hits`` sub-agg rendered relationally: per group, the top
    ``size`` rows by ``sort`` ((col, 'asc'|'desc') list), flattened to
    rows with a ``hit_rank`` column.  One window rank per group — no
    collect, no per-group loops."""
    order = [F.desc(c) if d.lower() == "desc" else F.asc(c)
             for c, d in sort]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    out = (df.withColumn("hit_rank", F.row_number().over(w))
           .filter(F.col("hit_rank") <= size))
    if select:
        out = out.select(*group_cols, "hit_rank", *select)
    return out


def terms_agg(
    df: DataFrame, fld: str, size: int = 10,
    sub_specs: dict[str, dict] | None = None, ascending: bool = False,
    order: dict | None = None, missing=None,
    include=None, exclude=None,
) -> DataFrame:
    """Top-N groups by doc count (terms agg): count order then key asc
    by default; ``order`` takes the reference's shapes — ``{"_count":
    "asc"}``, ``{"_key": "desc"}``, or ``{"<sub-agg alias>": "desc"}``
    (a multi-value sub-agg orders by its flattened ``alias_stat``
    column name).  The size cut happens AFTER the requested order, so
    a metric order returns the top-N BY THAT METRIC — OpenSearch warns
    its shard-local metric orders can be approximate; this global
    order is the exact form.  ``missing`` buckets null keys under a
    substitute value instead of dropping them."""
    sub_specs = sub_specs or {}
    if missing is not None:
        df = df.withColumn(fld, F.coalesce(F.col(fld), F.lit(missing)))
    # include/exclude (IncludeExclude): exact-value lists or an
    # anchored regex over the STRING form of the key, applied BEFORE
    # the size cut (the reference filters the terms enumeration) —
    # pushed below the groupBy so excluded keys never shuffle
    key_s = F.col(fld).cast("string")
    if include is not None:
        df = df.filter(key_s.isin([str(v) for v in include])
                       if isinstance(include, (list, tuple))
                       else key_s.rlike(f"^(?:{include})$"))
    if exclude is not None:
        df = df.filter(~(key_s.isin([str(v) for v in exclude])
                         if isinstance(exclude, (list, tuple))
                         else key_s.rlike(f"^(?:{exclude})$")))
    aggd = df.groupBy(fld).agg(
        F.count("*").alias("doc_count"),
        *metric_agg_cols(sub_specs))
    if order:
        (key, direction), = order.items()
        col = {"_count": "doc_count", "_key": fld}.get(key, key)
        if col not in aggd.columns:
            raise ValueError(
                f"terms order target {key!r} is not _count/_key or a "
                f"sub-agg column of {sorted(aggd.columns)}")
        lead = (F.asc(col) if str(direction).lower() == "asc"
                else F.desc(col))
        cols = [lead, F.asc(fld)]
    else:
        cols = [F.asc("doc_count") if ascending
                else F.desc("doc_count"), F.asc(fld)]
    return aggd.orderBy(*cols).limit(size)


def rare_terms_agg(
    df: DataFrame, fld: str, max_doc_count: int = 1,
    sub_specs: dict[str, dict] | None = None,
) -> DataFrame:
    """``rare_terms``: buckets whose doc_count ≤ ``max_doc_count``,
    ordered count asc then key asc (RareTermsAggregationBuilder's
    long-tail view — the exact complement of terms top-N)."""
    sub_specs = sub_specs or {}
    aggd = (df.filter(F.col(fld).isNotNull())
            .groupBy(fld)
            .agg(F.count("*").alias("doc_count"),
                 *metric_agg_cols(sub_specs)))
    return (aggd.filter(F.col("doc_count") <= max_doc_count)
            .orderBy(F.asc("doc_count"), F.asc(fld)))


def composite_agg(
    df: DataFrame,
    sources: list[str | Column],
    sub_specs: dict[str, dict] | None = None,
    after: list | None = None,
    size: int | None = None,
    names: list[str] | None = None,
) -> DataFrame:
    """Composite = full multi-source groupBy; pagination is usually
    unnecessary (B5 — one job returns everything).  ``after`` + ``size``
    implement the reference's after_key protocol anyway (the plugin's
    CompositeRetriever pages in size-N slices,
    CompositeRetriever.java:185-232): buckets sort by the source
    tuple, ``after`` resumes strictly past that tuple via the same
    lexicographic predicate search_after uses — applied to the
    AGGREGATED rows, so a page costs one agg + a tuple filter, and a
    client can replay the reference's paging loop verbatim.  A source
    may be a Column (e.g. a date_histogram bucket or an
    entity-extraction expression standing in for the painless-script
    source, QueryUtil.java:23-45); named sources are required for
    pagination (tuple values must map to output columns)."""
    sub_specs = sub_specs or {}
    out = df.groupBy(*sources).agg(
        F.count("*").alias("doc_count"),
        *metric_agg_cols(sub_specs))
    if after is None and size is None:
        return out
    names = names or [s for s in sources if isinstance(s, str)]
    if len(names) != len(sources):
        raise ValueError(
            "composite after/size pagination needs source NAMES — "
            "string sources, or pass names= for aliased Columns")
    if after is not None:
        if isinstance(after, dict):  # the endpoint's after_key shape
            missing = [n for n in names if n not in after]
            if missing:
                raise ValueError(f"after key missing sources {missing}")
            after = [after[n] for n in names]
        if len(after) != len(names):
            raise ValueError(
                f"after key length {len(after)} != {len(names)} sources")
        pred = None
        eq = None
        for c, v in zip(names, after):
            col, lit = F.col(c), F.lit(v)
            branch = (col > lit) if eq is None else eq & (col > lit)
            pred = branch if pred is None else pred | branch
            eq = (col == lit) if eq is None else eq & (col == lit)
        out = out.filter(pred)
    out = out.orderBy(*[F.asc(c) for c in names])
    return out.limit(int(size)) if size is not None else out


# ---------------------------------------------------------------------------
# pipeline aggregations (§2.4)
# ---------------------------------------------------------------------------

def bucket_sort(df: DataFrame, sort_cols: list[tuple[str, str]],
                from_: int = 0, size: int | None = None) -> DataFrame:
    """bucket_sort(sort, from, size) — global, unlike the per-page sort
    the reference must merge client-side."""
    order = [F.desc(c) if d.lower() == "desc" else F.asc(c) for c, d in sort_cols]
    if size is not None:
        # limit-then-rank: orderBy().limit() is TakeOrderedAndProject
        # (per-partition heap, tiny exchange); the offset window only
        # ever sees from_+size rows
        top = df.orderBy(*order).limit(from_ + size)
        if from_:
            w = Window.orderBy(*order)
            top = (top.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") > from_).drop("_rn"))
        return top.orderBy(*order)
    out = df.orderBy(*order)
    if from_:
        # unbounded size + offset: a global window is unavoidable; fine
        # here because pipeline aggs run over already-reduced bucket
        # rows (≤ thousands), never raw documents
        w = Window.orderBy(*order)
        out = (out.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") > from_).drop("_rn"))
    return out


def serial_diff(df: DataFrame, metric_col: str, order_col: str,
                lag: int = 1, alias: str | None = None) -> DataFrame:
    """serial_diff: value - lag(value, n) over bucket order.

    Unpartitioned window by design: pipeline aggs consume sibling
    *buckets* of one histogram (bounded by the time span / interval,
    not by corpus size), so one task sees thousands of rows at most.
    Per-entity variants should pre-partition (see features.pipeline).
    """
    alias = alias or f"{metric_col}_diff"
    w = Window.orderBy(order_col)
    return df.withColumn(alias, F.col(metric_col) - F.lag(metric_col, lag).over(w))


def min_bucket(df: DataFrame, metric_col: str) -> DataFrame:
    """min_bucket: min of a metric across sibling buckets."""
    return df.agg(F.min(metric_col).alias(f"min_{metric_col}"))


def sibling_bucket(df: DataFrame, metric_col: str, stat: str) -> DataFrame:
    """max_bucket / sum_bucket / avg_bucket / stats_bucket family:
    one reduction over sibling buckets (min_bucket's generalization)."""
    fns = {"min": F.min, "max": F.max, "sum": F.sum, "avg": F.avg}
    if stat not in fns:
        raise ValueError(f"unsupported sibling bucket stat {stat!r}")
    return df.agg(fns[stat](metric_col).alias(f"{stat}_{metric_col}"))


def stats_bucket(df: DataFrame, metric_col: str) -> DataFrame:
    """``stats_bucket``: count/min/max/avg/sum of a metric across
    sibling buckets (StatsBucketPipelineAggregationBuilder)."""
    return df.agg(F.count(metric_col).alias(f"{metric_col}_count"),
                  F.min(metric_col).alias(f"{metric_col}_min"),
                  F.max(metric_col).alias(f"{metric_col}_max"),
                  F.avg(metric_col).alias(f"{metric_col}_avg"),
                  F.sum(metric_col).alias(f"{metric_col}_sum"))


def extended_stats_bucket(df: DataFrame, metric_col: str,
                          sigma: float = 2.0) -> DataFrame:
    """``extended_stats_bucket``: :func:`stats_bucket` plus
    sum_of_squares / population variance / std_deviation and the
    ``avg ± sigma·std`` bounds (ExtendedStatsBucketPipelineAggregation-
    Builder; OpenSearch extended stats are population moments)."""
    c = F.col(metric_col).cast("double")
    out = df.agg(
        F.count(metric_col).alias(f"{metric_col}_count"),
        F.min(metric_col).alias(f"{metric_col}_min"),
        F.max(metric_col).alias(f"{metric_col}_max"),
        F.avg(c).alias(f"{metric_col}_avg"),
        F.sum(c).alias(f"{metric_col}_sum"),
        F.sum(c * c).alias(f"{metric_col}_sum_of_squares"),
        F.var_pop(c).alias(f"{metric_col}_variance"),
        F.stddev_pop(c).alias(f"{metric_col}_std_deviation"))
    avg, sd = F.col(f"{metric_col}_avg"), F.col(f"{metric_col}_std_deviation")
    return (out.withColumn(f"{metric_col}_std_upper",
                           avg + F.lit(float(sigma)) * sd)
            .withColumn(f"{metric_col}_std_lower",
                        avg - F.lit(float(sigma)) * sd))


def percentiles_bucket(df: DataFrame, metric_col: str,
                       percents: list[float] | None = None) -> DataFrame:
    """``percentiles_bucket``: percentiles of a metric across sibling
    buckets.  EXACT here (pipeline aggs consume already-reduced bucket
    rows — thousands at most — so the per-group buffering that rules
    out exact percentiles on raw documents doesn't apply)."""
    pcts = [p / 100.0 for p in (percents or [50.0])]
    col = (F.percentile(metric_col, F.lit(pcts[0])) if len(pcts) == 1
           else F.percentile(metric_col,
                             F.array(*[F.lit(p) for p in pcts])))
    return df.agg(col.alias(f"{metric_col}_percentiles"))


def _compile_bucket_script(script: str, paths: dict[str, str],
                           extra_ok: str = "") -> Column:
    """Painless-subset bucket script → Column: ``params.X`` resolves to
    the buckets_path column for X; what remains must be PURE arithmetic
    (numbers + operators — the only shapes the plugin-era dashboards
    use).  After substitution the backticked column refs are stripped
    and any leftover identifier character rejects the script, so no
    name other than the mapped columns can reach Catalyst."""
    import re

    expr = script
    for var, col in sorted(paths.items(), key=lambda kv: -len(kv[0])):
        expr = expr.replace(f"params.{var}", f"`{col}`")
    bare = re.sub(r"`[^`]*`", "", expr)
    if re.search(r"[A-Za-z_`]", bare) or \
            not set(bare) <= set("0123456789. +-*/()%,<>=!&|" + extra_ok):
        raise ValueError(f"unsupported bucket script: {script!r}")
    return F.expr(expr)


def bucket_script(df: DataFrame, paths: dict[str, str], script: str,
                  alias: str) -> DataFrame:
    """bucket_script pipeline agg: a new per-bucket column computed
    from sibling metric columns (arithmetic painless subset)."""
    return df.withColumn(alias,
                         _compile_bucket_script(script, paths)
                         .cast("double"))


def bucket_selector(df: DataFrame, paths: dict[str, str],
                    script: str) -> DataFrame:
    """bucket_selector pipeline agg: keep buckets where the predicate
    over sibling metrics holds (comparison/boolean painless subset)."""
    return df.filter(_compile_bucket_script(script, paths))


def derivative(df: DataFrame, metric_col: str, order_col: str,
               alias: str | None = None) -> DataFrame:
    """derivative pipeline agg ≡ serial_diff with lag 1
    (DerivativePipelineAggregationBuilder, unit-less form)."""
    return serial_diff(df, metric_col, order_col, lag=1,
                       alias=alias or f"{metric_col}_deriv")


def cumulative_sum(df: DataFrame, metric_col: str, order_col: str,
                   alias: str | None = None) -> DataFrame:
    """cumulative_sum pipeline agg: running total over bucket order
    (same unpartitioned-window scope note as :func:`serial_diff`)."""
    alias = alias or f"{metric_col}_cumsum"
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(alias, F.sum(metric_col).over(w))


def moving_avg(df: DataFrame, metric_col: str, order_col: str,
               window: int = 5, alias: str | None = None) -> DataFrame:
    """moving average over the trailing ``window`` buckets (inclusive),
    partial at the head like OpenSearch moving_fn unshifted windows."""
    alias = alias or f"{metric_col}_mavg"
    w = Window.orderBy(order_col).rowsBetween(-(window - 1), 0)
    return df.withColumn(alias, F.avg(metric_col).over(w))

# ---------------------------------------------------------------------------
# moving_fn / normalize / moving_percentiles / cumulative_cardinality —
# the remaining commonly-used pipeline aggregations
# (MovFnPipelineAggregationBuilder, NormalizePipelineAggregator,
# MovingPercentilesPipelineAggregationBuilder,
# CumulativeCardinalityPipelineAggregationBuilder)
# ---------------------------------------------------------------------------

_MOVING_SIMPLE = {"max": F.max, "min": F.min, "sum": F.sum,
                  "unweightedAvg": F.avg, "stdDev": F.stddev_pop}


def _moving_window(order_col: str, window: int, shift: int):
    """The MovFn window frame: with ``shift=0`` the window is the
    ``window`` buckets strictly BEFORE the current one; ``shift=1``
    slides it right to include the current bucket (the documented
    MovFnPipelineAggregator semantics — shift moves the window end)."""
    if window < 1:
        raise ValueError("moving_fn window must be >= 1")
    return Window.orderBy(order_col).rowsBetween(
        -window + shift, shift - 1)


def moving_fn(df: DataFrame, metric_col: str, order_col: str,
              window: int, fn: str = "unweightedAvg", shift: int = 0,
              alpha: float = 0.3, alias: str | None = None) -> DataFrame:
    """``moving_fn`` pipeline agg: one of the MovingFunctions library
    functions slid across sibling buckets.

    Supported ``fn``: max / min / sum / unweightedAvg / stdDev (the
    simple reductions, pure window aggregates) and linearWeightedAvg /
    ewma (position-weighted — computed with an ``aggregate`` HOF over
    the collected window, still whole-stage codegen; window size is a
    user constant, so the per-row list is bounded).  Empty windows
    yield null (MovingFunctions return NaN; null is the relational
    rendering).  Same unpartitioned-window scope note as serial_diff:
    pipeline aggs consume already-reduced sibling buckets."""
    alias = alias or f"{metric_col}_movfn"
    w = _moving_window(order_col, window, shift)
    if fn in _MOVING_SIMPLE:
        return df.withColumn(alias, _MOVING_SIMPLE[fn](metric_col).over(w))
    if fn not in ("linearWeightedAvg", "ewma"):
        raise ValueError(f"unsupported moving_fn function {fn!r}")
    xs = F.filter(F.collect_list(F.col(metric_col).cast("double")).over(w),
                  lambda x: x.isNotNull())
    if fn == "linearWeightedAvg":
        # weights 1..n, most-recent bucket heaviest (MovingFunctions
        # .linearWeightedAvg): Σ i·x_i / Σ i
        num = F.aggregate(
            F.zip_with(xs, F.sequence(F.lit(1), F.greatest(F.size(xs),
                                                           F.lit(1))),
                       lambda x, i: x * i.cast("double")),
            F.lit(0.0), lambda a, v: a + v)
        den = (F.size(xs) * (F.size(xs) + F.lit(1)) / F.lit(2)).cast("double")
        col = F.when(F.size(xs) > 0, num / den)
    else:
        # ewma: avg ← α·x + (1−α)·avg, oldest→newest, first value seeds
        a = float(alpha)
        acc0 = F.struct(F.lit(0.0).alias("a"), F.lit(False).alias("s"))
        col = F.when(F.size(xs) > 0, F.aggregate(
            xs, acc0,
            lambda acc, x: F.struct(
                F.when(acc["s"], F.lit(a) * x + F.lit(1.0 - a) * acc["a"])
                .otherwise(x).alias("a"),
                F.lit(True).alias("s")),
            lambda acc: acc["a"]))
    return df.withColumn(alias, col)


_NORMALIZE_METHODS = ("rescale_0_1", "rescale_0_100", "percent_of_sum",
                      "mean", "z-score", "softmax")


def normalize_agg(df: DataFrame, metric_col: str, method: str,
                  alias: str | None = None) -> DataFrame:
    """``normalize`` pipeline agg: rescale a metric across ALL sibling
    buckets (NormalizePipelineAggregator methods, with its documented
    formulas — ``mean`` is the reference's (x − mean)/(max − min)).
    One unbounded window over the sibling-bucket frame (bounded by the
    histogram span, not corpus size)."""
    alias = alias or f"{metric_col}_norm"
    w = (Window.orderBy(metric_col)
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    x = F.col(metric_col).cast("double")
    mn, mx = F.min(x).over(w), F.max(x).over(w)
    if method == "rescale_0_1":
        col = (x - mn) / (mx - mn)
    elif method == "rescale_0_100":
        col = F.lit(100.0) * (x - mn) / (mx - mn)
    elif method == "percent_of_sum":
        col = x / F.sum(x).over(w)
    elif method == "mean":
        col = (x - F.avg(x).over(w)) / (mx - mn)
    elif method == "z-score":
        col = (x - F.avg(x).over(w)) / F.stddev_pop(x).over(w)
    elif method == "softmax":
        col = F.exp(x) / F.sum(F.exp(x)).over(w)
    else:
        raise ValueError(
            f"unsupported normalize method {method!r}; "
            f"supported: {_NORMALIZE_METHODS}")
    return df.withColumn(alias, col)


def moving_percentiles(df: DataFrame, metric_col: str, order_col: str,
                       window: int, percents: list[float] | None = None,
                       shift: int = 0,
                       alias: str | None = None) -> DataFrame:
    """``moving_percentiles`` pipeline agg: percentiles of the metric
    over the sliding MovFn window (same window/shift semantics as
    :func:`moving_fn`).  EXACT percentiles — the window holds at most
    ``window`` already-reduced bucket values."""
    alias = alias or f"{metric_col}_movpct"
    pcts = [p / 100.0 for p in (percents or [50.0])]
    w = _moving_window(order_col, window, shift)
    col = (F.percentile(metric_col, F.lit(pcts[0])) if len(pcts) == 1
           else F.percentile(metric_col,
                             F.array(*[F.lit(p) for p in pcts])))
    return df.withColumn(alias, col.over(w))


def cumulative_cardinality(df: DataFrame, field: str,
                           bucket_col: Column,
                           min_doc_count: int = 0,
                           alias: str = "cumulative_cardinality",
                           interval_ms: int | None = None) -> DataFrame:
    """``cumulative_cardinality`` pipeline agg: per date bucket, the
    number of DISTINCT ``field`` values seen in that bucket or any
    earlier one (the "total unique users so far" shape).

    The reference merges per-bucket HLL sketches; here the exact
    answer costs one extra shuffle and stays scale-safe: group by
    VALUE to find each value's first bucket (map-side partial agg —
    the shuffle carries one row per distinct value), count first
    occurrences per bucket, running-sum over the (tiny) bucket frame.
    Returns (bucket_start, doc_count, {alias}); buckets with no new
    values carry the previous total.  When ``min_doc_count`` is 0 and
    ``interval_ms`` given, gap buckets are emitted like
    date_histogram."""
    base = df.withColumn("bucket_start", bucket_col)
    counts = base.groupBy("bucket_start").agg(
        F.count("*").alias("doc_count"))
    firsts = (base.groupBy(field)
              .agg(F.min("bucket_start").alias("bucket_start"))
              .groupBy("bucket_start")
              .agg(F.count("*").alias("_new")))
    out = counts.join(firsts, "bucket_start", "left")
    if min_doc_count == 0 and interval_ms is not None:
        from pyspark.sql import types as T

        bounds = out.agg(F.min("bucket_start").alias("lo"),
                         F.max("bucket_start").alias("hi"))
        step = (F.expr(f"interval {interval_ms} milliseconds")
                if isinstance(out.schema["bucket_start"].dataType,
                              (T.TimestampType, T.TimestampNTZType))
                else F.lit(interval_ms))
        grid = bounds.select(F.explode(F.sequence(
            "lo", "hi", step)).alias("bucket_start"))
        out = (grid.join(out, "bucket_start", "left")
               .withColumn("doc_count",
                           F.coalesce("doc_count", F.lit(0))))
    w = (Window.orderBy("bucket_start")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (out.withColumn(
        alias, F.sum(F.coalesce("_new", F.lit(0))).over(w))
        .drop("_new").orderBy("bucket_start"))

# ---------------------------------------------------------------------------
# boxplot / median_absolute_deviation / string_stats / t_test /
# matrix_stats — the remaining metric aggregations of the reference's
# user-facing surface (BoxplotAggregationBuilder,
# MedianAbsoluteDeviationAggregationBuilder,
# StringStatsAggregationBuilder, TTestAggregationBuilder and the
# matrix-stats module's MatrixStatsAggregationBuilder)
# ---------------------------------------------------------------------------


def _pct_col(field: str, pcts: list[float], exact: bool,
             accuracy: int = 10_000) -> Column:
    arr = (F.array(*[F.lit(p) for p in pcts]) if len(pcts) > 1
           else F.lit(pcts[0]))
    return (F.percentile(field, arr) if exact
            else F.percentile_approx(field, arr, F.lit(accuracy)))


def boxplot_cols(field: str, alias: str, exact: bool = False) -> list[Column]:
    """``boxplot`` agg → min/max/q1/q2/q3 columns.  Quartiles are
    approximate by default (same sketch-at-scale posture as
    percentiles; ``exact`` opts into F.percentile for oracle runs)."""
    q = _pct_col(field, [0.25, 0.5, 0.75], exact)
    return [F.min(field).alias(f"{alias}_min"),
            F.max(field).alias(f"{alias}_max"),
            q.getItem(0).alias(f"{alias}_q1"),
            q.getItem(1).alias(f"{alias}_q2"),
            q.getItem(2).alias(f"{alias}_q3")]


def mad_agg(df: DataFrame, field: str,
            group_cols: list[str] | None = None,
            exact: bool = False, alias: str = "mad") -> DataFrame:
    """``median_absolute_deviation``: median(|x − median(x)|).

    Inherently two-pass (the deviation needs the group median before
    any value can be reduced): pass 1 computes per-group medians — one
    row per group — which broadcast back onto the rows; pass 2 reduces
    the absolute deviations.  Both passes are approximate by default
    (the reference uses t-digest); ``exact=True`` for oracle parity.
    The broadcast join ships only the tiny medians frame — the big
    side never shuffles beyond the two groupBys on the same keys."""
    group_cols = group_cols or []
    med = (df.groupBy(*group_cols)
           .agg(_pct_col(field, [0.5], exact).alias("_med")))
    if group_cols:
        joined = df.join(F.broadcast(med), group_cols)
    else:
        joined = df.crossJoin(F.broadcast(med))
    dev = F.abs(F.col(field) - F.col("_med"))
    return (joined.groupBy(*group_cols)
            .agg((F.percentile(dev, F.lit(0.5)) if exact else
                  F.percentile_approx(dev, F.lit(0.5), F.lit(10_000)))
                 .alias(alias)))


def string_stats_agg(df: DataFrame, field: str,
                     group_cols: list[str] | None = None,
                     show_distribution: bool = False) -> DataFrame:
    """``string_stats``: count, min/max/avg length, and Shannon
    entropy over the CHARACTER distribution of all values (the
    reference's definition — entropy of character frequencies across
    the whole bucket, not per doc).

    Length stats are pure codegen; entropy explodes to one row per
    (group, character) COUNT — the shuffle carries at most
    |alphabet| rows per group.  ``show_distribution`` adds the
    per-character probability map as a sorted array of (char, prob)
    structs."""
    group_cols = group_cols or []
    lens = (df.filter(F.col(field).isNotNull())
            .groupBy(*group_cols)
            .agg(F.count(field).alias("count"),
                 F.min(F.length(field)).alias("min_length"),
                 F.max(F.length(field)).alias("max_length"),
                 F.avg(F.length(field)).alias("avg_length")))
    chars = (df.filter(F.col(field).isNotNull())
             .select(*group_cols,
                     F.explode(F.split(F.col(field), "")).alias("_ch"))
             .filter(F.col("_ch") != "")
             .groupBy(*group_cols, "_ch")
             .agg(F.count("*").alias("_n")))
    w = (Window.partitionBy(*group_cols) if group_cols
         else Window.partitionBy(F.lit(1)))
    p = F.col("_n") / F.sum("_n").over(w)
    per_char = chars.withColumn("_p", p)
    ent_cols = [(-F.sum(F.col("_p") * F.log2("_p"))).alias("entropy")]
    if show_distribution:
        ent_cols.append(F.array_sort(F.collect_list(F.struct(
            F.col("_ch").alias("char"), F.col("_p").alias("prob"))))
            .alias("distribution"))
    ent = per_char.groupBy(*group_cols).agg(*ent_cols)
    if group_cols:
        return lens.join(ent, group_cols, "left")
    return lens.crossJoin(ent)


def t_test_agg(df: DataFrame, a_field: str, b_field: str,
               a_filter: Column | None = None,
               b_filter: Column | None = None,
               test_type: str = "heteroscedastic",
               group_cols: list[str] | None = None) -> DataFrame:
    """``t_test`` agg: two-sided p-value that two populations have the
    same mean.  ``paired`` compares two fields on the same rows;
    un-paired forms compare ``a_field`` under ``a_filter`` vs
    ``b_field`` under ``b_filter`` (``heteroscedastic`` = Welch,
    the reference's default; ``homoscedastic`` = pooled variance).

    The moments reduce in ONE pass with conditional aggregates (no
    second scan, no shuffle beyond the groupBy); the t → p-value map
    runs in an Arrow batch over the already-reduced group rows via
    the numpy incomplete-beta in ``functions.stats``."""
    import pandas as pd
    from pyspark.sql import types as T

    from ..functions.stats import t_sf_two_sided

    group_cols = group_cols or []
    if test_type == "paired":
        d = F.col(a_field) - F.col(b_field)
        ok = F.col(a_field).isNotNull() & F.col(b_field).isNotNull()
        d = F.when(ok, d)
        red = df.groupBy(*group_cols).agg(
            F.count(d).alias("_n"), F.avg(d).alias("_m"),
            F.var_samp(d).alias("_v"))
        t = F.col("_m") / F.sqrt(F.col("_v") / F.col("_n"))
        dof = (F.col("_n") - 1).cast("double")
    elif test_type in ("heteroscedastic", "homoscedastic"):
        a = F.when(a_filter if a_filter is not None else F.lit(True),
                   F.col(a_field))
        b = F.when(b_filter if b_filter is not None else F.lit(True),
                   F.col(b_field))
        red = df.groupBy(*group_cols).agg(
            F.count(a).alias("_na"), F.avg(a).alias("_ma"),
            F.var_samp(a).alias("_va"),
            F.count(b).alias("_nb"), F.avg(b).alias("_mb"),
            F.var_samp(b).alias("_vb"))
        na, nb = F.col("_na"), F.col("_nb")
        va, vb = F.col("_va"), F.col("_vb")
        if test_type == "heteroscedastic":
            se2 = va / na + vb / nb
            t = (F.col("_ma") - F.col("_mb")) / F.sqrt(se2)
            dof = (se2 * se2) / (
                (va / na) * (va / na) / (na - 1)
                + (vb / nb) * (vb / nb) / (nb - 1))
        else:
            sp2 = (((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
            t = (F.col("_ma") - F.col("_mb")) / \
                F.sqrt(sp2 * (1.0 / na + 1.0 / nb))
            dof = (na + nb - 2).cast("double")
    else:
        raise ValueError(f"unsupported t_test type {test_type!r}")
    red = red.withColumn("_t", t.cast("double")) \
             .withColumn("_df", dof.cast("double"))

    @F.pandas_udf(T.DoubleType())
    def _pval(ts, dfs):
        return pd.Series(t_sf_two_sided(ts.to_numpy("float64"),
                                        dfs.to_numpy("float64")))

    return red.select(*group_cols,
                      _pval(F.col("_t"), F.col("_df")).alias("p_value"))


def matrix_stats_agg(df: DataFrame, fields: list[str]) -> DataFrame:
    """``matrix_stats`` (matrix-stats module): one row per ordered
    field pair (field_a, field_b) with the per-``field_a`` moments —
    count / mean / variance (sample) / skewness / kurtosis
    (population-moment g1 / excess g2, Spark's definitions; the
    divisor conventions are documented here because the reference's
    running-moment forms differ in O(1/n) bias terms) — plus sample
    covariance and Pearson correlation of the pair.  One single-pass
    reduction; the pair count is |fields|² user constants."""
    if len(fields) < 2:
        raise ValueError("matrix_stats needs >= 2 fields")
    cols: list[Column] = []
    for fld in fields:
        cols += [F.count(fld).alias(f"_n_{fld}"),
                 F.avg(fld).alias(f"_m_{fld}"),
                 F.var_samp(fld).alias(f"_v_{fld}"),
                 F.skewness(fld).alias(f"_s_{fld}"),
                 F.kurtosis(fld).alias(f"_k_{fld}")]
    for fa in fields:
        for fb in fields:
            cols += [F.covar_samp(fa, fb).alias(f"_cov_{fa}_{fb}"),
                     F.corr(fa, fb).alias(f"_cor_{fa}_{fb}")]
    red = df.agg(*cols)
    pair_rows = [F.struct(
        F.lit(fa).alias("field_a"), F.lit(fb).alias("field_b"),
        F.col(f"_n_{fa}").alias("count"),
        F.col(f"_m_{fa}").alias("mean"),
        F.col(f"_v_{fa}").alias("variance"),
        F.col(f"_s_{fa}").alias("skewness"),
        F.col(f"_k_{fa}").alias("kurtosis"),
        F.col(f"_cov_{fa}_{fb}").alias("covariance"),
        F.col(f"_cor_{fa}_{fb}").alias("correlation"))
        for fa in fields for fb in fields]
    return (red.select(F.explode(F.array(*pair_rows)).alias("_r"))
            .select("_r.*"))

# ---------------------------------------------------------------------------
# nested / reverse_nested — scope-switching bucket aggs over
# array<struct> columns (NestedAggregationBuilder,
# ReverseNestedAggregationBuilder; the relational twin of the nested
# query at planner.py "nested")
# ---------------------------------------------------------------------------


def _strip_path(field: str, path: str) -> str:
    return field[len(path) + 1:] if field.startswith(path + ".") else field


def nested_agg(df: DataFrame, path: str,
               terms: dict[str, Any] | None = None,
               sub_specs: dict[str, dict] | None = None,
               reverse_nested_alias: str | None = None) -> DataFrame:
    """``nested`` agg: switch the aggregation scope to the elements of
    the ``path`` array<struct> column.

    Without ``terms``: one row of nested-doc count + metric sub-aggs
    over ALL elements.  With ``terms`` ({"field", "size"}): a terms
    bucket over a nested field, metric sub-aggs in nested scope, and —
    when ``reverse_nested_alias`` is set — the PARENT doc count per
    bucket (``reverse_nested`` semantics: how many outer docs have at
    least one qualifying element), computed as a distinct count of a
    per-parent id in the same exploded frame (one explode, one
    shuffle).  Inner field names may carry the ``path.`` prefix like
    the reference."""
    sub_specs = {
        alias: {k: ({**b, "field": _strip_path(b["field"], path)}
                    if "field" in b else b)
                for k, b in spec.items()}
        for alias, spec in (sub_specs or {}).items()}
    ex = (df.withColumn("_pid", F.monotonically_increasing_id())
          .select("_pid", F.explode(path).alias("_e"))
          .select("_pid", "_e.*"))
    if terms is None:
        return ex.agg(F.count("*").alias("doc_count"),
                      *metric_agg_cols(sub_specs))
    fld = _strip_path(terms["field"], path)
    size = terms.get("size", 10)
    aggs = [F.count("*").alias("doc_count"), *metric_agg_cols(sub_specs)]
    if reverse_nested_alias:
        aggs.append(F.countDistinct("_pid")
                    .alias(f"{reverse_nested_alias}_doc_count"))
    return (ex.groupBy(fld).agg(*aggs)
            .orderBy(F.desc("doc_count"), F.asc(fld)).limit(size))


# ---------------------------------------------------------------------------
# sampler / diversified_sampler — deterministic renderings
# (SamplerAggregationBuilder, DiversifiedAggregationBuilder)
# ---------------------------------------------------------------------------


def sampler_agg(df: DataFrame, shard_size: int, sort_col: str,
                sub_specs: dict[str, dict] | None = None,
                diversify_field: str | None = None,
                max_docs_per_value: int = 1,
                tie_col: str | None = None) -> DataFrame:
    """``sampler`` / ``diversified_sampler``: run sub-aggs over only
    the top-``shard_size`` docs by ``sort_col`` descending.

    The reference samples the top-scored docs PER SHARD (shard-local,
    order-dependent); this rendering is the deterministic global
    top-N — strictly stronger and reproducible across partitionings.
    ``diversify_field`` adds the diversified_sampler constraint: at
    most ``max_docs_per_value`` docs per distinct value enter the
    sample (window rank inside each value, then the global top-N).
    ``tie_col`` breaks sort ties deterministically.  The sample is
    TakeOrderedAndProject-sized (shard_size rows), never a full
    sort."""
    order = [F.desc(sort_col)] + \
        ([F.asc(tie_col)] if tie_col else [])
    cand = df
    if diversify_field is not None:
        w = Window.partitionBy(diversify_field).orderBy(*order)
        cand = (cand.withColumn("_drk", F.row_number().over(w))
                .filter(F.col("_drk") <= max_docs_per_value)
                .drop("_drk"))
    sample = cand.orderBy(*order).limit(shard_size)
    return sample.agg(F.count("*").alias("doc_count"),
                      *metric_agg_cols(sub_specs or {}))


def variable_width_histogram(df: DataFrame, field: str, buckets: int,
                             iters: int = 4) -> DataFrame:
    """``variable_width_histogram``: cluster a numeric field into up
    to ``buckets`` variable-width buckets — (key = cluster mean, min,
    max, doc_count), keys ascending.

    The reference's algorithm is a shard-local streaming clusterer
    whose buckets depend on doc order and shard layout
    (VariableWidthHistogramAggregator — explicitly not deterministic);
    this rendering is the deterministic twin, same posture as
    ``sampler_agg``: centroids seeded at the (i+0.5)/k quantiles
    (percentile_approx), refined with ``iters`` 1-D Lloyd passes.
    Every pass is ONE map-side-combinable aggregation — assignment is
    a codegen CASE over the k−1 midpoint boundaries (1-D nearest
    centroid ≡ binning by midpoints), so no pass shuffles more than
    k rows per partition and the driver only ever sees k centroids.
    Empty clusters collapse, so fewer than ``buckets`` rows can
    return (the reference merges too)."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1: {buckets}")
    v = F.col(field)
    vals = df.filter(v.isNotNull())
    qs = [(i + 0.5) / buckets for i in range(buckets)]
    row = vals.agg(F.percentile_approx(field, qs).alias("c")).collect()
    if not row or row[0]["c"] is None:
        return local_df(df.sparkSession,
                        [], "key double, min double, max double, doc_count long")
    cents = sorted(set(float(c) for c in row[0]["c"]))

    def assign(cs: list[float]):
        mids = [(cs[i] + cs[i + 1]) / 2.0 for i in range(len(cs) - 1)]
        e = F.lit(0)
        for m in mids:
            e = e + F.when(v >= F.lit(m), 1).otherwise(0)
        return e

    stats = None
    for _ in range(max(1, iters)):
        stats = (vals.groupBy(assign(cents).alias("_c"))
                 .agg(F.sum(v).alias("_s"), F.count("*").alias("_n"),
                      F.min(v).alias("_mn"), F.max(v).alias("_mx"))
                 .collect())
        new = sorted(float(r["_s"]) / r["_n"] for r in stats)
        if new == cents:
            break
        cents = new
    out = sorted(
        (float(r["_s"]) / r["_n"], float(r["_mn"]), float(r["_mx"]),
         int(r["_n"])) for r in stats)
    return local_df(
        df.sparkSession, out,
        "key double, min double, max double, doc_count long")


def geo_distance_agg(
    df: DataFrame,
    field: str,
    origin: Any,
    ranges: list[dict],
    unit: str = "m",
    sub_specs: dict[str, dict] | None = None,
) -> DataFrame:
    """``geo_distance`` range agg (GeoDistanceAggregationBuilder):
    half-open [from, to) distance rings around ``origin``, bucket
    bounds expressed in ``unit`` (default meters).  The distance is
    computed ONCE per row in codegen, then bucketed via the same
    broadcast range join as :func:`range_agg` (rings may overlap, a
    groupBy key cannot express that)."""
    from ..functions.geo import (_UNIT_M, geo_columns, haversine_m,
                                 parse_point)

    sub_specs = sub_specs or {}
    if unit not in _UNIT_M:
        raise ValueError(f"unknown distance unit {unit!r}")
    scale = _UNIT_M[unit]
    lat, lon = parse_point(origin)
    lat_c, lon_c = geo_columns(df, field)
    spark = df.sparkSession
    rows = [(i,
             None if r.get("from") is None else float(r["from"]),
             None if r.get("to") is None else float(r["to"]))
            for i, r in enumerate(ranges)]
    rdf = F.broadcast(local_df(
        spark, rows, "range_id int, from_v double, to_v double"))
    d = (haversine_m(lat_c, lon_c, lat, lon) / F.lit(scale)).alias("_dist")
    joined = (df.withColumn("_dist", d)
              .join(rdf,
                    (F.col("from_v").isNull()
                     | (F.col("_dist") >= F.col("from_v")))
                    & (F.col("to_v").isNull()
                       | (F.col("_dist") < F.col("to_v")))))
    out = (joined.groupBy("range_id", "from_v", "to_v")
           .agg(F.count("*").alias("doc_count"),
                *metric_agg_cols(sub_specs)))
    return out.orderBy("range_id")


def geo_grid_agg(
    df: DataFrame,
    field: str,
    precision: int,
    kind: str = "geohash_grid",
    size: int = 10_000,
    sub_specs: dict[str, dict] | None = None,
) -> DataFrame:
    """``geohash_grid`` / ``geotile_grid`` bucket agg: cell key in
    codegen, one map-side-combinable groupBy (key space is bounded:
    32^precision hashes / 4^zoom tiles), top ``size`` cells by doc
    count desc then key asc (the reference's bucket order)."""
    from ..functions.geo import geo_columns, geohash_key, geotile_key

    sub_specs = sub_specs or {}
    lat_c, lon_c = geo_columns(df, field)
    if kind == "geohash_grid":
        key = geohash_key(lat_c, lon_c, precision)
    elif kind == "geotile_grid":
        key = geotile_key(lat_c, lon_c, precision)
    else:
        raise ValueError(f"unknown grid agg kind {kind!r}")
    return (df.groupBy(key.alias("key"))
            .agg(F.count("*").alias("doc_count"),
                 *metric_agg_cols(sub_specs))
            .orderBy(F.desc("doc_count"), F.asc("key"))
            .limit(size))


def geo_bounds_agg(df: DataFrame, field: str) -> DataFrame:
    """``geo_bounds`` metric agg: the tightest lat/lon box over the
    points (GeoBoundsAggregationBuilder with wrap_longitude=false —
    the dateline-wrapping variant is a response-size optimization the
    engine's flat output does not need; documented divergence)."""
    from ..functions.geo import geo_columns

    lat_c, lon_c = geo_columns(df, field)
    return df.agg(F.max(lat_c).alias("top_left_lat"),
                  F.min(lon_c).alias("top_left_lon"),
                  F.min(lat_c).alias("bottom_right_lat"),
                  F.max(lon_c).alias("bottom_right_lon"))


def geo_centroid_agg(df: DataFrame, field: str) -> DataFrame:
    """``geo_centroid`` metric agg: arithmetic mean of lat/lon over
    non-null points plus the contributing count
    (GeoCentroidAggregationBuilder accumulates the same per-dimension
    mean over doc-values points)."""
    from ..functions.geo import geo_columns

    lat_c, lon_c = geo_columns(df, field)
    ok = lat_c.isNotNull() & lon_c.isNotNull()
    return df.agg(
        F.avg(F.when(ok, lat_c)).alias("lat"),
        F.avg(F.when(ok, lon_c)).alias("lon"),
        F.count(F.when(ok, F.lit(1))).alias("count"))
