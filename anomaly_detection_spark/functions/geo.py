"""Geo-point expressions: haversine distance, geohash / geotile cell
keys, distance-unit and point parsing — every expression here is a
whole-stage-codegen Column (no UDFs, no shuffles), so geo predicates
push down to the scan like any numeric filter.

Reference semantics: the OpenSearch geo_point surface
(GeoDistanceQueryBuilder, GeoBoundingBoxQueryBuilder,
GeoPolygonQueryBuilder, GeoHashGridAggregationBuilder /
GeoTileGridAggregationBuilder, GeoBoundsAggregationBuilder /
GeoCentroidAggregationBuilder — OpenSearch core; the AD plugin issues
none of these itself, this is user-surface ring like regexp/fuzzy).

Scale shape: distance / cell-key computation is per-row arithmetic in
codegen — at 100 TB the cost is the scan itself; grid aggs reduce by
cell key with map-side partial aggregation (bounded key space:
32^precision geohash cells, 4^zoom tiles).

Storage convention: a geo_point "field" is either a struct column
with ``lat``/``lon`` fields or a pair of double columns
``<field>_lat`` / ``<field>_lon`` (the engine's tables are flat
parquet; the reference stores doc-values-encoded lat/lon pairs the
same way, LatLonDocValuesField).
"""
from __future__ import annotations

import math
import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Lucene GeoUtils.EARTH_MEAN_RADIUS_METERS (SloppyMath.haversinMeters
# uses the IUGG mean radius) — OpenSearch arc distances are computed
# on this sphere.
EARTH_MEAN_RADIUS_M = 6_371_008.7714

# OpenSearch DistanceUnit (DistanceUnit.java): meters per unit.
_UNIT_M: dict[str, float] = {
    "m": 1.0, "meters": 1.0,
    "km": 1000.0, "kilometers": 1000.0,
    "mi": 1609.344, "miles": 1609.344,
    "yd": 0.9144, "yards": 0.9144,
    "ft": 0.3048, "feet": 0.3048,
    "in": 0.0254, "inch": 0.0254,
    "nmi": 1852.0, "nauticalmiles": 1852.0, "NM": 1852.0,
    "cm": 0.01, "centimeters": 0.01,
    "mm": 0.001, "millimeters": 0.001,
}

# Web-Mercator latitude bound (GeoTileUtils.LATITUDE_MASK) — geotile
# cells only exist inside it; OpenSearch drops points outside.
MERCATOR_LAT_MAX = 85.0511287798066

_GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def parse_distance(spec: str | int | float) -> float:
    """``"10km"`` / ``"500m"`` / bare number (meters) → meters.

    OpenSearch DistanceUnit.parse: unit suffix optional, default
    meters; unknown suffixes raise by name.
    """
    if isinstance(spec, (int, float)):
        return float(spec)
    m = re.fullmatch(r"\s*([+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)\s*"
                     r"([a-zA-Z]*)\s*", str(spec))
    if not m:
        raise ValueError(f"unparseable distance {spec!r}")
    val, unit = float(m.group(1)), m.group(2)
    if not unit:
        return val
    if unit not in _UNIT_M:
        raise ValueError(f"unknown distance unit {unit!r} in {spec!r}")
    return val * _UNIT_M[unit]


def parse_point(spec: Any) -> tuple[float, float]:
    """A geo-point literal → (lat, lon).

    Accepted forms (GeoUtils.parseGeoPoint): ``{"lat":.., "lon":..}``,
    ``[lon, lat]`` (GeoJSON order!), ``"lat,lon"`` string.  Geohash
    point strings are out of subset and raise by name.
    """
    if isinstance(spec, dict):
        extra = set(spec) - {"lat", "lon"}
        if extra or "lat" not in spec or "lon" not in spec:
            raise ValueError(f"geo point object needs lat/lon, got {spec!r}")
        return float(spec["lat"]), float(spec["lon"])
    if isinstance(spec, (list, tuple)):
        if len(spec) != 2:
            raise ValueError(f"geo point array must be [lon, lat]: {spec!r}")
        return float(spec[1]), float(spec[0])
    if isinstance(spec, str):
        if "," not in spec:
            raise ValueError(
                f"geohash-encoded points are unsupported: {spec!r}")
        lat_s, lon_s = spec.split(",", 1)
        return float(lat_s), float(lon_s)
    raise ValueError(f"unparseable geo point {spec!r}")


def geo_columns(df: DataFrame, field: str) -> tuple[Column, Column]:
    """Resolve a geo_point field name to (lat, lon) Columns — struct
    column with lat/lon fields, or ``<field>_lat`` / ``<field>_lon``
    pair."""
    if field in df.columns:
        dt = df.schema[field].dataType
        if isinstance(dt, T.StructType) and {"lat", "lon"} <= set(
                dt.fieldNames()):
            return F.col(f"{field}.lat"), F.col(f"{field}.lon")
        raise ValueError(
            f"geo field {field!r} is not a lat/lon struct")
    la, lo = f"{field}_lat", f"{field}_lon"
    if la in df.columns and lo in df.columns:
        return F.col(la), F.col(lo)
    raise ValueError(
        f"geo field {field!r}: expected a lat/lon struct column or "
        f"{la!r}/{lo!r} columns")


def haversine_m(lat_col: Column, lon_col: Column,
                lat: float, lon: float) -> Column:
    """Great-circle distance in meters from each row's point to a
    fixed origin (Lucene SloppyMath.haversinMeters semantics on the
    mean-radius sphere) — pure codegen."""
    rl1 = F.radians(lat_col)
    rl2 = math.radians(lat)
    dlat = (F.radians(lat_col) - F.lit(math.radians(lat))) / 2.0
    dlon = (F.radians(lon_col) - F.lit(math.radians(lon))) / 2.0
    h = (F.sin(dlat) * F.sin(dlat)
         + F.cos(rl1) * F.lit(math.cos(rl2)) * F.sin(dlon) * F.sin(dlon))
    # guard fp drift: h can exceed 1 by ~1e-16 at antipodes
    return (F.lit(2.0 * EARTH_MEAN_RADIUS_M)
            * F.asin(F.sqrt(F.least(h, F.lit(1.0)))))


def geotile_key(lat_col: Column, lon_col: Column, precision: int) -> Column:
    """Web-Mercator tile key ``"z/x/y"`` at zoom ``precision``
    (GeoTileUtils.longEncode/stringEncode) — pure codegen.  Points
    outside the Mercator latitude bound are clamped into the edge
    tiles, matching GeoTileUtils (it masks latitude before encoding).
    """
    if not 0 <= precision <= 29:
        raise ValueError(f"geotile precision must be 0..29: {precision}")
    n = float(1 << precision)
    x = F.floor((lon_col + 180.0) / 360.0 * n)
    x = F.greatest(F.lit(0), F.least(x, F.lit(int(n) - 1)))
    latc = F.greatest(F.lit(-MERCATOR_LAT_MAX),
                      F.least(lat_col, F.lit(MERCATOR_LAT_MAX)))
    latr = F.radians(latc)
    y = F.floor((1.0 - F.log(F.tan(latr) + 1.0 / F.cos(latr))
                 / F.lit(math.pi)) / 2.0 * n)
    y = F.greatest(F.lit(0), F.least(y, F.lit(int(n) - 1)))
    return F.concat_ws("/", F.lit(str(precision)),
                       x.cast("long").cast("string"),
                       y.cast("long").cast("string"))


def geotile_key_sql(lat_expr: str, lon_expr: str, precision: int) -> str:
    """The identical geotile computation as an ANSI-SQL expression
    (DuckDB-runnable) — used by oracle twins so the driver can
    hash-match grid buckets."""
    n = 1 << precision
    lat_c = (f"greatest(-{MERCATOR_LAT_MAX!r}, "
             f"least({lat_expr}, {MERCATOR_LAT_MAX!r}))")
    x = (f"greatest(0, least(cast(floor(({lon_expr} + 180.0) / 360.0 "
         f"* {n}) as bigint), {n - 1}))")
    y = (f"greatest(0, least(cast(floor((1.0 - ln(tan(radians({lat_c})) "
         f"+ 1.0 / cos(radians({lat_c}))) / pi()) / 2.0 * {n}) as "
         f"bigint), {n - 1}))")
    return f"concat('{precision}', '/', {x}, '/', {y})"


def geohash_key(lat_col: Column, lon_col: Column, precision: int) -> Column:
    """Geohash cell string at ``precision`` chars (Lucene
    Geohash.stringEncode) — pure codegen: quantize lat/lon, interleave
    bits (lon first), map 5-bit groups through the base-32 alphabet.
    The bit-interleave is unrolled (5·precision ≤ 60 terms), which
    whole-stage codegen folds into straight-line arithmetic.
    """
    if not 1 <= precision <= 12:
        raise ValueError(f"geohash precision must be 1..12: {precision}")
    nbits = 5 * precision
    nlon = (nbits + 1) // 2  # even bit positions (0-based MSB) = lon
    nlat = nbits - nlon
    lon_q = F.floor((lon_col + 180.0) / 360.0 * F.lit(float(1 << nlon)))
    lon_q = F.greatest(
        F.lit(0), F.least(lon_q, F.lit((1 << nlon) - 1))).cast("long")
    lat_q = F.floor((lat_col + 90.0) / 180.0 * F.lit(float(1 << nlat)))
    lat_q = F.greatest(
        F.lit(0), F.least(lat_q, F.lit((1 << nlat) - 1))).cast("long")
    val: Column = F.lit(0).cast("long")
    for i in range(nbits):
        if i % 2 == 0:
            bit = F.shiftright(lon_q, nlon - 1 - i // 2)
        else:
            bit = F.shiftright(lat_q, nlat - 1 - i // 2)
        val = val + F.shiftleft(bit.bitwiseAND(F.lit(1)),
                                nbits - 1 - i)
    alpha = F.array(*[F.lit(c) for c in _GEOHASH_ALPHABET])
    chars = [F.element_at(
        alpha,
        (F.shiftright(val, 5 * (precision - 1 - k))
         .bitwiseAND(F.lit(31)) + 1).cast("int"))
        for k in range(precision)]
    return F.concat(*chars)


def geohash_encode(lat: float, lon: float, precision: int) -> str:
    """Driver-side twin of :func:`geohash_key` for tests/oracles."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits - nlon
    lon_q = min(max(int(math.floor((lon + 180.0) / 360.0 * (1 << nlon))),
                    0), (1 << nlon) - 1)
    lat_q = min(max(int(math.floor((lat + 90.0) / 180.0 * (1 << nlat))),
                    0), (1 << nlat) - 1)
    val = 0
    for i in range(nbits):
        bit = ((lon_q >> (nlon - 1 - i // 2)) if i % 2 == 0
               else (lat_q >> (nlat - 1 - i // 2))) & 1
        val |= bit << (nbits - 1 - i)
    return "".join(_GEOHASH_ALPHABET[(val >> (5 * (precision - 1 - k))) & 31]
                   for k in range(precision))


def point_in_polygon(lat_col: Column, lon_col: Column,
                     points: list[tuple[float, float]]) -> Column:
    """Even-odd-rule point-in-polygon over a fixed vertex list
    ((lat, lon) tuples) — the edge loop is unrolled into codegen XOR
    terms (GeoPolygonQueryBuilder's ray-casting semantics; boundary
    behavior is edge-function-exact like Lucene's tessellation, not
    specified beyond that).  Horizontal edges never toggle (the
    crossing guard is false), so no division-by-zero path exists.
    """
    if len(points) < 3:
        raise ValueError("geo_polygon needs at least 3 points")
    inside: Column = F.lit(False)
    n = len(points)
    for i in range(n):
        y1, x1 = points[i]
        y2, x2 = points[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge: (y1 > lat) != (y2 > lat) is false
        crosses = ((F.lit(y1) > lat_col) != (F.lit(y2) > lat_col))
        x_at = (F.lit(x2 - x1) * (lat_col - F.lit(y1))
                / F.lit(y2 - y1) + F.lit(x1))
        inside = inside != (crosses & (lon_col < x_at))
    return inside
