"""Geo ring: geo_distance / geo_bounding_box / geo_polygon queries,
geo_distance / geohash_grid / geotile_grid / geo_bounds / geo_centroid
aggs, `_geo_distance` sort — every kernel checked against an
independent numpy / pure-python oracle."""
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.functions.geo import (
    EARTH_MEAN_RADIUS_M, MERCATOR_LAT_MAX, geohash_encode, parse_distance,
    parse_point)
from anomaly_detection_spark.query.aggs_body import run_aggs
from anomaly_detection_spark.query.planner import compile_filter, search


def _points(spark, n=500, seed=7):
    """Deterministic scattered points with ids; returns (df, numpy
    lat, numpy lon)."""
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-89.0, 89.0, n)
    lon = rng.uniform(-180.0, 180.0, n)
    rows = [(i, float(lat[i]), float(lon[i]), float(i % 13))
            for i in range(n)]
    df = spark.createDataFrame(
        rows, "id long, loc_lat double, loc_lon double, value double")
    return df, lat, lon


def _haversine_np(lat, lon, lat0, lon0):
    p1, p0 = np.radians(lat), math.radians(lat0)
    dphi = (p1 - p0) / 2.0
    dlmb = (np.radians(lon) - math.radians(lon0)) / 2.0
    h = np.sin(dphi) ** 2 + np.cos(p1) * math.cos(p0) * np.sin(dlmb) ** 2
    return 2.0 * EARTH_MEAN_RADIUS_M * np.arcsin(np.sqrt(np.minimum(h, 1.0)))


def test_parse_distance_units():
    assert parse_distance("10km") == 10_000.0
    assert parse_distance("500") == 500.0
    assert parse_distance(250) == 250.0
    assert parse_distance("1mi") == pytest.approx(1609.344)
    assert parse_distance("2nmi") == 3704.0
    with pytest.raises(ValueError, match="unknown distance unit"):
        parse_distance("3parsecs")
    with pytest.raises(ValueError, match="unparseable"):
        parse_distance("fast")


def test_parse_point_forms():
    assert parse_point({"lat": 1.5, "lon": -2.0}) == (1.5, -2.0)
    assert parse_point([-2.0, 1.5]) == (1.5, -2.0)  # GeoJSON lon,lat
    assert parse_point("1.5,-2.0") == (1.5, -2.0)
    with pytest.raises(ValueError, match="geohash"):
        parse_point("u33dbc")
    with pytest.raises(ValueError, match="lat/lon"):
        parse_point({"latitude": 1, "longitude": 2})


def test_geo_distance_query_matches_numpy(spark):
    df, lat, lon = _points(spark)
    origin = (10.0, 20.0)
    radius_km = 3000.0
    cond = compile_filter(df, {"geo_distance": {
        "distance": f"{radius_km}km",
        "loc": {"lat": origin[0], "lon": origin[1]}}})
    got = {r["id"] for r in df.filter(cond).select("id").collect()}
    d = _haversine_np(lat, lon, *origin)
    want = {i for i in range(len(lat)) if d[i] <= radius_km * 1000.0}
    assert got == want and len(want) > 10


def test_geo_distance_plane_rejected(spark):
    df, _, _ = _points(spark, n=5)
    with pytest.raises(ValueError, match="distance_type"):
        compile_filter(df, {"geo_distance": {
            "distance": "1km", "distance_type": "plane",
            "loc": [0.0, 0.0]}})


def test_geo_bounding_box_incl_dateline_wrap(spark):
    df, lat, lon = _points(spark)
    # normal box
    cond = compile_filter(df, {"geo_bounding_box": {"loc": {
        "top_left": {"lat": 60.0, "lon": -30.0},
        "bottom_right": {"lat": -10.0, "lon": 40.0}}}})
    got = {r["id"] for r in df.filter(cond).select("id").collect()}
    want = {i for i in range(len(lat))
            if -10.0 <= lat[i] <= 60.0 and -30.0 <= lon[i] <= 40.0}
    assert got == want and want
    # dateline-crossing box: left 150 > right -150 wraps
    cond = compile_filter(df, {"geo_bounding_box": {"loc": {
        "top": 80.0, "left": 150.0, "bottom": -80.0, "right": -150.0}}})
    got = {r["id"] for r in df.filter(cond).select("id").collect()}
    want = {i for i in range(len(lat))
            if -80.0 <= lat[i] <= 80.0
            and (lon[i] >= 150.0 or lon[i] <= -150.0)}
    assert got == want and want


def _pip_np(lat, lon, pts):
    inside = np.zeros(lat.shape, dtype=bool)
    n = len(pts)
    for i in range(n):
        y1, x1 = pts[i]
        y2, x2 = pts[(i + 1) % n]
        if y1 == y2:
            continue
        crosses = (y1 > lat) != (y2 > lat)
        x_at = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        inside ^= crosses & (lon < x_at)
    return inside


def test_geo_polygon_concave_matches_numpy(spark):
    df, lat, lon = _points(spark, n=800, seed=11)
    # concave "arrowhead" polygon
    pts = [(0.0, -60.0), (50.0, 0.0), (0.0, 60.0), (20.0, 0.0)]
    cond = compile_filter(df, {"geo_polygon": {"loc": {
        "points": [{"lat": la, "lon": lo} for la, lo in pts]}}})
    got = {r["id"] for r in df.filter(cond).select("id").collect()}
    inside = _pip_np(lat, lon, pts)
    want = set(np.nonzero(inside)[0].tolist())
    assert got == want and len(want) > 5


def test_geo_queries_are_pure_codegen(spark):
    df, _, _ = _points(spark, n=5)
    for q in ({"geo_distance": {"distance": "1km", "loc": [0.0, 0.0]}},
              {"geo_polygon": {"loc": {"points": [[0, 0], [1, 1], [0, 2]]}}}):
        plan = df.filter(compile_filter(df, q))._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def _geohash_bisect(lat, lon, precision):
    """Independent oracle: the classic interval-bisection encoder
    (textbook algorithm, no bit interleave)."""
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_iv, lon_iv = [-90.0, 90.0], [-180.0, 180.0]
    out, bit, ch, even = [], 0, 0, True
    while len(out) < precision:
        iv, v = (lon_iv, lon) if even else (lat_iv, lat)
        mid = (iv[0] + iv[1]) / 2
        if v >= mid:
            ch |= 1 << (4 - bit)
            iv[0] = mid
        else:
            iv[1] = mid
        even = not even
        if bit < 4:
            bit += 1
        else:
            out.append(alpha[ch])
            bit, ch = 0, 0
    return "".join(out)


def test_geohash_key_matches_reference_encoder(spark):
    # canonical example (Wikipedia / Lucene Geohash docs)
    assert geohash_encode(57.64911, 10.40744, 11) == "u4pruydqqvj"
    # independent interval-bisection oracle over random points
    rng = np.random.default_rng(17)
    for _ in range(200):
        la = float(rng.uniform(-90, 90))
        lo = float(rng.uniform(-180, 180))
        p = int(rng.integers(1, 13))
        assert geohash_encode(la, lo, p) == _geohash_bisect(la, lo, p)
    df, lat, lon = _points(spark, n=300, seed=3)
    for p in (1, 5, 12):
        out = run_aggs(df, {"aggs": {"g": {
            "geohash_grid": {"field": "loc", "precision": p,
                             "size": 100_000}}}})["g"].collect()
        got = {r["key"]: r["doc_count"] for r in out}
        want: dict = {}
        for i in range(len(lat)):
            k = geohash_encode(lat[i], lon[i], p)
            want[k] = want.get(k, 0) + 1
        assert got == want


def _geotile_np(lat, lon, z):
    n = 1 << z
    x = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(int)
    latc = np.clip(lat, -MERCATOR_LAT_MAX, MERCATOR_LAT_MAX)
    latr = np.radians(latc)
    y = np.clip(np.floor(
        (1.0 - np.log(np.tan(latr) + 1.0 / np.cos(latr)) / math.pi)
        / 2.0 * n), 0, n - 1).astype(int)
    return [f"{z}/{x[i]}/{y[i]}" for i in range(len(lat))]


def test_geotile_grid_matches_numpy(spark):
    df, lat, lon = _points(spark, n=400, seed=5)
    for z in (0, 3, 11):
        out = run_aggs(df, {"aggs": {"g": {
            "geotile_grid": {"field": "loc", "precision": z,
                             "size": 100_000}}}})["g"].collect()
        got = {r["key"]: r["doc_count"] for r in out}
        want: dict = {}
        for k in _geotile_np(lat, lon, z):
            want[k] = want.get(k, 0) + 1
        assert got == want


def test_grid_agg_size_and_order(spark):
    df, lat, lon = _points(spark, n=400, seed=5)
    out = run_aggs(df, {"aggs": {"g": {
        "geotile_grid": {"field": "loc", "precision": 2,
                         "size": 3}}}})["g"].collect()
    assert len(out) == 3
    counts = [r["doc_count"] for r in out]
    assert counts == sorted(counts, reverse=True)
    # sub-metric under a grid bucket
    out = run_aggs(df, {"aggs": {"g": {
        "geotile_grid": {"field": "loc", "precision": 1},
        "aggs": {"v_avg": {"avg": {"field": "value"}}}}}})["g"]
    assert "v_avg" in out.columns


def test_geo_distance_agg_rings(spark):
    df, lat, lon = _points(spark)
    origin = (0.0, 0.0)
    out = run_aggs(df, {"aggs": {"rings": {"geo_distance": {
        "field": "loc", "origin": {"lat": 0.0, "lon": 0.0},
        "unit": "km",
        "ranges": [{"to": 3000}, {"from": 3000, "to": 8000},
                   {"from": 8000}]},
        "aggs": {"v_avg": {"avg": {"field": "value"}}}}}})["rings"]
    rows = {r["range_id"]: r for r in out.collect()}
    d_km = _haversine_np(lat, lon, *origin) / 1000.0
    vals = np.arange(len(lat)) % 13
    for rid, lo, hi in ((0, None, 3000), (1, 3000, 8000), (2, 8000, None)):
        m = np.ones(len(lat), dtype=bool)
        if lo is not None:
            m &= d_km >= lo
        if hi is not None:
            m &= d_km < hi
        assert rows[rid]["doc_count"] == int(m.sum())
        if m.sum():
            assert rows[rid]["v_avg"] == pytest.approx(
                float(vals[m].mean()))


def test_geo_bounds_and_centroid(spark):
    df, lat, lon = _points(spark, n=200, seed=9)
    b = run_aggs(df, {"aggs": {"b": {"geo_bounds": {"field": "loc"}}}})[
        "b"].collect()[0]
    assert b["top_left_lat"] == pytest.approx(float(lat.max()))
    assert b["top_left_lon"] == pytest.approx(float(lon.min()))
    assert b["bottom_right_lat"] == pytest.approx(float(lat.min()))
    assert b["bottom_right_lon"] == pytest.approx(float(lon.max()))
    c = run_aggs(df, {"aggs": {"c": {"geo_centroid": {"field": "loc"}}}})[
        "c"].collect()[0]
    assert c["lat"] == pytest.approx(float(lat.mean()))
    assert c["lon"] == pytest.approx(float(lon.mean()))
    assert c["count"] == 200
    with pytest.raises(ValueError, match="no sub-aggregations"):
        run_aggs(df, {"aggs": {"c": {"geo_centroid": {"field": "loc"},
                                     "aggs": {"m": {"max": {
                                         "field": "value"}}}}}})


def test_geo_struct_column_form(spark):
    df, lat, lon = _points(spark, n=50)
    sdf = df.select("id", F.struct(
        F.col("loc_lat").alias("lat"),
        F.col("loc_lon").alias("lon")).alias("loc"))
    cond = compile_filter(sdf, {"geo_distance": {
        "distance": "5000km", "loc": [0.0, 0.0]}})
    got = {r["id"] for r in sdf.filter(cond).select("id").collect()}
    d = _haversine_np(lat, lon, 0.0, 0.0)
    assert got == {i for i in range(len(lat)) if d[i] <= 5_000_000.0}
    with pytest.raises(ValueError, match="geo field"):
        compile_filter(df.select("id"), {"geo_distance": {
            "distance": "1km", "loc": [0.0, 0.0]}})


def test_geo_distance_sort_through_search(spark):
    df, lat, lon = _points(spark, n=120, seed=21)
    out = search(df, {
        "query": {"range": {"value": {"gte": 5.0}}},
        "sort": [{"_geo_distance": {"loc": {"lat": 30.0, "lon": 30.0},
                                    "order": "asc", "unit": "km"}},
                 {"id": "asc"}],
        "size": 7})
    rows = out.collect()
    assert len(rows) == 7
    d = _haversine_np(lat, lon, 30.0, 30.0) / 1000.0
    elig = sorted((d[i], i) for i in range(len(lat)) if (i % 13) >= 5)
    assert [r["id"] for r in rows] == [i for _, i in elig[:7]]
    # the sort value is carried in the hit frame like OpenSearch's
    # per-hit sort array
    assert rows[0]["_geo_distance"] == pytest.approx(elig[0][0])
    with pytest.raises(ValueError, match="mode"):
        search(df, {"sort": [{"_geo_distance": {
            "loc": [0.0, 0.0], "mode": "min"}}], "size": 1})


def test_geo_distance_nonpositive_rejected(spark):
    df, _, _ = _points(spark, n=5)
    with pytest.raises(ValueError, match="greater|> 0"):
        compile_filter(df, {"geo_distance": {
            "distance": "-5km", "loc": [0.0, 0.0]}})


def test_geo_bounding_box_inverted_lat_rejected(spark):
    df, _, _ = _points(spark, n=5)
    with pytest.raises(ValueError, match="below bottom"):
        compile_filter(df, {"geo_bounding_box": {"loc": {
            "top": -10.0, "left": 0.0, "bottom": 60.0, "right": 40.0}}})


def test_geo_agg_unknown_options_reject_by_name(spark):
    from anomaly_detection_spark.query.aggs_body import run_aggs
    df, _, _ = _points(spark, n=5)
    with pytest.raises(ValueError, match="distance_type"):
        run_aggs(df, {"aggs": {"r": {"geo_distance": {
            "field": "loc", "origin": {"lat": 0.0, "lon": 0.0},
            "distance_type": "plane", "ranges": [{"to": 10}]}}}})
    with pytest.raises(ValueError, match="bounds"):
        run_aggs(df, {"aggs": {"g": {"geotile_grid": {
            "field": "loc", "precision": 7,
            "bounds": {"top_left": {"lat": 1.0, "lon": 0.0},
                       "bottom_right": {"lat": 0.0, "lon": 1.0}}}}}})
