"""Function library tests: codecs round-trip, WKT matches the reference
formatting (7 decimals, vertex order), bounds aggregation."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from osmexpress_spark import functions as fn
from osmexpress_spark import testing


@pytest.fixture(scope="module")
def dfs(spark):
    return testing.to_dataframes(spark, testing.generate(n_nodes=200, seed=11))


def test_tags_roundtrip(spark):
    df = spark.createDataFrame(
        [(["a", "1", "b", "2"],), ([],)], "tags_kv array<string>"
    )
    out = df.select(
        fn.map_to_tags(fn.tags_to_map(F.col("tags_kv"))).alias("rt"), "tags_kv"
    ).collect()
    for r in out:
        assert r.rt == r.tags_kv


def test_tags_kv_matches_map_in_fixture(dfs):
    rows = dfs["nodes"].select(
        "tags", fn.tags_to_map(F.col("tags_kv")).alias("from_kv")
    ).collect()
    for r in rows:
        assert dict(r.tags) == dict(r.from_kv)


def test_coord_codec_roundtrip(spark):
    df = spark.createDataFrame(
        [(-1800000000,), (1800000000,), (0,), (-739937000,)], "x int"
    )
    out = df.select(
        fn.to_scaled(fn.to_degrees(F.col("x"))).alias("rt"), "x"
    ).collect()
    for r in out:
        assert r.rt == r.x


def test_fmt_coord_seven_decimals(spark):
    df = spark.createDataFrame([(-739937000, 407411000)], "lon int, lat int")
    row = df.select(fn.point_wkt(F.col("lon"), F.col("lat")).alias("wkt")).collect()[0]
    assert row.wkt == "POINT (-73.9937000 40.7411000)"


def test_way_linestring_vertex_order(spark):
    locations = spark.createDataFrame(
        [(1, 10_0000000, 1_0000000, 1, 0), (2, 20_0000000, 2_0000000, 1, 0),
         (3, 30_0000000, 3_0000000, 1, 0)],
        "id long, lon int, lat int, version int, cell long",
    )
    ways = spark.createDataFrame(
        [(7, [3, 1, 2], {}, [], None)],
        testing.schemas.WAYS_SCHEMA,
    )
    row = fn.way_linestrings(ways, locations).collect()[0]
    assert row.wkt == (
        "LINESTRING (30.0000000 3.0000000, 10.0000000 1.0000000, 20.0000000 2.0000000)"
    )


def test_iso8601_roundtrip(spark):
    df = spark.createDataFrame([("2020-01-02T03:04:05Z",)], "s string")
    out = df.select(
        fn.to_iso8601(fn.from_iso8601(F.col("s"))).alias("rt"), "s"
    ).collect()[0]
    assert out.rt == out.s


def test_way_geojson_valid(dfs):
    out = fn.way_geojson(dfs["ways"].limit(5), dfs["locations"]).collect()
    assert out
    for r in out:
        geo = json.loads(r.geometry)
        assert geo["type"] == "LineString"
        assert all(len(c) == 2 for c in geo["coordinates"])


def test_way_bounds(dfs):
    ways = {w.id: w.nodes for w in dfs["ways"].limit(10).collect()}
    coords = {r.id: (r.lon, r.lat) for r in dfs["locations"].collect()}
    got = {
        r.way_id: (r.min_lon, r.min_lat, r.max_lon, r.max_lat)
        for r in fn.way_bounds(dfs["ways"].limit(10), dfs["locations"]).collect()
    }
    for wid, refs in ways.items():
        xs = [coords[n][0] for n in refs]
        ys = [coords[n][1] for n in refs]
        assert got[wid] == (min(xs), min(ys), max(xs), max(ys))
