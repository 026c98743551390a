"""Port of the reference's region test suite
(`/root/reference/test/test_region.cpp`) against our Region module,
plus covering-consistency properties the reference never tested.
"""

from __future__ import annotations

import pytest

from osmexpress_spark.spatial import Region, cells, cover

# --- test_region.cpp:15-22 ---
def test_basic_bbox():
    s = Region("-1.0,-1.0,1.0,1.0", "bbox")
    assert s.contains(0, 0)
    assert s.contains(0.9, 0.9)


# --- test_region.cpp:24-31 ---
def test_basic_disc():
    s = Region("0.0,0.0,1.0", "disc")
    assert s.contains(0, 0)
    assert not s.contains(0.9, 0.9)


# --- test_region.cpp:33-49 ---
def test_geojson_polygon():
    json = """{
  "type": "Polygon",
  "coordinates": [
    [[-1.0,-1.0],[-1.0,1.0],[1.0,1.0],[1.0,-1.0],[-1.0,-1.0]]
  ]}"""
    s = Region(json, "geojson")
    assert s.contains(0, 0)
    assert not s.contains(2.0, 2.0)


# --- test_region.cpp:51-73 ---
def test_geojson_polygon_with_hole():
    json = """{
  "type": "Polygon",
  "coordinates": [
    [[-2.0,-2.0],[-2.0,2.0],[2.0,2.0],[2.0,-2.0],[-2.0,-2.0]],
    [[-1.0,-1.0],[-1.0,1.0],[1.0,1.0],[1.0,-1.0],[-1.0,-1.0]]
  ]}"""
    s = Region(json, "geojson")
    assert s.contains(1.5, 1.5)
    assert not s.contains(0.0, 0.0)


# --- test_region.cpp:75-105 ---
def test_geojson_multipolygon_and_bounds():
    json = """{
  "type": "MultiPolygon",
  "coordinates": [
    [[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,1.0],[0.0,0.0]]],
    [[[2.0,2.0],[3.0,2.0],[3.0,3.0],[2.0,3.0],[2.0,2.0]]]
  ]}"""
    s = Region(json, "geojson")
    assert s.contains(0.5, 0.5)
    assert s.contains(2.5, 2.5)
    lon0, lat0, lon1, lat1 = s.bounds()
    assert lat0 <= 0.0 and lat1 >= 3.0
    assert lon0 <= 0.0 and lon1 >= 3.0


# --- test_region.cpp:107-125 ---
def test_geojson_bounds_beyond_antimeridian():
    json = """{
  "type": "Polygon",
  "coordinates": [
    [[180.0,-1.0],[180.0,1.0],[181.0,1.0],[181.0,-1.0],[180.0,-1.0]]
  ]}"""
    s = Region(json, "geojson")
    lon0, lat0, lon1, lat1 = s.bounds()
    assert lon0 == 180.0
    assert -179.1 <= lon1 <= -178.9


# --- test_region.cpp:129-143 ---
def test_poly_simple():
    poly = """basic
first_area
    0.2e+01 0.1e+01
    0.2e+01 -0.1e+01
    -0.2e+01    -0.1e+01
    -0.2e+01    0.1e+01
END
END
"""
    s = Region(poly, "poly")
    assert s.contains(0, 0)
    assert not s.contains(2.0, 3.0)
    assert s.contains(0.5, 1.5)


# --- test_region.cpp:145-158 ---
def test_poly_whitespace_opposite_orientation():
    poly = """basic
first_area
    0.1E+01 0.1E+01
    -0.1E+01    0.1E+01
    -0.1E+01    -0.1E+01
    0.1E+01 -0.1E+01
END
END
"""
    s = Region(poly, "poly")
    assert s.contains(0, 0)
    assert not s.contains(2.0, 2.0)


# --- test_region.cpp:160-173 ---
def test_poly_repeated_last_point():
    poly = """basic
first_area
    0.1e+01 0.1e+01
    0.1e+01 -0.1e+01
    -0.1e+01    -0.1e+01
    -0.1e+01    0.1e+01
    0.1e+01 0.1e+01
END
END
"""
    s = Region(poly, "poly")
    assert s.contains(0, 0)
    assert not s.contains(2.0, 2.0)


# --- test_region.cpp:175-197 ---
def test_poly_multiple_outer_loops():
    poly = """basic
first_area
    0.1E+01 0.1E+01
    -0.1E+01    0.1E+01
    -0.1E+01    -0.1E+01
    0.1E+01 -0.1E+01
END
second_area
    0.4E+01 0.4E+01
    0.3E+01    0.4E+01
    0.3E+01    0.3E+01
    0.4E+01 0.3E+01
END
END
"""
    s = Region(poly, "poly")
    assert s.contains(0, 0)
    assert s.contains(3.5, 3.5)
    assert not s.contains(1.0, 1.0)


# --- test_region.cpp:199-201 is an empty placeholder; we implement it ---
def test_poly_with_hole():
    poly = """basic
first_area
    0.2e+01 0.2e+01
    0.2e+01 -0.2e+01
    -0.2e+01    -0.2e+01
    -0.2e+01    0.2e+01
END
!first_hole
    0.1e+01 0.1e+01
    0.1e+01 -0.1e+01
    -0.1e+01    -0.1e+01
    -0.1e+01    0.1e+01
END
END
"""
    s = Region(poly, "poly")
    assert s.contains(1.5, 1.5)
    assert not s.contains(0.0, 0.0)


def test_geojson_feature_and_collection():
    # src/region.cpp:93-101 accepts Feature / FeatureCollection wrappers
    json = """{
  "type": "FeatureCollection",
  "features": [{"type": "Feature", "properties": {}, "geometry": {
    "type": "Polygon",
    "coordinates": [[[-1.0,-1.0],[-1.0,1.0],[1.0,1.0],[1.0,-1.0],[-1.0,-1.0]]]
  }}]}"""
    s = Region(json, "geojson")
    assert s.contains(0, 0)
    assert not s.contains(2, 2)


# --- covering properties (our addition; the contract extract relies on) ---
@pytest.mark.parametrize(
    "region",
    [
        Region("-1.0,-1.0,1.0,1.0", "bbox"),
        Region("0.0,0.0,1.0", "disc"),
        Region("40.7411,-73.9937,40.7486,-73.9821", "bbox"),  # test_region.cpp:10
        Region(
            '{"type":"Polygon","coordinates":[[[-2,-2],[-2,2],[2,2],[2,-2],[-2,-2]],'
            "[[-1,-1],[-1,1],[1,1],[1,-1],[-1,-1]]]}",
            "geojson",
        ),
    ],
    ids=["bbox", "disc", "nyc-bbox", "poly-hole"],
)
def test_covering_superset_and_budget(region):
    """Every contained point's cell falls inside the covering (superset
    guarantee — extract must never under-select, README.md:64), and the
    covering respects the 1024-range budget (src/extract.cpp:133)."""
    ranges = cover(region)
    assert 0 < len(ranges) <= 1024
    lon0, lat0, lon1, lat1 = region.bounds()
    if lon1 < lon0:
        lon1 += 360  # antimeridian: not exercised for containment here
    steps = 17
    for i in range(steps):
        for j in range(steps):
            lon = lon0 + (lon1 - lon0) * i / (steps - 1)
            lat = lat0 + (lat1 - lat0) * j / (steps - 1)
            if not region.contains(lat, lon):
                continue
            c = cells.cell_of(int(round(lon * 1e7)), int(round(lat * 1e7)))
            assert any(lo <= c < hi for lo, hi in ranges), (lon, lat, c)


def test_covering_not_everything():
    """A small bbox must prune almost all of the world's cell space."""
    ranges = cover(Region("40.7411,-73.9937,40.7486,-73.9821", "bbox"))
    covered = sum(hi - lo for lo, hi in ranges)
    assert covered < (1 << 32) / 1e6  # < one millionth of the grid
