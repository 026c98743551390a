"""Cell index unit tests: the Spark column expression must be
bit-identical to the driver-side Python implementation, and Morton
ranges must nest correctly."""

from __future__ import annotations

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from osmexpress_spark.spatial import cells


@given(
    lon=st.integers(min_value=cells.LON_MIN, max_value=-cells.LON_MIN),
    lat=st.integers(min_value=cells.LAT_MIN, max_value=-cells.LAT_MIN),
)
@settings(max_examples=200, deadline=None)
def test_cell_of_in_range(lon, lat):
    c = cells.cell_of(lon, lat)
    assert 0 <= c < (1 << 32)


@given(
    lon=st.integers(min_value=cells.LON_MIN, max_value=-cells.LON_MIN),
    lat=st.integers(min_value=cells.LAT_MIN, max_value=-cells.LAT_MIN),
    level=st.integers(min_value=0, max_value=cells.MAX_LEVEL),
)
@settings(max_examples=200, deadline=None)
def test_point_inside_ancestor_rect(lon, lat, level):
    """The ancestor range at any level contains the point's level-16 cell,
    and the ancestor's degree-rect contains the point."""
    c = cells.cell_of(lon, lat)
    prefix = c >> (2 * (cells.MAX_LEVEL - level))
    lo, hi = cells.prefix_range(prefix, level)
    assert lo <= c < hi
    x0, y0, x1, y1 = cells.cell_rect(prefix, level)
    eps = 1e-7
    assert x0 - eps <= lon / 1e7 <= x1 + eps
    assert y0 - eps <= lat / 1e7 <= y1 + eps


def test_merge_ranges():
    assert cells.merge_ranges([(4, 8), (0, 4), (10, 12), (11, 14)]) == [
        (0, 8),
        (10, 14),
    ]
    assert cells.merge_ranges([]) == []


@pytest.mark.slow
def test_cell_col_matches_python(spark):
    """JVM bitwise expression == Python scalar, on a deterministic sweep
    plus extreme corners."""
    pts = [(-1_800_000_000, -900_000_000), (1_800_000_000, 900_000_000), (0, 0)]
    step = 123_456_789
    for i in range(-14, 15):
        for j in range(-7, 8):
            pts.append((i * step % 1_800_000_000, j * step % 900_000_000))
    df = spark.createDataFrame(pts, "lon int, lat int")
    got = {
        (r.lon, r.lat): r.cell
        for r in df.withColumn(
            "cell", cells.cell_col(df.lon, df.lat)
        ).collect()
    }
    for lon, lat in pts:
        assert got[(lon, lat)] == cells.cell_of(lon, lat), (lon, lat)


def test_cap_ranges_superset_and_order():
    """Capping merges smallest gaps first and only ever ADDS coverage
    (approximate-by-design, README.md:64 semantics)."""
    from osmexpress_spark.spatial.covering import _cap_ranges

    rs = [(0, 10), (12, 20), (100, 110), (112, 120), (500, 510)]
    capped = _cap_ranges(rs, 3)
    assert capped == [(0, 20), (100, 120), (500, 510)]

    def covered(x, rr):
        return any(lo <= x < hi for lo, hi in rr)

    for lo, hi in rs:
        assert covered(lo, capped) and covered(hi - 1, capped)
    # no-op when under the cap
    assert _cap_ranges(rs, 10) == rs


def test_tile_xy_known_points_and_clamp(spark):
    """Slippy-map sanity: known lon/lat -> z/x/y against the standard
    formula, plus polar clamping to the mercator edge rows."""
    import math

    from pyspark.sql import functions as F

    from osmexpress_spark.spatial.cells import tile_xy

    pts = [
        (1, 0, 0),                       # null island
        (2, -737985870, 407484050),      # NYC-ish (-73.79..., 40.74...)
        (3, 1395000000, 356000000),      # Tokyo-ish
        (4, 0, 890000000),               # beyond mercator clip -> y=0
        (5, 0, -890000000),              # -> y=2^z-1
        (6, -1800000000, 0),             # west edge -> x=0
    ]
    z = 8
    df = spark.createDataFrame(pts, "id long, lon int, lat int")
    tx, ty = tile_xy(F.col("lon"), F.col("lat"), z)
    got = {r.id: (r.x, r.y) for r in
           df.select("id", tx.alias("x"), ty.alias("y")).collect()}

    def slippy(lon, lat, z):
        n = 1 << z
        x = int((lon / 360.0 + 0.5) * n)
        lr = math.radians(lat)
        y = int((0.5 - math.log(math.tan(lr) + 1 / math.cos(lr))
                 / (2 * math.pi)) * n)
        return (max(0, min(x, n - 1)), max(0, min(y, n - 1)))

    for i, lon, lat in pts[:3] + [pts[5]]:
        assert got[i] == slippy(lon / 1e7, lat / 1e7, z), i
    assert got[4] == (128, 0)
    assert got[5] == (128, (1 << z) - 1)
