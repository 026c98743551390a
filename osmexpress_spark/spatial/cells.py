"""Level-16 Morton (Z-order) spatial cells over lon/lat.

The reference indexes nodes by level-16 S2 cell (`/root/reference/
include/osmx/util.h:9`, `/root/reference/src/expand.cpp:151-153`) and
turns a region into <=1024 sorted cell ranges that become LMDB cursor
range scans (`/root/reference/src/extract.cpp:132-174`,
`/root/reference/src/storage.cpp:170-191`).

We re-express the same idea with a plain quadtree Morton code over the
scaled-int32 lon/lat plane:

- a level-16 cell id is a 32-bit integer interleaving the 16-bit x
  (lon) and y (lat) grid coordinates;
- the 4^L cells of an ancestor at level L are exactly one contiguous
  Morton range ``[prefix << 2*(16-L), (prefix+1) << 2*(16-L))`` — so a
  region covering is a list of integer ranges, and the range scan
  becomes a Parquet row-group-prunable ``cell BETWEEN lo AND hi``
  predicate over a cell-sorted table layout (SURVEY.md §1.5 / §4).

Everything on the hot path is a pure Spark column expression (bitwise
ops only) — no UDF, fully inside WholeStageCodegen. The Python scalar
versions exist for the driver-side covering computation and for tests;
they are bit-for-bit identical to the column expression.

Why not S2: no s2 library is available in the environment, and nothing
downstream depends on S2's cell geometry — only on "point -> sortable
cell id" + "region -> few cell ranges". The Morton grid gives identical
semantics with exact integer arithmetic (S2 covering output is
explicitly build-dependent, `/root/reference/docs/MANUAL.md:148`, so
cross-implementation cell parity was never on the table).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_LEVEL = 16  # parity with osmx CELL_INDEX_LEVEL (include/osmx/util.h:9)

# scaled int32 degree range (docs/MANUAL.md:140-142)
LON_MIN, LON_SPAN = -1_800_000_000, 3_600_000_000
LAT_MIN, LAT_SPAN = -900_000_000, 1_800_000_000
GRID = 1 << MAX_LEVEL  # 65536 cells per axis at the finest level

_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_py(x: int) -> int:
    """Spread the low 16 bits of x into the even bits of a 32-bit int."""
    for shift, mask in _MASKS:
        x = (x | (x << shift)) & mask
    return x


def grid_coords(lon: int, lat: int) -> tuple[int, int]:
    """Scaled-int32 lon/lat -> (ix, iy) in [0, 65536)."""
    ix = ((lon - LON_MIN) << MAX_LEVEL) // (LON_SPAN + 1)
    iy = ((lat - LAT_MIN) << MAX_LEVEL) // (LAT_SPAN + 1)
    return ix, iy


def cell_of(lon: int, lat: int) -> int:
    """Level-16 cell id of a scaled-int32 (lon, lat) point (driver-side)."""
    ix, iy = grid_coords(lon, lat)
    return _spread_py(ix) | (_spread_py(iy) << 1)


def _spread_col(col: Column) -> Column:
    for shift, mask in _MASKS:
        col = (col.bitwiseOR(F.shiftleft(col, shift))).bitwiseAND(F.lit(mask))
    return col


def cell_col(lon: Column, lat: Column) -> Column:
    """Column expression computing the level-16 cell id — JVM-side only.

    Must stay bit-identical to :func:`cell_of`; test_cells.py asserts it.
    """
    ix = F.floor(
        (F.shiftleft(lon.cast("long") - F.lit(LON_MIN), MAX_LEVEL)) / F.lit(LON_SPAN + 1)
    ).cast("long")
    iy = F.floor(
        (F.shiftleft(lat.cast("long") - F.lit(LAT_MIN), MAX_LEVEL)) / F.lit(LAT_SPAN + 1)
    ).cast("long")
    return (_spread_col(ix).bitwiseOR(F.shiftleft(_spread_col(iy), 1))).cast("long")


def cell_rect(prefix: int, level: int) -> tuple[float, float, float, float]:
    """Degree-space bounding rect (lon_min, lat_min, lon_max, lat_max) of the
    cell with the given Morton *prefix* at *level* (prefix has 2*level bits)."""
    ix = iy = 0
    for i in range(level):
        quad = (prefix >> (2 * (level - 1 - i))) & 3
        ix = (ix << 1) | (quad & 1)
        iy = (iy << 1) | (quad >> 1)
    span = GRID >> level
    x0, y0 = ix * span, iy * span
    x1, y1 = x0 + span, y0 + span
    # grid -> degrees (inverse of grid_coords, continuous form)
    lon0 = x0 / GRID * (LON_SPAN + 1) / 1e7 + LON_MIN / 1e7
    lon1 = x1 / GRID * (LON_SPAN + 1) / 1e7 + LON_MIN / 1e7
    lat0 = y0 / GRID * (LAT_SPAN + 1) / 1e7 + LAT_MIN / 1e7
    lat1 = y1 / GRID * (LAT_SPAN + 1) / 1e7 + LAT_MIN / 1e7
    return lon0, lat0, lon1, lat1


def prefix_range(prefix: int, level: int) -> tuple[int, int]:
    """Level-16 Morton id range [lo, hi) covered by an ancestor cell."""
    shift = 2 * (MAX_LEVEL - level)
    return prefix << shift, (prefix + 1) << shift


def merge_ranges(ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Sort and coalesce adjacent/overlapping [lo, hi) ranges."""
    if not ranges:
        return []
    ranges = sorted(ranges)
    out = [ranges[0]]
    for lo, hi in ranges[1:]:
        if lo <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return out


def ranges_filter(cell: Column, ranges: list[tuple[int, int]]) -> Column:
    """Build the pushed-down predicate for a covering.

    An OR of BETWEENs plus an outer global BETWEEN: the outer bound gives
    Parquet coarse row-group pruning even when the OR list is long; the
    inner ORs do the fine pruning. Mirrors the reference's per-cell
    cursor scans (`src/extract.cpp:170-174`).
    """
    if not ranges:
        return F.lit(False)

    # A balanced OR tree: a left-nested chain of 1024 ORs overflows the
    # JVM stack in Catalyst's column-node conversion (observed at ~500
    # terms); log-depth nesting keeps the tree shallow and pushes down
    # identically.
    def build(lo_i: int, hi_i: int) -> Column:
        if hi_i - lo_i == 1:
            lo, hi = ranges[lo_i]
            return cell.between(lo, hi - 1)
        mid = (lo_i + hi_i) // 2
        return build(lo_i, mid) | build(mid, hi_i)

    outer = cell.between(ranges[0][0], ranges[-1][1] - 1)
    return outer & build(0, len(ranges))


def tile_xy(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    """Web-mercator tile (x, y) at `zoom` for scaled-int coords — the
    slippy-map z/x/y scheme every tile pipeline partitions by.

    x = floor((lon/360 + 0.5) * 2^z); y uses the mercator latitude
    projection. Latitudes beyond the mercator clip (~85.0511°) clamp to
    the edge rows like every tiler does. All math is double precision
    with a final floor — a cross-engine 1-ulp flip only matters when a
    point sits exactly on a tile boundary (measure-zero for real
    coordinates; the fixture oracle confirms bit-parity in practice)."""
    n = float(1 << zoom)
    lon_d = lon.cast("double") / 1e7
    lat_d = lat.cast("double") / 1e7
    x = F.floor((lon_d / F.lit(360.0) + F.lit(0.5)) * F.lit(n)).cast("long")
    # clamp BEFORE projecting: within ~1e-7 deg of the poles the
    # mercator argument tan+sec underflows to exactly 0.0 and log
    # becomes NULL here / an error in DuckDB — clamping to the tiling
    # limit keeps both engines finite and identical
    MERC_LIMIT = 85.05112877980659
    lat_c = F.greatest(F.lit(-MERC_LIMIT), F.least(lat_d, F.lit(MERC_LIMIT)))
    lat_r = F.radians(lat_c)
    merc = F.log(F.tan(lat_r) + F.lit(1.0) / F.cos(lat_r))
    y = F.floor(
        (F.lit(0.5) - merc / F.lit(2.0 * 3.141592653589793)) * F.lit(n)
    ).cast("long")
    clamp = lambda c: F.greatest(F.lit(0), F.least(c, F.lit(int(n) - 1)))
    return clamp(x), clamp(y)
