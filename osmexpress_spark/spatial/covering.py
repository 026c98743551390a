"""Region -> cell-range covering (the query *plan* for spatial scans).

Re-expresses `S2RegionCoverer` usage in the reference
(`/root/reference/src/extract.cpp:132-143`: max 1024 cells, max level
16; optional `--expand` buffer `:138-143` via
`/root/reference/src/region.cpp:129-135`) over our Morton grid
(spatial/cells.py).

Algorithm: quadtree descent from the root cell. A cell fully inside the
region is emitted whole (its entire Morton range); a boundary cell is
subdivided until ``max_level`` and then emitted. If the descent would
exceed the cell budget, retry with a coarser max level — coverings are
allowed to over-select (approximate-by-design, `README.md:64`), never
under-select. Rect tests are padded by one fine-cell width so float
rect geometry can never exclude a cell that the exact integer
point->cell mapping would assign (superset guarantee).

The output feeds ``cells.ranges_filter`` — i.e. the whole spatial plan
collapses to a data-skipping predicate on a cell-sorted Parquet layout.
At 100 TB this is the difference between scanning ~everything and
scanning only the row groups whose cell min/max overlap <=1024 ranges.
"""

from __future__ import annotations

from . import cells
from .region import Region

MAX_CELLS = 1024  # parity: src/extract.cpp:133

# Cap on the number of MERGED ranges handed to the filter expression.
# Each range is a BETWEEN term in the pushed predicate; a filter with
# hundreds of terms costs ~1s of whole-stage-codegen JIT per subplan it
# appears in (measured: 431 ranges -> 1.4s first use vs 0.14s at 64)
# and bloats the parquet pushdown. Capping merges the smallest gaps
# first — purely additive over-selection, which coverings are allowed
# to do by design (README.md:64).
MAX_RANGES = 64


def _cap_ranges(
    ranges: list[tuple[int, int]], max_ranges: int
) -> list[tuple[int, int]]:
    if len(ranges) <= max_ranges:
        return ranges
    gaps = sorted(
        range(1, len(ranges)), key=lambda i: ranges[i][0] - ranges[i - 1][1]
    )
    kill = set(gaps[: len(ranges) - max_ranges])
    out: list[tuple[int, int]] = []
    for i, r in enumerate(ranges):
        if i in kill:
            out[-1] = (out[-1][0], r[1])
        else:
            out.append(r)
    return out


def covering(
    region: Region,
    max_level: int = cells.MAX_LEVEL,
    max_cells: int = MAX_CELLS,
    expand_cells: int = 0,
    max_ranges: int = MAX_RANGES,
) -> list[tuple[int, int]]:
    """Compute merged level-16 Morton ranges covering the region.

    expand_cells: buffer the region by that many fine-cell widths
    (the moral equivalent of `--expand` / `covering.Expand(level)`,
    src/extract.cpp:138-143).
    """
    for level in range(max_level, -1, -2):
        ranges = _try_cover(region, level, max_cells * 4, expand_cells)
        if ranges is not None:
            ranges = cells.merge_ranges(ranges)
            if len(ranges) <= max_cells:
                return _cap_ranges(ranges, max_ranges)
    # level 0 always fits: the whole world as one range
    return [cells.prefix_range(0, 0)]


def _try_cover(
    region: Region, max_level: int, budget: int, expand_cells: int
) -> list[tuple[int, int]] | None:
    # pad by one fine-cell width (superset guarantee) + requested buffer
    pad_x = (cells.LON_SPAN / 1e7) / cells.GRID * (1 + expand_cells)
    pad_y = (cells.LAT_SPAN / 1e7) / cells.GRID * (1 + expand_cells)
    out: list[tuple[int, int]] = []

    def descend(prefix: int, level: int) -> bool:
        x0, y0, x1, y1 = cells.cell_rect(prefix, level)
        if not region.intersects_rect(x0 - pad_x, y0 - pad_y, x1 + pad_x, y1 + pad_y):
            return True
        if level >= max_level or region.contains_rect(
            x0 - pad_x, y0 - pad_y, x1 + pad_x, y1 + pad_y
        ):
            out.append(cells.prefix_range(prefix, level))
            return len(out) <= budget
        for quad in range(4):
            if not descend((prefix << 2) | quad, level + 1):
                return False
        return True

    return out if descend(0, 0) else None
