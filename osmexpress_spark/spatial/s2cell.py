"""Pure-stdlib S2 cell ids (level 16 default) for `.osmx` interop.

The reference keys its `cell_node` index by TRUE S2 cell ids at level
16 (`/root/reference/docs/MANUAL.md:121`, `src/storage.cpp:43-77` via
the s2geometry dependency), so a file whose cell index the reference's
own tooling can range-scan needs the real curve — not the documented
Morton substitute (`spatial/cells.py`).  This module implements the
published S2 point->cell math (s2geometry.io; Apache-2.0 spec, widely
re-implemented) from the spec:

1. lat/lon -> unit sphere (x, y, z);
2. cube-face projection: face = largest |component|, (u, v) the two
   gnomonic coordinates on that face;
3. the QUADRATIC u->s transform s = sqrt(1 + 3u)/2 (u >= 0), which
   equalizes cell areas across a face;
4. 30-bit discretization i = floor(s * 2^30);
5. the face-local Hilbert curve: 30 two-bit steps driven by the
   4-entry orientation tables; leaf id = face<<61 | curve_pos<<1 | 1,
   a level-k id keeps 2k position bits and sets the sentinel lsb.

Correctness is pinned structurally (tests/test_s2cell.py): the
ij<->pos tables are exact inverses at every orientation, CONSECUTIVE
curve positions decode to 4-adjacent (i, j) cells (the Hilbert
continuity property — any table/orientation error breaks it
somewhere), st<->uv round-trips, cell centers land inside their own
cell, and the end-to-end covering scan over a written `.osmx` equals
the exact lat/lon filter.

Scale note: the vectorized numpy entry point (`cell_ids_np`) is the
Arrow-seam body for Spark (one batch in, one uint64 batch out, zero
shuffle); the scalar path serves the driver-side covering math.
Spark has no unsigned 64-bit type, so ids travel through DataFrames
BIASED by -2^63 (`bias64`) — an order-preserving shift undone at the
storage boundary.
"""

from __future__ import annotations

import math

MAX_LEVEL = 30
_POS_BITS = 2 * MAX_LEVEL + 1  # 61

# kPosToIJ[orientation][position] -> ij (i<<1 | j), from the published
# S2 Hilbert tables; orientation bit 0 = swap, bit 1 = invert.
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (1, 0, 0, 3)
_IJ_TO_POS = tuple(
    tuple(row.index(ij) for ij in range(4)) for row in _POS_TO_IJ
)

BIAS = 1 << 63


def bias64(cell_id: int) -> int:
    """uint64 cell id -> signed int64 preserving unsigned order."""
    return cell_id - BIAS


def unbias64(biased: int) -> int:
    return biased + BIAS


def _xyz(lat_deg: float, lon_deg: float) -> tuple[float, float, float]:
    phi = math.radians(lat_deg)
    lam = math.radians(lon_deg)
    cp = math.cos(phi)
    return cp * math.cos(lam), cp * math.sin(lam), math.sin(phi)


def _face_uv(x: float, y: float, z: float) -> tuple[int, float, float]:
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x > 0 else 3
    elif ay >= az:
        face = 1 if y > 0 else 4
    else:
        face = 2 if z > 0 else 5
    if face == 0:
        return face, y / x, z / x
    if face == 1:
        return face, -x / y, z / y
    if face == 2:
        return face, -x / z, -y / z
    if face == 3:
        return face, z / x, y / x
    if face == 4:
        return face, z / y, -x / y
    return face, -y / z, -x / z


def _face_xyz(face: int, u: float, v: float) -> tuple[float, float, float]:
    if face == 0:
        return 1.0, u, v
    if face == 1:
        return -u, 1.0, v
    if face == 2:
        return -u, -v, 1.0
    if face == 3:
        return -1.0, -v, -u
    if face == 4:
        return v, -1.0, -u
    return v, u, -1.0


def _uv_to_st(u: float) -> float:
    if u >= 0:
        return 0.5 * math.sqrt(1.0 + 3.0 * u)
    return 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)


def _st_to_uv(s: float) -> float:
    if s >= 0.5:
        return (4.0 * s * s - 1.0) / 3.0
    return (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0


def _st_to_ij(s: float) -> int:
    return max(0, min((1 << MAX_LEVEL) - 1, int(s * (1 << MAX_LEVEL))))


def from_face_ij(face: int, i: int, j: int, level: int = MAX_LEVEL) -> int:
    """(face, leaf i, leaf j) -> uint64 cell id at `level`."""
    pos = 0
    o = face & 1
    for k in range(MAX_LEVEL - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _IJ_TO_POS[o][ij]
        pos = (pos << 2) | p
        o ^= _POS_TO_ORIENT[p]
    leaf = (face << _POS_BITS) | (pos << 1) | 1
    if level >= MAX_LEVEL:
        return leaf
    lsb = 1 << (2 * (MAX_LEVEL - level))
    return (leaf & ~(lsb - 1)) | lsb


def to_face_ij(cell_id: int) -> tuple[int, int, int]:
    """uint64 cell id -> (face, i, j) of its MIN leaf corner."""
    # decode via the cell's MIN descendant leaf (child 0 all the way
    # down): its position bits are the cell's prefix padded with zeros
    # and its sentinel sits at bit 0, out of the position field
    leaf = range_min(cell_id)
    face = leaf >> _POS_BITS
    pos = (leaf >> 1) & ((1 << (2 * MAX_LEVEL)) - 1)
    o = face & 1
    i = j = 0
    for k in range(MAX_LEVEL - 1, -1, -1):
        p = (pos >> (2 * k)) & 3
        ij = _POS_TO_IJ[o][p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        o ^= _POS_TO_ORIENT[p]
    return face, i, j


def level_of(cell_id: int) -> int:
    lsb = cell_id & -cell_id
    return MAX_LEVEL - (lsb.bit_length() - 1) // 2


def cell_id(lat_deg: float, lon_deg: float, level: int = 16) -> int:
    """lat/lon degrees -> uint64 S2 cell id at `level`."""
    face, u, v = _face_uv(*_xyz(lat_deg, lon_deg))
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    return from_face_ij(face, i, j, level)


def cell_id_scaled(lon_e7: int, lat_e7: int, level: int = 16) -> int:
    """Scaled-int32 (lon, lat) — the engine's storage codec — to a
    uint64 S2 cell id.  Division (not *1e-7) matches osmium's
    Location::lat/lon conversion bit-for-bit — ~29% of e7 values
    differ by 1 ulp between the two forms, enough to flip a node
    lying on a level-16 cell boundary (ADVICE r09)."""
    return cell_id(lat_e7 / 1e7, lon_e7 / 1e7, level)


def cell_center(cell_id_: int) -> tuple[float, float]:
    """(lat_deg, lon_deg) of the cell's center."""
    face, i, j = to_face_ij(cell_id_)
    size = 1 << (MAX_LEVEL - level_of(cell_id_))
    # to_face_ij returns the first leaf in CURVE order — some corner of
    # the cell, not necessarily the (min i, min j) one; all leaves in
    # the cell share the high ij bits, so mask down to the origin
    i &= ~(size - 1)
    j &= ~(size - 1)
    s = (i + size * 0.5) / (1 << MAX_LEVEL)
    t = (j + size * 0.5) / (1 << MAX_LEVEL)
    x, y, z = _face_xyz(face, _st_to_uv(s), _st_to_uv(t))
    n = math.sqrt(x * x + y * y + z * z)
    return (
        math.degrees(math.asin(z / n)),
        math.degrees(math.atan2(y, x)),
    )


def range_min(cell_id_: int) -> int:
    lsb = cell_id_ & -cell_id_
    return cell_id_ - (lsb - 1)


def range_max(cell_id_: int) -> int:
    lsb = cell_id_ & -cell_id_
    return cell_id_ + (lsb - 1)


def cell_ids_np(lon_e7, lat_e7, level: int = 16):
    """Vectorized cell ids: scaled-int arrays -> uint64 numpy array.
    This is the Arrow-seam body for Spark sinks (one batch in, one
    batch out, zero shuffle); 30 table-lookup steps over the whole
    batch instead of per-row Python."""
    import numpy as np

    # division matches osmium's e7 conversion bit-for-bit (ADVICE r09)
    lat = np.asarray(lat_e7, dtype=np.float64) / 1e7
    lon = np.asarray(lon_e7, dtype=np.float64) / 1e7
    phi = np.radians(lat)
    lam = np.radians(lon)
    cp = np.cos(phi)
    x = cp * np.cos(lam)
    y = cp * np.sin(lam)
    z = np.sin(phi)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x > 0, 0, 3),
        np.where(ay >= az, np.where(y > 0, 1, 4), np.where(z > 0, 2, 5)),
    ).astype(np.int64)
    # u, v per face (same table as _face_uv)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            default=-y / z,
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            default=-x / z,
        )
    # np.where evaluates BOTH branches, so clamp each sqrt operand —
    # the unselected branch would otherwise see a negative argument
    # and spray RuntimeWarnings on every batch (ADVICE r09)
    s = np.where(
        u >= 0,
        0.5 * np.sqrt(np.maximum(0.0, 1.0 + 3.0 * u)),
        1.0 - 0.5 * np.sqrt(np.maximum(0.0, 1.0 - 3.0 * u)),
    )
    t = np.where(
        v >= 0,
        0.5 * np.sqrt(np.maximum(0.0, 1.0 + 3.0 * v)),
        1.0 - 0.5 * np.sqrt(np.maximum(0.0, 1.0 - 3.0 * v)),
    )
    two30 = float(1 << MAX_LEVEL)
    i = np.clip((s * two30).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)
    j = np.clip((t * two30).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)
    ij2pos = np.array(_IJ_TO_POS, dtype=np.uint64)
    pos2orient = np.array(_POS_TO_ORIENT, dtype=np.int64)
    o = (face & 1).astype(np.int64)
    pos = np.zeros(len(lat), dtype=np.uint64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = ij2pos[o, ij]
        pos = (pos << np.uint64(2)) | p
        o = o ^ pos2orient[p.astype(np.int64)]
    leaf = (
        (face.astype(np.uint64) << np.uint64(_POS_BITS))
        | (pos << np.uint64(1))
        | np.uint64(1)
    )
    if level >= MAX_LEVEL:
        return leaf
    lsb = np.uint64(1 << (2 * (MAX_LEVEL - level)))
    return (leaf & ~(lsb - np.uint64(1))) | lsb


_EPS_DEG = 1e-9


def _cell_latlng_bound(
    face: int, i: int, j: int, size: int
) -> tuple[float, float, float, float]:
    """EXACT (up to _EPS_DEG float padding) latitude/longitude bound of
    the cell [i, i+size) x [j, j+size) on `face`, as
    (lat_lo, lat_hi, lon_lo, lon_hi) with the lon pair a possibly
    WRAPPING interval (lo > hi means it crosses the antimeridian;
    lo <= -180 and hi >= 180 means the full circle, e.g. a polar cell
    over the pole).

    Rigorous by per-face monotonicity: on equatorial faces latitude is
    monotone in one gnomonic coordinate and unimodal (extremum at 0) in
    the other, so its extrema over the uv-rect lie on the candidate
    grid {edges} x {edges, 0-crossing}; longitude is monotone in a
    single coordinate.  On polar faces latitude depends only on the
    distance r from the face center (extremes at the rect's nearest
    and farthest points from the origin) and longitude is the circular
    hull of the corner angles (for a convex region not containing the
    origin, the angle from the origin is monotone along each straight
    edge, so corner angles are the extremes); a rect containing the
    origin covers every longitude."""
    two30 = float(1 << MAX_LEVEL)
    u0, u1 = _st_to_uv(i / two30), _st_to_uv((i + size) / two30)
    v0, v1 = _st_to_uv(j / two30), _st_to_uv((j + size) / two30)

    if face in (2, 5):
        # polar faces: plane coords of the projected point are
        # (x, y) = (-u, -v) on face 2 and (v, u) on face 5
        if face == 2:
            corners = [(-u, -v) for u in (u0, u1) for v in (v0, v1)]
        else:
            corners = [(v, u) for u in (u0, u1) for v in (v0, v1)]
        # nearest/farthest distance from origin to the rect
        xs = sorted(c[0] for c in corners)
        ys = sorted(c[1] for c in corners)
        near_x = 0.0 if xs[0] <= 0.0 <= xs[-1] else min(abs(xs[0]), abs(xs[-1]))
        near_y = 0.0 if ys[0] <= 0.0 <= ys[-1] else min(abs(ys[0]), abs(ys[-1]))
        r_near = math.hypot(near_x, near_y)
        r_far = max(math.hypot(cx, cy) for cx, cy in corners)
        top = math.degrees(math.atan2(1.0, r_near))
        bot = math.degrees(math.atan2(1.0, r_far))
        if face == 2:
            lat_lo, lat_hi = bot, top
        else:
            lat_lo, lat_hi = -top, -bot
        if r_near == 0.0:  # contains the pole: every longitude
            return (
                lat_lo - _EPS_DEG, lat_hi + _EPS_DEG, -180.0, 180.0,
            )
        angs = sorted(
            math.degrees(math.atan2(cy, cx)) for cx, cy in corners
        )
        # circular hull: complement of the largest gap between
        # consecutive corner angles
        gaps = [
            (angs[(k + 1) % 4] - angs[k]) % 360.0 for k in range(4)
        ]
        k = max(range(4), key=gaps.__getitem__)
        lon_lo = angs[(k + 1) % 4]
        lon_hi = angs[k]  # wrapped interval lon_lo -> lon_hi (ccw)
        return (
            lat_lo - _EPS_DEG, lat_hi + _EPS_DEG,
            lon_lo - _EPS_DEG, lon_hi + _EPS_DEG,
        )

    # equatorial faces: derive (lat, lon) as functions of (u, v)
    def latlon(u: float, v: float) -> tuple[float, float]:
        x, y, z = _face_xyz(face, u, v)
        return (
            math.degrees(math.atan2(z, math.hypot(x, y))),
            math.degrees(math.atan2(y, x)),
        )

    # lat: monotone in one coordinate, unimodal (peak at 0) in the
    # other — faces 0/1 peak in u, faces 3/4 peak in v
    if face in (0, 1):
        u_cands = [u0, u1] + ([0.0] if u0 <= 0.0 <= u1 else [])
        v_cands = [v0, v1]
    else:
        u_cands = [u0, u1]
        v_cands = [v0, v1] + ([0.0] if v0 <= 0.0 <= v1 else [])
    lats = [latlon(u, v)[0] for u in u_cands for v in v_cands]
    lat_lo, lat_hi = min(lats), max(lats)

    # lon: monotone in exactly one coordinate; face 3 crosses the
    # antimeridian cut (monotone mod 360), so order endpoints along
    # the rotation direction and let the interval wrap
    if face == 0:
        lon_a, lon_b = latlon(u0, v0)[1], latlon(u1, v0)[1]
    elif face == 1:
        lon_a, lon_b = latlon(u0, v0)[1], latlon(u1, v0)[1]
    elif face == 3:
        # lon = atan2(-v, -1) increases (mod 360) with v, crossing the
        # antimeridian cut exactly when v spans 0 — keeping the
        # (v0-angle, v1-angle) order makes the interval wrap (lo > hi)
        # precisely in that case
        lon_a, lon_b = latlon(u0, v0)[1], latlon(u0, v1)[1]
        return (
            lat_lo - _EPS_DEG, lat_hi + _EPS_DEG,
            lon_a - _EPS_DEG, lon_b + _EPS_DEG,
        )
    else:  # face 4: increasing in v
        lon_a, lon_b = latlon(u0, v0)[1], latlon(u0, v1)[1]
    lon_lo, lon_hi = min(lon_a, lon_b), max(lon_a, lon_b)
    return (
        lat_lo - _EPS_DEG, lat_hi + _EPS_DEG,
        lon_lo - _EPS_DEG, lon_hi + _EPS_DEG,
    )


def _lon_intervals_overlap(
    lo_a: float, hi_a: float, lo_b: float, hi_b: float
) -> bool:
    """Overlap of two longitude intervals, either possibly wrapping."""
    if hi_a - lo_a >= 360.0 or hi_b - lo_b >= 360.0:
        return True

    def norm(x):
        return (x + 180.0) % 360.0 - 180.0

    la, ha, lb, hb = norm(lo_a), norm(hi_a), norm(lo_b), norm(hi_b)
    segs_a = [(la, ha)] if la <= ha else [(la, 180.0), (-180.0, ha)]
    segs_b = [(lb, hb)] if lb <= hb else [(lb, 180.0), (-180.0, hb)]
    return any(
        sa[0] <= sb[1] and sb[0] <= sa[1] for sa in segs_a for sb in segs_b
    )


def bbox_covering(
    lon_lo_e7: int,
    lat_lo_e7: int,
    lon_hi_e7: int,
    lat_hi_e7: int,
    level: int = 16,
    max_cells: int | None = None,
) -> list[int]:
    """Sorted uint64 S2 cell ids at `level` whose cells MAY intersect
    the scaled-int bbox — a conservative covering (over-selection
    only, never under): recursive descent from the 6 face cells,
    pruning with the corner-box-plus-diagonal bound.  The caller
    range-scans `cell_node` over the ids (contiguous runs merge into
    [range_min, range_max] spans) and refines with the exact lat/lon
    predicate, the same covering-then-refine shape as the Morton
    extract path.  Cells certainly inside the bbox are emitted at
    their coarsest level (perimeter-sized coverings, not area-sized);
    `max_cells`, when set, coarsens the boundary resolution until the
    covering fits — more over-selection, same refine contract (the
    S2RegionCoverer trade)."""
    if max_cells is not None:
        # budgeted descent: each level ABORTS as soon as its covering
        # exceeds the budget (the Morton _try_cover discipline) — a
        # continent-scale box never fully materializes its 100k-cell
        # level-16 boundary before coarsening
        for lvl in range(level, -1, -2):
            cover = _bbox_covering_level(
                lon_lo_e7, lat_lo_e7, lon_hi_e7, lat_hi_e7, lvl,
                budget=max_cells,
            )
            if cover is not None:
                return cover
        return _bbox_covering_level(
            lon_lo_e7, lat_lo_e7, lon_hi_e7, lat_hi_e7, 0, budget=None
        )
    return _bbox_covering_level(
        lon_lo_e7, lat_lo_e7, lon_hi_e7, lat_hi_e7, level, budget=None
    )


def _bbox_covering_level(
    lon_lo_e7: int,
    lat_lo_e7: int,
    lon_hi_e7: int,
    lat_hi_e7: int,
    level: int,
    budget: int | None,
) -> list[int] | None:
    """One covering attempt at a fixed boundary `level`; returns None
    as soon as the cell count exceeds `budget` (early abort)."""
    lat_lo, lat_hi = lat_lo_e7 * 1e-7, lat_hi_e7 * 1e-7
    lon_lo, lon_hi = lon_lo_e7 * 1e-7, lon_hi_e7 * 1e-7
    out: list[int] = []

    class _OverBudget(Exception):
        pass

    def descend(face: int, i: int, j: int, lvl: int) -> None:
        if budget is not None and len(out) > budget:
            raise _OverBudget
        size = 1 << (MAX_LEVEL - lvl)
        c_lat_lo, c_lat_hi, c_lon_lo, c_lon_hi = _cell_latlng_bound(
            face, i, j, size
        )
        if c_lat_hi < lat_lo or c_lat_lo > lat_hi:
            return
        if not _lon_intervals_overlap(c_lon_lo, c_lon_hi, lon_lo, lon_hi):
            return
        # interior short-circuit: a cell certainly INSIDE the bbox is
        # emitted at its coarse level — its [range_min, range_max]
        # contains every level-`level` descendant id, so the cursor
        # range scan over cell_node is identical but the covering stays
        # perimeter-sized instead of area-sized
        inside = (
            c_lat_lo >= lat_lo
            and c_lat_hi <= lat_hi
            and c_lon_lo <= c_lon_hi  # wrapped cell: never "inside"
            and lon_lo <= c_lon_lo
            and c_lon_hi <= lon_hi
        )
        if lvl == level or inside:
            out.append(from_face_ij(face, i, j, lvl))
            # re-check AFTER the append too: the entry check alone
            # misses a budget-busting cell appended by the final
            # descend call of the traversal (ADVICE r09)
            if budget is not None and len(out) > budget:
                raise _OverBudget
            return
        half = size // 2
        for di in (0, half):
            for dj in (0, half):
                descend(face, i + di, j + dj, lvl + 1)

    try:
        for face in range(6):
            descend(face, 0, 0, 0)
    except _OverBudget:
        return None
    return sorted(out)


def covering_ranges(cells: list[int]) -> list[tuple[int, int]]:
    """Merge same-level cell ids into [lo, hi] INCLUSIVE uint64 key
    ranges (adjacent curve positions coalesce), for cursor range scans
    over `cell_node`."""
    ranges: list[tuple[int, int]] = []
    for c in sorted(cells):
        lo, hi = range_min(c), range_max(c)
        # curve-consecutive same-level cells leave exactly one even
        # (never-a-cell-id) value between range_max and the next
        # range_min, so a gap of 2 still merges losslessly
        if ranges and lo <= ranges[-1][1] + 2:
            ranges[-1] = (ranges[-1][0], max(ranges[-1][1], hi))
        else:
            ranges.append((lo, hi))
    return ranges
