"""S2 cell-id math pinned structurally (no S2 library exists in this
container, so correctness rests on the algebraic properties that
uniquely characterize the curve plus the end-to-end covering test in
test_osmx.py):

- the ij<->pos orientation tables must be exact inverses;
- CONSECUTIVE curve positions must decode to 4-adjacent (i, j) cells —
  the Hilbert continuity property; any wrong table entry or
  orientation update breaks adjacency at some position, so the random
  sweep over positions is a strong pin of the whole table set;
- st<->uv round-trips, cell centers land back in their own cell, the
  scalar and vectorized paths agree bit-for-bit.
"""

from __future__ import annotations

import math
import random

import numpy as np

from osmexpress_spark.spatial import s2cell as S


def test_tables_are_inverses():
    for o in range(4):
        for pos in range(4):
            ij = S._POS_TO_IJ[o][pos]
            assert S._IJ_TO_POS[o][ij] == pos
        assert sorted(S._POS_TO_IJ[o]) == [0, 1, 2, 3]


def test_hilbert_continuity():
    """Consecutive leaf curve positions are 4-adjacent in (i, j)."""
    rng = random.Random(5)
    for _ in range(400):
        face = rng.randrange(6)
        pos = rng.randrange((1 << 60) - 1)
        a = (face << 61) | (pos << 1) | 1
        b = (face << 61) | ((pos + 1) << 1) | 1
        fa, ia, ja = S.to_face_ij(a)
        fb, ib, jb = S.to_face_ij(b)
        assert fa == fb == face
        assert abs(ia - ib) + abs(ja - jb) == 1, (pos, ia, ja, ib, jb)


def test_face_ij_roundtrip():
    rng = random.Random(6)
    for _ in range(300):
        face = rng.randrange(6)
        i = rng.randrange(1 << 30)
        j = rng.randrange(1 << 30)
        cid = S.from_face_ij(face, i, j, level=30)
        assert S.to_face_ij(cid) == (face, i, j)
        assert S.level_of(cid) == 30
        p16 = S.from_face_ij(face, i, j, level=16)
        assert S.level_of(p16) == 16
        assert S.range_min(p16) <= cid <= S.range_max(p16)


def test_st_uv_roundtrip_and_monotonic():
    prev = None
    for k in range(0, 1001):
        s = k / 1000.0
        u = S._st_to_uv(s)
        assert abs(S._uv_to_st(u) - s) < 1e-12
        if prev is not None:
            assert u > prev
        prev = u
    assert abs(S._st_to_uv(0.0) + 1.0) < 1e-15
    assert abs(S._st_to_uv(1.0) - 1.0) < 1e-15
    assert abs(S._st_to_uv(0.5)) < 1e-15


def test_xyz_face_uv_roundtrip():
    rng = random.Random(7)
    for _ in range(300):
        lat = rng.uniform(-89.9, 89.9)
        lon = rng.uniform(-180.0, 180.0)
        x, y, z = S._xyz(lat, lon)
        face, u, v = S._face_uv(x, y, z)
        assert -1.0 - 1e-12 <= u <= 1.0 + 1e-12
        assert -1.0 - 1e-12 <= v <= 1.0 + 1e-12
        xx, yy, zz = S._face_xyz(face, u, v)
        n = math.sqrt(xx * xx + yy * yy + zz * zz)
        assert abs(xx / n - x) < 1e-12
        assert abs(yy / n - y) < 1e-12
        assert abs(zz / n - z) < 1e-12


def test_cell_center_maps_back_to_same_cell():
    rng = random.Random(8)
    for _ in range(200):
        lat = rng.uniform(-85.0, 85.0)
        lon = rng.uniform(-179.9, 179.9)
        cid = S.cell_id(lat, lon, level=16)
        clat, clon = S.cell_center(cid)
        assert S.cell_id(clat, clon, level=16) == cid
        # the center is close to the original point (level-16 cells
        # are a few hundred meters: < 0.02 degrees everywhere)
        assert abs(clat - lat) < 0.02


def test_vectorized_matches_scalar():
    rng = random.Random(9)
    lons = np.array(
        [rng.randint(-1800000000, 1800000000) for _ in range(500)],
        dtype=np.int64,
    )
    lats = np.array(
        [rng.randint(-900000000, 900000000) for _ in range(500)],
        dtype=np.int64,
    )
    vec = S.cell_ids_np(lons, lats, level=16)
    for k in range(len(lons)):
        assert int(vec[k]) == S.cell_id_scaled(
            int(lons[k]), int(lats[k]), level=16
        ), (lons[k], lats[k])


def test_bias_roundtrip_preserves_order():
    rng = random.Random(10)
    ids = sorted(
        S.cell_id(rng.uniform(-89, 89), rng.uniform(-180, 180), 16)
        for _ in range(200)
    )
    biased = [S.bias64(c) for c in ids]
    assert biased == sorted(biased)
    assert [S.unbias64(b) for b in biased] == ids
    assert all(-(1 << 63) <= b < (1 << 63) for b in biased)


def test_bbox_covering_never_misses():
    """Every point inside the bbox has its level-16 cell in the
    covering (the conservative-descent guarantee), and the merged
    ranges contain every covering cell's id span."""
    rng = random.Random(11)
    for _ in range(8):
        lon0 = rng.randint(-1700000000, 1600000000)
        lat0 = rng.randint(-800000000, 700000000)
        lon1 = lon0 + rng.randint(100000, 5000000)
        lat1 = lat0 + rng.randint(100000, 5000000)
        cover = S.bbox_covering(lon0, lat0, lon1, lat1, level=14)
        assert cover
        # interior short-circuit may emit coarser-than-14 cells whose
        # ranges contain their descendants; membership is via ranges
        ranges = S.covering_ranges(cover)
        for _ in range(60):
            lon = rng.randint(lon0, lon1)
            lat = rng.randint(lat0, lat1)
            cid = S.cell_id_scaled(lon, lat, level=14)
            assert any(lo <= cid <= hi for lo, hi in ranges), (lon, lat)


def test_covering_ranges_merge_adjacent():
    a = S.from_face_ij(1, 0, 0, 16)
    # consecutive curve positions at the same level merge into one span
    lsb = a & -a
    b = a + 2 * lsb
    ranges = S.covering_ranges([a, b])
    assert ranges == [(S.range_min(a), S.range_max(b))]


def _lon_in(lon, lo, hi):
    if lo <= -180.0 and hi >= 180.0:
        return True
    lon = (lon + 180.0) % 360.0 - 180.0
    if lo <= hi:
        return lo - 1e-7 <= lon <= hi + 1e-7
    return lon >= lo - 1e-7 or lon <= hi + 1e-7


def test_cell_latlng_bound_contains_samples():
    """The exact per-face bound CONTAINS every sampled point of the
    cell, at every face and level — random cells incl. pole- and
    antimeridian-crossing ones."""
    rng = random.Random(13)
    for _ in range(250):
        face = rng.randrange(6)
        lvl = rng.randrange(0, 17)
        size = 1 << (S.MAX_LEVEL - lvl)
        i = rng.randrange(0, (1 << S.MAX_LEVEL) - size + 1)
        j = rng.randrange(0, (1 << S.MAX_LEVEL) - size + 1)
        lat_lo, lat_hi, lon_lo, lon_hi = S._cell_latlng_bound(
            face, i, j, size
        )
        for _ in range(25):
            fi = i + rng.random() * size
            fj = j + rng.random() * size
            u = S._st_to_uv(fi / (1 << S.MAX_LEVEL))
            v = S._st_to_uv(fj / (1 << S.MAX_LEVEL))
            x, y, z = S._face_xyz(face, u, v)
            n = math.sqrt(x * x + y * y + z * z)
            lat = math.degrees(math.asin(z / n))
            lon = math.degrees(math.atan2(y, x))
            assert lat_lo - 1e-7 <= lat <= lat_hi + 1e-7, (face, lvl)
            assert _lon_in(lon, lon_lo, lon_hi), (face, lvl, lon, lon_lo, lon_hi)


def test_known_values_from_the_published_spec():
    """Anchors every S2 implementation shares (s2geometry.io docs):
    the six face cells are (2f+1) << 60; face 0 is centered on
    (lat 0, lon 0) and face 2 on the north pole; the leaf at (0, 0)
    sits on face 0."""
    for face in range(6):
        fc = S.from_face_ij(face, 0, 0, level=0)
        assert fc == (2 * face + 1) << 60, face
        assert S.level_of(fc) == 0
    lat, lon = S.cell_center((1) << 60)  # face 0 cell
    assert abs(lat) < 1e-12 and abs(lon) < 1e-12
    lat, _lon = S.cell_center((5) << 60)  # face 2: +z, the north pole
    assert abs(lat - 90.0) < 1e-9
    lat, _lon = S.cell_center((11) << 60)  # face 5: -z, the south pole
    assert abs(lat + 90.0) < 1e-9
    # the (0, 0) point maps to face 0 and its level-0 ancestor is the
    # face cell
    leaf = S.cell_id(0.0, 0.0, level=30)
    assert leaf >> 61 == 0
    assert S.range_min((1) << 60) <= leaf <= S.range_max((1) << 60)


def test_budgeted_covering_still_never_misses():
    """max_cells coarsens the boundary but the guarantee holds: every
    in-box point's cell id lies inside some merged range."""
    rng = random.Random(21)
    cover = S.bbox_covering(
        -1000000000, 300000000, -700000000, 500000000, 16, max_cells=512
    )
    assert len(cover) <= 512
    ranges = S.covering_ranges(cover)
    for _ in range(100):
        lon = rng.randint(-1000000000, -700000000)
        lat = rng.randint(300000000, 500000000)
        cid = S.cell_id_scaled(lon, lat, level=16)
        assert any(lo <= cid <= hi for lo, hi in ranges), (lon, lat)
