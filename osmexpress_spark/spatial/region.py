"""Region parsing + containment — driver-side spatial planning.

Port of the reference's region surface (`/root/reference/src/region.cpp`):

- bbox text ``minLat,minLon,maxLat,maxLon`` (`src/region.cpp:74-82`,
  order documented in `test/test_region.cpp:14`);
- disc text ``lat,lon,radiusDegrees`` (`src/region.cpp:84-91`);
- GeoJSON Polygon / MultiPolygon / Feature / FeatureCollection
  (`src/region.cpp:16-45,93-101`);
- osmosis ``.poly`` with multiple outer loops and ``!``-prefixed holes
  (`src/region.cpp:47-70`); file-extension dispatch mirrors
  `src/extract.cpp:113-130`.

This is deliberately a small pure-Python module: region planning is a
driver-side activity in our engine (exactly as it is single-process in
the reference) — its output is a covering, i.e. a list of integer cell
ranges that become a pushed-down Parquet predicate. Executors never see
region objects.

Containment semantics: planar lon/lat geometry with even-odd
(ray-casting) polygon tests. The reference's S2 spherical edges differ
at the ~cell scale near poles/antimeridian; our correctness contract is
result id-sets computed against *this* module (SURVEY.md §5 — the
reference itself warns coverings are build-dependent,
`docs/MANUAL.md:148`).
"""

from __future__ import annotations

import json
import math
import re
from dataclasses import dataclass

Ring = list[tuple[float, float]]  # [(lon, lat), ...], closed implicitly


def _close(ring: Ring) -> Ring:
    """Drop an explicitly repeated last point (test_region.cpp:161-172)."""
    if len(ring) > 1 and ring[0] == ring[-1]:
        return ring[:-1]
    return ring


def _point_in_ring(lon: float, lat: float, ring: Ring) -> bool:
    """Even-odd ray casting; orientation-insensitive (test_region.cpp:146)."""
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > lat) != (y2 > lat):
            xint = x1 + (lat - y1) * (x2 - x1) / (y2 - y1)
            if lon < xint:
                inside = not inside
    return inside


def _segments_intersect(p1, p2, p3, p4) -> bool:
    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    def on_seg(a, b, c):
        return (
            min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
        )

    o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
    o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
    if o1 != o2 and o3 != o4:
        return True
    for (a, b, c), o in (
        ((p1, p2, p3), o1),
        ((p1, p2, p4), o2),
        ((p3, p4, p1), o3),
        ((p3, p4, p2), o4),
    ):
        if o == 0 and on_seg(a, b, c):
            return True
    return False


def _ring_edges(ring: Ring):
    n = len(ring)
    for i in range(n):
        yield ring[i], ring[(i + 1) % n]


def _rect_corners(x0, y0, x1, y1):
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]


def _edge_hits_rect(a, b, x0, y0, x1, y1) -> bool:
    # quick reject on bounding boxes, then segment-vs-4-sides
    if max(a[0], b[0]) < x0 or min(a[0], b[0]) > x1:
        return False
    if max(a[1], b[1]) < y0 or min(a[1], b[1]) > y1:
        return False
    if x0 <= a[0] <= x1 and y0 <= a[1] <= y1:
        return True
    rc = _rect_corners(x0, y0, x1, y1)
    for i in range(4):
        if _segments_intersect(a, b, rc[i], rc[(i + 1) % 4]):
            return True
    return False


@dataclass
class _Shape:
    """One polygon: an outer ring + zero or more holes. Discs and bboxes
    normalize into analytic shapes below."""

    outer: Ring
    holes: list[Ring]

    def contains(self, lon: float, lat: float) -> bool:
        if not _point_in_ring(lon, lat, self.outer):
            return False
        return not any(_point_in_ring(lon, lat, h) for h in self.holes)

    def bounds(self):
        xs = [p[0] for p in self.outer]
        ys = [p[1] for p in self.outer]
        return min(xs), min(ys), max(xs), max(ys)

    # --- rect predicates for the quadtree covering (conservative) ---
    def intersects_rect(self, x0, y0, x1, y1) -> bool:
        bx0, by0, bx1, by1 = self.bounds()
        if x1 < bx0 or x0 > bx1 or y1 < by0 or y0 > by1:
            return False
        if any(x0 <= px <= x1 and y0 <= py <= y1 for px, py in self.outer):
            return True
        if _point_in_ring((x0 + x1) / 2, (y0 + y1) / 2, self.outer) and not any(
            _point_in_ring((x0 + x1) / 2, (y0 + y1) / 2, h) for h in self.holes
        ):
            return True
        if any(self.contains(cx, cy) for cx, cy in _rect_corners(x0, y0, x1, y1)):
            return True
        for ring in [self.outer, *self.holes]:
            for a, b in _ring_edges(ring):
                if _edge_hits_rect(a, b, x0, y0, x1, y1):
                    return True
        return False

    def contains_rect(self, x0, y0, x1, y1) -> bool:
        if not all(self.contains(cx, cy) for cx, cy in _rect_corners(x0, y0, x1, y1)):
            return False
        for ring in [self.outer, *self.holes]:
            for a, b in _ring_edges(ring):
                if _edge_hits_rect(a, b, x0, y0, x1, y1):
                    return False
        return True


class _Disc:
    """Spherical-cap analog parameterized in degrees (src/region.cpp:84-91
    builds an S2Cap from a degree radius); we use planar degree distance,
    which matches at the scales the tests exercise."""

    def __init__(self, lat: float, lon: float, radius_deg: float):
        self.lat, self.lon, self.r = lat, lon, radius_deg

    def contains(self, lon: float, lat: float) -> bool:
        return math.hypot(lon - self.lon, lat - self.lat) <= self.r

    def bounds(self):
        return self.lon - self.r, self.lat - self.r, self.lon + self.r, self.lat + self.r

    def intersects_rect(self, x0, y0, x1, y1) -> bool:
        cx = min(max(self.lon, x0), x1)
        cy = min(max(self.lat, y0), y1)
        return math.hypot(cx - self.lon, cy - self.lat) <= self.r

    def contains_rect(self, x0, y0, x1, y1) -> bool:
        return all(self.contains(px, py) for px, py in _rect_corners(x0, y0, x1, y1))


_NUM = re.compile(r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?")


class Region:
    """A union of shapes, mirroring the reference's ``vector<S2Region>``
    (`src/region.cpp:72-120`). ``kind`` in {bbox, disc, geojson, poly}."""

    def __init__(self, text: str, kind: str):
        self.kind = kind
        self.shapes: list = []
        if kind == "bbox":
            min_lat, min_lon, max_lat, max_lon = (float(x) for x in text.split(","))
            self.shapes.append(
                _Shape(
                    outer=[
                        (min_lon, min_lat),
                        (max_lon, min_lat),
                        (max_lon, max_lat),
                        (min_lon, max_lat),
                    ],
                    holes=[],
                )
            )
        elif kind == "disc":
            lat, lon, r = (float(x) for x in text.split(","))
            self.shapes.append(_Disc(lat, lon, r))
        elif kind == "geojson":
            self._parse_geojson(json.loads(text))
        elif kind == "poly":
            self._parse_poly(text)
        else:
            raise ValueError(f"unknown region kind: {kind}")
        if not self.shapes:
            raise ValueError("region parsed to zero shapes")

    # dispatch mirrors src/extract.cpp:113-130
    @classmethod
    def from_file(cls, path: str) -> "Region":
        with open(path) as f:
            text = f.read()
        if path.endswith(".json") or path.endswith(".geojson"):
            return cls(text, "geojson")
        if path.endswith(".poly"):
            return cls(text, "poly")
        if path.endswith(".bbox"):
            return cls(text.strip(), "bbox")
        if path.endswith(".disc"):
            return cls(text.strip(), "disc")
        raise ValueError(f"cannot infer region kind from extension: {path}")

    def _add_polygon(self, coords) -> None:
        """GeoJSON Polygon coordinate array: [outer, hole, hole...]
        (src/region.cpp:16-31)."""
        rings = [_close([(float(x), float(y)) for x, y in ring]) for ring in coords]
        self.shapes.append(_Shape(outer=rings[0], holes=rings[1:]))

    def _parse_geojson(self, obj) -> None:
        t = obj.get("type")
        if t == "Polygon":
            self._add_polygon(obj["coordinates"])
        elif t == "MultiPolygon":
            for poly in obj["coordinates"]:
                self._add_polygon(poly)
        elif t == "Feature":
            self._parse_geojson(obj["geometry"])
        elif t == "FeatureCollection":
            for feat in obj["features"]:
                self._parse_geojson(feat)
        else:
            raise ValueError(f"unsupported GeoJSON type: {t}")

    def _parse_poly(self, text: str) -> None:
        """osmosis .poly: name line, then sections 'secname / coords / END',
        terminated by a final END; '!'-prefixed section = hole
        (src/region.cpp:47-70). Coordinates are lon lat."""
        lines = text.splitlines()
        i = 1  # skip dataset name line
        outers: list[Ring] = []
        holes: list[Ring] = []
        while i < len(lines):
            header = lines[i].strip()
            i += 1
            if header == "END" or header == "":
                if header == "END":
                    break
                continue
            is_hole = header.startswith("!")
            ring: Ring = []
            while i < len(lines) and lines[i].strip() != "END":
                nums = _NUM.findall(lines[i])
                if len(nums) >= 2:
                    ring.append((float(nums[0]), float(nums[1])))
                i += 1
            i += 1  # consume section END
            ring = _close(ring)
            if len(ring) >= 3:
                (holes if is_hole else outers).append(ring)
        for outer in outers:
            self.shapes.append(_Shape(outer=outer, holes=[]))
        # holes attach to whichever outer contains their first vertex
        for hole in holes:
            for shape in self.shapes:
                if isinstance(shape, _Shape) and _point_in_ring(*hole[0], shape.outer):
                    shape.holes.append(hole)
                    break

    # --- public surface (Region::Contains / GetBounds, src/region.cpp:122-157) ---
    def contains(self, lat: float, lon: float) -> bool:
        return any(s.contains(lon, lat) for s in self.shapes)

    def bounds(self) -> tuple[float, float, float, float]:
        """(lon_min, lat_min, lon_max, lat_max); lon_hi normalized to
        (-180, 180] past the antimeridian (src/region.cpp:137-157,
        test_region.cpp:107-125)."""
        boxes = [s.bounds() for s in self.shapes]
        x0 = min(b[0] for b in boxes)
        y0 = min(b[1] for b in boxes)
        x1 = max(b[2] for b in boxes)
        y1 = max(b[3] for b in boxes)
        if x1 > 180.0:
            x1 -= 360.0
        return x0, y0, x1, y1

    def intersects_rect(self, x0, y0, x1, y1) -> bool:
        return any(s.intersects_rect(x0, y0, x1, y1) for s in self.shapes)

    def contains_rect(self, x0, y0, x1, y1) -> bool:
        return any(s.contains_rect(x0, y0, x1, y1) for s in self.shapes)
