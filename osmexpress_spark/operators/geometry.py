"""Per-way geometry algorithms that are genuinely imperative.

Almost everything geometric in this engine is a column expression
(WKT/GeoJSON assembly, lengths, shoelace areas, tile/cell mapping).
Line SIMPLIFICATION is the exception: Visvalingam-Whyatt removes the
vertex with the smallest effective triangle area and RECOMPUTES its
neighbors' areas, an inherently sequential per-way loop — exactly the
case the architecture rules reserve for Arrow-batched mapInPandas
(bounded per-row work, zero shuffle, no driver involvement).

Simplification is the tile-rendering prerequisite (a z8 tile does not
need 10k-vertex coastline ways); the reference has no analog.
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def visvalingam(points: list[tuple[int, int]], min_area2: int) -> list[int]:
    """Indices of the vertices kept after removing every interior
    vertex whose effective triangle has 2*area < min_area2 (integer
    scaled-coord^2 units, exact arithmetic). Endpoints always survive;
    removal order is smallest-area-first with index tie-break, so the
    result is deterministic.

    O(n log n) via a lazy-invalidation min-heap over (area, index) — a
    popped entry is live only if it matches the vertex's CURRENT area
    and the vertex is still alive; removing a vertex re-pushes its two
    neighbors with recomputed areas (stale entries stay in the heap and
    are skipped on pop). heapq's lexicographic order makes equal areas
    resolve to the smallest index, identical to the former linear-scan
    implementation; a 50k-vertex way costs ~n log n area evaluations,
    not the scan's n^2/2."""
    n = len(points)
    if n <= 2:
        return list(range(n))

    def area2(i_prev: int, i: int, i_next: int) -> int:
        (x0, y0), (x1, y1), (x2, y2) = (
            points[i_prev], points[i], points[i_next]
        )
        return abs((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0))

    prev = list(range(-1, n - 1))
    nxt = list(range(1, n + 1))
    removed = [False] * n
    cur = [0] * n  # current effective area of each interior vertex
    heap: list[tuple[int, int]] = []
    for i in range(1, n - 1):
        cur[i] = area2(i - 1, i, i + 1)
        heap.append((cur[i], i))
    heapq.heapify(heap)

    alive_ct = n
    while heap and alive_ct > 2:
        a, i = heapq.heappop(heap)
        if removed[i] or a != cur[i]:
            continue  # stale: vertex gone, or its area was re-pushed
        if a >= min_area2:
            break  # live minimum clears the threshold: done
        removed[i] = True
        alive_ct -= 1
        p, q = prev[i], nxt[i]
        nxt[p], prev[q] = q, p
        for j in (p, q):
            if 0 < j < n - 1 and not removed[j]:
                cur[j] = area2(prev[j], j, nxt[j])
                heapq.heappush(heap, (cur[j], j))
    return [i for i in range(n) if not removed[i]]


def simplify_ways(
    ways: DataFrame,
    locations: DataFrame,
    min_area2: int,
) -> DataFrame:
    """(id, nodes, n_before, n_after): each way's node list simplified
    by Visvalingam-Whyatt at the given integer area threshold. Vertex
    coordinates come from the narrow locations join; unresolved refs
    are dropped before simplification (the extract convention). Plan:
    posexplode + locations join + per-way collect, then one
    Arrow-batched mapInPandas — no shuffle after the collect, no
    Python in any other stage."""
    verts = ways.select(
        F.col("id").alias("way_id"), F.posexplode("nodes").alias("pos", "node_id")
    )
    pts = (
        verts.join(
            locations.select(F.col("id").alias("node_id"), "lon", "lat"),
            "node_id",
        )
        .groupBy("way_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "node_id", "lon", "lat"))
            ).alias("pts")
        )
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nodes, before, after = [], [], [], []
            for way_id, arr in zip(pdf["way_id"], pdf["pts"]):
                coords = [(int(p["lon"]), int(p["lat"])) for p in arr]
                keep = visvalingam(coords, min_area2)
                ids.append(way_id)
                nodes.append([int(arr[i]["node_id"]) for i in keep])
                before.append(len(arr))
                after.append(len(keep))
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "nodes": pd.Series(nodes, dtype=object),
                    "n_before": pd.Series(before, dtype="int32"),
                    "n_after": pd.Series(after, dtype="int32"),
                }
            )

    return pts.mapInPandas(
        run, "id long, nodes array<long>, n_before int, n_after int"
    )
