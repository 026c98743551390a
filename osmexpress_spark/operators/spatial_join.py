"""Multi-region spatial join: points × regions in one pass.

The reference answers one region per process run (`osmx extract`,
src/extract.cpp:113-176). The engine generalizes it to a JOIN: N
regions (a dim table of bboxes/polygons) against the full point set
at once — the "tag every point with its containing zones" step of a
geo pipeline.

Scale shape (the extract plan, multi-tenant):
- coverings are computed DRIVER-side per region (regions are a dim —
  tens..thousands; each covering is ≤64 merged ranges) and broadcast
  as a (box_id, lo, hi) ranges table;
- the candidate join is `point.cell BETWEEN lo AND hi` against the
  broadcast ranges — a BroadcastNestedLoopJoin whose inner side is
  tiny, so cost is scan × ranges-lookup, never a shuffle of the big
  side;
- a single global `cell BETWEEN min(lo) AND max(hi)` predicate is
  added separately: on a cell-sorted locations table (the expand
  layout) it reaches the parquet scan as a pushed filter and prunes
  row groups before the join;
- the exact bbox refine runs as a post-join column predicate, so the
  covering's over-selection never reaches the output (assert on
  result sets, not coverings — docs/MANUAL.md:148).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..spatial import cells
from ..spatial.covering import covering
from ..spatial.region import Region

SCALE = 10_000_000


def point_in_box_join(
    points: DataFrame,
    boxes: DataFrame,
    id_col: str = "id",
    box_id_col: str = "box_id",
    max_ranges_per_box: int = 64,
) -> DataFrame:
    """(point id, box_id) for every point inside every box.

    `points` carries scaled-int `lon`/`lat`; `boxes` carries scaled-int
    `minlon`/`minlat`/`maxlon`/`maxlat` (inclusive bounds) and is a
    DIM table — it is collected to the driver to compute coverings
    (bounded: |boxes| × ≤64 ranges).
    """
    spark = points.sparkSession
    box_rows = boxes.select(
        box_id_col, "minlon", "minlat", "maxlon", "maxlat"
    ).collect()
    ranges = []
    exact = {}
    for r in box_rows:
        reg = Region(
            f"{r['minlat'] / SCALE},{r['minlon'] / SCALE},"
            f"{r['maxlat'] / SCALE},{r['maxlon'] / SCALE}",
            "bbox",
        )
        for lo, hi in covering(reg, max_ranges=max_ranges_per_box):
            ranges.append((r[box_id_col], lo, hi))
        exact[r[box_id_col]] = (
            r["minlon"], r["minlat"], r["maxlon"], r["maxlat"]
        )
    if not ranges:
        return points.select(
            F.col(id_col), F.lit(None).cast("long").alias(box_id_col)
        ).where(F.lit(False))
    ranges_df = spark.createDataFrame(ranges, f"{box_id_col} long, lo long, hi long")
    exact_df = spark.createDataFrame(
        [(b, *v) for b, v in exact.items()],
        f"{box_id_col} long, minlon int, minlat int, maxlon int, maxlat int",
    )
    glo = min(lo for _, lo, _ in ranges)
    ghi = max(hi for _, _, hi in ranges)

    pts = points.select(
        F.col(id_col), "lon", "lat", cells.cell_col(F.col("lon"), F.col("lat")).alias("__cell")
    ).where(F.col("__cell").between(F.lit(glo), F.lit(ghi)))
    # per-box coverings are merged DISJOINT ranges (cells.merge_ranges),
    # so a point hits at most one (box, range) row — candidate pairs are
    # already unique and the whole plan is shuffle-free
    cand = pts.join(
        F.broadcast(ranges_df),
        (F.col("__cell") >= F.col("lo")) & (F.col("__cell") <= F.col("hi")),
    ).select(id_col, "lon", "lat", box_id_col)
    refined = cand.join(F.broadcast(exact_df), box_id_col).where(
        (F.col("lon") >= F.col("minlon"))
        & (F.col("lon") <= F.col("maxlon"))
        & (F.col("lat") >= F.col("minlat"))
        & (F.col("lat") <= F.col("maxlat"))
    )
    return refined.select(F.col(id_col), F.col(box_id_col))


def radius_pairs(
    nodes,
    radius: int,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_bucket_size: int | None = None,
):
    """All node pairs (id_a < id_b) within planar integer distance
    ``radius`` (scaled deg*1e7 coords), with the exact squared
    distance d2. The proximity self-join every geo pipeline needs
    (cluster detection, duplicate-POI merge) — expressed as a
    grid-bucket join, not a cross join: bucket side = radius, so a
    point's partners can only live in its 3x3 bucket neighborhood.
    The probe side explodes its 9 neighbor keys; the build side keeps
    one row per point; each qualifying pair meets on exactly ONE
    bucket key (the build point's own), so no post-join dedup.

    100 TB shape: one equi-join shuffle on the bucket key (vs the
    O(n²) cross join), explode factor 9 on one side only, pure
    integer arithmetic. Squares are overflow-proof by construction:
    deltas are clamped to `radius` with least() BEFORE squaring —
    exact for every surviving pair (their deltas are <= radius
    already), bounded for antipodal ones (raw global deltas overflow
    int64 when squared). Planar contract: no antimeridian wrap — the
    two sides of the dateline are far apart in this metric, matching
    the reference's planar region tests (src/region.cpp).

    ``max_bucket_size`` is the hot-bucket guard for skewed point
    densities (the minhash_lsh_pairs pattern): a dense-city bucket of
    b points emits O(b²) pairs no matter the join strategy — that is
    the operator's OUTPUT, not an inefficiency — but one pathological
    bucket can still stall a reducer. Buckets above the cap are
    dropped before the join (one extra count-aggregate over the
    bucket keys); default None = exact contract semantics (what the
    oracle checks)."""
    bs = int(radius)

    def fdiv(c):
        c = F.col(c).cast("long")
        return ((c - F.pmod(c, F.lit(bs))) / F.lit(bs)).cast("long")

    pts = nodes.select(
        F.col(id_col).alias("id"),
        F.col(lon_col).cast("long").alias("lon"),
        F.col(lat_col).cast("long").alias("lat"),
        fdiv(lon_col).alias("bx"),
        fdiv(lat_col).alias("by"),
    )
    if max_bucket_size is not None:
        # drop hot-bucket POINTS (both join sides derive from the
        # filtered frame): filtering only one side would half-drop the
        # bucket and make survival depend on which id sorted lower
        size = pts.groupBy("bx", "by").agg(F.count(F.lit(1)).alias("__bsz"))
        ok = size.where(F.col("__bsz") <= max_bucket_size).select("bx", "by")
        pts = pts.join(ok, ["bx", "by"])
    probe = pts.select(
        F.col("id").alias("id_a"),
        F.col("lon").alias("lon_a"),
        F.col("lat").alias("lat_a"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("bx") + dx).alias("bx"),
                        (F.col("by") + dy).alias("by"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("nb"),
    ).select("id_a", "lon_a", "lat_a", "nb.bx", "nb.by")
    build = pts.select(
        F.col("id").alias("id_b"),
        F.col("lon").alias("lon_b"),
        F.col("lat").alias("lat_b"),
        "bx",
        "by",
    )
    adx = F.abs(F.col("lon_b") - F.col("lon_a"))
    ady = F.abs(F.col("lat_b") - F.col("lat_a"))
    dx = F.least(adx, F.lit(bs))
    dy = F.least(ady, F.lit(bs))
    return (
        probe.join(build, ["bx", "by"])
        .where(F.col("id_a") < F.col("id_b"))
        .where((adx <= bs) & (ady <= bs))
        .select(
            "id_a",
            "id_b",
            (dx * dx + dy * dy).alias("d2"),
        )
        # the bound is precomputed in Python: an int32 lit * lit would
        # constant-fold past 2^31 and trip ANSI overflow at plan time
        .where(F.col("d2") <= F.lit(bs * bs).cast("long"))
    )


def nearest_neighbors(
    nodes,
    k: int,
    radius: int,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
):
    """Radius-bounded k-nearest-neighbor join: for every node, its k
    closest nodes within `radius` (exact integer d2, ties -> lower
    neighbor id). Production kNN over geo points is always
    radius-bounded — an unbounded search needs adaptive grid levels,
    and pipelines that want "the k nearest, wherever they are" really
    want "neighbors within a sane radius, else nothing" (duplicate-POI
    merge, address clustering). Derived from radius_pairs: symmetrize
    the a<b pair stream, one rank window per node. Nodes with no
    neighbor inside the radius are absent from the output."""
    from pyspark.sql import Window

    # materialize once: the symmetrizing union would otherwise plan the
    # 9x-explode grid join twice (repo convention: localCheckpoint with
    # a "probed twice" note, as in topk_ivfpq_indexed)
    pairs = radius_pairs(nodes, radius, id_col, lon_col, lat_col)
    pairs = pairs.localCheckpoint(eager=True)
    sym = pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("neighbor_id"), "d2"
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("id"),
            F.col("id_a").alias("neighbor_id"),
            "d2",
        )
    )
    w = Window.partitionBy("id").orderBy("d2", "neighbor_id")
    return (
        sym.withColumn("nn_rank", F.row_number().over(w))
        .where(F.col("nn_rank") <= k)
        .select("id", "neighbor_id", "d2", "nn_rank")
    )


def way_intersections(
    node_way: DataFrame,
    min_shared: int = 1,
    max_node_degree: int | None = None,
) -> DataFrame:
    """Topological way-intersection join: (way_a < way_b,
    n_shared_nodes) for every pair of ways sharing at least
    ``min_shared`` nodes — the routing-graph construction step (shared
    nodes are the junction candidates), expressed over the node_way
    reverse edge table the engine already maintains.

    Plan: self-equi-join of node_way on node_id (each side one
    8-byte-pair row per edge) + one map-side-combined count — the
    inverted-index pair-generation shape of dedup.jaccard_pairs, NOT
    an all-pairs join. ``max_node_degree`` is the hot-key guard (the
    minhash/radius-join pattern): a node shared by b ways contributes
    O(b^2) pairs; degrees above the cap are dropped with the same
    documented bias trade-off. Default None keeps exact semantics."""
    e = node_way.select("node_id", "way_id")
    if max_node_degree is not None:
        deg = e.groupBy("node_id").agg(F.count(F.lit(1)).alias("__deg"))
        e = (
            e.join(deg.where(F.col("__deg") <= max_node_degree), "node_id")
            .drop("__deg")
        )
    a = e.select("node_id", F.col("way_id").alias("way_a"))
    b = e.select("node_id", F.col("way_id").alias("way_b"))
    return (
        a.join(b, "node_id")
        .where(F.col("way_a") < F.col("way_b"))
        .groupBy("way_a", "way_b")
        .agg(F.count(F.lit(1)).alias("n_shared_nodes"))
        .where(F.col("n_shared_nodes") >= min_shared)
    )
