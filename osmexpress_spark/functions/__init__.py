"""Scalar/assembly function library (SURVEY.md §2.7) — all JVM-side
Spark built-ins, no UDFs on any hot path.

- G1 coordinate codec (`docs/MANUAL.md:140-142`, `python/osmx/
  osmx.py:64-67`)
- G6 WKT LineString assembly (`examples/way_wkt.cpp:34-43`,
  `examples/bbox_wkt.cpp:82-91`)
- G7 GeoJSON assembly (`python/examples/web_server.py:28-71`)
- G8 tag_dict / interleaved list codec (`python/osmx/osmx.py:9-14`,
  `include/osmx/util.h:28-40`)
- G9 ISO8601 timestamp codec (`python/examples/augmented_diff.py:77-80`)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- G1: scaled int32 <-> degrees -----------------------------------------
SCALE = 1e7


def to_degrees(scaled: Column) -> Column:
    """int32 (deg x 1e7) -> double degrees (python/osmx/osmx.py:64-67)."""
    return scaled.cast("double") / F.lit(SCALE)


def to_scaled(deg: Column) -> Column:
    """double degrees -> int32 (deg x 1e7), round-half-away like the
    reference's C cast of (deg * 1e7) after libosmium parsing."""
    return F.round(deg * F.lit(SCALE)).cast("int")


# --- G8: interleaved [k0,v0,k1,v1,...] <-> map ----------------------------
def tags_to_map(tags_kv: Column) -> Column:
    """Interleaved list -> MAP, the Spark analog of ``tag_dict``
    (python/osmx/osmx.py:9-14). Even positions are keys, odd are values."""
    keys = F.filter(tags_kv, lambda _, i: i % 2 == F.lit(0))
    vals = F.filter(tags_kv, lambda _, i: i % 2 == F.lit(1))
    return F.map_from_arrays(keys, vals)


def map_to_tags(tags: Column) -> Column:
    """MAP -> interleaved list (setTags, include/osmx/util.h:28-40).
    flatten(k,v pairs) preserves map entry order for round-trips."""
    return F.flatten(
        F.transform(F.map_entries(tags), lambda e: F.array(e["key"], e["value"]))
    )


# --- G9: ISO8601 <-> timestamp --------------------------------------------
ISO8601 = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def to_iso8601(ts: Column) -> Column:
    return F.date_format(ts, ISO8601)


def from_iso8601(s: Column) -> Column:
    return F.to_timestamp(s, ISO8601)


# --- G6: WKT assembly ------------------------------------------------------
def _fmt_coord(scaled: Column) -> Column:
    """Fixed 7-decimal coordinate text (way_wkt.cpp:40 prints lon/lat with
    7 digits). Build from the exact scaled int to avoid float formatting:
    sign + integer part + '.' + zero-padded 7-digit fraction."""
    sign = F.when(scaled < 0, F.lit("-")).otherwise(F.lit(""))
    a = F.abs(scaled.cast("long"))
    return F.concat(
        sign,
        (a / F.lit(10_000_000)).cast("long").cast("string"),
        F.lit("."),
        F.lpad((a % F.lit(10_000_000)).cast("string"), 7, "0"),
    )


def point_wkt(lon: Column, lat: Column) -> Column:
    return F.concat(
        F.lit("POINT ("), _fmt_coord(lon), F.lit(" "), _fmt_coord(lat), F.lit(")")
    )


def way_linestrings(ways: DataFrame, locations: DataFrame) -> DataFrame:
    """way id -> WKT LINESTRING in stored vertex order (G6).

    Spark shape (SURVEY.md §2.7): posexplode the node array, equi-join
    the narrow locations table, reassemble with collect_list +
    array_sort on the position — the shuffle join replaces the
    reference's per-node LMDB point reads (way_wkt.cpp:37-42). Vertex
    order is restored exactly via the (pos, lon, lat) struct sort.

    A node id with no locations row drops out of the inner join (the
    vertex vanishes from the line). Extract output can't hit this —
    way completion back-fills every member node (extract.cpp:264-274) —
    but callers assembling over partial snapshots should left-join
    validity first.
    """
    verts = ways.select(
        F.col("id").alias("way_id"), F.posexplode("nodes").alias("pos", "node_id")
    )
    joined = verts.join(
        locations.select(F.col("id").alias("node_id"), "lon", "lat"), "node_id"
    )
    return (
        joined.groupBy("way_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "lon", "lat"))
            ).alias("pts")
        )
        .select(
            F.col("way_id").alias("id"),
            F.concat(
                F.lit("LINESTRING ("),
                F.array_join(
                    F.transform(
                        F.col("pts"),
                        lambda p: F.concat(
                            _fmt_coord(p["lon"]), F.lit(" "), _fmt_coord(p["lat"])
                        ),
                    ),
                    ", ",
                ),
                F.lit(")"),
            ).alias("wkt"),
        )
    )


# --- G7: GeoJSON assembly --------------------------------------------------
def node_geojson(locations: DataFrame, nodes: DataFrame) -> DataFrame:
    """node id -> GeoJSON Point feature with tag properties
    (web_server.py:28-36)."""
    df = locations.join(nodes.select("id", "tags"), "id", "left_outer")
    geometry = F.to_json(
        F.struct(
            F.lit("Point").alias("type"),
            F.array(to_degrees(F.col("lon")), to_degrees(F.col("lat"))).alias(
                "coordinates"
            ),
        )
    )
    return df.select(
        "id",
        F.to_json(
            F.struct(
                F.lit("Feature").alias("type"),
                F.coalesce(F.col("tags"), F.map_from_arrays(F.array(), F.array())).alias(
                    "properties"
                ),
            )
        ).alias("feature_head"),
        geometry.alias("geometry"),
    )


def way_geojson(ways: DataFrame, locations: DataFrame) -> DataFrame:
    """way id -> GeoJSON LineString coordinates (web_server.py:38-50)."""
    verts = ways.select(
        F.col("id").alias("way_id"), F.posexplode("nodes").alias("pos", "node_id")
    )
    joined = verts.join(
        locations.select(F.col("id").alias("node_id"), "lon", "lat"), "node_id"
    )
    return (
        joined.groupBy("way_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "lon", "lat"))).alias("pts"))
        .select(
            F.col("way_id").alias("id"),
            F.to_json(
                F.struct(
                    F.lit("LineString").alias("type"),
                    F.transform(
                        F.col("pts"),
                        lambda p: F.array(to_degrees(p["lon"]), to_degrees(p["lat"])),
                    ).alias("coordinates"),
                )
            ).alias("geometry"),
        )
    )


# --- A4: bounds over a geometry's nodes (augmented_diff.py:309-342) -------
def way_bounds(ways: DataFrame, locations: DataFrame) -> DataFrame:
    verts = ways.select(F.col("id").alias("way_id"), F.explode("nodes").alias("node_id"))
    joined = verts.join(
        locations.select(F.col("id").alias("node_id"), "lon", "lat"), "node_id"
    )
    return joined.groupBy("way_id").agg(
        F.min("lon").alias("min_lon"),
        F.min("lat").alias("min_lat"),
        F.max("lon").alias("max_lon"),
        F.max("lat").alias("max_lat"),
    )


# --- G7b: relation GeometryCollection with recursive member descent -------
def relation_member_leaves(
    relations: DataFrame,
    roots: DataFrame,
    max_depth: int = 32,
) -> DataFrame:
    """The descent core of `relation_geojson`: (root, path, mtype, ref)
    for every non-relation member reachable from each root, where
    `path` is the member-index path from the root (DFS order =
    lexicographic path order). A (root, relation) pair is descended at
    most once (breadth-first first-occurrence wins), so member cycles
    terminate — see relation_geojson's docstring for the deliberate
    deviations from web_server.py:52-71.

    Each level is one reverse-membership join; the loop is bounded by
    max_depth (planet nesting ~10); frontier/seen are localCheckpointed
    so the plan doesn't grow with depth."""
    rels = relations.select("id", "members")
    frontier = roots.select(
        F.col("id").alias("root"),
        F.col("id").alias("rel_id"),
        F.array().cast("array<int>").alias("path"),
    )
    seen = frontier.select("root", "rel_id")
    leaves = None
    for _ in range(max_depth):
        mem = (
            frontier.join(rels, frontier["rel_id"] == rels["id"])
            .select(
                "root",
                "path",
                F.posexplode("members").alias("pos", "m"),
            )
            .select(
                "root",
                F.concat("path", F.array("pos")).alias("path"),
                F.col("m.type").alias("mtype"),
                F.col("m.ref").alias("ref"),
            )
        )
        level_leaves = mem.where(F.col("mtype") != "relation")
        leaves = (
            level_leaves if leaves is None else leaves.unionByName(level_leaves)
        )
        nxt = (
            mem.where(F.col("mtype") == "relation")
            .select("root", F.col("ref").alias("rel_id"), "path")
            .join(seen, ["root", "rel_id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt.select("root", "rel_id")).localCheckpoint(
            eager=True
        )
        frontier = nxt
    return leaves


def relation_geojson(
    relations: DataFrame,
    ways: DataFrame,
    locations: DataFrame,
    roots: DataFrame | None = None,
    max_depth: int = 32,
) -> DataFrame:
    """Relation id -> GeoJSON Feature whose geometry is a
    GeometryCollection assembled by depth-first descent into member
    nodes, ways, and sub-relations (web_server.py:52-71's
    ``add_relation_geoms`` recursion, distributed).

    Geometries appear in the reference's DFS order: each leaf carries
    its member-index path from the root and the final sort is
    lexicographic on that path. Deviations from the reference, both
    deliberate:
    - node members emit (lon, lat) like every other coordinate here;
      web_server.py:61 appends the raw (lat, lon) location tuple for
      node members only — an order inconsistent with its own way
      coordinates (:34), i.e. an upstream bug we do not replicate;
    - a (root, relation) pair is descended at most once, so member
      cycles terminate; the reference recurses forever on cycles.

    Scale shape: the per-level descent is the J1 reverse-membership
    join bounded by `max_depth` levels (planet nesting is ~10); leaf
    sets are pruned with semi-joins BEFORE touching the planet-sized
    ways/locations tables; per-root assembly is one groupBy over the
    leaves. No driver-side geometry, no UDFs.
    """
    rels = relations.select("id", "members", "tags")
    if roots is None:
        roots = rels.select("id")
    leaves = relation_member_leaves(relations, roots, max_depth)

    node_leaves = leaves.where(F.col("mtype") == "node")
    way_leaves = leaves.where(F.col("mtype") == "way")

    node_geoms = node_leaves.join(
        locations.select(F.col("id").alias("ref"), "lon", "lat"), "ref"
    ).select(
        "root",
        "path",
        F.to_json(
            F.struct(
                F.lit("Point").alias("type"),
                F.array(to_degrees(F.col("lon")), to_degrees(F.col("lat"))).alias(
                    "coordinates"
                ),
            )
        ).alias("geometry"),
    )
    needed_ways = ways.join(
        way_leaves.select(F.col("ref").alias("id")).distinct(), "id", "left_semi"
    )
    way_geoms = way_leaves.join(
        way_geojson(needed_ways, locations).withColumnRenamed("id", "ref"), "ref"
    ).select("root", "path", "geometry")

    assembled = (
        node_geoms.unionByName(way_geoms)
        .groupBy("root")
        .agg(
            F.array_sort(F.collect_list(F.struct("path", "geometry"))).alias("g")
        )
        .select(
            F.col("root").alias("id"),
            F.concat(
                F.lit('{"type":"GeometryCollection","geometries":['),
                F.array_join(F.transform("g", lambda x: x["geometry"]), ","),
                F.lit("]}"),
            ).alias("geometry"),
        )
    )
    props = rels.select(
        "id",
        F.coalesce(F.col("tags"), F.map_from_arrays(F.array(), F.array())).alias(
            "tags"
        ),
    )
    return (
        roots.select("id")
        .join(props, "id", "left_outer")
        .join(assembled, "id", "left_outer")
        .select(
            "id",
            F.concat(
                F.lit('{"type":"Feature","properties":'),
                F.coalesce(F.to_json("tags"), F.lit("{}")),
                F.lit(',"geometry":'),
                F.coalesce(
                    F.col("geometry"),
                    F.lit('{"type":"GeometryCollection","geometries":[]}'),
                ),
                F.lit("}"),
            ).alias("feature"),
        )
    )


def way_lengths(ways: DataFrame, locations: DataFrame) -> DataFrame:
    """Per-way planar polyline length (id, n_segments, length_micro):
    sum over consecutive vertex pairs of round(sqrt(dlon^2+dlat^2)*1e6)
    in scaled-coord micro-units. Each SEGMENT rounds to an integer
    before the sum, so the per-way total is an exact BIGINT — immune
    to float summation order across partitions/engines (the only float
    is one sqrt per segment, rounded at 1e-6 where a cross-engine ulp
    flip is measure-zero). Same posexplode + narrow-locations join as
    way_linestrings; consecutive pairs come from zip_with over the
    sorted vertex array, so no window function runs."""
    verts = ways.select(
        F.col("id").alias("way_id"),
        F.posexplode("nodes").alias("pos", "node_id"),
    )
    joined = verts.join(
        locations.select(F.col("id").alias("node_id"), "lon", "lat"),
        "node_id",
    )
    pts = joined.groupBy("way_id").agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "lon", "lat"))
        ).alias("pts")
    )
    n = F.size("pts")
    head = F.slice(F.col("pts"), 1, n - 1)
    tail = F.slice(F.col("pts"), 2, n - 1)
    seg = F.zip_with(
        head,
        tail,
        lambda a, b: F.round(
            F.sqrt(
                (b["lon"].cast("double") - a["lon"].cast("double"))
                * (b["lon"].cast("double") - a["lon"].cast("double"))
                + (b["lat"].cast("double") - a["lat"].cast("double"))
                * (b["lat"].cast("double") - a["lat"].cast("double"))
            )
            * 1e6
        ).cast("long"),
    )
    return pts.select(
        F.col("way_id").alias("id"),
        (n - 1).cast("int").alias("n_segments"),
        F.aggregate(
            seg, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("length_micro"),
    )


def way_areas(ways: DataFrame, locations: DataFrame) -> DataFrame:
    """Planar shoelace area of closed ways (id, n_vertices,
    area2): 2x the signed polygon area in scaled-coord^2 units,
    positive for counter-clockwise rings — the multipolygon building
    block the reference assembles but never measures.

    Exactness contract (the way_lengths sibling): every vertex is
    TRANSLATED by the ring's first vertex before the cross products,
    so the BIGINT products stay within ~(2^31)^2 for any ring whose
    extent fits one hemisphere-scale bbox, and the per-way sum is an
    exact integer — no float anywhere, immune to fold order across
    partitions and engines. Closed = first ref equals last ref and
    >= 4 refs; same posexplode + narrow-locations join + zip_with
    consecutive-pairs shape as way_lengths (no window function)."""
    closed = ways.where(
        (F.size("nodes") >= 4)
        & (F.element_at("nodes", 1) == F.element_at("nodes", -1))
    )
    verts = closed.select(
        F.col("id").alias("way_id"),
        F.posexplode("nodes").alias("pos", "node_id"),
    )
    joined = verts.join(
        locations.select(F.col("id").alias("node_id"), "lon", "lat"),
        "node_id",
    )
    pts = joined.groupBy("way_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "lon", "lat"))).alias(
            "pts"
        )
    )
    n = F.size("pts")
    x0 = F.element_at("pts", 1)["lon"].cast("long")
    y0 = F.element_at("pts", 1)["lat"].cast("long")
    head = F.slice(F.col("pts"), 1, n - 1)
    tail = F.slice(F.col("pts"), 2, n - 1)
    cross = F.zip_with(
        head,
        tail,
        lambda a, b: (a["lon"].cast("long") - x0)
        * (b["lat"].cast("long") - y0)
        - (b["lon"].cast("long") - x0) * (a["lat"].cast("long") - y0),
    )
    return pts.select(
        F.col("way_id").alias("id"),
        n.cast("int").alias("n_vertices"),
        F.aggregate(
            cross, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("area2"),
    )
