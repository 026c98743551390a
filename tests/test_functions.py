"""Function library tests: codecs round-trip, WKT matches the reference
formatting (7 decimals, vertex order), bounds aggregation."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from osmexpress_spark import functions as fn
from osmexpress_spark import testing


@pytest.fixture(scope="module")
def dfs(spark):
    return testing.to_dataframes(spark, testing.generate(n_nodes=200, seed=11))


def test_tags_roundtrip(spark):
    df = spark.createDataFrame(
        [(["a", "1", "b", "2"],), ([],)], "tags_kv array<string>"
    )
    out = df.select(
        fn.map_to_tags(fn.tags_to_map(F.col("tags_kv"))).alias("rt"), "tags_kv"
    ).collect()
    for r in out:
        assert r.rt == r.tags_kv


def test_tags_kv_matches_map_in_fixture(dfs):
    rows = dfs["nodes"].select(
        "tags", fn.tags_to_map(F.col("tags_kv")).alias("from_kv")
    ).collect()
    for r in rows:
        assert dict(r.tags) == dict(r.from_kv)


def test_coord_codec_roundtrip(spark):
    df = spark.createDataFrame(
        [(-1800000000,), (1800000000,), (0,), (-739937000,)], "x int"
    )
    out = df.select(
        fn.to_scaled(fn.to_degrees(F.col("x"))).alias("rt"), "x"
    ).collect()
    for r in out:
        assert r.rt == r.x


def test_fmt_coord_seven_decimals(spark):
    df = spark.createDataFrame([(-739937000, 407411000)], "lon int, lat int")
    row = df.select(fn.point_wkt(F.col("lon"), F.col("lat")).alias("wkt")).collect()[0]
    assert row.wkt == "POINT (-73.9937000 40.7411000)"


def test_way_linestring_vertex_order(spark):
    locations = spark.createDataFrame(
        [(1, 10_0000000, 1_0000000, 1, 0), (2, 20_0000000, 2_0000000, 1, 0),
         (3, 30_0000000, 3_0000000, 1, 0)],
        "id long, lon int, lat int, version int, cell long",
    )
    ways = spark.createDataFrame(
        [(7, [3, 1, 2], {}, [], None)],
        testing.schemas.WAYS_SCHEMA,
    )
    row = fn.way_linestrings(ways, locations).collect()[0]
    assert row.wkt == (
        "LINESTRING (30.0000000 3.0000000, 10.0000000 1.0000000, 20.0000000 2.0000000)"
    )


def test_iso8601_roundtrip(spark):
    df = spark.createDataFrame([("2020-01-02T03:04:05Z",)], "s string")
    out = df.select(
        fn.to_iso8601(fn.from_iso8601(F.col("s"))).alias("rt"), "s"
    ).collect()[0]
    assert out.rt == out.s


def test_way_geojson_valid(dfs):
    out = fn.way_geojson(dfs["ways"].limit(5), dfs["locations"]).collect()
    assert out
    for r in out:
        geo = json.loads(r.geometry)
        assert geo["type"] == "LineString"
        assert all(len(c) == 2 for c in geo["coordinates"])


def test_way_bounds(dfs):
    ways = {w.id: w.nodes for w in dfs["ways"].limit(10).collect()}
    coords = {r.id: (r.lon, r.lat) for r in dfs["locations"].collect()}
    got = {
        r.way_id: (r.min_lon, r.min_lat, r.max_lon, r.max_lat)
        for r in fn.way_bounds(dfs["ways"].limit(10), dfs["locations"]).collect()
    }
    for wid, refs in ways.items():
        xs = [coords[n][0] for n in refs]
        ys = [coords[n][1] for n in refs]
        assert got[wid] == (min(xs), min(ys), max(xs), max(ys))


@pytest.mark.slow
def test_relation_geojson_matches_python_model(spark):
    """relation_geojson vs an independent Python recursion replicating
    web_server.py:52-71 (DFS member order, level-synchronized cycle
    guard, (lon,lat) coordinate order)."""
    import json

    from osmexpress_spark import testing
    from osmexpress_spark.functions import relation_geojson

    rows = testing.generate(n_nodes=300, seed=7)
    dfs = testing.to_dataframes(spark, rows)
    out = {
        r["id"]: json.loads(r["feature"])
        for r in relation_geojson(
            dfs["relations"], dfs["ways"], dfs["locations"]
        ).collect()
    }

    locs = {r[0]: (r[1], r[2]) for r in rows["locations"]}
    way_refs = {w[0]: w[1] for w in rows["ways"]}
    rels = {r[0]: r for r in rows["relations"]}

    def leaves_of(root):
        leaves, seen, frontier = [], {root}, [(root, [])]
        while frontier:
            mem = []
            for rel_id, path in frontier:
                if rel_id not in rels:  # dangling ref: inner join drops it
                    continue
                for pos, (ref, typ, _role) in enumerate(rels[rel_id][1]):
                    mem.append((path + [pos], typ, ref))
            leaves += [
                (p, t, r)
                for p, t, r in mem
                if t != "relation"
                and (r in locs if t == "node" else r in way_refs)
            ]
            nxt = [
                (r, p) for p, t, r in mem if t == "relation" and r not in seen
            ]
            seen |= {r for r, _ in nxt}
            frontier = nxt
        return sorted(leaves, key=lambda x: x[0])

    def geom(typ, ref):
        if typ == "node":
            lon, lat = locs[ref]
            return {"type": "Point", "coordinates": [lon / 1e7, lat / 1e7]}
        return {
            "type": "LineString",
            "coordinates": [
                [locs[n][0] / 1e7, locs[n][1] / 1e7] for n in way_refs[ref]
            ],
        }

    assert set(out) == set(rels)
    checked_nested = 0
    for rid, rel in rels.items():
        expected = [geom(t, r) for _p, t, r in leaves_of(rid)]
        feat = out[rid]
        assert feat["type"] == "Feature"
        assert feat["properties"] == (rel[2] or {})
        assert feat["geometry"]["type"] == "GeometryCollection"
        assert feat["geometry"]["geometries"] == expected, f"relation {rid}"
        if any(m[1] == "relation" for m in rel[1]):
            checked_nested += 1
    assert checked_nested >= 3  # fixture guarantees nesting chains + diamond


@pytest.mark.slow
def test_relation_geojson_serializes_member_leaves(spark):
    """Bridges the driver oracle to the JSON output: the
    `osm_relation_geojson` CORRECTNESS row checks the descent core
    (relation_member_leaves) against a visited-set BFS oracle; this test
    asserts the Feature text is a deterministic serialization of
    exactly those leaves — together they pin the full pipeline."""
    import json

    from osmexpress_spark import testing
    from osmexpress_spark.functions import (
        relation_geojson,
        relation_member_leaves,
    )

    rows = testing.generate(n_nodes=300, seed=7)
    dfs = testing.to_dataframes(spark, rows)
    leaves = {}
    for r in relation_member_leaves(
        dfs["relations"], dfs["relations"].select("id")
    ).collect():
        leaves.setdefault(r["root"], []).append(
            (list(r["path"]), r["mtype"], r["ref"])
        )
    out = {
        r["id"]: json.loads(r["feature"])
        for r in relation_geojson(
            dfs["relations"], dfs["ways"], dfs["locations"]
        ).collect()
    }

    locs = {r[0]: (r[1], r[2]) for r in rows["locations"]}
    way_refs = {w[0]: w[1] for w in rows["ways"]}

    def geom(typ, ref):
        if typ == "node":
            lon, lat = locs[ref]
            return {"type": "Point", "coordinates": [lon / 1e7, lat / 1e7]}
        return {
            "type": "LineString",
            "coordinates": [
                [locs[n][0] / 1e7, locs[n][1] / 1e7] for n in way_refs[ref]
            ],
        }

    assert set(out) >= set(leaves)
    for rid, feat in out.items():
        expected = [
            geom(t, ref)
            for _p, t, ref in sorted(leaves.get(rid, []), key=lambda x: x[0])
            if (ref in locs if t == "node" else ref in way_refs)
        ]
        assert feat["geometry"]["geometries"] == expected, f"relation {rid}"


def test_way_lengths_integer_micro_sums(spark):
    from osmexpress_spark import functions as fn

    ways = spark.createDataFrame(
        [(1, [10, 11, 12]), (2, [20, 21]), (3, [30])],
        "id long, nodes array<long>",
    )
    locs = spark.createDataFrame(
        [(10, 0, 0), (11, 3, 4), (12, 3, 8),      # 5.0 + 4.0
         (20, 0, 0), (21, 1, 1),                   # sqrt(2)
         (30, 7, 7)],                              # single vertex
        "id long, lon int, lat int",
    )
    got = {r.id: (r.n_segments, r.length_micro)
           for r in fn.way_lengths(ways, locs).collect()}
    assert got[1] == (2, 5_000_000 + 4_000_000)
    assert got[2] == (1, round(2 ** 0.5 * 1e6))
    assert got[3] == (0, 0)


@pytest.mark.slow
def test_relation_member_leaves_asymmetric_depth_sharing(spark):
    """The visited-set contract on ASYMMETRIC-depth sharing: root A
    holds C directly (depth 1) and via B (depth 2). C is descended at
    its first-reached level only, so C's leaves appear once under the
    direct path — plain recursion would emit them under both paths
    (the divergence the level-unrolled oracle mirrors). Within-level
    duplicates (the classic equal-depth diamond) still both descend."""
    from osmexpress_spark.functions import relation_member_leaves

    m = lambda ref, t: {"ref": ref, "type": t, "role": ""}  # noqa: E731
    rels = spark.createDataFrame(
        [
            (1, [m(3, "relation"), m(2, "relation")]),   # A: C direct + B
            (2, [m(3, "relation")]),                     # B: C
            (3, [m(100, "node")]),                       # C: one leaf
            # equal-depth diamond: D -> (E, F) -> G
            (10, [m(11, "relation"), m(12, "relation")]),
            (11, [m(13, "relation")]),
            (12, [m(13, "relation")]),
            (13, [m(200, "node")]),
        ],
        "id long, members array<struct<ref:long,type:string,role:string>>",
    )
    got = {}
    for r in relation_member_leaves(rels, rels.select("id")).collect():
        got.setdefault(r["root"], []).append((list(r["path"]), r["ref"]))
    # A: C first reached at depth 1 (path [0]); the depth-2 route via B
    # is pruned
    assert sorted(got[1]) == [([0, 0], 100)]
    # D: G reached twice at the SAME level -> both paths descend
    assert sorted(got[10]) == [([0, 0, 0], 200), ([1, 0, 0], 200)]


@pytest.mark.slow
def test_fixture_nesting_within_oracle_unroll_depth(spark):
    """The osm_relation_geojson oracle unrolls the visited-set BFS to 6
    levels; the fixture's descent must be complete within that bound
    (max_depth=6 equals the unbounded operator)."""
    from osmexpress_spark import queries_osm as QO
    from osmexpress_spark.functions import relation_member_leaves

    ds = QO._dataset(spark)
    rels = ds.relations()
    full = relation_member_leaves(rels, rels.select("id")).count()
    bounded = relation_member_leaves(rels, rels.select("id"), max_depth=6).count()
    assert full == bounded
