"""Extract pipeline golden tests: the Spark DAG must reproduce the
reference semantics (`src/extract.cpp:149-274`) computed independently
by a pure-Python model over the same fixture rows."""

from __future__ import annotations

import pytest

from osmexpress_spark import testing
from osmexpress_spark.api import Dataset
from osmexpress_spark.operators import edges as edges_mod
from osmexpress_spark.operators.closure import transitive_closure
from osmexpress_spark.spatial import Region, cover

from conftest import assert_no_key_exchange  # noqa: E402


@pytest.fixture(scope="module")
def fixture_rows():
    return testing.generate(n_nodes=800, seed=42)


@pytest.fixture(scope="module")
def dataset(spark, tmp_path_factory, fixture_rows):
    path = str(tmp_path_factory.mktemp("osm") / "ds")
    dfs = testing.to_dataframes(spark, fixture_rows)
    import os
    for name, df in dfs.items():
        df.write.mode("overwrite").parquet(os.path.join(path, name))
    return Dataset(spark, path)


def python_model_extract(rows, region, max_level=16, max_cells=1024):
    """Independent reimplementation of extract.cpp:149-274 over raw rows."""
    ranges = cover(region, max_level=max_level, max_cells=max_cells)
    node_hits = {
        r[0] for r in rows["locations"] if any(lo <= r[4] < hi for lo, hi in ranges)
    }
    way_nodes = {w[0]: w[1] for w in rows["ways"]}
    way_ids = {wid for wid, refs in way_nodes.items() if set(refs) & node_hits}
    members = {r[0]: r[1] for r in rows["relations"]}
    tags = {r[0]: r[2] for r in rows["relations"]}
    rel_ids = set()
    for rid, mems in members.items():
        for ref, typ, _ in mems:
            if (typ == "node" and ref in node_hits) or (typ == "way" and ref in way_ids):
                rel_ids.add(rid)
    # fixpoint: parents of selected relations (extract.cpp:211-237)
    changed = True
    while changed:
        changed = False
        for rid, mems in members.items():
            if rid in rel_ids:
                continue
            if any(typ == "relation" and ref in rel_ids for ref, typ, _ in mems):
                rel_ids.add(rid)
                changed = True
    # multipolygon completion with existence check (extract.cpp:243-260)
    for rid in list(rel_ids):
        if tags[rid].get("type") == "multipolygon":
            for ref, typ, _ in members[rid]:
                if typ == "way" and ref in way_nodes:
                    way_ids.add(ref)
    # way completion (extract.cpp:264-274)
    node_ids = set(node_hits)
    for wid in way_ids:
        node_ids.update(way_nodes[wid])
    return ranges, node_ids, way_ids, rel_ids


REGIONS = [
    Region("40.5,-74.3,41.0,-73.7", "bbox"),  # NYC hotspot
    Region("48.85,2.35,0.6", "disc"),  # Paris hotspot disc
    Region(
        '{"type":"Polygon","coordinates":[[[139.2,35.2],[140.2,35.2],'
        "[140.2,36.2],[139.2,36.2],[139.2,35.2]]]}",
        "geojson",
    ),  # Tokyo polygon
    Region("-1.0,179.5,2.0,180.0", "bbox"),  # antimeridian-adjacent
]


@pytest.mark.parametrize("region", REGIONS, ids=["nyc", "paris", "tokyo", "antimeridian"])
@pytest.mark.slow
def test_extract_matches_python_model(dataset, fixture_rows, region):
    res = dataset.extract(region)
    ranges, exp_nodes, exp_ways, exp_rels = python_model_extract(fixture_rows, region)
    assert res.covering == ranges
    got_nodes = {r.id for r in res.node_ids.collect()}
    got_ways = {r.id for r in res.way_ids.collect()}
    got_rels = {r.id for r in res.relation_ids.collect()}
    assert got_nodes == exp_nodes
    assert got_ways == exp_ways
    assert got_rels == exp_rels
    # payload tables mirror the id-sets
    assert {r.id for r in res.locations.select("id").collect()} == exp_nodes
    assert {r.id for r in res.ways.select("id").collect()} == exp_ways
    assert {r.id for r in res.relations.select("id").collect()} == exp_rels
    # result is a superset of exact containment (covering-approximate,
    # README.md:64) — never an under-selection
    exact = {
        r[0]
        for r in fixture_rows["locations"]
        if region.contains(r[2] / 1e7, r[1] / 1e7)
    }
    assert exact <= got_nodes


@pytest.mark.slow
def test_extract_excludes_dangling_way(dataset, fixture_rows):
    """The dangling multipolygon member must be filtered by the existence
    check (extract.cpp:253-255)."""
    whole_world = Region("-90,-180,90,180", "bbox")
    res = dataset.extract(whole_world)
    got_ways = {r.id for r in res.way_ids.collect()}
    assert testing.DANGLING_WAY_REF not in got_ways
    # whole-world extract returns everything that exists
    assert got_ways == {w[0] for w in fixture_rows["ways"]}
    got_nodes = {r.id for r in res.node_ids.collect()}
    assert got_nodes == {r[0] for r in fixture_rows["locations"]}


@pytest.mark.slow
def test_closure_depth_and_diamond(spark, dataset):
    """Nesting chain (depth 3) and diamond converge to the full ancestor
    set; seeds included; no duplicates."""
    relations = dataset.relations()
    rr = edges_mod.relation_relation(relations)
    # seed with every relation that has a relation member's child — take
    # the deepest chain base: relations that appear as child but have no
    # relation members themselves
    all_rel = {r.id for r in relations.select("id").collect()}
    child_of = {(r.child_id, r.relation_id) for r in rr.collect()}
    children = {c for c, _ in child_of}
    seeds = spark.createDataFrame([(min(children),)], "id long")
    got = {r.id for r in transitive_closure(seeds, rr, "child_id", "relation_id").collect()}
    # python model
    exp = {min(children)}
    changed = True
    while changed:
        changed = False
        for c, p in child_of:
            if c in exp and p not in exp:
                exp.add(p)
                changed = True
    assert got == exp
    assert got <= all_rel
    # the distributed-loop fallback (100 TB path) must agree with the
    # driver fast path
    got_loop = {
        r.id
        for r in transitive_closure(
            seeds, rr, "child_id", "relation_id", driver_max_edges=0
        ).collect()
    }
    assert got_loop == exp


@pytest.mark.slow
def test_exact_refinement_subset(dataset, fixture_rows):
    """P5: exact=True returns exactly the contained nodes plus completion
    back-fill — regional ids shrink to true containment."""
    region = Region("40.5,-74.3,41.0,-73.7", "bbox")
    res = dataset.extract(region, exact=True)
    got_nodes = {r.id for r in res.node_ids.collect()}
    exact = {
        r[0]
        for r in fixture_rows["locations"]
        if region.contains(r[2] / 1e7, r[1] / 1e7)
    }
    # every exactly-contained node present; any extras must come from way
    # completion (member of a selected way)
    assert exact <= got_nodes
    way_nodes = {w[0]: set(w[1]) for w in fixture_rows["ways"]}
    got_ways = {r.id for r in res.way_ids.collect()}
    completion = set().union(*(way_nodes[w] for w in got_ways)) if got_ways else set()
    assert got_nodes <= exact | completion


def test_sql_surface_region_predicate(spark, dataset, fixture_rows):
    """create_views + region_predicate: the SQL path returns the same
    region node set as the extract pipeline's first stage."""
    views = dataset.create_views()
    assert "osm_locations" in views
    region = Region("40.5,-74.3,41.0,-73.7", "bbox")
    got = {
        r.id
        for r in spark.sql("SELECT id, cell FROM osm_locations")
        .where(dataset.region_predicate(region))
        .collect()
    }
    ranges = cover(region)
    want = {
        r[0]
        for r in fixture_rows["locations"]
        if any(lo <= r[4] < hi for lo, hi in ranges)
    }
    assert got == want


@pytest.mark.slow
def test_point_in_box_join_matches_bruteforce_and_plan(spark):
    import random

    from pyspark.sql import functions as F

    from osmexpress_spark.operators.spatial_join import point_in_box_join

    rng = random.Random(11)
    pts_rows = [
        (i, rng.randint(-1_700_000_000, 1_700_000_000),
         rng.randint(-850_000_000, 850_000_000))
        for i in range(2000)
    ]
    box_rows = []
    for b in range(12):
        lon0 = rng.randint(-1_700_000_000, 1_400_000_000)
        lat0 = rng.randint(-850_000_000, 600_000_000)
        box_rows.append(
            (b, lon0, lat0, lon0 + rng.randint(1, 300_000_000),
             lat0 + rng.randint(1, 200_000_000))
        )
    pts = spark.createDataFrame(pts_rows, "id long, lon int, lat int")
    boxes = spark.createDataFrame(
        box_rows, "box_id long, minlon int, minlat int, maxlon int, maxlat int"
    )
    res = point_in_box_join(pts, boxes)
    got = {(r.id, r.box_id) for r in res.collect()}
    want = {
        (i, b)
        for i, lon, lat in pts_rows
        for b, x0, y0, x1, y1 in box_rows
        if x0 <= lon <= x1 and y0 <= lat <= y1
    }
    assert got == want
    # covering candidates never duplicate pairs -> no distinct, and the
    # big side never shuffles: broadcast exchanges only, no repartition
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert_no_key_exchange(plan)
    assert "Exchange rangepartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_radius_pairs_matches_bruteforce(spark):
    """Grid-bucket proximity join vs an O(n^2) python model, including
    points straddling bucket boundaries and exact-boundary distances."""
    from osmexpress_spark.operators.spatial_join import radius_pairs

    pts = [
        (1, 0, 0),
        (2, 90, 10),          # d2=8200 < 10000
        (3, 100, 0),          # exactly radius -> included
        (4, 101, 0),          # just outside
        (5, -99, -99),        # boundary-straddling bucket, outside (d2>1e4)
        (6, -70, -70),        # inside (d2=9800)
        (7, 1000000, 1000000),
        (8, 1000050, 1000050), # inside with far-away bucket
    ]
    df = spark.createDataFrame(pts, "id long, lon int, lat int")
    r = 100
    got = sorted((x.id_a, x.id_b, x.d2)
                 for x in radius_pairs(df, r).collect())
    want = []
    for i, (ia, xa, ya) in enumerate(pts):
        for ib, xb, yb in pts[i + 1:]:
            d2 = (xb - xa) ** 2 + (yb - ya) ** 2
            if d2 <= r * r:
                a, b = sorted((ia, ib))
                want.append((a, b, d2))
    assert got == sorted(want) and len(want) >= 3


def test_nearest_neighbors_radius_bounded_knn(spark):
    from osmexpress_spark.operators.spatial_join import nearest_neighbors

    pts = [
        (1, 0, 0), (2, 10, 0), (3, 0, 20), (4, 30, 30), (5, 500, 500),
    ]
    df = spark.createDataFrame(pts, "id long, lon int, lat int")
    got = {}
    for r in nearest_neighbors(df, k=2, radius=100).collect():
        got.setdefault(r.id, []).append((r.nn_rank, r.neighbor_id, r.d2))
    for v in got.values():
        v.sort()
    # python model
    want = {}
    for i, (ia, xa, ya) in enumerate(pts):
        cands = sorted(
            ((xb - xa) ** 2 + (yb - ya) ** 2, ib)
            for ib, xb, yb in pts
            if ib != ia and (xb - xa) ** 2 + (yb - ya) ** 2 <= 100 * 100
        )
        if cands:
            want[ia] = [(r + 1, nid, d2)
                        for r, (d2, nid) in enumerate(cands[:2])]
    assert got == want
    assert 5 not in got  # isolated node absent, not k-padded


@pytest.mark.slow
def test_radius_pairs_hot_bucket_cap(spark):
    from osmexpress_spark.operators.spatial_join import radius_pairs

    # 30 points piled into one bucket + 2 isolated-but-close points
    pts = [(i, 5 + i % 3, 5 + i // 3) for i in range(30)]
    pts += [(100, 100000, 100000), (101, 100010, 100010)]
    df = spark.createDataFrame(pts, "id long, lon int, lat int")
    full = radius_pairs(df, 100).collect()
    capped = radius_pairs(df, 100, max_bucket_size=10).collect()
    assert len(full) == 30 * 29 // 2 + 1
    # the hot pile is dropped; the small bucket's pair survives
    assert sorted((r.id_a, r.id_b) for r in capped) == [(100, 101)]


@pytest.mark.slow
def test_radius_pairs_cap_drops_whole_bucket_symmetrically(spark):
    """A pair spanning a hot bucket and an ok bucket must vanish
    REGARDLESS of which side carries the lower id (the half-dropped
    form leaked pairs when the hot point's id was smaller)."""
    from osmexpress_spark.operators.spatial_join import radius_pairs

    def run(hot_id, ok_id):
        pts = [(hot_id + i, 5 + i % 3, 5 + i // 3) for i in range(20)]
        pts.append((ok_id, 105, 5))  # adjacent bucket, within radius of
        pts.append((hot_id, 95, 5))  # this hot-bucket member
        df = spark.createDataFrame(pts, "id long, lon int, lat int")
        return sorted(
            (r.id_a, r.id_b)
            for r in radius_pairs(df, 100, max_bucket_size=10).collect()
        )

    assert run(hot_id=1, ok_id=1000) == []     # hot side has lower ids
    assert run(hot_id=1000, ok_id=1) == []     # hot side has higher ids
