"""OSM-domain driver-contract queries (rows-only checks).

These exercise the reference-specific pipelines — spatial extract,
fixpoint closure, WKT assembly, point lookup — over the deterministic
fixture dataset (seeded; built lazily under .fixtures/). They are not
SQL-expressible (coverings + iterative closure), so no oracle entries;
correctness is asserted by tests/test_extract.py against an
independent Python model of `src/extract.cpp` semantics.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import functions as fn
from . import testing
from .api import Dataset
from .spatial import Region

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           ".fixtures", "osm_small")
FIXTURE_NODES = 5000

NYC_BBOX = "40.5,-74.3,41.0,-73.7"


def _dataset(spark: SparkSession) -> Dataset:
    testing.ensure_fixture_dataset(spark, FIXTURE_DIR, n_nodes=FIXTURE_NODES, seed=42)
    return Dataset(spark, FIXTURE_DIR)


def defq(name: str):
    def wrap(fn_):
        SPARK_QUERIES[name] = fn_
        return fn_

    return wrap


@defq("osm_extract_bbox")
def osm_extract_bbox(spark, sf_dir):
    """Flagship OSM pipeline: bbox extract -> typed ordered id output
    (extract.cpp:69-426; O3 ordering)."""
    res = _dataset(spark).extract(Region(NYC_BBOX, "bbox"))
    out = (
        res.node_ids.select(F.lit(1).alias("type_rank"), F.lit("node").alias("type"), "id")
        .union(res.way_ids.select(F.lit(2), F.lit("way"), "id"))
        .union(res.relation_ids.select(F.lit(3), F.lit("relation"), "id"))
    )
    return out.orderBy("type_rank", "id")


@defq("osm_extract_exact")
def osm_extract_exact(spark, sf_dir):
    """Extract with the exact containment refinement (P5) the reference
    defines but never wires up (src/region.cpp:122-127)."""
    res = _dataset(spark).extract(Region(NYC_BBOX, "bbox"), exact=True)
    return res.node_ids.orderBy("id")


@defq("osm_way_wkt")
def osm_way_wkt(spark, sf_dir):
    """G6: WKT LineString assembly for every way in a bbox extract
    (examples/way_wkt.cpp:34-43)."""
    res = _dataset(spark).extract(Region(NYC_BBOX, "bbox"))
    return fn.way_linestrings(res.ways, res.locations).orderBy("id")


@defq("osm_lookup")
def osm_lookup(spark, sf_dir):
    """S3: point lookup of one way (src/cmd.cpp:61-73)."""
    ds = _dataset(spark)
    wid = ds.ways().agg(F.min("id")).collect()[0][0]
    return ds.lookup("way", wid).select(
        "id", F.size("nodes").alias("n_nodes"), F.size("tags_kv").alias("n_tag_kv")
    )


@defq("osm_stats")
def osm_stats(spark, sf_dir):
    """S6: per-table cardinality report (src/cmd.cpp:96-109)."""
    ds = _dataset(spark)
    out = None
    for i, name in enumerate(("locations", "nodes", "ways", "relations")):
        row = ds.table(name).agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(i).alias("rank"), F.lit(name).alias("tbl"), "n"
        )
        out = row if out is None else out.union(row)
    return out.orderBy("rank")


@defq("osm_augmented_diff")
def osm_augmented_diff(spark, sf_dir):
    """U6 capstone: classify a deterministic OsmChange batch against the
    fixture snapshot and propagate node moves to parent ways/relations
    (python/examples/augmented_diff.py:17-305). Rows-only: the
    classification + propagation semantics are golden-tested in
    tests/test_streaming_diff.py against an independent model."""
    from .operators.diff import augmented_diff

    ds = _dataset(spark)
    fx_rows = testing.generate(n_nodes=FIXTURE_NODES, seed=42)
    batch = testing.generate_changes(fx_rows, n_batches=1, per_batch=40)[0]
    changes = spark.createDataFrame(batch, testing.schemas.CHANGES_SCHEMA)
    return augmented_diff(ds.tables(), changes).orderBy("type", "id")


@defq("osm_relation_geojson")
def osm_relation_geojson(spark, sf_dir):
    """G7: relation -> GeoJSON GeometryCollection with recursive member
    descent (python/examples/web_server.py:52-71), distributed as a
    bounded-depth reverse-membership fixpoint. Rows-only: the DFS
    ordering + recursion semantics are golden-tested in
    tests/test_functions.py against an independent Python model."""
    ds = _dataset(spark)
    return fn.relation_geojson(
        ds.relations(), ds.ways(), ds.table("locations")
    ).orderBy("id")
