"""The flagship query: spatial extract with graph-closure completion.

Re-expresses `osmx extract` (`/root/reference/src/extract.cpp:69-426`;
lifecycle traced in SURVEY.md §3.1) as one declarative DataFrame DAG
plus the driver-side fixpoint loop:

1. region -> cell covering (driver; G3/G4)            extract.cpp:132-143
2. covering -> node ids (pushed cell-range filter)    extract.cpp:164-175
3. node->way reverse join (J1)                        extract.cpp:177-187
4. node->rel, way->rel reverse joins (J1)             extract.cpp:190-209
5. rel->rel fixpoint closure (A2)                     extract.cpp:211-237
6. multipolygon member completion + existence check   extract.cpp:243-260
7. way completion: back-fill member node ids (J2)     extract.cpp:264-274
8. materialize payload tables, ordered output (O3)    extract.cpp:280-426

Scale design (the part the reference hard-codes for one machine):
- Step 2 is a data-skipping scan: the covering is <=1024 integer ranges
  over the cell-sorted locations layout, so only matching row groups
  are read. No shuffle.
- Steps 3-7 are semi/equi joins keyed on element ids. The id-set side
  is usually far smaller than the base tables; AQE broadcast-joins it
  automatically when it fits, and falls back to shuffle joins when a
  continent-sized extract makes it big — exactly the degradation the
  reference cannot do (its Roaring bitmaps must fit in RAM,
  extract.cpp:149-151).
- Nothing is ever collected to the driver except the covering itself.

The covering filter over-selects (approximate-by-design,
`/root/reference/README.md:64`); pass ``exact=True`` to add the exact
point-in-region refinement the reference defines but never uses
(`src/region.cpp:122-127`, operator P5 — an upgrade, off by default
for parity).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..spatial import Region, cover
from ..spatial import cells as cells_mod
from . import edges as edges_mod
from .closure import transitive_closure


@dataclass
class ExtractResult:
    """Id-sets + payload DataFrames of one extract. Ordered output
    (nodes, ways, relations ascending by id — extract.cpp:304-421) is the
    sink's job; the DataFrames here stay unordered/parallel."""

    node_ids: DataFrame
    way_ids: DataFrame
    relation_ids: DataFrame
    locations: DataFrame
    nodes: DataFrame
    ways: DataFrame
    relations: DataFrame
    covering: list[tuple[int, int]] = field(default_factory=list)


def _ids(df: DataFrame, col: str, name: str = "id") -> DataFrame:
    return df.select(F.col(col).alias(name))


def extract(
    tables: dict[str, DataFrame],
    region: Region,
    expand_cells: int = 0,
    exact: bool = False,
    max_level: int = cells_mod.MAX_LEVEL,
    max_cells: int = 1024,
    cache_ids: bool = False,
) -> ExtractResult:
    """tables: {locations, nodes, ways, relations} DataFrames
    (schemas.TABLE_SCHEMAS). Edge tables are derived on the fly unless
    provided as node_way / node_relation / way_relation /
    relation_relation keys (materialized edges skip the explode)."""
    locations = tables["locations"]
    nodes = tables["nodes"]
    ways = tables["ways"]
    relations = tables["relations"]
    node_way = tables.get("node_way")
    node_relation = tables.get("node_relation")
    way_relation = tables.get("way_relation")
    relation_relation = tables.get("relation_relation")
    if node_way is None:
        node_way = edges_mod.node_way(ways)
    if node_relation is None:
        node_relation = edges_mod.node_relation(relations)
    if way_relation is None:
        way_relation = edges_mod.way_relation(relations)
    if relation_relation is None:
        relation_relation = edges_mod.relation_relation(relations)

    # 1-2: covering -> pushed range filter on the cell-sorted layout
    ranges = cover(region, max_level=max_level, max_cells=max_cells,
                   expand_cells=expand_cells)
    region_locs = locations.filter(cells_mod.ranges_filter(F.col("cell"), ranges))
    if exact:
        region_locs = region_locs.filter(region_contains_udf(region)(
            F.col("lat"), F.col("lon")))
    region_node_ids = _ids(region_locs, "id")

    # 3: node -> way (J1)
    way_ids = (
        node_way.join(region_node_ids, node_way["node_id"] == region_node_ids["id"])
        .select(F.col("way_id").alias("id"))
        .distinct()
    )

    # 4: node -> relation, way -> relation (J1)
    rel_seeds = (
        node_relation.join(
            region_node_ids, node_relation["node_id"] == region_node_ids["id"]
        )
        .select(F.col("relation_id").alias("id"))
        .union(
            way_relation.join(way_ids, way_relation["way_id"] == way_ids["id"])
            .select(F.col("relation_id").alias("id"))
        )
        .distinct()
    )

    # 5: super-relation fixpoint (A2; extract.cpp:211-237)
    relation_ids = transitive_closure(
        rel_seeds, relation_relation, src_col="child_id", dst_col="relation_id"
    )

    # 6: multipolygon completion with existence check (P2 + J3;
    # extract.cpp:243-260): member ways of selected type=multipolygon
    # relations join back ONLY if the way exists (left semi).
    mp_member_ways = (
        relations.join(relation_ids, "id", "left_semi")
        .where(F.col("tags")["type"] == "multipolygon")
        .select(F.explode("members").alias("m"))
        .where(F.col("m.type") == "way")
        .select(F.col("m.ref").alias("id"))
        .distinct()
        .join(ways, "id", "left_semi")  # existence check, extract.cpp:253-255
    )
    way_ids = way_ids.union(mp_member_ways).distinct()

    # 7: way completion — back-fill every member node (J2; extract.cpp:264-274)
    way_node_ids = (
        node_way.join(way_ids, node_way["way_id"] == way_ids["id"])
        .select(F.col("node_id").alias("id"))
    )
    node_ids = region_node_ids.union(way_node_ids).distinct()

    # The id sets are consumed 2-4 times each (payload semi-joins +
    # caller unions); optionally materialize them — the Spark analog
    # of the reference holding its Roaring64Map id bitmaps in RAM for
    # the whole extract (extract.cpp:149-151).  r11: localCheckpoint
    # instead of cache() — cache() is lazy, so a SINGLE action over a
    # frame that references an id set twice (e.g. the bbox union,
    # where way_ids feeds both node completion and the output) still
    # evaluated the whole join tree per reference; the eager cut
    # computes each id set exactly once (and way_ids' cut also prunes
    # the copy embedded in node_ids' completion join).
    if cache_ids:
        way_ids = way_ids.localCheckpoint(eager=True)
        way_node_ids = (
            node_way.join(way_ids, node_way["way_id"] == way_ids["id"])
            .select(F.col("node_id").alias("id"))
        )
        node_ids = (
            region_node_ids.union(way_node_ids)
            .distinct()
            .localCheckpoint(eager=True)
        )
        relation_ids = relation_ids.localCheckpoint(eager=True)

    # 8: payload materialization (the sink orders it; O3)
    return ExtractResult(
        node_ids=node_ids,
        way_ids=way_ids,
        relation_ids=relation_ids,
        locations=locations.join(node_ids, "id", "left_semi"),
        nodes=nodes.join(node_ids, "id", "left_semi"),
        ways=ways.join(way_ids, "id", "left_semi"),
        relations=relations.join(relation_ids, "id", "left_semi"),
        covering=ranges,
    )


def region_contains_udf(region: Region):
    """Exact point-in-region refinement (P5, src/region.cpp:122-127) as a
    vectorized Pandas UDF. Off the hot path by default; the region object
    is tiny and ships in the task closure."""

    @F.pandas_udf(T.BooleanType())
    def _contains(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(
            [region.contains(la / 1e7, lo / 1e7) for la, lo in zip(lat, lon)]
        )

    return _contains
