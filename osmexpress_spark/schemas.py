"""Logical schemas for the OSM data model, re-expressed in Spark types.

Source of truth in the reference is the Cap'n Proto schema
(`/root/reference/include/osmx/messages.capnp:3-38`) plus the fixed
12-byte `locations` encoding (`/root/reference/docs/MANUAL.md:130-142`,
`/root/reference/src/storage.cpp:79-114`). Mapping decisions are
documented in SURVEY.md §1.5:

- coordinates stay scaled int32 (degrees x 1e7) for exactness and sort
  order; float views are derived columns (`lon_deg = lon / 1e7`).
- tags are MapType (OSM keys are unique per element) with the original
  interleaved ``[k0,v0,k1,v1,...]`` list kept alongside for byte-level
  round trips (`/root/reference/include/osmx/util.h:28-40`).
- `ways.nodes` and `relations.members` are ordered arrays — order is
  load-bearing (geometry vertex order, member order;
  `/root/reference/examples/way_wkt.cpp:37-42`,
  `/root/reference/src/extract.cpp:399-410`).
- `cell` is the derived level-16 spatial cell (our Morton scheme, see
  spatial/cells.py) standing in for the reference's S2 `cell_node`
  index (`/root/reference/src/expand.cpp:151-153`).
"""

from __future__ import annotations

from pyspark.sql import types as T

METADATA_TYPE = T.StructType(
    [
        T.StructField("version", T.IntegerType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("changeset", T.LongType()),
        T.StructField("uid", T.LongType()),
        T.StructField("user", T.StringType()),
    ]
)

MEMBER_TYPE = T.StructType(
    [
        T.StructField("ref", T.LongType()),
        T.StructField("type", T.StringType()),  # node | way | relation
        T.StructField("role", T.StringType()),
    ]
)

TAGS_TYPE = T.MapType(T.StringType(), T.StringType())
TAGS_KV_TYPE = T.ArrayType(T.StringType())  # interleaved [k0,v0,k1,v1,...]

# locations: EVERY node, tagged or not (ref docs/MANUAL.md:118). The
# narrow hot table — at planet scale 5.3e9 rows x ~20 bytes columnar.
LOCATIONS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("lon", T.IntegerType(), False),
        T.StructField("lat", T.IntegerType(), False),
        T.StructField("version", T.IntegerType(), False),
        T.StructField("cell", T.LongType(), False),
    ]
)

# nodes: tagged nodes only (ref src/expand.cpp:156) — the cold wide table.
NODES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("tags", TAGS_TYPE),
        T.StructField("tags_kv", TAGS_KV_TYPE),
        T.StructField("metadata", METADATA_TYPE),
    ]
)

WAYS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("nodes", T.ArrayType(T.LongType()), False),
        T.StructField("tags", TAGS_TYPE),
        T.StructField("tags_kv", TAGS_KV_TYPE),
        T.StructField("metadata", METADATA_TYPE),
    ]
)

RELATIONS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("members", T.ArrayType(MEMBER_TYPE), False),
        T.StructField("tags", TAGS_TYPE),
        T.StructField("tags_kv", TAGS_KV_TYPE),
        T.StructField("metadata", METADATA_TYPE),
    ]
)

# OsmChange rows (ref src/update.cpp; FIXTURES.md `changes`).
CHANGES_SCHEMA = T.StructType(
    [
        T.StructField("seqnum", T.LongType(), False),
        T.StructField("action", T.StringType(), False),  # create|modify|delete
        T.StructField("type", T.StringType(), False),  # node|way|relation
        T.StructField("id", T.LongType(), False),
        T.StructField("visible", T.BooleanType(), False),
        T.StructField("lon", T.IntegerType()),
        T.StructField("lat", T.IntegerType()),
        T.StructField("nodes", T.ArrayType(T.LongType())),
        T.StructField("members", T.ArrayType(MEMBER_TYPE)),
        T.StructField("tags", TAGS_TYPE),
        T.StructField("metadata", METADATA_TYPE),
    ]
)

TABLE_SCHEMAS = {
    "locations": LOCATIONS_SCHEMA,
    "nodes": NODES_SCHEMA,
    "ways": WAYS_SCHEMA,
    "relations": RELATIONS_SCHEMA,
}

# Derived reverse-membership edge tables (ref docs/MANUAL.md:121-122,
# populated at src/expand.cpp:180,203-205). Maintained by operators/edges.py.
EDGE_TABLES = {
    "node_way": ("node_id", "way_id"),
    "node_relation": ("node_id", "relation_id"),
    "way_relation": ("way_id", "relation_id"),
    "relation_relation": ("child_id", "relation_id"),
}
