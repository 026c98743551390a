"""Reverse-membership edge tables (the property-graph edges).

The reference maintains four LMDB DUPSORT indexes — `node_way`,
`node_relation`, `way_relation`, `relation_relation` — populated at
ingest (`/root/reference/src/expand.cpp:180,203-205`) and maintained
incrementally on update (`/root/reference/src/update.cpp:116-125,
189-212`). They are pure derivations of the forward arrays, so in
Spark they are either *computed* (an explode, fully pipelined, no
shuffle) or *materialized* once for update/serving workloads
(SURVEY.md §1.5).

Invariant (property-tested): each edge table always equals the explode
of its forward array. `derive_all` is the single source of truth both
for bulk derivation and for the update path's incremental rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def node_way(ways: DataFrame) -> DataFrame:
    """node_id -> way_id (ref src/expand.cpp:180). Distinct per pair:
    a way that visits a node twice (closed ring) yields one edge, matching
    LMDB DUPSORT key-value uniqueness."""
    return (
        ways.select(F.explode("nodes").alias("node_id"), F.col("id").alias("way_id"))
        .distinct()
    )


def _member_edges(relations: DataFrame, member_type: str, out_col: str) -> DataFrame:
    return (
        relations.select(F.explode("members").alias("m"), F.col("id").alias("relation_id"))
        .where(F.col("m.type") == member_type)
        .select(F.col("m.ref").alias(out_col), "relation_id")
        .distinct()
    )


def node_relation(relations: DataFrame) -> DataFrame:
    return _member_edges(relations, "node", "node_id")


def way_relation(relations: DataFrame) -> DataFrame:
    return _member_edges(relations, "way", "way_id")


def relation_relation(relations: DataFrame) -> DataFrame:
    """child relation -> parent relation (ref src/expand.cpp:203-205)."""
    return _member_edges(relations, "relation", "child_id")


def derive_all(ways: DataFrame, relations: DataFrame) -> dict[str, DataFrame]:
    return {
        "node_way": node_way(ways),
        "node_relation": node_relation(relations),
        "way_relation": way_relation(relations),
        "relation_relation": relation_relation(relations),
    }
