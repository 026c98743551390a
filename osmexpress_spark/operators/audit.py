"""Referential-integrity audit over the OSM forward arrays.

The reference tolerates dangling references at extract time
(src/extract.cpp:253-255 skips members whose way is absent) but has no
way to REPORT them; planet QA pipelines (osmose/keepright-style) need
the census: how many way->node refs, relation->node/way/relation
member refs point at elements that do not exist in the snapshot.

Scale shape: each category is one explode + one left-anti (or
left-outer + null-count) join against the referenced table's id
column — fully pruned scans, map-side-combined counts, no driver
collection. The whole audit is a handful of joins whose probe side is
8-byte (ref) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _category(
    refs: DataFrame, ids: DataFrame, category: str
) -> DataFrame:
    """refs(ref) vs ids(id): (category, n_refs, n_dangling)."""
    joined = refs.join(
        ids.select(F.col("id").alias("ref"), F.lit(1).alias("__ok")),
        "ref",
        "left_outer",
    )
    # coalesce: F.sum over ZERO rows is NULL, and an empty category
    # (e.g. a snapshot with no relations) must report 0, not None
    return joined.agg(
        F.lit(category).alias("category"),
        F.count(F.lit(1)).alias("n_refs"),
        F.coalesce(
            F.sum(F.when(F.col("__ok").isNull(), 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_dangling"),
    )


def integrity_audit(
    locations: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
) -> DataFrame:
    """(category, n_refs, n_dangling) for the four reference classes:
    way->node, relation->node, relation->way, relation->relation.
    Counts are per REFERENCE (a node referenced twice counts twice),
    matching what an updater would have to resolve."""
    way_refs = ways.select(F.explode("nodes").alias("ref"))
    members = relations.select(F.explode("members").alias("m")).select(
        F.col("m.type").alias("mtype"), F.col("m.ref").alias("ref")
    )
    out = _category(way_refs, locations, "way_node")
    for mtype, ids, cat in (
        ("node", locations, "relation_node"),
        ("way", ways, "relation_way"),
        ("relation", relations, "relation_relation"),
    ):
        out = out.unionByName(
            _category(
                members.where(F.col("mtype") == mtype).select("ref"),
                ids,
                cat,
            )
        )
    return out
