"""Augmented diff generation (operator U6) — the reference's most
analytic query (`/root/reference/python/examples/augmented_diff.py`).

For one change batch against a snapshot:
1. last-wins dedup of the batch (`:28-36`);
2. J4 outer join against the stored previous version by (type, id) —
   classifying create / modify / delete, with `not_in_db` for deletes
   of unknown elements (`:48-55,125-165`);
3. change propagation: a moved node *indirectly* modifies its parent
   ways and relations; a changed way indirectly modifies its parent
   relations (`:216-305`) — reverse-index joins (J1) minus the
   directly-changed set;
4. A4 bounds: old/new bboxes for directly-changed nodes (ways'
   geometries need the full old node snapshot; the bbox of changed
   member nodes is attached per way).

Output is a DataFrame (type, id, action, direct, old_version,
new_version) + bbox columns — the Overpass-style XML serialization is
a sink concern (sources.osc), not part of the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import lineage

from . import edges as edges_mod
from .update import last_wins

TYPE_RANK = {"node": 1, "way": 2, "relation": 3}


def augmented_diff(
    tables: dict[str, DataFrame], changes: DataFrame
) -> DataFrame:
    # The deduped batch feeds ~10 plan branches (3 classifies, id sets,
    # old/new positions, new edges). Without a cut, each branch re-runs
    # the union+window dedup — and the whole diff is one plan, so JIT
    # compiles every copy. Materializing is safe at scale: a change
    # batch is minutely-diff-sized, same bound update.py relies on.
    chg = last_wins(changes).localCheckpoint(eager=True)

    # --- classify against the snapshot (J4; augmented_diff.py:48-55) ------
    # r12 join strategy (guide §3.1/§3.2): every non-snapshot frame in
    # this operator is DIFF-BATCH-BOUNDED by contract, so the snapshot
    # (planet-sized) tables must never shuffle against them.  The r11
    # final plan ran 10 SortMergeJoins — node_way and locations were
    # each shuffled several times to meet batch-sized id sets.  The
    # pattern applied throughout: semi-filter the snapshot side with a
    # BROADCAST of the batch ids (a map-side filter, no exchange),
    # then broadcast the now-batch-bounded result into the outer join.
    # Broadcast hints on batch-bounded frames are scale-safe — their
    # size is bounded by the change feed, not the corpus.
    def classify(typ: str, old: DataFrame) -> DataFrame:
        c = chg.where(F.col("type") == typ).select(
            "id",
            "action",
            "visible",
            F.col("metadata.version").alias("new_version"),
        )
        o = old.select("id", F.lit(True).alias("in_db"), *(
            [F.col("version").alias("old_version")]
            if "version" in old.columns
            else [F.col("metadata.version").alias("old_version")]
        ))
        # snapshot rows surviving the id semi-filter are <= batch-sized
        o = F.broadcast(
            o.join(F.broadcast(c.select("id")), "id", "left_semi")
        )
        j = c.join(o, "id", "left_outer")
        action = (
            F.when(~F.col("visible"),
                   F.when(F.col("in_db").isNull(), F.lit("delete_not_in_db"))
                   .otherwise(F.lit("delete")))
            .when(F.col("in_db").isNull(), F.lit("create"))
            .otherwise(F.lit("modify"))
        )
        return j.select(
            F.lit(typ).alias("type"),
            "id",
            action.alias("action"),
            F.lit(True).alias("direct"),
            "old_version",
            "new_version",
        )

    direct = (
        classify("node", tables["locations"])
        .unionByName(classify("way", tables["ways"]))
        .unionByName(classify("relation", tables["relations"]))
    )

    # --- propagation (augmented_diff.py:216-305) ---------------------------
    node_ids = chg.where(F.col("type") == "node").select("id")
    way_ids_direct = chg.where(F.col("type") == "way").select("id")
    rel_ids_direct = chg.where(F.col("type") == "relation").select("id")

    node_way = tables.get("node_way")
    if node_way is None:
        node_way = edges_mod.node_way(tables["ways"])
    node_rel = tables.get("node_relation")
    if node_rel is None:
        node_rel = edges_mod.node_relation(tables["relations"])
    way_rel = tables.get("way_relation")
    if way_rel is None:
        way_rel = edges_mod.way_relation(tables["relations"])

    parent_ways = (
        node_way.join(
            F.broadcast(node_ids), node_way["node_id"] == node_ids["id"]
        )
        .select(F.col("way_id").alias("id"))
        .distinct()
        .join(F.broadcast(way_ids_direct), "id", "left_anti")  # direct wins
    )
    touched_ways = way_ids_direct.unionByName(parent_ways.select("id")).distinct()
    parent_rels = (
        node_rel.join(
            F.broadcast(node_ids), node_rel["node_id"] == node_ids["id"]
        )
        .select(F.col("relation_id").alias("id"))
        .unionByName(
            way_rel.join(
                F.broadcast(touched_ways),
                way_rel["way_id"] == touched_ways["id"],
            )
            .select(F.col("relation_id").alias("id"))
        )
        .distinct()
        .join(F.broadcast(rel_ids_direct), "id", "left_anti")
    )

    indirect = (
        parent_ways.join(tables["ways"].select("id"), "id", "left_semi")
        .select(
            F.lit("way").alias("type"),
            "id",
            F.lit("modify").alias("action"),
            F.lit(False).alias("direct"),
            F.lit(None).cast("int").alias("old_version"),
            F.lit(None).cast("int").alias("new_version"),
        )
        .unionByName(
            parent_rels.join(tables["relations"].select("id"), "id", "left_semi")
            .select(
                F.lit("relation").alias("type"),
                "id",
                F.lit("modify").alias("action"),
                F.lit(False).alias("direct"),
                F.lit(None).cast("int").alias("old_version"),
                F.lit(None).cast("int").alias("new_version"),
            )
        )
    )

    # --- bounds for directly-changed nodes (A4; :309-342) ------------------
    # old positions can only be consumed for type='node' rows (the
    # select below masks every other type to null), and every direct
    # node id is in the batch's node id set — so semi-filtering the
    # planet-sized locations table by a broadcast of those ids, then
    # broadcasting the batch-bounded survivors, is exact: rows the
    # filter drops could only ever have produced masked-to-null
    # columns (ways/relations whose numeric id collides with some
    # node's).
    old_pos = F.broadcast(
        tables["locations"]
        .select("id", F.col("lon").alias("old_lon"),
                F.col("lat").alias("old_lat"))
        .join(
            F.broadcast(chg.where(F.col("type") == "node").select("id")),
            "id", "left_semi",
        )
    )
    new_pos = F.broadcast(
        chg.where((F.col("type") == "node") & F.col("visible")).select(
            "id", F.col("lon").alias("new_lon"), F.col("lat").alias("new_lat")
        )
    )
    out = direct.unionByName(indirect)
    out = (
        out.join(old_pos, "id", "left_outer")
        .join(new_pos, "id", "left_outer")
        .select(
            "type", "id", "action", "direct", "old_version", "new_version",
            *[
                F.when(F.col("type") == "node", F.col(c)).alias(c)
                for c in ("old_lon", "old_lat", "new_lon", "new_lat")
            ],
        )
    )
    # `out` feeds way_rows, both bbox semi-filters and the non-way
    # branch; without a cut Catalyst replicates the classify +
    # propagation subtree per reference (the pre-fix plan held 88
    # joins / 112 Exchanges — plans/r11/q_augmented_diff_analog_
    # before.txt).  Like `chg`, it is diff-batch-sized by contract,
    # so materializing it is bounded at any corpus scale.
    out = lineage.cut(out)

    # --- per-way old/new bboxes over member nodes (:309-342, the 5th
    # pass: every emitted way gets a <bounds> from its nd coordinates —
    # old geometry from the snapshot, new geometry from the post-batch
    # node positions). All joins are semi-pruned to the touched-way set
    # before touching the (planet-sized) locations table, and the bbox
    # is a plain min/max aggregate — no geometry collected.
    bbox_cols = [
        "old_minlon", "old_minlat", "old_maxlon", "old_maxlat",
        "new_minlon", "new_minlat", "new_maxlon", "new_maxlat",
    ]
    way_rows = out.where(F.col("type") == "way")
    touched_way_ids = way_rows.select("id")

    def bbox(edges: DataFrame, pos: DataFrame, prefix: str) -> DataFrame:
        # touched ways are batch-bounded -> broadcast semi keeps the
        # (planet-sized) edge table un-shuffled; the surviving edges
        # are batch x way-size bounded, so THEY broadcast against the
        # planet-sized position table — the corpus side of both joins
        # never crosses an exchange (guide §3.1).
        e = F.broadcast(
            edges.join(
                F.broadcast(touched_way_ids),
                edges["way_id"] == touched_way_ids["id"],
                "left_semi",
            )
        )
        return (
            e.join(pos, e["node_id"] == pos["id"])
            .groupBy("way_id")
            .agg(
                F.min("lon").alias(f"{prefix}_minlon"),
                F.min("lat").alias(f"{prefix}_minlat"),
                F.max("lon").alias(f"{prefix}_maxlon"),
                F.max("lat").alias(f"{prefix}_maxlat"),
            )
        )

    old_bbox = bbox(node_way, tables["locations"].select("id", "lon", "lat"),
                    "old")

    # post-batch node positions: snapshot minus touched nodes, plus the
    # batch's visible node versions
    chg_nodes = chg.where(F.col("type") == "node")
    new_loc = (
        tables["locations"].select("id", "lon", "lat")
        .join(F.broadcast(chg_nodes.select("id")), "id", "left_anti")
        .unionByName(
            chg_nodes.where(F.col("visible")).select("id", "lon", "lat")
        )
    )
    # post-batch membership: a directly-modified way's new member list
    # comes from the batch (when it carries one); everything else keeps
    # the snapshot edges
    chg_ways = chg.where((F.col("type") == "way") & F.col("visible"))
    ways_with_refs = chg_ways.where(F.col("nodes").isNotNull())
    new_edges = (
        ways_with_refs.select(
            F.col("id").alias("way_id"), F.explode("nodes").alias("node_id")
        )
        .unionByName(
            node_way.join(
                F.broadcast(
                    ways_with_refs.select(F.col("id").alias("way_id"))
                ),
                "way_id", "left_anti",
            ).select("way_id", "node_id")
        )
    )
    new_bbox = bbox(new_edges, new_loc, "new")

    way_rows = (
        way_rows.join(
            F.broadcast(old_bbox),
            way_rows["id"] == old_bbox["way_id"], "left_outer",
        )
        .drop("way_id")
        .join(
            F.broadcast(new_bbox),
            way_rows["id"] == new_bbox["way_id"], "left_outer",
        )
        .drop("way_id")
    )
    # a deleted way has no new geometry (the reference's new element
    # carries no nds, hence no bounds)
    way_rows = way_rows.select(
        *[c for c in way_rows.columns if not c.startswith("new_m")],
        *[
            F.when(~F.col("action").startswith("delete"), F.col(c)).alias(c)
            for c in bbox_cols
            if c.startswith("new_")
        ],
    )
    others = out.where(F.col("type") != "way").select(
        "*", *[F.lit(None).cast("int").alias(c) for c in bbox_cols]
    )
    return way_rows.select(others.columns).unionByName(others)
