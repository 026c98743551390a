"""OsmChange application — the MERGE path (operators U1-U4).

Re-expresses `osmx update` (`/root/reference/src/update.cpp:33-291`) as
declarative DataFrame merges over the snapshot store:

- U1 node upsert: location coords/version replaced, payload row kept
  only while tags remain non-empty (tag removal demotes a tagged node
  to locations-only, update.cpp:60-62); the spatial cell is a derived
  column so the reference's explicit cell move (update.cpp:65-74) is
  simply recomputation + eventual re-sort.
- U2/U3 way/relation upsert with reverse-index maintenance: instead of
  the reference's imperative per-element edge diff
  (update.cpp:116-125, 189-212) we recompute edges for *changed ids
  only* — an anti-join dropping their old edges plus an explode of
  their new arrays. Semantically identical (property-tested), and the
  changed set is minutes-sized while the table is planet-sized, so the
  incremental cost is the same O(|changes|).
- U4 transactional batch: the caller commits all new tables plus the
  seqnum/timestamp metadata in ONE SnapshotStore commit; dry-run =
  compute without committing (update.cpp:280-291's rollback).

Merge mechanics: with Delta this is literally `MERGE INTO ... WHEN
MATCHED [AND deleted] THEN DELETE / UPDATE / INSERT`; on plain parquet
we express the same thing as anti-join (drop changed/deleted ids) +
union (insert new images). Shuffle cost is one join keyed on id per
table — broadcast-sized whenever the changeset is a minutely diff.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..spatial import cells
from ..store import MergeSpec
from . import edges as edges_mod


def _empty_tags():
    # built lazily: Column construction needs an active SparkSession
    return F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )


def last_wins(changes: DataFrame) -> DataFrame:
    """A5 dedup: one row per (type, id) — highest metadata.version, then
    highest seqnum (a repeated element inside one batch replays in
    version order, augmented_diff.py:28-36)."""
    w = Window.partitionBy("type", "id").orderBy(
        F.col("metadata.version").desc_nulls_last(), F.col("seqnum").desc()
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _merge(
    old: DataFrame, upserts: DataFrame, changed_ids: DataFrame
) -> DataFrame:
    """anti-join out every changed id, union back the surviving images —
    the plain-parquet MERGE. Deletes are ids present in changed_ids but
    absent from upserts."""
    return old.join(changed_ids, "id", "left_anti").unionByName(upserts)


@dataclass
class UpdateResult:
    tables: dict[str, DataFrame]
    # per-table (upserts, changed keys) — the same merge expressed as
    # batch-sized deltas for SnapshotStore.merge_commit (O(|batch|)
    # write path); `tables` above is the eagerly-folded equivalent.
    merge_specs: dict[str, MergeSpec] | None = None
    _chg: DataFrame | None = None
    _counts: dict[str, int] | None = None

    @property
    def counts(self) -> dict[str, int]:
        """Per-action row counts — computed on first access (a commit
        path that never looks at them pays no job for them)."""
        if self._counts is None:
            self._counts = {
                row["action"]: row["n"]
                for row in self._chg.groupBy("action")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
        return self._counts


def merge_specs_for(
    changes: DataFrame,
) -> tuple[dict[str, MergeSpec], DataFrame]:
    """Batch-only merge specs: per-table upsert images + changed-key
    sets derived from the deduped batch ALONE — no base table is ever
    read or planned. This is the O(|batch|) path the replication
    commit uses: at 100 TB the base tables are planet-sized while the
    batch is minutes-sized, and `SnapshotStore.merge_commit` only needs
    these batch-sized frames (base files stay untouched). Returns
    (specs, deduped batch); callers that also want the folded tables go
    through `apply_changes`, which reuses these specs."""
    chg = last_wins(changes).localCheckpoint(eager=True)

    nodes_chg = chg.where(F.col("type") == "node")
    ways_chg = chg.where(F.col("type") == "way")
    rels_chg = chg.where(F.col("type") == "relation")

    # --- locations (U1): every visible node has coords ---------------------
    node_ids = nodes_chg.select("id")
    loc_upserts = nodes_chg.where(F.col("visible")).select(
        "id",
        F.col("lon"),
        F.col("lat"),
        F.coalesce(F.col("metadata.version"), F.lit(1)).alias("version"),
        cells.cell_col(F.col("lon"), F.col("lat")).alias("cell"),
    )

    # --- tagged-node payload: kept only while tags non-empty ---------------
    tagged_upserts = nodes_chg.where(
        F.col("visible") & (F.size(F.coalesce(F.col("tags"), _empty_tags())) > 0)
    ).select(
        "id",
        "tags",
        F.flatten(
            F.transform(
                F.map_entries("tags"), lambda e: F.array(e["key"], e["value"])
            )
        ).alias("tags_kv"),
        "metadata",
    )

    # --- ways (U2) ----------------------------------------------------------
    way_ids = ways_chg.select("id")
    way_upserts = ways_chg.where(F.col("visible")).select(
        "id",
        F.coalesce(F.col("nodes"), F.array().cast("array<bigint>")).alias("nodes"),
        F.coalesce(F.col("tags"), _empty_tags()).alias("tags"),
        F.flatten(
            F.transform(
                F.map_entries(F.coalesce(F.col("tags"), _empty_tags())),
                lambda e: F.array(e["key"], e["value"]),
            )
        ).alias("tags_kv"),
        "metadata",
    )

    # --- relations (U3) -----------------------------------------------------
    rel_ids = rels_chg.select("id")
    rel_upserts = rels_chg.where(F.col("visible")).select(
        "id",
        F.coalesce(
            F.col("members"),
            F.array().cast("array<struct<ref:bigint,type:string,role:string>>"),
        ).alias("members"),
        F.coalesce(F.col("tags"), _empty_tags()).alias("tags"),
        F.flatten(
            F.transform(
                F.map_entries(F.coalesce(F.col("tags"), _empty_tags())),
                lambda e: F.array(e["key"], e["value"]),
            )
        ).alias("tags_kv"),
        "metadata",
    )

    specs = {
        "locations": MergeSpec(loc_upserts, node_ids, "id"),
        "nodes": MergeSpec(tagged_upserts, node_ids, "id"),
        "ways": MergeSpec(way_upserts, way_ids, "id"),
        "relations": MergeSpec(rel_upserts, rel_ids, "id"),
    }

    # --- reverse-index maintenance (U2/U3): recompute changed ids only -----
    # New edge rows derive from the batch's upsert images alone, so the
    # edge-upsert plans never touch the base tables — O(|batch|).
    way_keys = way_ids.withColumnRenamed("id", "way_id")
    specs["node_way"] = MergeSpec(
        edges_mod.node_way(way_upserts), way_keys, "way_id"
    )
    rel_anti = rel_ids.withColumnRenamed("id", "relation_id")
    for name, fn in (
        ("node_relation", edges_mod.node_relation),
        ("way_relation", edges_mod.way_relation),
        ("relation_relation", edges_mod.relation_relation),
    ):
        specs[name] = MergeSpec(fn(rel_upserts), rel_anti, "relation_id")
    return specs, chg


def apply_changes(
    tables: dict[str, DataFrame], changes: DataFrame, with_edges: bool = True
) -> UpdateResult:
    """Apply one OsmChange batch to the core tables (+ edge tables if
    present/requested). Pure transformation: returns new DataFrames, the
    caller decides whether to commit (U4 dry-run semantics). The folded
    `tables` are the specs from `merge_specs_for` applied as
    anti-join + union MERGEs; commit paths that only need the
    batch-sized deltas should call `merge_specs_for` directly and never
    pay for base-table plan construction."""
    specs, chg = merge_specs_for(changes)

    # edge-table anti-joins key on the OWNING side and a USING join
    # moves the key column first — re-select the canonical column order
    out = {}
    for name in ("locations", "nodes", "ways", "relations"):
        spec = specs[name]
        out[name] = _merge(tables[name], spec.upserts, spec.changed_keys)
    if with_edges:
        for name in (
            "node_way", "node_relation", "way_relation", "relation_relation"
        ):
            if name not in tables:
                continue
            spec = specs[name]
            out[name] = (
                tables[name]
                .join(spec.changed_keys, spec.key, "left_anti")
                .select(tables[name].columns)
                .unionByName(spec.upserts.select(tables[name].columns))
            )

    return UpdateResult(tables=out, merge_specs=specs, _chg=chg)
