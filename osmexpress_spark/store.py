"""Versioned snapshot store — ACID-ish table commits on plain parquet.

The reference gets atomicity from LMDB: one write transaction covers
all ten sub-databases plus the replication seqnum/timestamp metadata
(`/root/reference/src/update.cpp:260-291`, `docs/MANUAL.md:126`), and
MVCC readers keep seeing the old snapshot. The Spark-native equivalent
is a transaction log a la Delta/Iceberg; those jars aren't in this
environment, so this module implements the minimal same-shaped
mechanism on plain parquet:

    root/_versions/v{N:012d}.json   <- the commit (atomic rename)
    root/data/{table}/v{N}/         <- parquet written before commit

A manifest lists every table's data path (unchanged tables point at
prior versions' directories) plus user metadata (replication seqnum,
timestamp). Readers resolve the latest manifest once and read immutable
files — a concurrent commit never disturbs them (snapshot isolation).
Writers are single-process here (exactly the reference's
one-writer/many-readers model). Time travel = read an older manifest.

Two write granularities:

- `commit(changed=...)` rewrites whole tables (bootstrap / compaction).
- `merge_commit(...)` is **merge-on-read**: a batch upsert/delete lands
  as a delta LAYER — two batch-sized parquet writes (upsert rows +
  changed-key set), the base files untouched. This is the
  Iceberg-equality-delete / Delta-MERGE analog of the reference
  touching only dirtied LMDB pages per minutely diff
  (`src/update.cpp:116-125`): write cost is O(|batch|), never
  O(table) — the property that matters when the table is 100 TB and
  the batch is a minutely diff. Readers fold layers back in with
  broadcast joins (layers are diff-sized); a bounded layer count
  triggers compaction back into a sorted base (OPTIMIZE analog), so
  read amplification is capped.

At production scale swap this for Delta/Iceberg — the engine only uses
`read_table`/`commit`/`merge_commit`/`metadata`, which map 1:1.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class MergeSpec:
    """One table's share of a batch merge: `upserts` are the new row
    images; `changed_keys` (single column named `key`'s value) lists
    every merge-key value the batch touches — deletes are keys present
    here but absent from `upserts` (same contract as operators.update's
    anti-join+union merge)."""

    upserts: DataFrame  # schema == table schema
    changed_keys: DataFrame  # one column, named `key`'s value
    key: str


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "_versions"), exist_ok=True)

    # --- manifest plumbing -------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "_versions", f"v{version:012d}.json")

    def versions(self) -> list[int]:
        d = os.path.join(self.root, "_versions")
        return sorted(
            int(f[1:-5]) for f in os.listdir(d)
            if f.startswith("v") and f.endswith(".json")
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int | None = None) -> dict:
        version = version if version is not None else self.latest_version()
        if version is None:
            raise ValueError("empty store")
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def metadata(self, version: int | None = None) -> dict:
        return self._manifest(version)["metadata"]

    def tables(self, version: int | None = None) -> list[str]:
        return sorted(self._manifest(version)["tables"])

    # --- read path ----------------------------------------------------------
    def _resolve(self, entry) -> DataFrame:
        """Entry -> DataFrame. A string entry is a plain directory; a
        dict entry is a merge-on-read table: base plus ordered delta
        layers. Fold-in rule (per merge key): the highest layer that
        touched a key owns it — base rows survive only for untouched
        keys, and a layer's upsert rows survive only while no later
        layer re-touches their key. Layers are diff-sized, so both
        folding joins broadcast: the base scan stays a single
        shuffle-free pass."""
        if isinstance(entry, str):
            return self.spark.read.parquet(os.path.join(self.root, entry))
        base = self.spark.read.parquet(os.path.join(self.root, entry["base"]))
        layers = entry.get("layers", [])
        if not layers:
            return base
        key = entry["key"]
        changed = None
        ups = None
        for rank, layer in enumerate(layers):
            c = (
                self.spark.read.parquet(os.path.join(self.root, layer["changed"]))
                .withColumnRenamed("key", key)
                .withColumn("__layer", F.lit(rank))
            )
            changed = c if changed is None else changed.unionByName(c)
            u = self.spark.read.parquet(
                os.path.join(self.root, layer["upserts"])
            ).withColumn("__layer", F.lit(rank))
            ups = u if ups is None else ups.unionByName(u)
        winner = changed.groupBy(key).agg(F.max("__layer").alias("__layer"))
        survivors = ups.join(F.broadcast(winner), [key, "__layer"]).drop("__layer")
        return (
            base.join(F.broadcast(winner.select(key)), key, "left_anti")
            # a USING join moves the key column first; restore the
            # table's canonical column order
            .select(base.columns)
            .unionByName(survivors.select(base.columns))
        )

    def read_table(self, name: str, version: int | None = None) -> DataFrame:
        """Snapshot read: resolves the manifest once; the files it points
        at are immutable (LMDB MVCC analog / Delta versionAsOf)."""
        return self._resolve(self._manifest(version)["tables"][name])

    def read_all(self, version: int | None = None) -> dict[str, DataFrame]:
        m = self._manifest(version)
        return {name: self._resolve(e) for name, e in m["tables"].items()}

    # --- write path ---------------------------------------------------------
    def commit(
        self,
        changed: dict[str, DataFrame],
        metadata: dict | None = None,
        sort_by: dict[str, str] | None = None,
        partitions: int = 8,
    ) -> int:
        """Write changed tables, then atomically publish a new manifest.

        Data lands before the manifest rename — a crash mid-commit
        leaves orphan data dirs but never a torn snapshot (same
        guarantee ordering as the reference's single LMDB txn and as a
        Delta log entry). `sort_by` preserves each table's pruning
        layout (cell-sorted locations, id-sorted payloads).
        """
        prev = self.latest_version()
        new_version = 0 if prev is None else prev + 1
        table_paths = {} if prev is None else dict(self._manifest(prev)["tables"])

        for name, df in changed.items():
            rel = os.path.join("data", name, f"v{new_version}")
            out = os.path.join(self.root, rel)
            key = (sort_by or {}).get(name)
            if key:
                df = df.repartitionByRange(partitions, key).sortWithinPartitions(key)
            df.write.mode("overwrite").parquet(out)
            table_paths[name] = rel

        manifest = {
            "version": new_version,
            "tables": table_paths,
            "metadata": {**(metadata or {}), "committed_at": time.time()},
        }
        return self._publish(manifest, new_version)

    def _publish(self, manifest: dict, new_version: int) -> int:
        fd, tmp = tempfile.mkstemp(
            dir=os.path.join(self.root, "_versions"), suffix=".tmp"
        )
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        try:
            # link (not rename): publishing a version that already exists
            # fails loudly with FileExistsError instead of silently
            # clobbering a racing writer's commit
            os.link(tmp, self._manifest_path(new_version))  # the commit point
        finally:
            os.unlink(tmp)
        return new_version

    def set_metadata(self, metadata: dict) -> int:
        """Metadata-only commit: republish the current table entries
        under a new version with the given metadata — e.g. recording
        the post-expand `timestamp` that the replication bootstrap
        (streaming/feedstate.py) later resolves to a seqnum."""
        prev = self.latest_version()
        if prev is None:
            raise ValueError("set_metadata on empty store")
        manifest = {
            "tables": self._manifest(prev)["tables"],
            "metadata": {**metadata, "committed_at": time.time()},
        }
        return self._publish(manifest, prev + 1)

    def merge_commit(
        self,
        merges: dict[str, MergeSpec],
        metadata: dict | None = None,
        sort_by: dict[str, str] | None = None,
        max_layers: int = 16,
        partitions: int = 8,
        layer_files: int | None = None,
    ) -> int:
        """Publish one batch of per-table merges as delta layers — the
        O(|batch|)-write path (see module docstring). Every touched
        table gains one layer: `upserts` parquet + single-column
        `changed` key-set parquet, both batch-sized. A table whose
        layer count would exceed `max_layers` is compacted instead:
        its folded state is rewritten as a fresh sorted base (read
        amplification stays bounded; pruning layout restored). All
        tables + metadata publish in ONE manifest rename, preserving
        the reference's whole-txn atomicity.

        Per-table writes run on a thread pool: each write is a small
        independent Spark job (layers are batch-sized), so submitting
        them concurrently overlaps their fixed job-scheduling cost —
        the batch latency driver when a minutely diff touches all 8
        tables. Nothing is visible until the single manifest rename, so
        concurrency never weakens atomicity."""
        prev = self.latest_version()
        if prev is None:
            raise ValueError("merge_commit on empty store — bootstrap with commit()")
        new_version = prev + 1
        table_entries = dict(self._manifest(prev)["tables"])

        def write_one(name: str, spec: MergeSpec):
            entry = table_entries.get(name)
            if isinstance(entry, str):
                entry = {"base": entry, "key": spec.key, "layers": []}
            layers = list(entry.get("layers", []))
            if len(layers) + 1 > max_layers:
                # compact: fold current state + this batch into a new base
                folded = (
                    self._resolve(entry)
                    .join(
                        F.broadcast(spec.changed_keys.select(spec.key)),
                        spec.key,
                        "left_anti",
                    )
                    .unionByName(spec.upserts)
                )
                rel = os.path.join("data", name, f"v{new_version}")
                sort_key = (sort_by or {}).get(name)
                if sort_key:
                    folded = folded.repartitionByRange(
                        partitions, sort_key
                    ).sortWithinPartitions(sort_key)
                folded.write.mode("overwrite").parquet(os.path.join(self.root, rel))
                return name, {"base": rel, "key": spec.key, "layers": []}
            ldir = os.path.join("data", name, f"v{new_version}_layer")
            ups_rel = os.path.join(ldir, "upserts")
            chg_rel = os.path.join(ldir, "changed")
            # minutely diffs are tiny -> one file per layer keeps the
            # merge-on-read fold cheap; a large backfill batch keeps
            # its write parallel instead of serializing into one task
            lf = layer_files if layer_files is not None else 1
            spec.upserts.coalesce(lf).write.mode("overwrite").parquet(
                os.path.join(self.root, ups_rel)
            )
            spec.changed_keys.select(
                F.col(spec.key).alias("key")
            ).distinct().coalesce(lf).write.mode("overwrite").parquet(
                os.path.join(self.root, chg_rel)
            )
            layers.append({"upserts": ups_rel, "changed": chg_rel})
            return name, {
                "base": entry["base"],
                "key": spec.key,
                "layers": layers,
            }

        from concurrent.futures import ThreadPoolExecutor

        if len(merges) > 1:
            with ThreadPoolExecutor(max_workers=min(8, len(merges))) as pool:
                results = list(pool.map(lambda kv: write_one(*kv), merges.items()))
        else:
            results = [write_one(name, spec) for name, spec in merges.items()]
        table_entries.update(dict(results))

        manifest = {
            "version": new_version,
            "tables": table_entries,
            "metadata": {**(metadata or {}), "committed_at": time.time()},
        }
        return self._publish(manifest, new_version)

    def optimize(
        self,
        tables: list[str] | None = None,
        sort_by: dict[str, str] | None = None,
        partitions: int = 8,
    ) -> int:
        """Compact merge-on-read tables back into sorted bases (the
        OPTIMIZE / ZORDER analog, SURVEY.md §2.6 U1). No-op entries are
        carried forward; publishes one new version."""
        prev = self.latest_version()
        entries = dict(self._manifest(prev)["tables"])
        new_version = prev + 1
        for name in tables or list(entries):
            entry = entries[name]
            if isinstance(entry, str) or not entry.get("layers"):
                continue
            folded = self._resolve(entry)
            rel = os.path.join("data", name, f"v{new_version}")
            sort_key = (sort_by or {}).get(name)
            if sort_key:
                folded = folded.repartitionByRange(
                    partitions, sort_key
                ).sortWithinPartitions(sort_key)
            folded.write.mode("overwrite").parquet(os.path.join(self.root, rel))
            entries[name] = {"base": rel, "key": entry["key"], "layers": []}
        manifest = {
            "version": new_version,
            "tables": entries,
            "metadata": {
                **self._manifest(prev)["metadata"],
                "committed_at": time.time(),
                "optimized": True,
            },
        }
        return self._publish(manifest, new_version)

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        tables: dict[str, DataFrame],
        metadata: dict | None = None,
        sort_by: dict[str, str] | None = None,
    ) -> "SnapshotStore":
        store = cls(spark, root)
        if store.latest_version() is None:
            store.commit(tables, metadata=metadata, sort_by=sort_by)
        return store


DEFAULT_SORT = {
    "locations": "cell",
    "nodes": "id",
    "ways": "id",
    "relations": "id",
    "node_way": "node_id",
    "node_relation": "node_id",
    "way_relation": "way_id",
    "relation_relation": "child_id",
}

# Merge keys: the column a batch's deletes/upserts target. Element
# tables merge by element id; edge tables merge by the OWNING side
# (a way upsert replaces all of that way's node_way rows —
# src/update.cpp:116-125), which differs from their read-pruning sort
# key (the node/member side).
MERGE_KEYS = {
    "locations": "id",
    "nodes": "id",
    "ways": "id",
    "relations": "id",
    "node_way": "way_id",
    "node_relation": "relation_id",
    "way_relation": "relation_id",
    "relation_relation": "relation_id",
}
