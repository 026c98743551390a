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

At production scale swap this for Delta/Iceberg — the engine only uses
`read_table`/`commit`/`metadata`, which map 1:1.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession


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
    def read_table(self, name: str, version: int | None = None) -> DataFrame:
        """Snapshot read: resolves the manifest once; the files it points
        at are immutable (LMDB MVCC analog / Delta versionAsOf)."""
        path = self._manifest(version)["tables"][name]
        return self.spark.read.parquet(os.path.join(self.root, path))

    def read_all(self, version: int | None = None) -> dict[str, DataFrame]:
        m = self._manifest(version)
        return {
            name: self.spark.read.parquet(os.path.join(self.root, rel))
            for name, rel in m["tables"].items()
        }

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
        fd, tmp = tempfile.mkstemp(
            dir=os.path.join(self.root, "_versions"), suffix=".tmp"
        )
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, self._manifest_path(new_version))  # the commit point
        return new_version

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
