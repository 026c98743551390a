"""`.osmx` source/sink: the reference's native LMDB artifact.

The reference's `osmx expand` product is a single-file LMDB
environment with ten sub-databases (`/root/reference/src/storage.cpp:
6-19`): `metadata` (string keys, storage.cpp:21-41), `locations`
(node id -> 12-byte lon/lat/version triple, storage.cpp:79-96),
`nodes`/`ways`/`relations` (id -> Cap'n Proto message,
storage.cpp:43-77), and the `cell_node`/`node_way`/`node_relation`/
`way_relation` reverse indexes (integer-dup sets,
storage.cpp:126-144).  Its Python embedding opens that file directly
(`/root/reference/python/osmx/osmx.py:16-46`).  This module gives the
Spark engine the same capability — a user migrating an existing
planet.osmx does NOT have to re-expand from PBF:

- ``spark.read.format("osmx").load(path)`` — a PySpark Python
  DataSource emitting the same unified ALL_SCHEMA rows as the PBF/XML
  sources, so ``Dataset.expand(spark, "planet.osmx", dest)`` runs the
  identical ingest pipeline.  Partition planning reads only the top
  B-tree levels on the driver (`LmdbReader.split_points`) and hands
  each task an independent key range — a planet-scale file fans out
  across the cluster the way PBF blobs do.
- ``OsmxFile`` — the point-access API surface of the reference's
  Python embedding (location/node/way/relation gets, index walks).
- ``write_osmx`` — a bulk sink building a file the REFERENCE can open
  (the pure-stdlib writer is cross-validated against the system
  liblmdb via ctypes in tests/test_lmdb_kv.py).  Derives the four
  reverse indexes from the logical tables the way expand does
  (src/expand.cpp:40-121's external sort, here a Spark sort).

Cell-scheme note (SURVEY §1.5, VERDICT r07/r08): the reference's
`cell_node` keys are S2 cell ids at level 16 (`docs/MANUAL.md:121`,
`src/expand.cpp:151-153`).  The READ path re-derives cells from the
exact lon/lat integers instead of trusting stored `cell_node` keys —
semantics (point -> sortable cell, region -> few ranges) are
preserved whatever the file holds.  The WRITE path stores TRUE
level-16 S2 ids by default (spatial/s2cell.py; `cell_scheme=s2_16` in
the metadata table) so the reference's own region queries can
range-scan our index; the engine's documented Morton grid
(spatial/cells.py) remains available as `cell_scheme="morton16"`.
`OsmxFile.bbox_node_ids` serves region queries against either scheme.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pandas as pd

from . import capnp_codec as C
from . import lmdb_kv as K

TABLE_FLAGS = K.MDB_INTEGERKEY
INDEX_FLAGS = (
    K.MDB_INTEGERKEY | K.MDB_DUPSORT | K.MDB_DUPFIXED | K.MDB_INTEGERDUP
)

ELEMENT_DBS = ("locations", "nodes", "ways", "relations")
INDEX_DBS = ("cell_node", "node_way", "node_relation", "way_relation")


def _iso(ts: int | None) -> str | None:
    if not ts:
        return None
    return datetime.fromtimestamp(int(ts), tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def _unpack_location(raw: bytes) -> tuple[int, int, int]:
    """12-byte locations value -> (lon, lat, version) scaled ints
    (storage.cpp:88-96; osmx.py:60-68 reads lat from bytes 4:8 and lon
    from 0:4)."""
    import struct

    lon, lat, version = struct.unpack("<iiI", raw[:12])
    return lon, lat, version


def _pack_location(lon: int, lat: int, version: int) -> bytes:
    import struct

    return struct.pack("<iiI", int(lon), int(lat), int(version or 0))


class OsmxFile:
    """Driver-side point access to a `.osmx` file — the reference's
    Python embedding surface (osmx.py:53-111) without the lmdb
    dependency."""

    def __init__(self, path: str):
        self.reader = K.LmdbReader(path)

    def close(self) -> None:
        self.reader.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def metadata(self) -> dict[str, str]:
        return {
            k.decode(): v.decode()
            for k, v in self.reader.items("metadata")
        }

    def stats(self) -> dict[str, int]:
        """Per-table entry counts straight from the stored MDB_db
        structs — the `osmx query FILE` report (`src/cmd.cpp:96-109`
        runs mdb_stat per dbi; ms_entries is the same md_entries
        field), answered without scanning a single data page."""
        return {
            name: self.reader.db(name).entries
            for name in self.reader.db_names()
        }

    def location(self, node_id: int):
        raw = self.reader.get("locations", node_id)
        return None if raw is None else _unpack_location(raw)

    def node(self, node_id: int):
        raw = self.reader.get("nodes", node_id)
        return None if raw is None else C.decode_node(raw)

    def way(self, way_id: int):
        raw = self.reader.get("ways", way_id)
        return None if raw is None else C.decode_way(raw)

    def relation(self, rel_id: int):
        raw = self.reader.get("relations", rel_id)
        return None if raw is None else C.decode_relation(raw)

    def node_ways(self, node_id: int) -> list[int]:
        return self.reader.get_dups("node_way", node_id)

    def node_relations(self, node_id: int) -> list[int]:
        return self.reader.get_dups("node_relation", node_id)

    def way_relations(self, way_id: int) -> list[int]:
        return self.reader.get_dups("way_relation", way_id)

    def cell_nodes(self, cell: int) -> list[int]:
        return self.reader.get_dups("cell_node", cell)

    def cell_scheme(self) -> str:
        return self.metadata().get("cell_scheme", "s2_16")

    def bbox_node_ids(
        self,
        lon_lo: int,
        lat_lo: int,
        lon_hi: int,
        lat_hi: int,
    ) -> list[int]:
        """Node ids whose `cell_node` cells may intersect the
        scaled-int bbox — the reference's region-query shape
        (`src/extract.cpp:138-175`: covering -> cursor range scans),
        honoring the file's recorded cell scheme.  Over-selective by
        covering construction; callers refine with the exact location
        predicate (as the reference does)."""
        scheme = self.cell_scheme()
        out: list[int] = []
        if scheme == "s2_16":
            from ..spatial import s2cell as S2

            cover = S2.bbox_covering(
                lon_lo, lat_lo, lon_hi, lat_hi, 16, max_cells=4096
            )
            ranges = S2.covering_ranges(cover)
        elif scheme == "morton16":
            from ..spatial import covering as COV
            from ..spatial import region as REG

            text = (
                f"{lat_lo * 1e-7},{lon_lo * 1e-7},"
                f"{lat_hi * 1e-7},{lon_hi * 1e-7}"
            )
            ranges = COV.covering(REG.Region(text, "bbox"), expand_cells=1)
        else:
            raise ValueError(f"unknown cell_scheme {scheme!r}")
        for lo, hi in ranges:
            for _k, v in self.reader.items("cell_node", lo=lo, hi=hi):
                out.append(K._from_ikey(v))
        return out


def _meta_dict(meta: dict | None) -> tuple:
    """capnp metadata -> the unified row's trailing columns
    (version, timestamp_iso, changeset, uid, user)."""
    if meta is None:
        return None, None, None, None, None
    return (
        meta["version"], _iso(meta["timestamp"]), meta["changeset"],
        meta["uid"], meta["user"],
    )


def _tags_map(tags_kv: list[str]) -> dict:
    it = iter(tags_kv)
    return dict(zip(it, it))


def scan_unified(path: str, element: str, lo: int | None, hi: int | None):
    """Yield ALL_SCHEMA tuples for one element type over one key range
    — the executor-side body of the DataSource read.  Node rows merge
    the `locations` range scan with the tagged-payload table on the
    fly (two ordered iterators over the same id range)."""
    with K.LmdbReader(path) as r:
        if element == "node":
            payloads = r.items("nodes", lo=lo, hi=hi)
            cur = next(payloads, None)
            for nid, raw in r.items("locations", lo=lo, hi=hi):
                lon, lat, loc_version = _unpack_location(raw)
                tags: dict = {}
                meta_cols: tuple = (loc_version, None, None, None, None)
                while cur is not None and cur[0] < nid:
                    cur = next(payloads, None)
                if cur is not None and cur[0] == nid:
                    tags_kv, meta = C.decode_node(cur[1])
                    tags = _tags_map(tags_kv)
                    if meta is not None:
                        meta_cols = _meta_dict(meta)
                yield ("node", nid, lon, lat, None, None, meta_cols[0],
                       tags, meta_cols[1], meta_cols[2], meta_cols[3],
                       meta_cols[4])
        elif element == "way":
            for wid, raw in r.items("ways", lo=lo, hi=hi):
                refs, tags_kv, meta = C.decode_way(raw)
                v, ts, cs, uid, user = _meta_dict(meta)
                yield ("way", wid, None, None, refs, None, v,
                       _tags_map(tags_kv), ts, cs, uid, user)
        elif element == "relation":
            for rid, raw in r.items("relations", lo=lo, hi=hi):
                members, tags_kv, meta = C.decode_relation(raw)
                v, ts, cs, uid, user = _meta_dict(meta)
                yield ("relation", rid, None, None, None, members, v,
                       _tags_map(tags_kv), ts, cs, uid, user)
        else:
            raise ValueError(f"unknown element {element!r}")


try:  # PySpark 4 Python DataSource API (same gate as sources/pbf.py)
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    from .osm_xml import ALL_SCHEMA

    class _RangePartition(InputPartition):
        def __init__(self, path: str, element: str, lo, hi):
            self.path = path
            self.element = element
            self.lo = lo
            self.hi = hi

    class OsmxReader(DataSourceReader):
        def __init__(self, options):
            self.paths = options["path"].split(",")
            self.per_table = int(options.get("partitions", "8"))

        def partitions(self):
            parts = []
            for path in self.paths:
                with K.LmdbReader(path) as r:
                    for element, table in (
                        ("node", "locations"),
                        ("way", "ways"),
                        ("relation", "relations"),
                    ):
                        try:
                            splits = r.split_points(table, self.per_table)
                        except KeyError:
                            continue
                        bounds = [None, *splits, None]
                        for i in range(len(bounds) - 1):
                            hi = (
                                bounds[i + 1] - 1
                                if bounds[i + 1] is not None
                                else None
                            )
                            parts.append(
                                _RangePartition(path, element, bounds[i], hi)
                            )
            return parts

        def read(self, partition):
            yield from scan_unified(
                partition.path, partition.element, partition.lo, partition.hi
            )

    class OsmxDataSource(DataSource):
        """spark.read.format("osmx").load("planet.osmx") — unified
        ALL_SCHEMA rows, same shape as the PBF/XML sources, so the
        whole expand pipeline (tables_from_unified, sorted writes,
        edge derivation) applies unchanged."""

        @classmethod
        def name(cls):
            return "osmx"

        def schema(self):
            return ALL_SCHEMA

        def reader(self, schema):
            return OsmxReader(self.options)

    def register(spark) -> None:
        spark.dataSource.register(OsmxDataSource)

except ImportError:  # pragma: no cover

    def register(spark) -> None:
        raise NotImplementedError("Python DataSource API requires pyspark>=4")


# --------------------------------------------------------------------------
# sink
# --------------------------------------------------------------------------


def _epoch(ts) -> int | None:
    if ts is None:
        return None
    if isinstance(ts, (int, float)):
        return int(ts)
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=timezone.utc)
    return int(ts.timestamp())


def _meta_from_row(md) -> dict | None:
    if md is None:
        return None
    return {
        "version": md["version"] or 0,
        "timestamp": _epoch(md["timestamp"]) or 0,
        "changeset": md["changeset"] or 0,
        "uid": md["uid"] or 0,
        "user": md["user"],
    }


def write_osmx(
    tables: dict,
    path: str,
    metadata: dict[str, str] | None = None,
    cell_scheme: str = "s2_16",
) -> None:
    """Four logical DataFrames (schemas.TABLE_SCHEMAS layout) -> one
    `.osmx` file the reference's tooling can open.  Sorting happens in
    Spark (the engine's analog of the reference's external sort at
    src/expand.cpp:40-121); rows stream to the driver through
    toLocalIterator into the STREAMING bulk writer, so driver memory
    holds one row and the current page — the single output file is
    the serial bottleneck (as it is for the reference's own expand),
    not memory.  The four reverse indexes and the cell index are
    derived here exactly as expand derives them.

    ``cell_scheme`` picks the `cell_node` key space and is recorded in
    the metadata table:

    - ``"s2_16"`` (default): TRUE level-16 S2 cell ids
      (spatial/s2cell.py) — the key space the reference itself writes
      (`src/storage.cpp:43-77` via s2geometry, docs/MANUAL.md:121), so
      the reference's region queries can range-scan our index.  Ids
      are computed in a vectorized Arrow seam and travel through the
      Spark sort BIASED to signed int64 (order-preserving), unbiased
      back to uint64 at the storage boundary.
    - ``"morton16"``: the engine's documented Morton substitute
      (spatial/cells.py), key-compatible with our own query path.

    Readers of either scheme that re-derive cells from exact lon/lat
    (our read path does — cells are never trusted from the file) are
    unaffected by the choice."""
    from pyspark.sql import functions as F

    from ..spatial import s2cell as S2

    locations = tables["locations"]
    ways = tables["ways"]
    relations = tables["relations"]

    # every entry stream below is SORTED IN SPARK and consumed through
    # toLocalIterator, so the driver holds one row / one dup list at a
    # time; the streaming writer (lmdb_kv.write_env presorted=True)
    # lands pages in the file as they pack — bulk memory is bounded by
    # page buffers + the B-tree level key lists, not the dataset

    def loc_stream():
        for row in locations.orderBy("id").toLocalIterator():
            yield row["id"], _pack_location(
                row["lon"], row["lat"], row["version"]
            )

    def element_stream(df, encode):
        for row in df.orderBy("id").toLocalIterator():
            yield row["id"], encode(row)

    def grouped_stream(df, key, val, key_fn=int):
        grouped = (
            df.groupBy(key)
            .agg(F.sort_array(F.collect_set(val)).alias("vals"))
            .orderBy(key)
        )
        for row in grouped.toLocalIterator():
            yield key_fn(row[key]), [int(v) for v in row["vals"]]

    if cell_scheme == "s2_16":

        @F.pandas_udf("long")
        def _s2_biased(lon: pd.Series, lat: pd.Series) -> pd.Series:
            import numpy as np

            ids = S2.cell_ids_np(lon.to_numpy(), lat.to_numpy(), 16)
            # flip the top bit: uint64 order -> int64 order (== -2^63)
            return pd.Series((ids ^ np.uint64(1 << 63)).view(np.int64))

        cell_src = locations.select(
            _s2_biased(F.col("lon"), F.col("lat")).alias("cell"), "id"
        )
        cell_key_fn = S2.unbias64
    elif cell_scheme == "morton16":
        cell_src = locations.select("cell", "id")
        cell_key_fn = int
    else:
        raise ValueError(
            f"unknown cell_scheme {cell_scheme!r} (s2_16 | morton16)"
        )
    cell_node = grouped_stream(cell_src, "cell", "id", cell_key_fn)
    node_way = grouped_stream(
        ways.select(
            F.explode("nodes").alias("node_id"), F.col("id").alias("way_id")
        ),
        "node_id", "way_id",
    )
    members = relations.select(
        F.explode("members").alias("m"), F.col("id").alias("rel_id")
    )
    node_rel = grouped_stream(
        members.where(F.col("m.type") == "node").select(
            F.col("m.ref").alias("node_id"), "rel_id"
        ),
        "node_id", "rel_id",
    )
    way_rel = grouped_stream(
        members.where(F.col("m.type") == "way").select(
            F.col("m.ref").alias("way_id"), "rel_id"
        ),
        "way_id", "rel_id",
    )

    def enc_node(row):
        return C.encode_node(
            list(row["tags_kv"] or []), _meta_from_row(row["metadata"])
        )

    def enc_way(row):
        return C.encode_way(
            [int(x) for x in (row["nodes"] or [])],
            list(row["tags_kv"] or []), _meta_from_row(row["metadata"]),
        )

    def enc_rel(row):
        return C.encode_relation(
            [
                (int(m["ref"]), m["type"], m["role"] or "")
                for m in (row["members"] or [])
            ],
            list(row["tags_kv"] or []), _meta_from_row(row["metadata"]),
        )

    # the recorded scheme must describe the keys actually written —
    # bbox_node_ids dispatches on it, so a caller-supplied override
    # would make region queries silently scan the wrong key space
    if metadata and metadata.get("cell_scheme", cell_scheme) != cell_scheme:
        raise ValueError(
            f"metadata cell_scheme {metadata['cell_scheme']!r} contradicts "
            f"the written scheme {cell_scheme!r}; pass cell_scheme= instead"
        )
    meta = {"cell_scheme": cell_scheme}
    meta.update(metadata or {})
    meta["cell_scheme"] = cell_scheme
    meta_entries = [
        (k.encode(), str(v).encode()) for k, v in sorted(meta.items())
    ]

    K.write_env(path, {
        "metadata": (0, meta_entries),
        "locations": (TABLE_FLAGS, loc_stream()),
        "nodes": (TABLE_FLAGS, element_stream(tables["nodes"], enc_node)),
        "ways": (TABLE_FLAGS, element_stream(ways, enc_way)),
        "relations": (TABLE_FLAGS, element_stream(relations, enc_rel)),
        "cell_node": (INDEX_FLAGS, cell_node),
        "node_way": (INDEX_FLAGS, node_way),
        "node_relation": (INDEX_FLAGS, node_rel),
        "way_relation": (INDEX_FLAGS, way_rel),
    }, presorted=True)


# --------------------------------------------------------------------------
# generic LMDB key-value source (beyond the .osmx schema)
# --------------------------------------------------------------------------

try:
    from pyspark.sql.datasource import DataSource as _DS
    from pyspark.sql.datasource import DataSourceReader as _DSR
    from pyspark.sql.datasource import InputPartition as _IP

    class _KvPartition(_IP):
        def __init__(self, path, db, lo, hi):
            self.path = path
            self.db = db
            self.lo = lo
            self.hi = hi

    class LmdbKvReader(_DSR):
        def __init__(self, options):
            self.paths = options["path"].split(",")
            self.db = options.get("db", "main")
            self.per_table = int(options.get("partitions", "8"))

        def partitions(self):
            parts = []
            for path in self.paths:
                with K.LmdbReader(path) as r:
                    db = r.db(self.db)
                    if db.flags & K.MDB_INTEGERKEY:
                        splits = r.split_points(self.db, self.per_table)
                    else:
                        splits = []  # bytewise dbs scan in one partition
                    bounds = [None, *splits, None]
                    for i in range(len(bounds) - 1):
                        hi = (
                            bounds[i + 1] - 1
                            if bounds[i + 1] is not None
                            else None
                        )
                        parts.append(
                            _KvPartition(path, self.db, bounds[i], hi)
                        )
            return parts

        def read(self, partition):
            with K.LmdbReader(partition.path) as r:
                db = r.db(partition.db)
                integer = bool(db.flags & K.MDB_INTEGERKEY)
                for k, v in r.items(
                    partition.db, lo=partition.lo, hi=partition.hi
                ):
                    if integer:
                        yield k, None, bytes(v)
                    else:
                        yield None, bytes(k), bytes(v)

    class LmdbKvDataSource(_DS):
        """spark.read.format("lmdbkv").option("db", "locations")
        .load("any.mdb") — ANY single-file LMDB environment as a
        DataFrame of raw (key_int | key_bytes, value) rows, reusing
        the pure-stdlib walker and its key-range partitioning.  The
        general-purpose escape hatch for LMDB artifacts beyond the
        .osmx schema (the typed path is format("osmx"))."""

        @classmethod
        def name(cls):
            return "lmdbkv"

        def schema(self):
            return "key_int long, key_bytes binary, value binary"

        def reader(self, schema):
            return LmdbKvReader(self.options)

    def register_kv(spark) -> None:
        spark.dataSource.register(LmdbKvDataSource)

except ImportError:  # pragma: no cover

    def register_kv(spark) -> None:
        raise NotImplementedError("Python DataSource API requires pyspark>=4")
