"""PBF source (operator S1) — a real, working PySpark Python DataSource.

The reference's native format is `.osm.pbf` read through libosmium
(`/root/reference/src/expand.cpp:273-295`). PBF is a length-prefixed
sequence of independently-compressed Blobs (~8k elements each), which
makes it block-splittable: the natural Spark mapping is ONE INPUT
PARTITION PER BLOB — a planet file (~47 GB, ~5k blobs) fans out across
the cluster with no coordination, each task seeking straight to its
offset. Decode is the pure-stdlib wire codec in pbf_codec.py (no
protobuf/osmium dependency).

Shape: `spark.dataSource.register(OsmPbfDataSource)` then
`spark.read.format("osmpbf").option("element", "way").load(path)`.
Output schemas are identical to sources/osm_xml.py, so the XML and PBF
flavors are drop-in interchangeable. The write side (operator S5) is
`sources.sink.write_pbf` — distributed encode, ordered driver append.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

from . import pbf_codec


@dataclass
class BlobRef:
    """One PBF blob: file offset + sizes — an input partition."""

    path: str
    header_offset: int
    data_offset: int
    data_size: int
    blob_type: str


def scan_blob_index(path: str) -> list[BlobRef]:
    """Walk the BlobHeader framing (big-endian int32 header length, then
    a tiny BlobHeader message: type field 1, datasize field 3). This is
    the driver-side partition plan — O(#blobs) tiny reads, no decode.
    """
    blobs: list[BlobRef] = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        off = 0
        while off + 4 <= size:
            f.seek(off)
            (hlen,) = struct.unpack(">i", f.read(4))
            header = f.read(hlen)
            btype, datasize = _parse_blob_header(header)
            data_off = off + 4 + hlen
            blobs.append(
                BlobRef(
                    path=path,
                    header_offset=off,
                    data_offset=data_off,
                    data_size=datasize,
                    blob_type=btype,
                )
            )
            off = data_off + datasize
    return blobs


def _parse_blob_header(buf: bytes) -> tuple[str, int]:
    r = pbf_codec._Reader(buf)
    btype, datasize = "", 0
    for field, wire, val in r.fields():
        if field == 1 and wire == 2:
            btype = r.span_bytes(val).decode()
        elif field == 3 and wire == 0:
            datasize = val
    return btype, datasize


def decode_blob(ref: BlobRef) -> dict[str, list[tuple]]:
    """One blob -> {'node': rows, 'way': rows, 'relation': rows}."""
    with open(ref.path, "rb") as f:
        f.seek(ref.data_offset)
        raw = f.read(ref.data_size)
    payload = pbf_codec.decode_blob(raw)
    return pbf_codec.decode_primitive_block(payload)


def read_header(path: str) -> dict:
    """The OSMHeader blob (bbox, features, writingprogram)."""
    for ref in scan_blob_index(path):
        if ref.blob_type == "OSMHeader":
            with open(path, "rb") as f:
                f.seek(ref.data_offset)
                raw = f.read(ref.data_size)
            return pbf_codec.decode_header_block(pbf_codec.decode_blob(raw))
    return {"bbox": None, "required_features": [], "optional_features": []}


try:
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    from .osm_xml import (
        ALL_SCHEMA,
        NODE_SCHEMA,
        RELATION_SCHEMA,
        WAY_SCHEMA,
        to_unified,
    )

    class _BlobPartition(InputPartition):
        def __init__(self, ref: BlobRef):
            self.ref = ref

    class OsmPbfReader(DataSourceReader):
        def __init__(self, options):
            self.paths = options["path"].split(",")
            self.element = options.get("element", "node")

        def partitions(self):
            # real partition plan: one task per ~8k-element blob
            return [
                _BlobPartition(r)
                for p in self.paths
                for r in scan_blob_index(p)
                if r.blob_type == "OSMData"
            ]

        def read(self, partition):
            decoded = decode_blob(partition.ref)
            if self.element == "all":
                # single-decode bulk-ingest path: every element type
                # from one pass over the blobs
                for kind in ("node", "way", "relation"):
                    for row in decoded[kind]:
                        yield to_unified(kind, row)
            else:
                yield from decoded[self.element]

    class OsmPbfDataSource(DataSource):
        """spark.read.format("osmpbf").option("element", "way").load(f)"""

        @classmethod
        def name(cls):
            return "osmpbf"

        def schema(self):
            element = self.options.get("element", "node")
            return {
                "node": NODE_SCHEMA,
                "way": WAY_SCHEMA,
                "relation": RELATION_SCHEMA,
                "all": ALL_SCHEMA,
            }[element]

        def reader(self, schema):
            return OsmPbfReader(self.options)

    def register(spark) -> None:
        spark.dataSource.register(OsmPbfDataSource)

except ImportError:  # pragma: no cover

    def register(spark) -> None:
        raise NotImplementedError("Python DataSource API requires pyspark>=4")
