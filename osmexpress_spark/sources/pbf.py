"""PBF source/sink scaffolding (operators S1/S5) — import-gated.

The reference's native format is `.osm.pbf` read/written through
libosmium (`/root/reference/src/expand.cpp:273-295`,
`src/extract.cpp:280-426`). PBF is a length-prefixed sequence of
independently-compressed Blobs (~8k elements each), which makes it
block-splittable: the natural Spark mapping is one input partition per
blob range.

Neither protobuf nor osmium is installed in this environment, so the
decode step is STUBBED: `scan_blob_index` (pure stdlib: the BlobHeader
length framing is just big-endian int32 + protobuf varint fields we
can skip without a schema) is real and gives the partition plan;
`decode_blob` raises unless a codec is importable. The DataSource
registers and plans; reading raises NotImplementedError with guidance.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass


def _codec():
    try:
        import osmium  # noqa: F401

        return "osmium"
    except ImportError:
        return None


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
    a tiny BlobHeader message) without a protobuf runtime. We only need
    two fields of BlobHeader: type (field 1, length-delimited) and
    datasize (field 3, varint) — hand-decoded below.
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
    """Minimal protobuf wire-format walk of BlobHeader
    (type: field 1 string, indexdata: field 2 bytes, datasize: field 3
    varint)."""
    i = 0
    btype, datasize = "", 0

    def varint():
        nonlocal i
        out = shift = 0
        while True:
            b = buf[i]
            i += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    while i < len(buf):
        key = varint()
        field, wire = key >> 3, key & 7
        if wire == 2:  # length-delimited
            ln = varint()
            if field == 1:
                btype = buf[i : i + ln].decode()
            i += ln
        elif wire == 0:
            v = varint()
            if field == 3:
                datasize = v
        else:  # pragma: no cover - not used by BlobHeader
            raise ValueError(f"unexpected wire type {wire}")
    return btype, datasize


def decode_blob(ref: BlobRef) -> list[tuple]:
    """Blob -> element rows. Requires an OSM codec; stubbed here."""
    codec = _codec()
    if codec is None:
        raise NotImplementedError(
            "PBF blob decode needs the 'osmium' (pyosmium) package, which "
            "is not installed in this environment. The partition planning "
            "(scan_blob_index) is functional; install pyosmium or convert "
            "via 'osmium cat file.osm.pbf -o file.osm' and use the osmxml "
            "source / parquet layout instead."
        )
    raise NotImplementedError("codec wiring pending")  # pragma: no cover


try:
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _BlobPartition(InputPartition):
        def __init__(self, ref: BlobRef):
            self.ref = ref

    class OsmPbfReader(DataSourceReader):
        def __init__(self, options):
            self.path = options["path"]

        def partitions(self):
            # real partition plan: one task per ~8k-element blob
            return [
                _BlobPartition(r)
                for r in scan_blob_index(self.path)
                if r.blob_type == "OSMData"
            ]

        def read(self, partition):
            yield from decode_blob(partition.ref)

    class OsmPbfDataSource(DataSource):
        """spark.read.format("osmpbf").load(path) — registers and plans;
        decode is import-gated (see module docstring)."""

        @classmethod
        def name(cls):
            return "osmpbf"

        def schema(self):
            from .osm_xml import NODE_SCHEMA

            return NODE_SCHEMA

        def reader(self, schema):
            return OsmPbfReader(self.options)

    def register(spark) -> None:
        spark.dataSource.register(OsmPbfDataSource)

except ImportError:  # pragma: no cover

    def register(spark) -> None:
        raise NotImplementedError("Python DataSource API requires pyspark>=4")
