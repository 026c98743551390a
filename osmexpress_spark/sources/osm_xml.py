"""OSM XML source (operator S1, XML flavor) — a real, working PySpark
Python DataSource.

The reference ingests .osm.pbf / .osm XML through libosmium visitors
(`/root/reference/src/expand.cpp:273-295`); the XML flavor needs only
the stdlib parser, so this source is fully functional in this
environment (the PBF flavor lives in sources/pbf.py behind an
import gate).

Shape: `spark.dataSource.register(OsmXmlDataSource)` then
`spark.read.format("osmxml").option("element", "node").load(path)`.
One input partition per file (OSM XML isn't block-splittable the way
PBF is; for bulk loads convert to the parquet layout once and never
re-parse). Elements stream through ElementTree.iterparse — constant
memory per task.

Output schemas match schemas.py minus derived columns:
- node:     id, lon, lat, version, tags (map), timestamp, changeset, uid, user
- way:      id, nodes (array<long>), tags, version, ...
- relation: id, members (array<struct>), tags, version, ...
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

try:  # PySpark 4 Python DataSource API
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older pyspark
    HAVE_DATASOURCE_API = False
    DataSource = DataSourceReader = InputPartition = object  # type: ignore

NODE_SCHEMA = (
    "id long, lon int, lat int, version int, tags map<string,string>, "
    "timestamp string, changeset long, uid long, user string"
)
WAY_SCHEMA = (
    "id long, nodes array<long>, version int, tags map<string,string>, "
    "timestamp string, changeset long, uid long, user string"
)
RELATION_SCHEMA = (
    "id long, "
    "members array<struct<ref:long,type:string,role:string>>, version int, "
    "tags map<string,string>, timestamp string, changeset long, uid long, "
    "user string"
)
# element="all": every element type in one scan (single source decode —
# the bulk-ingest path; per-type columns are NULL where inapplicable)
ALL_SCHEMA = (
    "type string, id long, lon int, lat int, nodes array<long>, "
    "members array<struct<ref:long,type:string,role:string>>, version int, "
    "tags map<string,string>, timestamp string, changeset long, uid long, "
    "user string"
)


def to_unified(kind: str, row: tuple) -> tuple:
    """Per-element row tuple -> ALL_SCHEMA tuple."""
    if kind == "node":
        eid, lon, lat, *rest = row
        return (kind, eid, lon, lat, None, None, *rest)
    eid, payload, *rest = row
    if kind == "way":
        return (kind, eid, None, None, payload, None, *rest)
    return (kind, eid, None, None, None, payload, *rest)


def _common(el) -> tuple:
    return (
        int(el.get("version", "1")),
        {t.get("k"): t.get("v") for t in el.findall("tag")},
        el.get("timestamp"),
        int(el.get("changeset", "0")),
        int(el.get("uid", "0")),
        el.get("user", ""),
    )


def _row(el, element: str) -> tuple:
    if element == "node":
        return (
            int(el.get("id")),
            int(round(float(el.get("lon", "0")) * 1e7)),
            int(round(float(el.get("lat", "0")) * 1e7)),
            *_common(el),
        )
    if element == "way":
        return (
            int(el.get("id")),
            [int(nd.get("ref")) for nd in el.findall("nd")],
            *_common(el),
        )
    return (
        int(el.get("id")),
        [
            (int(m.get("ref")), m.get("type"), m.get("role", ""))
            for m in el.findall("member")
        ],
        *_common(el),
    )


def _open_stream(path: str):
    """Transparent .gz/.bz2 decompression, matching libosmium's
    extension sniffing (the reference accepts planet.osm.bz2 etc.)."""
    if path.endswith(".gz"):
        import gzip

        return gzip.open(path, "rb")
    if path.endswith(".bz2"):
        import bz2

        return bz2.open(path, "rb")
    return open(path, "rb")


def iter_elements(path: str, element: str) -> Iterator[tuple]:
    """Stream one element type from an .osm XML file (scaled-int coords,
    docs/MANUAL.md:140-142), optionally gzip/bz2-compressed.
    element="all" yields unified ALL_SCHEMA rows for every type in ONE
    parse — the bulk-ingest path."""
    wanted = (
        {"node", "way", "relation"} if element == "all" else {element}
    )
    with _open_stream(path) as f:
        for _, el in ET.iterparse(f):
            if el.tag not in wanted:
                continue
            row = _row(el, el.tag)
            yield to_unified(el.tag, row) if element == "all" else row
            el.clear()  # constant-memory streaming


if HAVE_DATASOURCE_API:

    class _FilePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class OsmXmlReader(DataSourceReader):
        def __init__(self, options):
            self.paths = options["path"].split(",")
            self.element = options.get("element", "node")

        def partitions(self):
            return [_FilePartition(p) for p in self.paths]

        def read(self, partition):
            yield from iter_elements(partition.path, self.element)

    class OsmXmlDataSource(DataSource):
        """spark.read.format("osmxml").option("element", "way").load(f)"""

        @classmethod
        def name(cls):
            return "osmxml"

        def schema(self):
            element = self.options.get("element", "node")
            return {
                "node": NODE_SCHEMA,
                "way": WAY_SCHEMA,
                "relation": RELATION_SCHEMA,
                "all": ALL_SCHEMA,
            }[element]

        def reader(self, schema):
            return OsmXmlReader(self.options)

    def register(spark) -> None:
        spark.dataSource.register(OsmXmlDataSource)

else:  # pragma: no cover

    def register(spark) -> None:
        raise NotImplementedError("Python DataSource API requires pyspark>=4")
