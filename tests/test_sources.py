"""Sources/sinks: osmxml DataSource round-trip, OSC parse, PBF blob
index framing, ordered XML sink."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from osmexpress_spark import testing
from osmexpress_spark.api import Dataset
from osmexpress_spark.sources import osc, osm_xml, pbf, sink
from osmexpress_spark.spatial import Region

OSM_XML = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6" generator="test">
  <node id="1" lon="10.0000001" lat="-5.5" version="2" changeset="7" uid="3" user="bob">
    <tag k="amenity" v="cafe"/>
  </node>
  <node id="2" lon="-180" lat="90" version="1"/>
  <way id="10" version="1">
    <nd ref="1"/><nd ref="2"/>
    <tag k="highway" v="residential"/>
  </way>
  <relation id="20" version="1">
    <member type="way" ref="10" role="outer"/>
    <member type="node" ref="1" role=""/>
    <tag k="type" v="multipolygon"/>
  </relation>
</osm>
"""


@pytest.fixture()
def xml_file(tmp_path):
    p = tmp_path / "mini.osm"
    p.write_text(OSM_XML)
    return str(p)


@pytest.mark.slow
def test_osmxml_datasource_reads_all_types(spark, xml_file):
    osm_xml.register(spark)
    nodes = spark.read.format("osmxml").option("element", "node").load(xml_file)
    got = {r.id: r for r in nodes.collect()}
    assert got[1].lon == 100_000_001 and got[1].lat == -55_000_000
    assert got[1].tags == {"amenity": "cafe"}
    assert got[2].lon == -1_800_000_000 and got[2].lat == 900_000_000
    ways = spark.read.format("osmxml").option("element", "way").load(xml_file)
    w = ways.collect()[0]
    assert w.id == 10 and list(w.nodes) == [1, 2]
    rels = spark.read.format("osmxml").option("element", "relation").load(xml_file)
    r = rels.collect()[0]
    assert [tuple(m) for m in r.members] == [(10, "way", "outer"), (1, "node", "")]


OSC_XML = """<?xml version="1.0" encoding="UTF-8"?>
<osmChange version="0.6">
  <create>
    <node id="100" lon="1.5" lat="2.5" version="1" timestamp="2024-01-01T00:00:00Z"/>
  </create>
  <modify>
    <way id="10" version="3"><nd ref="1"/><nd ref="3"/><tag k="x" v="y"/></way>
  </modify>
  <delete>
    <node id="2" version="2"/>
  </delete>
</osmChange>
"""


def test_osc_parse(spark, tmp_path):
    p = tmp_path / "diff.osc"
    p.write_text(OSC_XML)
    df = osc.read_osc(spark, str(p), seqnum=42)
    rows = {(r.type, r.id): r for r in df.collect()}
    assert rows[("node", 100)].action == "create"
    assert rows[("node", 100)].lon == 15_000_000
    assert rows[("way", 10)].action == "modify"
    assert list(rows[("way", 10)].nodes) == [1, 3]
    assert rows[("way", 10)].tags == {"x": "y"}
    assert rows[("node", 2)].action == "delete"
    assert not rows[("node", 2)].visible
    assert all(r.seqnum == 42 for r in df.collect())


def _encode_varint(v: int) -> bytes:
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        out += bytes([b7 | (0x80 if v else 0)])
        if not v:
            return out


def _fake_pbf(tmp_path):
    """Two framed blobs with hand-encoded BlobHeaders."""
    path = tmp_path / "fake.osm.pbf"
    data = b""
    for btype, payload in (("OSMHeader", b"h" * 10), ("OSMData", b"d" * 25)):
        tb = btype.encode()
        header = (
            bytes([0x0A]) + _encode_varint(len(tb)) + tb  # field 1: type
            + bytes([0x18]) + _encode_varint(len(payload))  # field 3: datasize
        )
        data += struct.pack(">i", len(header)) + header + payload
    path.write_bytes(data)
    return str(path)


def test_pbf_blob_index(tmp_path):
    path = _fake_pbf(tmp_path)
    blobs = pbf.scan_blob_index(path)
    assert [b.blob_type for b in blobs] == ["OSMHeader", "OSMData"]
    assert blobs[0].data_size == 10
    assert blobs[1].data_size == 25
    # offsets chain correctly
    assert blobs[1].header_offset == blobs[0].data_offset + blobs[0].data_size
    # the fake payload is not a protobuf Blob — a real decode lives in
    # tests/test_pbf.py; here we only assert the framing walk
    with pytest.raises(ValueError):
        pbf.decode_blob(blobs[1])


@pytest.mark.slow
def test_xml_sink_roundtrip(spark, tmp_path):
    """extract -> ordered XML -> osmxml source -> same id sets (the
    round-trip design the reference relies on, SURVEY.md §5)."""
    path = str(tmp_path / "ds")
    testing.write_fixture_dataset(spark, path, n_nodes=300, seed=21)
    ds = Dataset(spark, path)
    res = ds.extract(Region("-90,-180,90,180", "bbox"))
    out = str(tmp_path / "extract.osm")
    sink.write_xml(res, out)

    osm_xml.register(spark)
    nodes = spark.read.format("osmxml").option("element", "node").load(out)
    ways = spark.read.format("osmxml").option("element", "way").load(out)
    rels = spark.read.format("osmxml").option("element", "relation").load(out)
    assert nodes.count() == res.locations.count()
    assert {r.id for r in ways.collect()} == {r.id for r in res.way_ids.collect()}
    assert {r.id for r in rels.collect()} == {
        r.id for r in res.relation_ids.collect()
    }
    # ordering: ids ascending within each type (extract.cpp:304-421)
    ids = [r.id for r in nodes.collect()]
    assert ids == sorted(ids)
    lon0, lat0, lon1, lat1 = sink.header_bbox(res)
    assert lon0 <= lon1 and lat0 <= lat1


def test_way_tags_preserved_in_xml(spark, tmp_path, xml_file):
    """tags survive sink->source round trip."""
    osm_xml.register(spark)
    ways = spark.read.format("osmxml").option("element", "way").load(xml_file)
    assert ways.collect()[0].tags == {"highway": "residential"}


@pytest.mark.slow
def test_xml_source_reads_gz_and_bz2(spark, tmp_path):
    """libosmium extension parity: .osm.gz / .osm.bz2 decompress
    transparently through the XML source and the expand dispatcher."""
    import bz2 as bz2_mod
    import gzip as gzip_mod

    from osmexpress_spark.operators.expand import _fmt_for, unified_source

    xml = (
        '<osm version="0.6">'
        '<node id="1" lat="10.5" lon="20.25" version="2"><tag k="a" v="b"/></node>'
        '<node id="2" lat="-5.0" lon="3.5" version="1"/>'
        '<way id="7" version="1"><nd ref="1"/><nd ref="2"/></way>'
        "</osm>"
    ).encode()
    plain = tmp_path / "t.osm"
    plain.write_bytes(xml)
    (tmp_path / "t.osm.gz").write_bytes(gzip_mod.compress(xml))
    (tmp_path / "t.osm.bz2").write_bytes(bz2_mod.compress(xml))

    assert _fmt_for(str(tmp_path / "t.osm.gz")) == "osmxml"
    assert _fmt_for(str(tmp_path / "t.osm.bz2")) == "osmxml"

    base = sorted(map(tuple, unified_source(spark, str(plain)).collect()))
    for name in ("t.osm.gz", "t.osm.bz2"):
        got = sorted(map(tuple, unified_source(spark, str(tmp_path / name)).collect()))
        assert got == base and len(got) == 3


@pytest.mark.slow
def test_replication_header_metadata_flows_through_expand(spark, tmp_path):
    """Reference parity src/expand.cpp:283-287: the PBF header's osmosis
    replication timestamp/seqnum land in the dataset metadata, in the
    bootstrap-consumable shape (feedstate.bootstrap_seqnum reads
    `timestamp`/`seqnum`)."""
    from osmexpress_spark.api import Dataset
    from osmexpress_spark.operators.extract import extract
    from osmexpress_spark.sources import pbf, pbf_codec, sink
    from osmexpress_spark.spatial import Region
    from osmexpress_spark import testing as T

    fx = T.ensure_fixture_dataset(spark, str(tmp_path / "fx"), n_nodes=120, seed=11)
    res = extract(Dataset(spark, fx).tables(), Region("-90,-180,90,180", "bbox"))
    orig = str(tmp_path / "plain.pbf")
    sink.write_pbf(res, orig)

    # splice a replication-stamped header onto the original body
    idx = pbf.scan_blob_index(orig)
    assert idx[0].blob_type == "OSMHeader"
    body_start = idx[0].data_offset + idx[0].data_size
    stamped = str(tmp_path / "stamped.osm.pbf")
    header = pbf_codec.frame_blob(
        "OSMHeader",
        pbf_codec.encode_header_block(
            replication_timestamp=1700000000, replication_seqnum=424242
        ),
    )
    with open(orig, "rb") as f_in, open(stamped, "wb") as f_out:
        f_in.seek(body_start)
        f_out.write(header)
        f_out.write(f_in.read())

    hdr = pbf.read_header(stamped)
    assert hdr["osmosis_replication_timestamp"] == 1700000000
    assert hdr["osmosis_replication_sequence_number"] == 424242

    ds = Dataset.expand(spark, stamped, str(tmp_path / "ds"),
                        materialize_edges=False)
    meta = ds.metadata()
    assert meta["timestamp"] == "2023-11-14T22:13:20Z"
    assert meta["seqnum"] == 424242
    assert meta["import_filename"] == stamped
