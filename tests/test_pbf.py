"""PBF codec + DataSource + sink: byte-level round trips of the
pure-stdlib OSMPBF wire codec (sources/pbf_codec.py) and the
extract -> write_pbf -> osmpbf-source -> same-content loop (the
round-trip design the reference relies on, SURVEY.md §5)."""

from __future__ import annotations

import pytest

from osmexpress_spark import testing
from osmexpress_spark.api import Dataset
from osmexpress_spark.sources import pbf, pbf_codec, sink
from osmexpress_spark.spatial import Region

NODES = [
    # (id, lon_i, lat_i, version, tags, ts, changeset, uid, user)
    (1, 100_000_001, -55_000_000, 2, {"amenity": "cafe"},
     "2024-01-02T03:04:05Z", 7, 3, "bob"),
    (2, -1_800_000_000, 900_000_000, 1, {}, None, 0, 0, ""),
    (99, 0, 0, 1, {"name": "zero", "note": "München ✓"},
     "2020-06-01T00:00:00Z", 123456789, 42, "umlaut-üser"),
]
WAYS = [
    (10, [1, 2, 99], 1, {"highway": "residential"},
     "2024-01-02T03:04:05Z", 7, 3, "bob"),
    (11, [99, 1], 3, {}, None, 0, 0, ""),
]
RELATIONS = [
    (20, [(10, "way", "outer"), (1, "node", ""), (21, "relation", "sub")],
     1, {"type": "multipolygon"}, "2024-01-02T03:04:05Z", 7, 3, "bob"),
    (21, [], 1, {}, None, 0, 0, ""),
]


def _roundtrip(kind, rows):
    frame = next(pbf_codec.iter_blob_frames(kind, iter(rows)))
    # re-walk the frame as a file would be walked
    import struct

    (hlen,) = struct.unpack(">i", frame[:4])
    blob = frame[4 + hlen :]
    payload = pbf_codec.decode_blob(blob)
    return pbf_codec.decode_primitive_block(payload)[kind]


def test_codec_nodes_roundtrip():
    got = _roundtrip("node", NODES)
    assert got == NODES


def test_codec_ways_roundtrip():
    got = _roundtrip("way", WAYS)
    assert got == WAYS


def test_codec_relations_roundtrip():
    got = _roundtrip("relation", RELATIONS)
    assert got == RELATIONS


def test_codec_block_splitting():
    rows = [
        (i, i * 10, -i * 10, 1, {}, None, 0, 0, "") for i in range(1, 25)
    ]
    frames = list(pbf_codec.iter_blob_frames("node", iter(rows), block_size=10))
    assert len(frames) == 3  # 10 + 10 + 4


def test_codec_header_block_roundtrip():
    hdr = pbf_codec.encode_header_block(
        bbox=(-1_800_000_000, -900_000_000, 1_800_000_000, 900_000_000)
    )
    got = pbf_codec.decode_header_block(hdr)
    assert got["bbox"] == (
        -1_800_000_000, -900_000_000, 1_800_000_000, 900_000_000
    )
    assert "OsmSchema-V0.6" in got["required_features"]
    assert "DenseNodes" in got["required_features"]


def test_codec_nondense_node_decode():
    """Our writer emits DenseNodes, but readers must accept the plain
    Node message too (both are legal per spec)."""
    st = pbf_codec._StringTable()
    k, v = st.sid("shop"), st.sid("bakery")
    node = bytearray()
    pbf_codec._put_varint(node, 1, pbf_codec._zz_enc(-5))  # id sint64
    pbf_codec._put_bytes(node, 2, pbf_codec._packed([k]))
    pbf_codec._put_bytes(node, 3, pbf_codec._packed([v]))
    pbf_codec._put_varint(node, 8, pbf_codec._zz_enc(-55_000_000 * 100 // 100))
    pbf_codec._put_varint(node, 9, pbf_codec._zz_enc(100_000_001))
    group = bytearray()
    pbf_codec._put_bytes(group, 1, bytes(node))
    block = bytearray()
    pbf_codec._put_bytes(block, 1, st.encode())
    pbf_codec._put_bytes(block, 2, bytes(group))
    got = pbf_codec.decode_primitive_block(bytes(block))["node"]
    assert got == [(-5, 100_000_001, -55_000_000, 1, {"shop": "bakery"},
                    None, 0, 0, "")]


def _write_fixture_pbf(spark, tmp_path):
    ds_path = str(tmp_path / "ds")
    testing.write_fixture_dataset(spark, ds_path, n_nodes=300, seed=21)
    ds = Dataset(spark, ds_path)
    res = ds.extract(Region("-90,-180,90,180", "bbox"))
    out = str(tmp_path / "extract.osm.pbf")
    sink.write_pbf(res, out, block_size=64, partitions=4)
    return res, out


@pytest.mark.slow
def test_pbf_sink_source_roundtrip(spark, tmp_path):
    res, out = _write_fixture_pbf(spark, tmp_path)
    pbf.register(spark)
    nodes = spark.read.format("osmpbf").option("element", "node").load(out)
    ways = spark.read.format("osmpbf").option("element", "way").load(out)
    rels = spark.read.format("osmpbf").option("element", "relation").load(out)

    assert nodes.count() == res.locations.count()
    assert {r.id for r in ways.collect()} == {
        r.id for r in res.way_ids.collect()
    }
    assert {r.id for r in rels.collect()} == {
        r.id for r in res.relation_ids.collect()
    }
    # coordinates survive exactly (scaled-int codec, no float drift)
    want = {(r.id, r.lon, r.lat) for r in res.locations.collect()}
    got = {(r.id, r.lon, r.lat) for r in nodes.collect()}
    assert got == want
    # way node order is load-bearing (examples/way_wkt.cpp:37-42)
    want_w = {r.id: list(r.nodes) for r in res.ways.collect()}
    got_w = {r.id: list(r.nodes) for r in ways.collect()}
    assert got_w == want_w
    # tags survive
    want_t = {r.id: dict(r.tags) for r in res.nodes.collect()}
    got_t = {r.id: dict(r.tags) for r in nodes.collect() if r.tags}
    assert got_t == want_t


@pytest.mark.slow
def test_pbf_partition_plan_is_per_blob(spark, tmp_path):
    _, out = _write_fixture_pbf(spark, tmp_path)
    data_blobs = [
        b for b in pbf.scan_blob_index(out) if b.blob_type == "OSMData"
    ]
    assert len(data_blobs) >= 3  # 300 nodes / block_size 64 alone gives 5
    pbf.register(spark)
    nodes = spark.read.format("osmpbf").option("element", "node").load(out)
    # one Spark input partition per blob
    assert nodes.rdd.getNumPartitions() == len(data_blobs)


@pytest.mark.slow
def test_pbf_header_bbox(spark, tmp_path):
    res, out = _write_fixture_pbf(spark, tmp_path)
    hdr = pbf.read_header(out)
    lo = res.locations.selectExpr(
        "min(lon)", "min(lat)", "max(lon)", "max(lat)"
    ).collect()[0]
    assert hdr["bbox"] == (lo[0], lo[1], lo[2], lo[3])


# --- property-based codec round trip (hypothesis) -------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_tag_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30
)
_ts = st.one_of(
    st.none(),
    # epoch 0 excluded: wire value 0 means "unset" (protobuf default —
    # DenseInfo's packed arrays have no per-row presence)
    st.integers(min_value=1, max_value=4_000_000_000).map(
        lambda s: __import__("datetime")
        .datetime.fromtimestamp(s, tz=__import__("datetime").timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ")
    ),
)
_meta = st.tuples(
    st.integers(min_value=1, max_value=1 << 30),  # version
    _ts,
    st.integers(min_value=0, max_value=1 << 40),  # changeset
    st.integers(min_value=0, max_value=1 << 31),  # uid
    _tag_text,  # user
)
_tags = st.dictionaries(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=1, max_size=20,
    ),
    _tag_text,
    max_size=5,
)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(1 << 62), max_value=1 << 62),
            st.integers(min_value=-1_800_000_000, max_value=1_800_000_000),
            st.integers(min_value=-900_000_000, max_value=900_000_000),
            _tags,
            _meta,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_codec_node_property_roundtrip(raw):
    rows = [
        (nid, lon, lat, m[0], tags, m[1], m[2], m[3], m[4])
        for nid, lon, lat, tags, m in raw
    ]
    assert _roundtrip("node", rows) == rows


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1 << 62),
            st.lists(
                st.integers(min_value=-(1 << 62), max_value=1 << 62),
                max_size=10,
            ),
            _tags,
            _meta,
        ),
        min_size=1,
        max_size=10,
    )
)
@pytest.mark.slow
def test_codec_way_property_roundtrip(raw):
    rows = [
        (wid, refs, m[0], tags, m[1], m[2], m[3], m[4])
        for wid, refs, tags, m in raw
    ]
    assert _roundtrip("way", rows) == rows


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1 << 62),
            st.lists(
                st.tuples(
                    st.integers(min_value=-(1 << 62), max_value=1 << 62),
                    st.sampled_from(["node", "way", "relation"]),
                    _tag_text,
                ),
                max_size=6,
            ),
            _tags,
            _meta,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_codec_relation_property_roundtrip(raw):
    rows = [
        (rid, members, m[0], tags, m[1], m[2], m[3], m[4])
        for rid, members, tags, m in raw
    ]
    assert _roundtrip("relation", rows) == rows


@pytest.mark.slow
def test_pbf_sink_user_data_false_drops_gdpr_fields(spark, tmp_path):
    """--noUserData parity (src/extract.cpp:73,111): changeset/uid/user
    are zeroed at the projection before encode; everything else
    round-trips unchanged."""
    ds_path = str(tmp_path / "ds")
    testing.write_fixture_dataset(spark, ds_path, n_nodes=200, seed=11)
    ds = Dataset(spark, ds_path)
    res = ds.extract(Region("-90,-180,90,180", "bbox"))
    out = str(tmp_path / "gdpr.osm.pbf")
    sink.write_pbf(res, out, block_size=64, partitions=2, user_data=False)
    pbf.register(spark)
    for element in ("node", "way", "relation"):
        rows = (
            spark.read.format("osmpbf").option("element", element).load(out)
        ).collect()
        assert rows
        for r in rows:
            if "changeset" in r.__fields__:
                assert (r.changeset or 0) == 0 and (r.uid or 0) == 0
                assert (r.user or "") == ""
    # ids/coords unaffected
    nodes = spark.read.format("osmpbf").option("element", "node").load(out)
    assert nodes.count() == res.locations.count()


def test_header_bbox_odd_nanodegrees_round_to_nearest():
    # third-party PBFs may carry bbox nanodegrees that aren't multiples
    # of 100; decoding must round-to-nearest like node coords, not
    # floor toward -inf
    from osmexpress_spark.sources.pbf_codec import (
        _put_bytes, _put_varint, _zz_enc, decode_header_block,
    )

    bb = bytearray()
    # (left, right, top, bottom) nanodeg: +....49 rounds down,
    # +....51 rounds up, and negatives mirror (-...51 rounds down)
    _put_varint(bb, 1, _zz_enc(1_000_000_049))
    _put_varint(bb, 2, _zz_enc(1_000_000_051))
    _put_varint(bb, 3, _zz_enc(-1_000_000_049))
    _put_varint(bb, 4, _zz_enc(-1_000_000_051))
    hdr = bytearray()
    _put_bytes(hdr, 1, bytes(bb))
    out = decode_header_block(bytes(hdr))
    left, bottom, right, top = out["bbox"]
    assert left == 10_000_000
    assert right == 10_000_001
    assert top == -10_000_000
    assert bottom == -10_000_001
