"""Pure-stdlib OSM PBF wire codec (read + write).

The `.osm.pbf` format is public spec (https://wiki.openstreetmap.org/
wiki/PBF_Format): a sequence of [int32 BlobHeader length | BlobHeader |
Blob] frames, where each Blob holds a zlib-compressed `HeaderBlock` or
`PrimitiveBlock` protobuf message of ~8000 elements. The reference
reads/writes it through libosmium (`/root/reference/src/expand.cpp:
273-295`, `/root/reference/src/extract.cpp:280-426`); neither protobuf
nor osmium is installed here, so this module hand-rolls the protobuf
wire format (varint / zigzag / length-delimited / packed repeated) for
exactly the OSMPBF message set. No third-party imports.

Row shapes mirror sources/osm_xml.py so the two sources are drop-in
interchangeable:

- node:     (id, lon_i, lat_i, version, tags, timestamp, changeset, uid, user)
- way:      (id, refs, version, tags, timestamp, changeset, uid, user)
- relation: (id, members[(ref, type, role)], version, tags, timestamp,
             changeset, uid, user)

Coordinates are scaled int32 degrees*1e7 (the reference's storage
encoding, `/root/reference/docs/MANUAL.md:140-142`); PBF stores
nanodegrees = lat_offset + granularity * raw, so deg*1e7 = nanodeg/100
— exact for the default granularity of 100.
"""

from __future__ import annotations

import struct
import zlib
from datetime import datetime, timezone

MEMBER_TYPES = ("node", "way", "relation")
DEFAULT_BLOCK = 8000  # elements per PrimitiveBlock, matches osmium convention


# ---------------------------------------------------------------------------
# protobuf wire-format primitives
# ---------------------------------------------------------------------------


def _wrap64(v: int) -> int:
    """Wrap into signed int64 — deltas of values spanning > 2^63 must
    overflow exactly like the reference's int64 arithmetic does."""
    return ((v + (1 << 63)) % (1 << 64)) - (1 << 63)


def _zz_enc(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _zz_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _varint(out: bytearray, v: int) -> None:
    if v < 0:  # two's-complement 64-bit, 10 bytes
        v += 1 << 64
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _tag(out: bytearray, field: int, wire: int) -> None:
    _varint(out, (field << 3) | wire)


def _put_bytes(out: bytearray, field: int, payload: bytes) -> None:
    _tag(out, field, 2)
    _varint(out, len(payload))
    out += payload


def _put_varint(out: bytearray, field: int, v: int) -> None:
    _tag(out, field, 0)
    _varint(out, v)


def _packed(values, signed: bool = False, delta: bool = False) -> bytes:
    out = bytearray()
    prev = 0
    for v in values:
        if delta:
            v, prev = _wrap64(v - prev), v
        _varint(out, _zz_enc(v) if signed else v)
    return bytes(out)


class _Reader:
    """Cursor over one protobuf message's bytes."""

    __slots__ = ("buf", "i", "end")

    def __init__(self, buf: bytes, start: int = 0, end: int | None = None):
        self.buf = buf
        self.i = start
        self.end = len(buf) if end is None else end

    def varint(self) -> int:
        buf, i = self.buf, self.i
        out = shift = 0
        while True:
            b = buf[i]
            i += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                self.i = i
                if out >= 1 << 63:  # negative int64
                    out -= 1 << 64
                return out
            shift += 7

    def fields(self):
        """Yield (field_no, wire_type, value) where value is int for
        wire 0, bytes-(start,end) span for wire 2."""
        while self.i < self.end:
            key = self.varint()
            field, wire = key >> 3, key & 7
            if wire == 0:
                yield field, 0, self.varint()
            elif wire == 2:
                ln = self.varint()
                span = (self.i, self.i + ln)
                self.i += ln
                yield field, 2, span
            elif wire == 5:  # fixed32 (unused by OSMPBF, skip)
                self.i += 4
                yield field, 5, 0
            elif wire == 1:  # fixed64
                self.i += 8
                yield field, 1, 0
            else:
                raise ValueError(f"unsupported wire type {wire}")

    def span_bytes(self, span) -> bytes:
        return self.buf[span[0] : span[1]]


def _unpack(buf: bytes, span, signed: bool = False, delta: bool = False) -> list[int]:
    """Decode a packed repeated scalar field."""
    r = _Reader(buf, span[0], span[1])
    out = []
    prev = 0
    while r.i < r.end:
        v = r.varint()
        if v < 0:
            v += 1 << 64  # re-widen: packed values are unsigned on the wire
        if signed:
            v = _zz_dec(v)
        if delta:
            prev = _wrap64(prev + v)
            out.append(prev)
        else:
            out.append(v)
    return out


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_blob(buf: bytes) -> bytes:
    """Blob message -> raw payload (field 1 raw | field 3 zlib_data)."""
    r = _Reader(buf)
    for field, wire, val in r.fields():
        if field == 1 and wire == 2:
            return r.span_bytes(val)
        if field == 3 and wire == 2:
            return zlib.decompress(r.span_bytes(val))
    raise ValueError("Blob has no raw/zlib_data payload (unsupported codec)")


def decode_header_block(buf: bytes) -> dict:
    """HeaderBlock -> {bbox (deg*1e7 ints or None), required_features,
    optional_features, writingprogram}."""
    r = _Reader(buf)
    out = {
        "bbox": None,
        "required_features": [],
        "optional_features": [],
        "writingprogram": "",
    }
    for field, wire, val in r.fields():
        if field == 1 and wire == 2:  # HeaderBBox, nanodegrees sint64
            br = _Reader(r.buf, val[0], val[1])
            bb = {}
            for f2, w2, v2 in br.fields():
                if w2 == 0:
                    bb[f2] = _zz_dec(v2 + (1 << 64) if v2 < 0 else v2)
            # round-to-nearest like _BlockCtx.coord: third-party PBFs
            # whose bbox nanodegrees aren't multiples of 100 must not
            # bias toward -inf (floor) while node coords round
            def nano7(v: int) -> int:
                return v // 100 if v % 100 == 0 else round(v / 100)

            out["bbox"] = (
                nano7(bb.get(1, 0)),  # left
                nano7(bb.get(4, 0)),  # bottom
                nano7(bb.get(2, 0)),  # right
                nano7(bb.get(3, 0)),  # top
            )
        elif field == 4 and wire == 2:
            out["required_features"].append(r.span_bytes(val).decode())
        elif field == 5 and wire == 2:
            out["optional_features"].append(r.span_bytes(val).decode())
        elif field == 16 and wire == 2:
            out["writingprogram"] = r.span_bytes(val).decode()
        elif field == 32 and wire == 0:  # osmosis_replication_timestamp
            out["osmosis_replication_timestamp"] = val
        elif field == 33 and wire == 0:  # osmosis_replication_sequence_number
            out["osmosis_replication_sequence_number"] = val
        elif field == 34 and wire == 2:  # osmosis_replication_base_url
            out["osmosis_replication_base_url"] = r.span_bytes(val).decode()
    return out


def _iso(epoch_s: int) -> str:
    return datetime.fromtimestamp(epoch_s, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def _epoch(iso: str | None) -> int:
    if not iso:
        return 0
    return int(
        datetime.strptime(iso, "%Y-%m-%dT%H:%M:%SZ")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    )


class _BlockCtx:
    __slots__ = ("strings", "granularity", "lat_off", "lon_off", "date_gran")

    def __init__(self):
        self.strings: list[str] = []
        self.granularity = 100
        self.lat_off = 0
        self.lon_off = 0
        self.date_gran = 1000

    def coord(self, raw: int, off: int) -> int:
        nano = off + self.granularity * raw
        return nano // 100 if nano % 100 == 0 else round(nano / 100)

    def ts(self, raw: int) -> str | None:
        # 0 = unset (protobuf default; optional fields have no per-row
        # presence in DenseInfo's packed arrays)
        if not raw:
            return None
        return _iso(raw * self.date_gran // 1000)


def _decode_info(buf: bytes, span, ctx: _BlockCtx) -> tuple:
    """Info -> (version, timestamp_iso, changeset, uid, user)."""
    r = _Reader(buf, span[0], span[1])
    version, ts, changeset, uid, user = 1, None, 0, 0, ""
    for field, wire, val in r.fields():
        if wire != 0:
            continue
        if field == 1:
            version = val
        elif field == 2:
            ts = ctx.ts(val)
        elif field == 3:
            changeset = val
        elif field == 4:
            uid = val
        elif field == 5:
            user = ctx.strings[val] if val < len(ctx.strings) else ""
    return version, ts, changeset, uid, user


def _decode_dense(buf: bytes, span, ctx: _BlockCtx) -> list[tuple]:
    r = _Reader(buf, span[0], span[1])
    ids = lats = lons = kvs = []
    versions: list[int] = []
    timestamps: list[int] = []
    changesets: list[int] = []
    uids: list[int] = []
    user_sids: list[int] = []
    for field, wire, val in r.fields():
        if wire != 2:
            continue
        if field == 1:
            ids = _unpack(buf, val, signed=True, delta=True)
        elif field == 8:
            lats = _unpack(buf, val, signed=True, delta=True)
        elif field == 9:
            lons = _unpack(buf, val, signed=True, delta=True)
        elif field == 10:
            kvs = _unpack(buf, val)
        elif field == 5:  # DenseInfo
            ir = _Reader(buf, val[0], val[1])
            for f2, w2, v2 in ir.fields():
                if w2 != 2:
                    continue
                if f2 == 1:
                    versions = _unpack(buf, v2)
                elif f2 == 2:
                    timestamps = _unpack(buf, v2, signed=True, delta=True)
                elif f2 == 3:
                    changesets = _unpack(buf, v2, signed=True, delta=True)
                elif f2 == 4:
                    uids = _unpack(buf, v2, signed=True, delta=True)
                elif f2 == 5:
                    user_sids = _unpack(buf, v2, signed=True, delta=True)
    rows = []
    ki = 0
    st = ctx.strings
    for n, nid in enumerate(ids):
        tags: dict[str, str] = {}
        if kvs:
            while ki < len(kvs) and kvs[ki] != 0:
                tags[st[kvs[ki]]] = st[kvs[ki + 1]]
                ki += 2
            ki += 1  # the 0 separator
        rows.append(
            (
                nid,
                ctx.coord(lons[n], ctx.lon_off),
                ctx.coord(lats[n], ctx.lat_off),
                versions[n] if n < len(versions) else 1,
                tags,
                ctx.ts(timestamps[n]) if n < len(timestamps) else None,
                changesets[n] if n < len(changesets) else 0,
                uids[n] if n < len(uids) else 0,
                st[user_sids[n]] if n < len(user_sids) else "",
            )
        )
    return rows


def _decode_keys_vals(buf: bytes, r: _Reader, kv: dict, field: int, wire: int, val):
    if wire == 2:
        kv.setdefault(field, []).extend(_unpack(buf, val))
    elif wire == 0:
        kv.setdefault(field, []).append(val)


def _decode_element(buf: bytes, span, ctx: _BlockCtx, kind: str) -> tuple:
    """Non-dense Node / Way / Relation message -> row tuple."""
    r = _Reader(buf, span[0], span[1])
    eid = 0
    lat = lon = 0
    info = (1, None, 0, 0, "")
    packed: dict[int, list[int]] = {}
    for field, wire, val in r.fields():
        if field == 1 and wire == 0:
            eid = _zz_dec(val + (1 << 64) if val < 0 else val) if kind == "node" else val
        elif field == 4 and wire == 2:
            info = _decode_info(buf, val, ctx)
        elif kind == "node" and field == 8 and wire == 0:
            lat = _zz_dec(val + (1 << 64) if val < 0 else val)
        elif kind == "node" and field == 9 and wire == 0:
            lon = _zz_dec(val + (1 << 64) if val < 0 else val)
        elif field in (2, 3, 8, 9, 10):
            _decode_keys_vals(buf, r, packed, field, wire, val)
    st = ctx.strings
    tags = {
        st[k]: st[v]
        for k, v in zip(packed.get(2, []), packed.get(3, []))
    }
    if kind == "node":
        return (
            eid,
            ctx.coord(lon, ctx.lon_off),
            ctx.coord(lat, ctx.lat_off),
            info[0],
            tags,
            *info[1:],
        )
    if kind == "way":
        refs = _delta_signed(packed.get(8, []))
        return (eid, refs, info[0], tags, *info[1:])
    # relation
    roles = [st[s] for s in packed.get(8, [])]
    memids = _delta_signed(packed.get(9, []))
    types = [MEMBER_TYPES[t] for t in packed.get(10, [])]
    members = list(zip(memids, types, roles))
    return (eid, members, info[0], tags, *info[1:])


def _delta_signed(raw: list[int]) -> list[int]:
    out = []
    prev = 0
    for v in raw:
        prev = _wrap64(prev + _zz_dec(v))
        out.append(prev)
    return out


def decode_primitive_block(buf: bytes) -> dict[str, list[tuple]]:
    """PrimitiveBlock -> {'node': [...], 'way': [...], 'relation': [...]}"""
    r = _Reader(buf)
    ctx = _BlockCtx()
    groups = []
    for field, wire, val in r.fields():
        if field == 1 and wire == 2:  # StringTable
            sr = _Reader(buf, val[0], val[1])
            for f2, w2, v2 in sr.fields():
                if f2 == 1 and w2 == 2:
                    ctx.strings.append(sr.span_bytes(v2).decode("utf-8"))
        elif field == 2 and wire == 2:
            groups.append(val)
        elif field == 17 and wire == 0:
            ctx.granularity = val
        elif field == 18 and wire == 0:
            ctx.date_gran = val
        elif field == 19 and wire == 0:
            ctx.lat_off = val
        elif field == 20 and wire == 0:
            ctx.lon_off = val
    out: dict[str, list[tuple]] = {"node": [], "way": [], "relation": []}
    for span in groups:
        gr = _Reader(buf, span[0], span[1])
        for field, wire, val in gr.fields():
            if wire != 2:
                continue
            if field == 1:
                out["node"].append(_decode_element(buf, val, ctx, "node"))
            elif field == 2:
                out["node"].extend(_decode_dense(buf, val, ctx))
            elif field == 3:
                out["way"].append(_decode_element(buf, val, ctx, "way"))
            elif field == 4:
                out["relation"].append(_decode_element(buf, val, ctx, "relation"))
    return out


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


class _StringTable:
    """Index 0 is reserved (DenseNodes delimiter), per spec."""

    def __init__(self):
        self.index: dict[str, int] = {"": 0}
        self.strings: list[str] = [""]

    def sid(self, s: str) -> int:
        i = self.index.get(s)
        if i is None:
            i = len(self.strings)
            self.index[s] = i
            self.strings.append(s)
        return i

    def encode(self) -> bytes:
        out = bytearray()
        for s in self.strings:
            _put_bytes(out, 1, s.encode("utf-8"))
        return bytes(out)


def _encode_info(st: _StringTable, version, ts, changeset, uid, user) -> bytes:
    out = bytearray()
    _put_varint(out, 1, version or 1)
    if ts:
        _put_varint(out, 2, _epoch(ts))
    if changeset:
        _put_varint(out, 3, changeset)
    if uid:
        _put_varint(out, 4, uid)
    if user:
        _put_varint(out, 5, st.sid(user))
    return bytes(out)


def encode_nodes_block(rows: list[tuple]) -> bytes:
    """Node rows -> PrimitiveBlock bytes (DenseNodes encoding)."""
    st = _StringTable()
    ids, lats, lons, kvs = [], [], [], []
    versions, tss, csets, uids, usids = [], [], [], [], []
    for nid, lon_i, lat_i, version, tags, ts, cset, uid, user in rows:
        ids.append(nid)
        lons.append(lon_i)  # granularity 100: raw = nanodeg/100 = deg*1e7
        lats.append(lat_i)
        for k, v in (tags or {}).items():
            kvs.append(st.sid(k))
            kvs.append(st.sid(v))
        kvs.append(0)
        versions.append(version or 1)
        tss.append(_epoch(ts))
        csets.append(cset or 0)
        uids.append(uid or 0)
        usids.append(st.sid(user or ""))
    dinfo = bytearray()
    _put_bytes(dinfo, 1, _packed(versions))
    _put_bytes(dinfo, 2, _packed(tss, signed=True, delta=True))
    _put_bytes(dinfo, 3, _packed(csets, signed=True, delta=True))
    _put_bytes(dinfo, 4, _packed(uids, signed=True, delta=True))
    _put_bytes(dinfo, 5, _packed(usids, signed=True, delta=True))
    dense = bytearray()
    _put_bytes(dense, 1, _packed(ids, signed=True, delta=True))
    _put_bytes(dense, 5, bytes(dinfo))
    _put_bytes(dense, 8, _packed(lats, signed=True, delta=True))
    _put_bytes(dense, 9, _packed(lons, signed=True, delta=True))
    _put_bytes(dense, 10, _packed(kvs))
    group = bytearray()
    _put_bytes(group, 2, bytes(dense))
    return _finish_block(st, group)


def _encode_keys_vals(out: bytearray, st: _StringTable, tags) -> None:
    keys = [st.sid(k) for k in (tags or {})]
    vals = [st.sid(v) for v in (tags or {}).values()]
    if keys:
        _put_bytes(out, 2, _packed(keys))
        _put_bytes(out, 3, _packed(vals))


def encode_ways_block(rows: list[tuple]) -> bytes:
    st = _StringTable()
    group = bytearray()
    for wid, refs, version, tags, ts, cset, uid, user in rows:
        w = bytearray()
        _put_varint(w, 1, wid)
        _encode_keys_vals(w, st, tags)
        _put_bytes(w, 4, _encode_info(st, version, ts, cset, uid, user))
        _put_bytes(w, 8, _packed(list(refs or []), signed=True, delta=True))
        _put_bytes(group, 3, bytes(w))
    return _finish_block(st, group)


def encode_relations_block(rows: list[tuple]) -> bytes:
    st = _StringTable()
    group = bytearray()
    for rid, members, version, tags, ts, cset, uid, user in rows:
        rel = bytearray()
        _put_varint(rel, 1, rid)
        _encode_keys_vals(rel, st, tags)
        _put_bytes(rel, 4, _encode_info(st, version, ts, cset, uid, user))
        members = list(members or [])
        _put_bytes(rel, 8, _packed([st.sid(m[2] or "") for m in members]))
        _put_bytes(
            rel, 9, _packed([m[0] for m in members], signed=True, delta=True)
        )
        _put_bytes(
            rel, 10, _packed([MEMBER_TYPES.index(m[1]) for m in members])
        )
        _put_bytes(group, 4, bytes(rel))
    return _finish_block(st, group)


def _finish_block(st: _StringTable, group: bytearray) -> bytes:
    block = bytearray()
    _put_bytes(block, 1, st.encode())
    _put_bytes(block, 2, bytes(group))
    # defaults: granularity 100, date_granularity 1000, offsets 0
    return bytes(block)


def encode_header_block(
    bbox: tuple[int, int, int, int] | None = None,
    writingprogram: str = "osmexpress_spark",
    replication_timestamp: int | None = None,
    replication_seqnum: int | None = None,
) -> bytes:
    """bbox is (left, bottom, right, top) in deg*1e7 ints; replication
    fields are the osmosis header options the reference reads at expand
    time (src/expand.cpp:283-286)."""
    out = bytearray()
    if bbox is not None:
        bb = bytearray()
        left, bottom, right, top = (int(v) * 100 for v in bbox)  # nanodeg
        _put_varint(bb, 1, _zz_enc(left))
        _put_varint(bb, 2, _zz_enc(right))
        _put_varint(bb, 3, _zz_enc(top))
        _put_varint(bb, 4, _zz_enc(bottom))
        _put_bytes(out, 1, bytes(bb))
    for feat in ("OsmSchema-V0.6", "DenseNodes"):
        _put_bytes(out, 4, feat.encode())
    _put_bytes(out, 16, writingprogram.encode())
    if replication_timestamp is not None:
        _put_varint(out, 32, int(replication_timestamp))
    if replication_seqnum is not None:
        _put_varint(out, 33, int(replication_seqnum))
    return bytes(out)


def frame_blob(blob_type: str, payload: bytes) -> bytes:
    """payload -> zlib Blob -> [int32 len][BlobHeader][Blob] frame."""
    blob = bytearray()
    _put_varint(blob, 2, len(payload))  # raw_size
    _put_bytes(blob, 3, zlib.compress(payload, 6))
    header = bytearray()
    _put_bytes(header, 1, blob_type.encode())
    _put_varint(header, 3, len(blob))
    return struct.pack(">i", len(header)) + bytes(header) + bytes(blob)


ENCODERS = {
    "node": encode_nodes_block,
    "way": encode_ways_block,
    "relation": encode_relations_block,
}


def iter_blob_frames(kind: str, rows, block_size: int = DEFAULT_BLOCK):
    """Batch element rows into framed OSMData blobs — the map-side encode
    step of the distributed sink (heavy work stays on executors)."""
    enc = ENCODERS[kind]
    buf: list[tuple] = []
    for row in rows:
        buf.append(row)
        if len(buf) >= block_size:
            yield frame_blob("OSMData", enc(buf))
            buf = []
    if buf:
        yield frame_blob("OSMData", enc(buf))
