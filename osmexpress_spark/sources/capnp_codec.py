"""Minimal Cap'n Proto codec for the reference's element messages.

The reference serializes each OSM element into LMDB as a standard
Cap'n Proto message (segment table + segments — written through
``capnp::writeMessage`` into a ``kj::VectorOutputStream`` and read
back with ``FlatArrayMessageReader``/``from_bytes``,
`/root/reference/src/storage.cpp:71-78`,
`/root/reference/python/osmx/osmx.py:76-98`).  The schema is fixed and
tiny (`/root/reference/include/osmx/messages.capnp:11-38`):

    Metadata { version u32 @0; timestamp u64 @1; changeset u32 @2;
               uid u32 @3; user Text @4 }
    Node     { tags List(Text) @0; metadata Metadata @1 }
    Way      { nodes List(UInt64) @0; tags List(Text) @1;
               metadata Metadata @2 }
    RelationMember { ref u64 @0; type enum(node,way,relation) @1;
                     role Text @2 }
    Relation { tags List(Text) @0; members List(RelationMember) @1;
               metadata Metadata @2 }

Wire-format facts are public knowledge from the Cap'n Proto encoding
spec (capnproto.org/encoding.html): 8-byte words, little-endian;
struct pointers carry (offset, data words, pointer words); list
pointers carry (offset, element-size code, count); Text is a byte
list with a NUL terminator; composite lists start with a tag word;
far pointers (kind 2) indirect into another segment.  Field offsets
follow capnp's hole-filling layout: Metadata packs version@0-3,
changeset@4-7, timestamp@8-15, uid@16-19 (3 data words, 1 pointer),
RelationMember packs ref@0-7, type@8-9 (2 data words, 1 pointer).

The encoder emits canonical single-segment messages; the decoder
accepts any valid message (multi-segment, far pointers, short
structs reading as defaults), so artifacts produced by the
reference's capnp runtime decode identically — property-tested
against a pure-Python model in tests/test_lmdb_kv.py.
"""

from __future__ import annotations

import struct

MEMBER_TYPES = ("node", "way", "relation")


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


class _Msg:
    def __init__(self, data: bytes):
        n_minus_1 = struct.unpack_from("<I", data, 0)[0]
        n = n_minus_1 + 1
        sizes = struct.unpack_from(f"<{n}I", data, 4)
        off = 4 + 4 * n
        off = (off + 7) & ~7  # pad segment table to a word
        self.segs = []
        for s in sizes:
            self.segs.append(data[off: off + 8 * s])
            off += 8 * s

    def word(self, seg: int, idx: int) -> int:
        return struct.unpack_from("<Q", self.segs[seg], idx * 8)[0]

    def deref(self, seg: int, idx: int):
        """Resolve a pointer word -> (kind, seg, content_idx, a, b) with
        far pointers followed; kind is 0 struct / 1 list; returns None
        for a null pointer."""
        w = self.word(seg, idx)
        if w == 0:
            return None
        kind = w & 3
        if kind == 2:  # far pointer
            two_word = (w >> 2) & 1
            pad_idx = (w >> 3) & 0x1FFFFFFF
            tseg = (w >> 32) & 0xFFFFFFFF
            if not two_word:
                return self.deref(tseg, pad_idx)
            # double-far: pad word 0 is a far pointer to the content,
            # pad word 1 is the tag with offset 0
            landing = self.word(tseg, pad_idx)
            cseg = (landing >> 32) & 0xFFFFFFFF
            cidx = (landing >> 3) & 0x1FFFFFFF
            tag = self.word(tseg, pad_idx + 1)
            kind = tag & 3
            return kind, cseg, cidx, (tag >> 32) & 0xFFFFFFFF, tag >> 32
        offset = (w >> 2) & 0x3FFFFFFF
        if offset & 0x20000000:  # sign-extend 30-bit
            offset -= 0x40000000
        content = idx + 1 + offset
        return kind, seg, content, (w >> 32) & 0xFFFFFFFF, w >> 32

    def struct_at(self, seg: int, idx: int):
        """Pointer word at (seg, idx) -> (seg, data_idx, dwords, pwords)
        or None."""
        r = self.deref(seg, idx)
        if r is None:
            return None
        kind, cseg, cidx, _, meta = r
        if kind != 0:
            raise ValueError("expected struct pointer")
        dwords = meta & 0xFFFF
        pwords = (meta >> 16) & 0xFFFF
        return cseg, cidx, dwords, pwords

    def list_at(self, seg: int, idx: int):
        """Pointer word at (seg, idx) -> (seg, content_idx, elem_code,
        count) or None; composite lists return the tag-resolved
        (count, dwords, pwords) via elem_code 7."""
        r = self.deref(seg, idx)
        if r is None:
            return None
        kind, cseg, cidx, _, meta = r
        if kind != 1:
            raise ValueError("expected list pointer")
        code = meta & 7
        count = (meta >> 3) & 0x1FFFFFFF
        return cseg, cidx, code, count

    # typed readers ------------------------------------------------------

    def read_data(self, seg, data_idx, dwords, fmt, byte_off, default=0):
        if byte_off + struct.calcsize(fmt) > dwords * 8:
            return default  # short struct: field reads as default
        return struct.unpack_from(fmt, self.segs[seg], data_idx * 8 + byte_off)[0]

    def read_text(self, seg, ptr_idx) -> str | None:
        lst = self.list_at(seg, ptr_idx)
        if lst is None:
            return None
        cseg, cidx, code, count = lst
        if code != 2:
            raise ValueError("Text must be a byte list")
        raw = self.segs[cseg][cidx * 8: cidx * 8 + count]
        return raw[:-1].decode("utf-8") if count else ""

    def read_text_list(self, seg, ptr_idx) -> list[str]:
        lst = self.list_at(seg, ptr_idx)
        if lst is None:
            return []
        cseg, cidx, code, count = lst
        if code != 6:
            raise ValueError("List(Text) must be a pointer list")
        return [self.read_text(cseg, cidx + i) or "" for i in range(count)]

    def read_u64_list(self, seg, ptr_idx) -> list[int]:
        lst = self.list_at(seg, ptr_idx)
        if lst is None:
            return []
        cseg, cidx, code, count = lst
        if code != 5:
            raise ValueError("List(UInt64) must be 8-byte elements")
        return list(struct.unpack_from(f"<{count}Q", self.segs[cseg], cidx * 8))


def _decode_metadata(m: _Msg, seg, ptr_idx):
    st = m.struct_at(seg, ptr_idx)
    if st is None:
        return None
    cseg, didx, dw, pw = st
    return {
        "version": m.read_data(cseg, didx, dw, "<I", 0),
        "timestamp": m.read_data(cseg, didx, dw, "<Q", 8),
        "changeset": m.read_data(cseg, didx, dw, "<I", 4),
        "uid": m.read_data(cseg, didx, dw, "<I", 16),
        "user": m.read_text(cseg, didx + dw) if pw >= 1 else None,
    }


def decode_node(data: bytes):
    """-> (tags_kv, metadata|None); tags_kv is the interleaved
    [k0,v0,k1,v1,...] list exactly as stored (util.h:28-40)."""
    m = _Msg(data)
    st = m.struct_at(0, 0)
    if st is None:
        return [], None
    seg, didx, dw, pw = st
    pbase = didx + dw
    tags = m.read_text_list(seg, pbase) if pw >= 1 else []
    meta = _decode_metadata(m, seg, pbase + 1) if pw >= 2 else None
    return tags, meta


def decode_way(data: bytes):
    """-> (node_refs, tags_kv, metadata|None)."""
    m = _Msg(data)
    st = m.struct_at(0, 0)
    if st is None:
        return [], [], None
    seg, didx, dw, pw = st
    pbase = didx + dw
    refs = m.read_u64_list(seg, pbase) if pw >= 1 else []
    tags = m.read_text_list(seg, pbase + 1) if pw >= 2 else []
    meta = _decode_metadata(m, seg, pbase + 2) if pw >= 3 else None
    return refs, tags, meta


def decode_relation(data: bytes):
    """-> (members, tags_kv, metadata|None); members are
    (ref, type_str, role) with the enum mapped through MEMBER_TYPES
    (messages.capnp:27-31)."""
    m = _Msg(data)
    st = m.struct_at(0, 0)
    if st is None:
        return [], [], None
    seg, didx, dw, pw = st
    pbase = didx + dw
    tags = m.read_text_list(seg, pbase) if pw >= 1 else []
    members = []
    if pw >= 2:
        lst = m.list_at(seg, pbase + 1)
        if lst is not None:
            cseg, cidx, code, count = lst
            if code != 7:
                raise ValueError("List(RelationMember) must be composite")
            tag = m.word(cseg, cidx)
            n = (tag >> 2) & 0x3FFFFFFF
            dw_e = (tag >> 32) & 0xFFFF
            pw_e = (tag >> 48) & 0xFFFF
            stride = dw_e + pw_e
            base = cidx + 1
            for i in range(n):
                didx_e = base + i * stride
                ref = m.read_data(cseg, didx_e, dw_e, "<Q", 0)
                mtype = m.read_data(cseg, didx_e, dw_e, "<H", 8)
                role = (
                    m.read_text(cseg, didx_e + dw_e) if pw_e >= 1 else None
                )
                members.append(
                    (ref, MEMBER_TYPES[mtype] if mtype < 3 else str(mtype),
                     role or "")
                )
    meta = _decode_metadata(m, seg, pbase + 2) if pw >= 3 else None
    return members, tags, meta


# --------------------------------------------------------------------------
# encoder (canonical single-segment messages)
# --------------------------------------------------------------------------


class _Builder:
    def __init__(self):
        self.words = bytearray()

    def alloc(self, n_words: int) -> int:
        idx = len(self.words) // 8
        self.words += b"\0" * (8 * n_words)
        return idx

    def put_word(self, idx: int, value: int) -> None:
        struct.pack_into("<Q", self.words, idx * 8, value)

    def struct_ptr(self, at: int, to: int, dwords: int, pwords: int) -> None:
        off = to - at - 1
        self.put_word(
            at, ((off & 0x3FFFFFFF) << 2) | (dwords << 32) | (pwords << 48)
        )

    def list_ptr(self, at: int, to: int, code: int, count: int) -> None:
        off = to - at - 1
        self.put_word(
            at, 1 | ((off & 0x3FFFFFFF) << 2) | (code << 32) | (count << 35)
        )

    def write_text(self, at: int, s: str | None) -> None:
        if s is None:
            return
        raw = s.encode("utf-8") + b"\0"
        idx = self.alloc((len(raw) + 7) // 8)
        self.words[idx * 8: idx * 8 + len(raw)] = raw
        self.list_ptr(at, idx, 2, len(raw))

    def write_text_list(self, at: int, items: list[str]) -> None:
        if not items:
            return
        base = self.alloc(len(items))
        self.list_ptr(at, base, 6, len(items))
        for i, s in enumerate(items):
            self.write_text(base + i, s)

    def write_u64_list(self, at: int, items: list[int]) -> None:
        if not items:
            return
        base = self.alloc(len(items))
        self.list_ptr(at, base, 5, len(items))
        for i, v in enumerate(items):
            self.put_word(base + i, v)

    def write_metadata(self, at: int, meta: dict | None) -> None:
        if meta is None:
            return
        didx = self.alloc(4)  # 3 data words + 1 pointer word
        self.struct_ptr(at, didx, 3, 1)
        struct.pack_into(
            "<IIQI", self.words, didx * 8,
            meta.get("version") or 0, meta.get("changeset") or 0,
            meta.get("timestamp") or 0, meta.get("uid") or 0,
        )
        self.write_text(didx + 3, meta.get("user"))

    def message(self) -> bytes:
        n_words = len(self.words) // 8
        return struct.pack("<II", 0, n_words) + bytes(self.words)


def encode_node(tags_kv: list[str], meta: dict | None) -> bytes:
    b = _Builder()
    root_ptr = b.alloc(1)
    didx = b.alloc(2)  # 0 data words + 2 pointers
    b.struct_ptr(root_ptr, didx, 0, 2)
    b.write_text_list(didx, tags_kv or [])
    b.write_metadata(didx + 1, meta)
    return b.message()


def encode_way(refs: list[int], tags_kv: list[str], meta: dict | None) -> bytes:
    b = _Builder()
    root_ptr = b.alloc(1)
    didx = b.alloc(3)
    b.struct_ptr(root_ptr, didx, 0, 3)
    b.write_u64_list(didx, refs or [])
    b.write_text_list(didx + 1, tags_kv or [])
    b.write_metadata(didx + 2, meta)
    return b.message()


def encode_relation(members, tags_kv: list[str], meta: dict | None) -> bytes:
    """members: (ref, type_str, role) triples."""
    b = _Builder()
    root_ptr = b.alloc(1)
    didx = b.alloc(3)
    b.struct_ptr(root_ptr, didx, 0, 3)
    b.write_text_list(didx, tags_kv or [])
    if members:
        stride = 3  # 2 data words + 1 pointer word per RelationMember
        base = b.alloc(1 + stride * len(members))
        b.list_ptr(didx + 1, base, 7, stride * len(members))
        b.put_word(
            base,
            ((len(members) & 0x3FFFFFFF) << 2) | (2 << 32) | (1 << 48),
        )
        for i, (ref, type_str, role) in enumerate(members):
            e = base + 1 + i * stride
            b.put_word(e, ref)
            struct.pack_into(
                "<H", b.words, (e + 1) * 8, MEMBER_TYPES.index(type_str)
            )
            b.write_text(e + 2, role if role is not None else "")
    b.write_metadata(didx + 2, meta)
    return b.message()
