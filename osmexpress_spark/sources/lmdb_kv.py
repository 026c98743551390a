"""Pure-stdlib LMDB (0.9.x data format) reader + minimal bulk writer.

The reference's native artifact is an LMDB environment opened with
``MDB_NOSUBDIR`` (single file) holding up to 10 named sub-databases
(`/root/reference/src/storage.cpp:6-19`): ``metadata`` (string keys),
``locations``/``nodes``/``ways``/``relations`` (``MDB_INTEGERKEY``,
storage.cpp:43-44,79-80) and the ``cell_node``/``node_way``/
``node_relation``/``way_relation`` indexes (``MDB_INTEGERKEY |
MDB_DUPSORT | MDB_DUPFIXED | MDB_INTEGERDUP``, storage.cpp:126-128).
No ``lmdb`` binding exists in this environment, so this module speaks
the on-disk B-tree format directly — the same pure-stdlib-codec
approach as the repo's WebP/FLAC decoders, and like them it is
cross-validated in tests/test_lmdb_kv.py against the system
``liblmdb.so`` via ctypes (write ours -> read theirs, write theirs ->
read ours).

Format facts used here are public knowledge from the LMDB sources
(mdb.c / lmdb.h, OpenLDAP Public License):

- pages of ``psize`` bytes (psize persisted in meta ``mm_dbs[0].md_pad``);
  16-byte header: pgno u64, pad u16, flags u16, lower u16, upper u16
  (overflow pages reuse lower/upper as a u32 page count);
- meta pages 0 and 1, magic 0xBEEFC0DE, data version 1; readers take
  the meta with the larger txnid;
- branch/leaf nodes: lo u16, hi u16, flags u16, ksize u16, key bytes,
  data bytes; branch child pgno = lo | hi<<16 | flags<<32; leaf data
  size = lo | hi<<16; node offsets live in a u16 array after the page
  header (numkeys = (lower - 16) / 2);
- LEAF2 pages (DUPFIXED sub-trees) pack fixed-size keys back-to-back
  at offset 16 with no per-node headers;
- node flags: F_BIGDATA (data = u64 overflow pgno), F_DUPDATA (data =
  embedded sub-page), F_DUPDATA|F_SUBDATA (data = 48-byte MDB_db of a
  dup sub-tree); named-database entries in the main DB carry F_SUBDATA
  with a 48-byte MDB_db value;
- MDB_INTEGERKEY keys are native-endian u64 compared numerically (the
  file is arch-native, as with LMDB itself — little-endian here).

The writer is a single-pass bulk loader (sorted input -> packed leaf
pages -> branch levels -> metas), the shape of the reference's own
ordered bulk load (`src/expand.cpp` MDB_APPEND loop); it exists to
produce migration fixtures and test artifacts, not to be a live store
(the repo's SnapshotStore is the live store).
"""

from __future__ import annotations

import mmap
import os
import struct
from dataclasses import dataclass

PSIZE = 4096
PAGEHDRSZ = 16
MAGIC = 0xBEEFC0DE
DATA_VERSION = 1
P_INVALID = 0xFFFFFFFFFFFFFFFF

P_BRANCH = 0x01
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_META = 0x08
P_DIRTY = 0x10
P_LEAF2 = 0x20
P_SUBP = 0x40

F_BIGDATA = 0x01
F_SUBDATA = 0x02
F_DUPDATA = 0x04

MDB_REVERSEKEY = 0x02
MDB_DUPSORT = 0x04
MDB_INTEGERKEY = 0x08
MDB_DUPFIXED = 0x10
MDB_INTEGERDUP = 0x20

# me_nodemax for psize 4096: ((psize - PAGEHDRSZ) / MDB_MINKEYS) & -2,
# minus one indx_t — data larger than this goes to overflow pages
NODEMAX = (((PSIZE - PAGEHDRSZ) // 2) & ~1) - 2

_DB_STRUCT = struct.Struct("<IHHQQQQQ")  # pad, flags, depth, branch, leaf, ovf, entries, root


@dataclass
class Db:
    pad: int
    flags: int
    depth: int
    branch_pages: int
    leaf_pages: int
    overflow_pages: int
    entries: int
    root: int

    def pack(self) -> bytes:
        return _DB_STRUCT.pack(
            self.pad, self.flags, self.depth, self.branch_pages,
            self.leaf_pages, self.overflow_pages, self.entries, self.root,
        )

    @classmethod
    def unpack(cls, buf) -> "Db":
        return cls(*_DB_STRUCT.unpack(bytes(buf[:48])))


def _ikey(n: int) -> bytes:
    return int(n).to_bytes(8, "little")


def _from_ikey(b) -> int:
    return int.from_bytes(bytes(b), "little")


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------


class LmdbReader:
    """Read-only walker over a single-file (MDB_NOSUBDIR) environment.

    Mirrors the semantics of the reference's Python embedding
    (`/root/reference/python/osmx/osmx.py:16-46`): open read-only,
    named sub-databases on demand, integer point-gets and dup-value
    scans — re-expressed against the raw file so no lmdb binding is
    needed, and extended with `split_points` so a Spark job can fan
    the key space out across executors (each partition re-opens the
    file and walks only its range)."""

    def __init__(self, path: str):
        self.path = path
        f = open(path, "rb")
        self._f = f
        self._mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        best = None
        psize = PSIZE  # meta 0 is always at byte 0; its md_pad gives
        # the real page size, which locates meta 1
        for pg in (0, 1):
            base = pg * psize
            hdr = self._mm[base: base + PAGEHDRSZ]
            if len(hdr) < PAGEHDRSZ:
                continue
            flags = struct.unpack_from("<H", hdr, 10)[0]
            if not flags & P_META:
                continue
            off = base + PAGEHDRSZ
            magic, version = struct.unpack_from("<II", self._mm, off)
            if magic != MAGIC or version != DATA_VERSION:
                continue
            free_db = Db.unpack(self._mm[off + 24: off + 72])
            main_db = Db.unpack(self._mm[off + 72: off + 120])
            last_pg, txnid = struct.unpack_from("<QQ", self._mm, off + 120)
            if pg == 0 and free_db.pad:
                psize = free_db.pad
            if best is None or txnid > best[0]:
                best = (txnid, free_db, main_db, last_pg)
        if best is None:
            raise ValueError(f"{path}: not an LMDB data file (bad meta pages)")
        self.txnid, free_db, self.main_db, self.last_pg = best
        self.psize = psize
        self._dbs: dict[str, Db] = {}

    def close(self) -> None:
        self._mm.close()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- pages ------------------------------------------------------------

    def _page(self, pgno: int):
        off = pgno * self.psize
        return self._mm[off: off + self.psize]

    def _page_flags(self, page) -> int:
        return struct.unpack_from("<H", page, 10)[0]

    def _numkeys(self, page) -> int:
        lower = struct.unpack_from("<H", page, 12)[0]
        return (lower - PAGEHDRSZ) >> 1

    def _node(self, page, i):
        """(key, flags, lo, hi, data_offset_in_page) of node i."""
        ptr = struct.unpack_from("<H", page, PAGEHDRSZ + 2 * i)[0]
        lo, hi, flags, ksize = struct.unpack_from("<HHHH", page, ptr)
        key = page[ptr + 8: ptr + 8 + ksize]
        return key, flags, lo, hi, ptr + 8 + ksize

    def _leaf_value(self, page, i) -> bytes:
        key, flags, lo, hi, doff = self._node(page, i)
        size = lo | (hi << 16)
        if flags & F_BIGDATA:
            ovf_pgno = struct.unpack_from("<Q", page, doff)[0]
            start = ovf_pgno * self.psize + PAGEHDRSZ
            return bytes(self._mm[start: start + size])
        return bytes(page[doff: doff + size])

    # -- named databases --------------------------------------------------

    def db(self, name: str) -> Db:
        if name not in self._dbs:
            raw = self._search(self.main_db, name.encode())
            if raw is None:
                raise KeyError(f"{self.path}: no sub-database {name!r}")
            self._dbs[name] = Db.unpack(raw)
        return self._dbs[name]

    def db_names(self) -> list[str]:
        return [bytes(k).decode() for k, _ in self._walk_tree(self.main_db)]

    # -- lookups / scans --------------------------------------------------

    def _cmp_key(self, db: Db, key: bytes):
        if db.flags & MDB_INTEGERKEY:
            return _from_ikey(key)
        return bytes(key)

    def _search(self, db: Db, key: bytes):
        """Point lookup -> raw node value bytes (first dup for DUPSORT),
        or None. The reference's Table.get (osmx.py:53-57) semantics."""
        if db.root == P_INVALID:
            return None
        want = self._cmp_key(db, key)
        page = self._page(db.root)
        while self._page_flags(page) & P_BRANCH:
            n = self._numkeys(page)
            child = None
            for i in range(n - 1, -1, -1):
                k, flags, lo, hi, _ = self._node(page, i)
                if i == 0 or self._cmp_key(db, k) <= want:
                    child = lo | (hi << 16) | (flags << 32)
                    break
            page = self._page(child)
        n = self._numkeys(page)
        for i in range(n):
            k, flags, lo, hi, doff = self._node(page, i)
            if self._cmp_key(db, k) == want:
                if flags & F_DUPDATA:
                    for v in self._dup_values(page, i):
                        return v
                return self._leaf_value(page, i)
        return None

    def get(self, name: str, key) -> bytes | None:
        db = self.db(name)
        kb = _ikey(key) if isinstance(key, int) else key
        return self._search(db, kb)

    def get_dups(self, name: str, key: int) -> list[int]:
        """All dup values of an integer-dup index key, ascending — the
        reference's Index.get (osmx.py:37-46)."""
        return [_from_ikey(v) for _, v in self.items(name, lo=key, hi=key)]

    def _dup_values(self, page, i):
        """Yield each dup value of a F_DUPDATA leaf node."""
        key, flags, lo, hi, doff = self._node(page, i)
        if flags & F_SUBDATA:  # sub-tree of values
            sub = Db.unpack(page[doff: doff + 48])
            for vkey, _ in self._walk_tree(sub):
                yield bytes(vkey)
            return
        # embedded sub-page
        sp = page[doff: doff + (lo | (hi << 16))]
        yield from self._subpage_values(sp)

    def _subpage_values(self, sp):
        spflags = struct.unpack_from("<H", sp, 10)[0]
        n = (struct.unpack_from("<H", sp, 12)[0] - PAGEHDRSZ) >> 1
        if spflags & P_LEAF2:
            ks = struct.unpack_from("<H", sp, 8)[0]
            for j in range(n):
                yield bytes(sp[PAGEHDRSZ + j * ks: PAGEHDRSZ + (j + 1) * ks])
        else:
            for j in range(n):
                ptr = struct.unpack_from("<H", sp, PAGEHDRSZ + 2 * j)[0]
                ksize = struct.unpack_from("<H", sp, ptr + 6)[0]
                yield bytes(sp[ptr + 8: ptr + 8 + ksize])

    def _walk_tree(self, db: Db, lo=None, hi=None):
        """Yield (key, value) over a tree in key order; LEAF2 trees
        yield (key, b\"\")."""
        if db.root == P_INVALID:
            return
        yield from self._walk_page(db, db.root, lo, hi)

    def _walk_page(self, db: Db, pgno: int, lo, hi):
        page = self._page(pgno)
        pflags = self._page_flags(page)
        n = self._numkeys(page)
        if pflags & P_BRANCH:
            for i in range(n):
                k, flags, plo, phi, _ = self._node(page, i)
                child = plo | (phi << 16) | (flags << 32)
                # subtree i covers [key_i, key_{i+1}); prune by range
                if hi is not None and i > 0 and self._cmp_key(db, k) > hi:
                    break
                if lo is not None and i + 1 < n:
                    nk, _, _, _, _ = self._node(page, i + 1)
                    if self._cmp_key(db, nk) <= lo:
                        continue
                yield from self._walk_page(db, child, lo, hi)
            return
        if pflags & P_LEAF2:
            ks = struct.unpack_from("<H", page, 8)[0]
            for i in range(n):
                k = bytes(page[PAGEHDRSZ + i * ks: PAGEHDRSZ + (i + 1) * ks])
                ck = self._cmp_key(db, k)
                if lo is not None and ck < lo:
                    continue
                if hi is not None and ck > hi:
                    return
                yield k, b""
            return
        for i in range(n):
            k, flags, *_ = self._node(page, i)
            ck = self._cmp_key(db, k)
            if lo is not None and ck < lo:
                continue
            if hi is not None and ck > hi:
                return
            if flags & F_DUPDATA:
                for v in self._dup_values(page, i):
                    yield bytes(k), v
            else:
                yield bytes(k), self._leaf_value(page, i)

    def items(self, name: str, lo=None, hi=None):
        """(key, value) scan over a named db, optionally range-bounded
        on the comparable key ([lo, hi] inclusive; ints for INTEGERKEY
        dbs). DUPSORT keys repeat once per dup value."""
        db = self.db(name)
        for k, v in self._walk_tree(db, lo, hi):
            if db.flags & MDB_INTEGERKEY:
                yield _from_ikey(k), v
            else:
                yield bytes(k), v

    def split_points(self, name: str, n: int) -> list[int]:
        """<= n-1 ascending integer keys that partition the db's key
        space into ~n contiguous ranges — read from the top one or two
        branch levels only (bounded driver work even on a planet-scale
        file), so a Spark read can give each task an independent
        [lo, hi) slice."""
        db = self.db(name)
        if not db.flags & MDB_INTEGERKEY:
            raise ValueError("split_points requires an INTEGERKEY db")
        if db.root == P_INVALID or db.depth <= 1:
            return []
        keys: list[int] = []
        root = self._page(db.root)
        nroot = self._numkeys(root)
        for i in range(1, nroot):
            k, *_ = self._node(root, i)
            keys.append(_from_ikey(k))
        if len(keys) + 1 < n and db.depth > 2:
            # Node 0 of EVERY branch page carries an empty key (this
            # writer emits them too, and liblmdb leaves them undefined),
            # so skip j==0 on every child and substitute the root's own
            # separator key for child i>0 — that separator IS the lowest
            # key of subtree i, which node 0 would have held.
            keys = []
            for i in range(nroot):
                k, flags, lo_, hi_, _ = self._node(root, i)
                if i > 0:
                    keys.append(_from_ikey(k))
                child = self._page(lo_ | (hi_ << 16) | (flags << 32))
                for j in range(1, self._numkeys(child)):
                    ck, *_ = self._node(child, j)
                    keys.append(_from_ikey(ck))
        keys = sorted(set(keys))
        if len(keys) + 1 > n:
            step = (len(keys) + 1) / n
            keys = [keys[int((i + 1) * step) - 1] for i in range(n - 1)
                    if 0 <= int((i + 1) * step) - 1 < len(keys)]
            keys = sorted(set(keys))
        # sorted(set(...)) above guarantees strict ascent on every
        # path — partition bounds can never overlap from here
        return keys


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------


class _PageAlloc:
    """Streams pages to the output file as they are built (pgno order
    == file order), so writer memory holds one page buffer plus the
    per-level (first_key, pgno) lists — not the whole environment.
    Pages 0/1 (the metas) are reserved up front and written last via
    a seek."""

    def __init__(self, f):
        self.f = f
        self.n = 2  # next pgno; metas occupy 0 and 1

    def next_pgno(self) -> int:
        return self.n

    def alloc(self, data: bytes) -> int:
        assert len(data) == PSIZE
        self.f.write(data)
        pg = self.n
        self.n += 1
        return pg

    def alloc_many(self, blobs) -> int:
        first = self.n
        for b in blobs:
            self.f.write(b)
            self.n += 1
        return first


def _page_header(pgno: int, flags: int, lower: int, upper: int) -> bytes:
    return struct.pack("<QHHHH", pgno, 0, flags, lower, upper)


def _pack_leaf_nodes(pgno: int, pflags: int, nodes: list) -> bytes:
    """nodes: (key, data, node_flags[, datasize]) -> one page. Caller
    guarantees fit. F_BIGDATA nodes store the overflow pgno in the
    data area but the CONTENT size in lo/hi, so they pass the true
    size as the 4th element."""
    buf = bytearray(PSIZE)
    upper = PSIZE
    ptrs = []
    for node in nodes:
        key, data, nflags = node[0], node[1], node[2]
        dsize = node[3] if len(node) > 3 else len(data)
        sz = 8 + len(key) + len(data)
        sz += sz & 1
        upper -= sz
        ptrs.append(upper)
        if pflags & P_BRANCH:
            # lo/hi/flags carry the child pgno for branch nodes
            child = nflags  # overloaded: branch passes pgno via nflags
            struct.pack_into(
                "<HHHH", buf, upper,
                child & 0xFFFF, (child >> 16) & 0xFFFF,
                (child >> 32) & 0xFFFF, len(key),
            )
        else:
            struct.pack_into(
                "<HHHH", buf, upper,
                dsize & 0xFFFF, (dsize >> 16) & 0xFFFF,
                nflags, len(key),
            )
        buf[upper + 8: upper + 8 + len(key)] = key
        buf[upper + 8 + len(key): upper + 8 + len(key) + len(data)] = data
    lower = PAGEHDRSZ + 2 * len(ptrs)
    buf[0:PAGEHDRSZ] = _page_header(pgno, pflags, lower, upper)
    for i, p in enumerate(ptrs):
        struct.pack_into("<H", buf, PAGEHDRSZ + 2 * i, p)
    return bytes(buf)


def _leaf2_page(pgno: int, keys: list[bytes], ksize: int, extra_flags: int = 0) -> bytes:
    buf = bytearray(PSIZE)
    for i, k in enumerate(keys):
        assert len(k) == ksize
        buf[PAGEHDRSZ + i * ksize: PAGEHDRSZ + (i + 1) * ksize] = k
    lower = PAGEHDRSZ + 2 * len(keys)
    upper = PSIZE - len(keys) * ksize + 2 * len(keys)
    buf[0:PAGEHDRSZ] = _page_header(
        pgno, P_LEAF | P_LEAF2 | extra_flags, lower, upper
    )
    struct.pack_into("<H", buf, 8, ksize)  # mp_pad = fixed key size
    return bytes(buf)


def _subpage(values: list[bytes], vsize: int) -> bytes:
    """Embedded LEAF2 sub-page holding a node's dup values (the
    compact form LMDB uses while a dup list is small)."""
    n = len(values)
    size = PAGEHDRSZ + n * vsize
    size += size & 1
    buf = bytearray(size)
    for i, v in enumerate(values):
        buf[PAGEHDRSZ + i * vsize: PAGEHDRSZ + (i + 1) * vsize] = v
    lower = PAGEHDRSZ + 2 * n
    buf[0:PAGEHDRSZ] = _page_header(0, P_LEAF | P_LEAF2 | P_SUBP, lower, size)
    struct.pack_into("<H", buf, 8, vsize)
    return bytes(buf)


class _TreeBuilder:
    """Bulk-build one B-tree from pre-sorted leaf node specs."""

    def __init__(self, alloc: _PageAlloc):
        self.alloc = alloc
        self.branch_pages = 0
        self.leaf_pages = 0
        self.overflow_pages = 0

    def build(self, nodes, leaf2_ksize: int | None = None) -> tuple[int, int]:
        """nodes: ITERABLE of leaf node specs sorted by key ->
        (root_pgno, depth). With leaf2_ksize, nodes are bare keys
        packed into LEAF2 pages. Consumed once; only the per-level
        (first_key, pgno) lists are held in memory."""
        level: list[tuple[bytes, int]] = []  # (first_key, pgno)
        if leaf2_ksize is not None:
            per = (PSIZE - PAGEHDRSZ) // leaf2_ksize
            chunk: list[bytes] = []
            for k, _, _ in nodes:
                chunk.append(k)
                if len(chunk) == per:
                    pg = self.alloc.alloc(_leaf2_page(
                        self.alloc.next_pgno(), chunk, leaf2_ksize))
                    self.leaf_pages += 1
                    level.append((chunk[0], pg))
                    chunk = []
            if chunk:
                pg = self.alloc.alloc(_leaf2_page(
                    self.alloc.next_pgno(), chunk, leaf2_ksize))
                self.leaf_pages += 1
                level.append((chunk[0], pg))
        else:
            cur: list = []
            room = PSIZE - PAGEHDRSZ
            for node in nodes:
                key, data = node[0], node[1]
                sz = 8 + len(key) + len(data)
                sz += sz & 1
                need = 2 + sz
                if cur and need > room:
                    pg = self.alloc.alloc(
                        _pack_leaf_nodes(self.alloc.next_pgno(), P_LEAF, cur)
                    )
                    self.leaf_pages += 1
                    level.append((cur[0][0], pg))
                    cur, room = [], PSIZE - PAGEHDRSZ
                cur.append(node)
                room -= need
            if cur:
                pg = self.alloc.alloc(
                    _pack_leaf_nodes(self.alloc.next_pgno(), P_LEAF, cur)
                )
                self.leaf_pages += 1
                level.append((cur[0][0], pg))
        if not level:
            return P_INVALID, 0
        depth = 1
        while len(level) > 1:
            nxt: list[tuple[bytes, int]] = []
            cur_b: list[tuple[bytes, bytes, int]] = []
            room = PSIZE - PAGEHDRSZ
            first_key_of_page = None
            for j, (first_key, child_pg) in enumerate(level):
                # node 0 of every branch page carries an empty key
                # (LMDB never compares it: search starts at index 1)
                key = b"" if not cur_b else first_key
                sz = 8 + len(key)
                sz += sz & 1
                need = 2 + sz
                if cur_b and need > room:
                    pg = self.alloc.alloc(_pack_leaf_nodes(
                        self.alloc.next_pgno(), P_BRANCH, cur_b))
                    self.branch_pages += 1
                    nxt.append((first_key_of_page, pg))
                    cur_b, room = [], PSIZE - PAGEHDRSZ
                    key = b""
                    sz = 8
                    need = 2 + sz
                if not cur_b:
                    first_key_of_page = first_key
                cur_b.append((key, b"", child_pg))
                room -= need
            if cur_b:
                pg = self.alloc.alloc(_pack_leaf_nodes(
                    self.alloc.next_pgno(), P_BRANCH, cur_b))
                self.branch_pages += 1
                nxt.append((first_key_of_page, pg))
            level = nxt
            depth += 1
        return level[0][1], depth


def _build_db(alloc: _PageAlloc, entries, flags: int) -> Db:
    """entries: key-sorted ITERABLE of (key_bytes, value) where value
    is bytes, or a list[bytes] of dup values when flags has
    MDB_DUPSORT. Streams: overflow pages and dup sub-trees are
    emitted inline as their owning node is reached (any pgno order is
    a valid LMDB file), so memory holds one dup list / one value at a
    time plus the tree-builder's per-level key lists."""
    tb = _TreeBuilder(alloc)
    counts = {"entries": 0}

    def node_specs():
        for key, value in entries:
            if flags & MDB_DUPSORT:
                # INTEGERDUP values compare numerically
                # (native-endian), not bytewise
                if flags & MDB_INTEGERDUP:
                    vals = sorted(set(value), key=_from_ikey)
                else:
                    vals = sorted(set(value))
                counts["entries"] += len(vals)
                if len(vals) == 1:
                    yield (key, vals[0], 0)
                    continue
                vsize = len(vals[0])
                sp = _subpage(vals, vsize)
                if 8 + len(key) + len(sp) <= NODEMAX:
                    yield (key, sp, F_DUPDATA)
                    continue
                sub_tb = _TreeBuilder(alloc)
                sub_root, sub_depth = sub_tb.build(
                    ((v, b"", 0) for v in vals), leaf2_ksize=vsize
                )
                sub = Db(
                    pad=vsize,
                    flags=MDB_DUPFIXED | (
                        MDB_INTEGERKEY if flags & MDB_INTEGERDUP else 0
                    ),
                    depth=sub_depth,
                    branch_pages=sub_tb.branch_pages,
                    leaf_pages=sub_tb.leaf_pages,
                    overflow_pages=0,
                    entries=len(vals),
                    root=sub_root,
                )
                tb.branch_pages += sub_tb.branch_pages
                tb.leaf_pages += sub_tb.leaf_pages
                yield (key, sub.pack(), F_DUPDATA | F_SUBDATA)
            else:
                counts["entries"] += 1
                if 8 + len(key) + len(value) + (len(value) & 1) > NODEMAX:
                    npages = (len(value) + PAGEHDRSZ + PSIZE - 1) // PSIZE
                    first = alloc.next_pgno()
                    blob = bytearray(npages * PSIZE)
                    blob[0:PAGEHDRSZ] = struct.pack(
                        "<QHHI", first, 0, P_OVERFLOW, npages
                    )
                    blob[PAGEHDRSZ: PAGEHDRSZ + len(value)] = value
                    alloc.alloc_many(
                        bytes(blob[i * PSIZE: (i + 1) * PSIZE])
                        for i in range(npages)
                    )
                    tb.overflow_pages += npages
                    yield (
                        key, struct.pack("<Q", first), F_BIGDATA, len(value)
                    )
                else:
                    yield (key, value, 0)

    root, depth = tb.build(node_specs())
    return Db(
        pad=0, flags=flags, depth=depth, branch_pages=tb.branch_pages,
        leaf_pages=tb.leaf_pages, overflow_pages=tb.overflow_pages,
        entries=counts["entries"], root=root,
    )


def _norm_entries(entries, flags: int):
    for key, value in entries:
        kb = _ikey(key) if isinstance(key, int) else bytes(key)
        if flags & MDB_DUPSORT:
            vb = [
                _ikey(v) if isinstance(v, int) else bytes(v)
                for v in value
            ]
        else:
            vb = bytes(value)
        yield kb, vb


def write_env(path: str, dbs: dict, presorted: bool = False) -> None:
    """Write a single-file LMDB environment: ``dbs`` maps sub-database
    name -> (db_flags, entries). INTEGERKEY dbs take int keys (sorted
    numerically), others bytes keys (sorted bytewise); DUPSORT values
    are lists of fixed-size byte strings or ints.

    With ``presorted=True`` entries may be any ITERABLE already in
    key order (e.g. a Spark ``orderBy(...).toLocalIterator()``) and
    the writer streams: pages land in the output file as they are
    built, so memory holds the current page plus the per-level
    (first_key, pgno) lists — never the dataset.  With the default,
    entries are materialized and sorted here (test convenience)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(b"\0" * (2 * PSIZE))  # meta placeholders, patched last
        alloc = _PageAlloc(f)
        named: list[tuple[bytes, bytes, int]] = []
        for name in sorted(dbs):
            flags, entries = dbs[name]
            norm = _norm_entries(entries, flags)
            if not presorted:
                norm = sorted(
                    norm,
                    key=(lambda kv: _from_ikey(kv[0]))
                    if flags & MDB_INTEGERKEY
                    else (lambda kv: kv[0]),
                )
            db = _build_db(alloc, norm, flags)
            named.append((name.encode(), db.pack(), F_SUBDATA))
        main_tb = _TreeBuilder(alloc)
        main_root, main_depth = main_tb.build(named)
        main = Db(
            pad=0, flags=0, depth=main_depth,
            branch_pages=main_tb.branch_pages,
            leaf_pages=main_tb.leaf_pages,
            overflow_pages=0, entries=len(named), root=main_root,
        )
        last_pg = alloc.next_pgno() - 1
        mapsize = max(1 << 30, (last_pg + 1) * PSIZE)
        free = Db(pad=PSIZE, flags=0, depth=0, branch_pages=0,
                  leaf_pages=0, overflow_pages=0, entries=0,
                  root=P_INVALID)

        def meta(pgno: int, txnid: int, main_db: Db) -> bytes:
            buf = bytearray(PSIZE)
            buf[0:PAGEHDRSZ] = _page_header(pgno, P_META, 0, 0)
            struct.pack_into("<II", buf, PAGEHDRSZ, MAGIC, DATA_VERSION)
            struct.pack_into("<QQ", buf, PAGEHDRSZ + 8, 0, mapsize)
            buf[PAGEHDRSZ + 24: PAGEHDRSZ + 72] = free.pack()
            buf[PAGEHDRSZ + 72: PAGEHDRSZ + 120] = main_db.pack()
            struct.pack_into("<QQ", buf, PAGEHDRSZ + 120, last_pg, txnid)
            return bytes(buf)

        empty_main = Db(pad=0, flags=0, depth=0, branch_pages=0,
                        leaf_pages=0, overflow_pages=0, entries=0,
                        root=P_INVALID)
        f.seek(0)
        f.write(meta(0, 0, empty_main))
        f.write(meta(1, 1, main))
    os.replace(tmp, path)
