"""Pure-stdlib LMDB codec + Cap'n Proto codec tests.

The decisive gates are the ctypes cross-validations against the
system liblmdb (the WebP-decoder pattern): a file written by our bulk
writer must read back bit-identically through the REAL library (so
the reference's tooling could open our `.osmx`), and a file written
by the REAL library must read back identically through our reader
(so an existing planet.osmx migrates without re-expanding).
"""

from __future__ import annotations

import ctypes
import os
import random

import pytest

from osmexpress_spark.sources import capnp_codec as C
from osmexpress_spark.sources import lmdb_kv as L

LIBLMDB = "/root/miniconda/lib/liblmdb.so"

NOSUBDIR = 0x4000
RDONLY = 0x20000
NOSYNC = 0x10000
NOLOCK = 0x400000
CREATE = 0x40000
MDB_FIRST, MDB_NEXT = 0, 8


def _dataset(seed=11):
    rng = random.Random(seed)
    plain = [
        (i, bytes([i % 251]) * rng.choice([5, 40, 300, 5000]))
        for i in range(0, 3000, 3)
    ]
    dup = [
        (k, sorted(rng.sample(range(10**12), rng.choice([1, 2, 30, 900]))))
        for k in range(0, 1500, 7)
    ]
    meta = [
        (b"alpha", b"1"),
        (b"import_filename", b"x.pbf"),
        (b"osmosis_replication_timestamp", b"2024-01-01T00:00:00Z"),
    ]
    return plain, dup, meta


def _write_ours(path, plain, dup, meta):
    L.write_env(path, {
        "plain": (L.MDB_INTEGERKEY, plain),
        "dup": (
            L.MDB_INTEGERKEY | L.MDB_DUPSORT | L.MDB_DUPFIXED
            | L.MDB_INTEGERDUP,
            dup,
        ),
        "metadata": (0, meta),
    })


def test_pure_roundtrip(tmp_path):
    plain, dup, meta = _dataset()
    path = str(tmp_path / "t.mdb")
    _write_ours(path, plain, dup, meta)
    with L.LmdbReader(path) as r:
        assert r.db_names() == ["dup", "metadata", "plain"]
        assert list(r.items("plain")) == sorted(plain)
        got_dup: dict = {}
        for k, v in r.items("dup"):
            got_dup.setdefault(k, []).append(L._from_ikey(v))
        assert got_dup == dict(dup)
        assert list(r.items("metadata")) == sorted(meta)
        # point gets incl. a miss and an overflow-page value
        assert r.get("plain", 3) == dict(plain)[3]
        assert r.get("plain", 4) is None
        big = next(k for k, v in plain if len(v) == 5000)
        assert r.get("plain", big) == dict(plain)[big]
        assert r.get_dups("dup", 7) == dict(dup)[7]
        assert r.get("metadata", b"alpha") == b"1"
        with pytest.raises(KeyError):
            r.db("missing")


def test_range_scan_and_splits_tile_the_keyspace(tmp_path):
    plain, dup, meta = _dataset()
    path = str(tmp_path / "t.mdb")
    _write_ours(path, plain, dup, meta)
    with L.LmdbReader(path) as r:
        lo, hi = 600, 1200
        assert list(r.items("plain", lo=lo, hi=hi)) == [
            (k, v) for k, v in sorted(plain) if lo <= k <= hi
        ]
        sp = r.split_points("plain", 8)
        assert sp == sorted(set(sp)) and sp
        bounds = [None, *sp, None]
        rows = []
        for i in range(len(bounds) - 1):
            hi_i = bounds[i + 1] - 1 if bounds[i + 1] is not None else None
            rows += list(r.items("plain", lo=bounds[i], hi=hi_i))
        assert rows == sorted(plain)


def test_split_points_depth3_tile_exactly(tmp_path):
    """Regression (round-9 ADVICE, lmdb_kv.py:365): on a depth-3 tree
    the empty node-0 key of every non-leftmost second-level branch page
    used to decode as integer 0, making the split list non-monotonic —
    overlapping [lo, hi) partitions then silently duplicated rows (a
    40k-row self-written file read back 938,744 rows). The splits must
    be strictly ascending and the induced ranges must tile the keyspace
    exactly, including when the requested partition count exceeds the
    second-level key count (the path that skipped normalization)."""
    path = str(tmp_path / "deep.mdb")
    rows = [(i * 3 + 1, (b"%d|" % i) * 2) for i in range(40_000)]
    L.write_env(path, {"plain": (L.MDB_INTEGERKEY, rows)})
    with L.LmdbReader(path) as r:
        assert r.db("plain").depth >= 3
        for n in (4, 32, 500, 10_000):
            sp = r.split_points("plain", n)
            assert all(a < b for a, b in zip(sp, sp[1:])), (n, sp[:10])
            bounds = [None, *sp, None]
            got = []
            for i in range(len(bounds) - 1):
                hi_i = bounds[i + 1] - 1 if bounds[i + 1] is not None else None
                got += list(r.items("plain", lo=bounds[i], hi=hi_i))
            assert len(got) == len(rows), (n, len(got))
            assert got == rows


def test_atomic_write_replaces(tmp_path):
    path = str(tmp_path / "t.mdb")
    L.write_env(path, {"plain": (L.MDB_INTEGERKEY, [(1, b"a")])})
    L.write_env(path, {"plain": (L.MDB_INTEGERKEY, [(2, b"b")])})
    with L.LmdbReader(path) as r:
        assert list(r.items("plain")) == [(2, b"b")]
    assert not os.path.exists(path + ".tmp")


# --------------------------------------------------------------------------
# ctypes cross-validation vs the real liblmdb
# --------------------------------------------------------------------------


class _MDBVal(ctypes.Structure):
    _fields_ = [("mv_size", ctypes.c_size_t), ("mv_data", ctypes.c_void_p)]


def _lib():
    if not os.path.exists(LIBLMDB):  # pragma: no cover - env-dependent
        pytest.skip("system liblmdb not available")
    lib = ctypes.CDLL(LIBLMDB)
    lib.mdb_env_create.argtypes = [ctypes.POINTER(ctypes.c_void_p)]
    lib.mdb_env_set_mapsize.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.mdb_env_set_maxdbs.argtypes = [ctypes.c_void_p, ctypes.c_uint]
    lib.mdb_env_open.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint, ctypes.c_int
    ]
    lib.mdb_txn_begin.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.mdb_txn_commit.argtypes = [ctypes.c_void_p]
    lib.mdb_dbi_open.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint,
        ctypes.POINTER(ctypes.c_uint),
    ]
    lib.mdb_put.argtypes = [
        ctypes.c_void_p, ctypes.c_uint, ctypes.POINTER(_MDBVal),
        ctypes.POINTER(_MDBVal), ctypes.c_uint,
    ]
    lib.mdb_cursor_open.argtypes = [
        ctypes.c_void_p, ctypes.c_uint, ctypes.POINTER(ctypes.c_void_p)
    ]
    lib.mdb_cursor_get.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(_MDBVal), ctypes.POINTER(_MDBVal),
        ctypes.c_int,
    ]
    lib.mdb_env_close.argtypes = [ctypes.c_void_p]
    return lib


def _real_read_all(lib, path, dbname, dbflags):
    env = ctypes.c_void_p()
    assert lib.mdb_env_create(ctypes.byref(env)) == 0
    lib.mdb_env_set_maxdbs(env, 10)
    assert lib.mdb_env_open(
        env, path.encode(), NOSUBDIR | RDONLY | NOLOCK, 0o664
    ) == 0
    txn = ctypes.c_void_p()
    assert lib.mdb_txn_begin(env, None, RDONLY, ctypes.byref(txn)) == 0
    dbi = ctypes.c_uint()
    assert lib.mdb_dbi_open(
        txn, dbname.encode(), dbflags, ctypes.byref(dbi)
    ) == 0
    cur = ctypes.c_void_p()
    assert lib.mdb_cursor_open(txn, dbi, ctypes.byref(cur)) == 0
    out = []
    k, v = _MDBVal(), _MDBVal()
    rc = lib.mdb_cursor_get(cur, ctypes.byref(k), ctypes.byref(v), MDB_FIRST)
    while rc == 0:
        out.append((
            ctypes.string_at(k.mv_data, k.mv_size),
            ctypes.string_at(v.mv_data, v.mv_size),
        ))
        rc = lib.mdb_cursor_get(cur, ctypes.byref(k), ctypes.byref(v), MDB_NEXT)
    lib.mdb_env_close(env)
    return out


def test_real_lmdb_reads_our_file(tmp_path):
    lib = _lib()
    plain, dup, meta = _dataset()
    path = str(tmp_path / "ours.mdb")
    _write_ours(path, plain, dup, meta)
    got = _real_read_all(lib, path, "plain", L.MDB_INTEGERKEY)
    assert got == [(L._ikey(k), v) for k, v in sorted(plain)]
    got_d = _real_read_all(
        lib, path, "dup",
        L.MDB_INTEGERKEY | L.MDB_DUPSORT | L.MDB_DUPFIXED | L.MDB_INTEGERDUP,
    )
    assert got_d == [
        (L._ikey(k), L._ikey(x)) for k, vs in sorted(dup) for x in vs
    ]
    assert _real_read_all(lib, path, "metadata", 0) == sorted(meta)


def test_our_reader_reads_real_lmdb_file(tmp_path):
    lib = _lib()
    plain, dup, meta = _dataset(seed=23)
    path = str(tmp_path / "real.mdb")

    def val(b):
        v = _MDBVal()
        v.mv_size = len(b)
        buf = ctypes.create_string_buffer(b, len(b))
        v.mv_data = ctypes.cast(buf, ctypes.c_void_p)
        return v, buf

    env = ctypes.c_void_p()
    assert lib.mdb_env_create(ctypes.byref(env)) == 0
    lib.mdb_env_set_mapsize(env, 1 << 30)
    lib.mdb_env_set_maxdbs(env, 10)
    assert lib.mdb_env_open(
        env, path.encode(), NOSUBDIR | NOSYNC | NOLOCK, 0o664
    ) == 0
    txn = ctypes.c_void_p()
    assert lib.mdb_txn_begin(env, None, 0, ctypes.byref(txn)) == 0
    dbis = {}
    for name, flags in (
        ("plain", CREATE | L.MDB_INTEGERKEY),
        ("dup", CREATE | L.MDB_INTEGERKEY | L.MDB_DUPSORT | L.MDB_DUPFIXED
         | L.MDB_INTEGERDUP),
        ("metadata", CREATE),
    ):
        dbi = ctypes.c_uint()
        assert lib.mdb_dbi_open(
            txn, name.encode(), flags, ctypes.byref(dbi)
        ) == 0
        dbis[name] = dbi
    for k, v in plain:
        kv, _kb = val(L._ikey(k))
        vv, _vb = val(v)
        assert lib.mdb_put(
            txn, dbis["plain"], ctypes.byref(kv), ctypes.byref(vv), 0
        ) == 0
    for k, vs in dup:
        for x in vs:
            kv, _kb = val(L._ikey(k))
            vv, _vb = val(L._ikey(x))
            assert lib.mdb_put(
                txn, dbis["dup"], ctypes.byref(kv), ctypes.byref(vv), 0
            ) == 0
    for k, v in meta:
        kv, _kb = val(k)
        vv, _vb = val(v)
        assert lib.mdb_put(
            txn, dbis["metadata"], ctypes.byref(kv), ctypes.byref(vv), 0
        ) == 0
    assert lib.mdb_txn_commit(txn) == 0
    lib.mdb_env_close(env)

    with L.LmdbReader(path) as r:
        assert list(r.items("plain")) == sorted(plain)
        got_dup: dict = {}
        for k, v in r.items("dup"):
            got_dup.setdefault(k, []).append(L._from_ikey(v))
        assert got_dup == dict(dup)
        assert list(r.items("metadata")) == sorted(meta)
        assert r.get("plain", 9) == dict(plain)[9]
        assert r.get_dups("dup", 14) == dict(dup)[14]
        sp = r.split_points("plain", 6)
        bounds = [None, *sp, None]
        rows = []
        for i in range(len(bounds) - 1):
            hi_i = bounds[i + 1] - 1 if bounds[i + 1] is not None else None
            rows += list(r.items("plain", lo=bounds[i], hi=hi_i))
        assert rows == sorted(plain)


# --------------------------------------------------------------------------
# capnp codec
# --------------------------------------------------------------------------


def _norm_meta(m):
    if m is None:
        return None
    return {
        "version": m["version"] or 0, "timestamp": m["timestamp"] or 0,
        "changeset": m["changeset"] or 0, "uid": m["uid"] or 0,
        "user": m["user"],
    }


def test_capnp_roundtrip_property():
    rng = random.Random(3)
    for trial in range(300):
        tags = [
            w for _ in range(rng.randrange(0, 6))
            for w in (f"k{rng.randrange(9)}", "v" + "x" * rng.randrange(0, 30))
        ]
        meta = None if rng.random() < 0.2 else {
            "version": rng.randrange(1, 99),
            "timestamp": rng.randrange(2**40),
            "changeset": rng.randrange(2**31),
            "uid": rng.randrange(2**20),
            "user": rng.choice([None, "", "alice", "ünïcødé", "x" * 200]),
        }
        assert C.decode_node(C.encode_node(tags, meta)) == (
            tags, _norm_meta(meta)
        )
        refs = [rng.randrange(2**50) for _ in range(rng.randrange(0, 400))]
        assert C.decode_way(C.encode_way(refs, tags, meta)) == (
            refs, tags, _norm_meta(meta)
        )
        members = [
            (rng.randrange(2**40), rng.choice(C.MEMBER_TYPES),
             rng.choice(["", "outer", "inner", "rôle"]))
            for _ in range(rng.randrange(0, 20))
        ]
        assert C.decode_relation(C.encode_relation(members, tags, meta)) == (
            members, tags, _norm_meta(meta)
        )


def test_capnp_null_and_short_structs():
    assert C.decode_node(C.encode_node([], None)) == ([], None)
    # a message whose root is a zero-size struct reads as all defaults
    empty = b"\x00\x00\x00\x00\x01\x00\x00\x00" + b"\x00" * 8
    assert C.decode_way(empty) == ([], [], None)
    assert C.decode_relation(empty) == ([], [], None)
