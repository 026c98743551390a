"""Round-8 repo-only components: phonetic record linkage, CMS
join-size estimation, and the generic LMDB KV source — each pinned
against a straight-line Python model."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmexpress_spark.operators import linkage as LK
from osmexpress_spark.operators import sketch as SK

NAMES = [
    (1, "Robert"), (2, "Rupert"), (3, "Robret"),
    (4, "Ashcraft"), (5, "Ashcroft"),
    (6, "Tymczak"), (7, "Pfister"),
    (8, "Robert"),  # exact duplicate of 1
    (9, None), (10, ""),
]


def _lev(a, b):
    # textbook DP model
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[n]


def _soundex(name):
    codes = {**dict.fromkeys("BFPV", "1"), **dict.fromkeys("CGJKQSXZ", "2"),
             **dict.fromkeys("DT", "3"), "L": "4",
             **dict.fromkeys("MN", "5"), "R": "6"}
    s = name.upper()
    out, last = s[0], codes.get(s[0], "")
    for ch in s[1:]:
        c = codes.get(ch, "")
        if c and c != last:
            out += c
        if ch not in "HW":
            last = c
    return (out.replace("0", "") + "000")[:4]


def test_linkage_pairs_matches_model(spark):
    df = spark.createDataFrame(NAMES, "id long, name string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in LK.linkage_pairs(df, "id", "name", max_dist=2).collect()
    }
    exp = {}
    valid = [(i, n) for i, n in NAMES if n]
    for i, a in valid:
        for j, b in valid:
            if i < j and _soundex(a) == _soundex(b):
                d = _lev(a, b)
                if d <= 2:
                    exp[(i, j)] = d
    assert got == exp and got, got
    assert (1, 8) in got and got[(1, 8)] == 0  # exact dup
    assert (4, 5) in got  # Ashcraft/Ashcroft: same soundex, dist 1
    # Robert/Rupert: same soundex, two substitutions — inside the band
    assert got[(1, 2)] == 2
    # but at max_dist=1 the verify drops them while keeping A/A
    tight = {
        (r["id_a"], r["id_b"])
        for r in LK.linkage_pairs(df, "id", "name", max_dist=1).collect()
    }
    assert (1, 2) not in tight and (4, 5) in tight


def test_linkage_stays_jvm_side(spark):
    df = spark.createDataFrame(NAMES, "id long, name string")
    plan = (
        LK.linkage_pairs(df, "id", "name")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_linkage_hot_block_cap(spark):
    # 300 identical names = one soundex block of 300 > max_block=200:
    # dropped entirely instead of a 45k-pair quadratic blowup
    rows = [(i, "Smith") for i in range(300)] + [(400, "Jones"), (401, "Janes")]
    df = spark.createDataFrame(rows, "id long, name string")
    got = LK.linkage_pairs(df, "id", "name", max_dist=2, max_block=200)
    ids = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert ids == {(400, 401)}


def test_linkage_against_reference(spark):
    new = spark.createDataFrame([(100, "Ashcruft")], "id long, name string")
    ref = spark.createDataFrame(NAMES, "id long, name string")
    got = {
        (r["new_id"], r["ref_id"])
        for r in LK.linkage_against(new, ref, "id", "name").collect()
    }
    assert got == {(100, 4), (100, 5)}


def test_canonical_entities(spark):
    df = spark.createDataFrame(NAMES, "id long, name string")
    ent = {
        r["id"]: r["entity_id"]
        for r in LK.canonical_entities(df, "id", "name").collect()
    }
    # {1,2,3,8} link (Robert/Rupert/Robret all within dist 2 of
    # Robert), {4,5} link; the rest are singletons
    assert ent[1] == ent[2] == ent[3] == ent[8] == 1
    assert ent[4] == ent[5] == 4
    for i in (6, 7):
        assert ent[i] == i


@pytest.mark.slow
def test_cms_join_size_estimates(spark):
    import hashlib

    rows_a = [(f"k{i % 40}",) for i in range(400)]
    rows_b = [(f"k{i % 25}",) for i in range(100)]
    a = spark.createDataFrame(rows_a, "k string")
    b = spark.createDataFrame(rows_b, "k string")
    exact = a.join(b, "k").count()
    sa = SK.cms_build(a, F.col("k"), w=1024, d=3)
    sb = SK.cms_build(b, F.col("k"), w=1024, d=3)
    est = SK.cms_join_size(sa, sb).collect()[0]["est_join_size"]
    # inner product is an upper bound; at w=1024 with 40 keys,
    # collisions are rare so the estimate is exact or near-exact
    assert est >= exact
    assert est <= exact * 1.1 + 100, (est, exact)


def test_cms_join_size_disjoint_is_zero(spark):
    a = spark.createDataFrame([("x1",), ("x2",)], "k string")
    b = spark.createDataFrame([("y1",), ("y2",)], "k string")
    sa = SK.cms_build(a, F.col("k"), w=1024, d=3)
    sb = SK.cms_build(b, F.col("k"), w=1024, d=3)
    est = SK.cms_join_size(sa, sb).collect()[0]["est_join_size"]
    assert est == 0  # no shared buckets in any row (w >> items)


@pytest.mark.slow
def test_cms_join_size_respects_merge(spark):
    # sketch-of-union == merged per-part sketches -> same estimate
    rows = [(f"k{i % 10}",) for i in range(100)]
    whole = spark.createDataFrame(rows, "k string")
    p1 = spark.createDataFrame(rows[:50], "k string")
    p2 = spark.createDataFrame(rows[50:], "k string")
    probe = spark.createDataFrame([(f"k{i % 10}",) for i in range(30)],
                                  "k string")
    sp = SK.cms_build(probe, F.col("k"))
    s_whole = SK.cms_build(whole, F.col("k"))
    s_merged = SK.cms_merge([
        SK.cms_build(p1, F.col("k")), SK.cms_build(p2, F.col("k"))
    ])
    e1 = SK.cms_join_size(s_whole, sp).collect()[0]["est_join_size"]
    e2 = SK.cms_join_size(s_merged, sp).collect()[0]["est_join_size"]
    assert e1 == e2 == whole.join(probe, "k").count()


@pytest.mark.slow
def test_lmdbkv_generic_source(spark, tmp_path):
    from osmexpress_spark.sources import lmdb_kv as K
    from osmexpress_spark.sources.osmx import LmdbKvDataSource

    path = str(tmp_path / "kv.mdb")
    ints = [(i, bytes([i % 7]) * (i % 50 + 1)) for i in range(500)]
    strs = [(f"s{i:03d}".encode(), f"v{i}".encode()) for i in range(40)]
    K.write_env(path, {
        "ints": (K.MDB_INTEGERKEY, ints),
        "strs": (0, strs),
    })
    spark.dataSource.register(LmdbKvDataSource)
    got_i = (
        spark.read.format("lmdbkv").option("db", "ints")
        .option("partitions", "4").load(path)
    )
    rows = sorted((r["key_int"], bytes(r["value"])) for r in got_i.collect())
    assert rows == ints
    got_s = spark.read.format("lmdbkv").option("db", "strs").load(path)
    srows = sorted((bytes(r["key_bytes"]), bytes(r["value"]))
                   for r in got_s.collect())
    assert srows == strs


def test_kmv_set_estimates_exact_below_k(spark):
    # 60 + 60 distinct with 20 shared — all below k=256, so every
    # estimate is EXACT (the KMV small-cardinality branch)
    a = spark.createDataFrame([(f"a{i}",) for i in range(40)]
                              + [(f"s{i}",) for i in range(20)], "k string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(40)]
                              + [(f"s{i}",) for i in range(20)], "k string")
    r = SK.kmv_set_estimates(a, F.col("k"), b, F.col("k"), k=256).collect()[0]
    assert r["est_distinct_a"] == 60.0 and r["est_distinct_b"] == 60.0
    assert r["est_union"] == 100.0
    assert abs(r["est_intersection"] - 20.0) < 1e-9
    assert abs(r["jaccard_est"] - 0.2) < 1e-9


def test_kmv_set_estimates_sampling_regime(spark):
    # 2000 vs 2000 with 1000 shared at k=256: estimates within 25%
    a = spark.createDataFrame([(f"x{i}",) for i in range(2000)], "k string")
    b = spark.createDataFrame([(f"x{i}",) for i in range(1000, 3000)],
                              "k string")
    r = SK.kmv_set_estimates(a, F.col("k"), b, F.col("k"), k=256).collect()[0]
    assert abs(r["est_union"] - 3000) / 3000 < 0.25, r
    assert abs(r["est_intersection"] - 1000) / 1000 < 0.35, r


@pytest.mark.slow
def test_join_plan_advice_strategies(spark):
    small = spark.createDataFrame([(f"k{i}",) for i in range(10)], "k string")
    big = spark.createDataFrame([(f"k{i % 50}",) for i in range(5000)],
                                "k string")
    r = SK.join_plan_advice(
        small, F.col("k"), big, F.col("k"),
        broadcast_threshold_rows=100,
    ).collect()[0]
    assert r["strategy"] == "broadcast_a"
    assert r["rows_a"] == 10 and r["rows_b"] == 5000
    assert r["est_join_size"] >= small.join(big, "k").count()
    r2 = SK.join_plan_advice(
        big, F.col("k"), small, F.col("k"),
        broadcast_threshold_rows=100,
    ).collect()[0]
    assert r2["strategy"] == "broadcast_b"
    # both sides above threshold -> shuffle
    r3 = SK.join_plan_advice(
        big, F.col("k"), big, F.col("k"), broadcast_threshold_rows=1,
    ).collect()[0]
    assert r3["strategy"] in ("shuffle", "shuffle_salted")
