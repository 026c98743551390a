"""Property-based checks of the round-4 operators against independent
Python models (the test strategy SURVEY §5 prescribes: small random
inputs, exact expected values computed by straight-line Python)."""

from __future__ import annotations

import pytest

import datetime as dt
import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- band join vs brute force ----------------------------------------------
_events = st.lists(
    st.tuples(
        st.integers(0, 3),            # user
        st.integers(0, 20_000),       # seconds offset
    ),
    min_size=0,
    max_size=25,
)


@SET
@given(left=_events, right=_events, band=st.integers(1, 7200))
@pytest.mark.slow
def test_band_join_matches_bruteforce(spark, left, right, band):
    from osmexpress_spark.operators.asof import band_join

    t0 = dt.datetime(2024, 1, 1)
    lrows = [(i, u, t0 + dt.timedelta(seconds=s)) for i, (u, s) in enumerate(left)]
    rrows = [(i, u, t0 + dt.timedelta(seconds=s)) for i, (u, s) in enumerate(right)]
    ldf = spark.createDataFrame(lrows, "lid long, user long, ts timestamp") \
        if lrows else spark.createDataFrame([], "lid long, user long, ts timestamp")
    rdf = spark.createDataFrame(rrows, "rid long, user long, ts timestamp") \
        if rrows else spark.createDataFrame([], "rid long, user long, ts timestamp")
    got = {
        (r["lid"], r["r_rid"])
        for r in band_join(ldf, rdf, "user", "ts", "ts", band).collect()
    }
    want = {
        (li, ri)
        for li, lu, lt in lrows
        for ri, ru, rt in rrows
        if lu == ru and lt < rt <= lt + dt.timedelta(seconds=band)
    }
    assert got == want


# --- shoelace areas vs python model ----------------------------------------
_ring = st.lists(
    st.tuples(st.integers(-10_000, 10_000), st.integers(-10_000, 10_000)),
    min_size=3,
    max_size=8,
)


@SET
@given(rings=st.lists(_ring, min_size=1, max_size=4))
@pytest.mark.slow
def test_way_areas_match_python_shoelace(spark, rings):
    from osmexpress_spark import functions as fn

    locs, ways, nid = [], [], 0
    for wid, ring in enumerate(rings):
        ids = []
        for lon, lat in ring:
            locs.append((nid, lon, lat))
            ids.append(nid)
            nid += 1
        ways.append((wid, ids + [ids[0]]))  # close the ring
    ldf = spark.createDataFrame(locs, "id long, lon int, lat int")
    wdf = spark.createDataFrame(ways, "id long, nodes array<long>")
    got = {r["id"]: r["area2"] for r in fn.way_areas(wdf, ldf).collect()}
    for wid, ring in enumerate(rings):
        pts = ring + [ring[0]]
        want = sum(
            pts[i][0] * pts[i + 1][1] - pts[i + 1][0] * pts[i][1]
            for i in range(len(pts) - 1)
        )
        assert got[wid] == want, (wid, ring)


# --- integer pagerank vs python model --------------------------------------
_edges = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)


@SET
@given(edges=_edges, iters=st.integers(1, 3))
@pytest.mark.slow
def test_pagerank_micro_matches_python(spark, edges, iters):
    from osmexpress_spark.operators.graph import pagerank_micro

    edges = sorted(set(edges))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["pr_micro"] for r in pagerank_micro(df, iters).collect()}

    verts = sorted({v for e in edges for v in e})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    pr = {v: 1_000_000 for v in verts}
    for _ in range(iters):
        s = {v: 0 for v in verts}
        for a, b in edges:
            s[b] += pr[a] // deg[a]
        pr = {v: 150_000 + (17 * s[v]) // 20 for v in verts}
    assert got == pr


# --- KMV vs hashlib model --------------------------------------------------
@SET
@given(items=st.lists(st.text(min_size=0, max_size=6), min_size=1, max_size=60),
       k=st.integers(2, 16))
@pytest.mark.slow
def test_kmv_matches_hashlib_model(spark, items, k):
    from osmexpress_spark.operators import sketch

    df = spark.createDataFrame([(s,) for s in items], "s string")
    row = sketch.kmv_distinct_estimate(df, F.col("s"), k=k).collect()[0]
    hs = sorted({
        int(hashlib.md5(s.encode()).hexdigest()[:12], 16) for s in items
    })[:k]
    assert row.k_used == len(hs)
    assert row.kth_hash == max(hs)
    if len(hs) < k:
        assert row.est_distinct == float(len(hs))
    else:
        assert row.est_distinct == (k - 1) * float(1 << 48) / hs[-1]


# --- CMS upper bound -------------------------------------------------------
@SET
@given(items=st.lists(st.sampled_from("abcdef"), min_size=1, max_size=80),
       w=st.integers(4, 64))
@pytest.mark.slow
def test_cms_estimates_upper_bound_true_counts(spark, items, w):
    from osmexpress_spark.operators import sketch

    df = spark.createDataFrame([(s,) for s in items], "s string")
    cms = sketch.cms_build(df, F.col("s"), w=w, d=3)
    probes = sorted(set(items)) + ["zz"]
    got = {r["item"]: r["est_count"]
           for r in sketch.cms_estimate(cms, probes, w=w, d=3).collect()}
    true = {s: items.count(s) for s in set(items)}
    for s, n in true.items():
        assert got[s] >= n
    assert got["zz"] >= 0


# --- fuzzy pairs vs python blocked model -----------------------------------
def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@SET
@given(toks=st.lists(st.text(alphabet="abcd", min_size=4, max_size=7),
                     min_size=0, max_size=20))
@pytest.mark.slow
def test_fuzzy_pairs_match_blocked_model(spark, toks):
    from osmexpress_spark.operators import dedup

    df = spark.createDataFrame([(s,) for s in toks], "tok string") \
        if toks else spark.createDataFrame([], "tok string")
    got = {(r.a, r.b): r.dist
           for r in dedup.fuzzy_token_pairs(df, "tok").collect()}
    uniq = sorted(set(toks))
    want = {}
    for i, a in enumerate(uniq):
        for b in uniq[i + 1:]:
            if abs(len(a) - len(b)) > 2:
                continue
            if a[0] != b[0] and a[-1] != b[-1]:
                continue  # the documented blocking bound
            d = _lev(a, b)
            if d <= 2:
                want[(a, b)] = d
    assert got == want


# --- as-of join vs brute-force model ---------------------------------------
@SET
@given(left=_events, right=_events,
       direction=st.sampled_from(["backward", "forward"]))
@pytest.mark.slow
def test_asof_join_matches_bruteforce(spark, left, right, direction):
    from osmexpress_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    lrows = [(i, u, t0 + dt.timedelta(seconds=s))
             for i, (u, s) in enumerate(left)]
    rrows = [(i, u, t0 + dt.timedelta(seconds=s))
             for i, (u, s) in enumerate(right)]
    schema_l = "lid long, user long, ts timestamp"
    schema_r = "rid long, user long, rts timestamp"
    ldf = (spark.createDataFrame(lrows, schema_l)
           if lrows else spark.createDataFrame([], schema_l))
    rdf = (spark.createDataFrame([(i, u, t) for i, u, t in rrows], schema_r)
           if rrows else spark.createDataFrame([], schema_r))
    got = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            ldf, rdf, on="user", left_time="ts", right_time="rts",
            right_cols=["rid"], right_order="rid", direction=direction,
        ).collect()
    }
    assert set(got) == {i for i, _, _ in lrows}
    for li, lu, lt in lrows:
        if direction == "backward":
            cands = [(rt, ri) for ri, ru, rt in rrows if ru == lu and rt <= lt]
            # latest time wins; ties -> HIGHEST right_order (rid)
            want = max(cands)[1] if cands else None
        else:
            cands = [(rt, ri) for ri, ru, rt in rrows if ru == lu and rt >= lt]
            # earliest time; ties -> LOWEST rid
            want = min(cands)[1] if cands else None
        assert got[li] == want, (li, direction, cands)


# --- shard-manifest algebra vs Python model ---------------------------------
_docs = st.lists(
    st.tuples(
        st.integers(0, 60),                  # doc id pool (dups possible)
        st.text(
            alphabet="ab xy", min_size=0, max_size=12
        ),                                   # content incl. spaces/empty
        st.integers(0, 9),                   # weight
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda r: r[0],
)


@SET
@given(docs=_docs, n_shards=st.integers(1, 6), n_parts=st.integers(1, 4))
@pytest.mark.slow
def test_manifest_merge_equals_union_property(spark, docs, n_shards, n_parts):
    """merge(per-part manifests) == manifest(union) for ANY disjoint
    split — the algebra compact_epochs' metadata proof rests on."""
    from osmexpress_spark.operators import shards as SH
    from osmexpress_spark.operators.sample import KNUTH

    df = spark.createDataFrame(docs, "doc_id long, text string, w long")
    parts = [
        df.where(F.col("doc_id") % n_parts == i) for i in range(n_parts)
    ]
    merged = SH.manifest_merge(
        [SH.shard_manifest(p, "doc_id", "text", "w", n_shards) for p in parts]
    )
    whole = SH.shard_manifest(df, "doc_id", "text", "w", n_shards)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # and the whole manifest matches the straight-line Python model
    want = {}
    for i, text, w in docs:
        s = (i * KNUTH) % n_shards
        h = int(hashlib.md5(f"{i}:{text}".encode()).hexdigest()[:15], 16)
        d, t, c = want.get(s, (0, 0, 0))
        want[s] = (d + 1, t + w, c ^ h)
    got = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["checksum"])
        for r in whole.collect()
    }
    assert got == want


# --- source overlap vs Python set model -------------------------------------
_srcdocs = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),
        st.lists(
            st.sampled_from(["p", "q", "r", "s"]), min_size=0, max_size=6
        ),
    ),
    min_size=1,
    max_size=12,
)


@SET
@given(docs=_srcdocs)
@pytest.mark.slow
def test_source_overlap_matches_set_model(spark, docs):
    from osmexpress_spark.operators.dedup import source_overlap

    rows = [(i, src, " ".join(ws)) for i, (src, ws) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    sets: dict[str, set] = {}
    for _, src, ws in ((i, s, w) for (i, (s, w)) in enumerate(docs)):
        sh = {
            " ".join(ws[j : j + 2]) for j in range(len(ws) - 1)
        }
        if sh:
            sets.setdefault(src, set()).update(sh)
    want = {}
    srcs = sorted(sets)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(sets[a] & sets[b])
            want[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    got = {
        (r.src_a, r.src_b): (r.n_common, r.n_a, r.n_b)
        for r in source_overlap(df, "source", "text", k=2).collect()
    }
    assert got == want
