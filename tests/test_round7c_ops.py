"""Round-7 fifth-session operators: the pre-aggregated rollup store.
Pinned against a straight-line Python model of the cents partials plus
merge-algebra, append, pruning-plan, meta-guard, and streaming checks."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from osmexpress_spark.operators import rollup as R


def _events(spark, rows):
    """rows: (event_id, iso_ts, event_type, value)."""
    data = [
        (eid, dt.datetime.fromisoformat(ts), etype, val)
        for eid, ts, etype, val in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, event_type string, value double"
    )


_ROWS = [
    (1, "2024-01-01T03:15:00", "click", 1.25),
    (2, "2024-01-01T21:59:59", "click", -0.10),
    (3, "2024-01-01T21:59:59", "view", 7.77),
    (4, "2024-01-02T00:00:00", "click", 100.00),
    (5, "2024-01-03T12:00:00", "view", 0.333),
    (6, "2024-01-03T12:30:00", "view", 2.50),
    (7, "2024-01-05T08:00:00", "error", 9.99),
]


def _model(rows, start, end, by_type=True):
    """Straight-line merge model over exact floor-cents."""
    import math

    agg = {}
    s, e = dt.date.fromisoformat(start), dt.date.fromisoformat(end)
    for _eid, ts, etype, val in rows:
        day = dt.datetime.fromisoformat(ts).date()
        if not (s <= day <= e):
            continue
        cents = math.floor(val * 100)
        key = etype if by_type else ()
        n, sm, mn, mx = agg.get(key, (0, 0, None, None))
        agg[key] = (
            n + 1,
            sm + cents,
            cents if mn is None else min(mn, cents),
            cents if mx is None else max(mx, cents),
        )
    return {
        k: (n, sm, mn, mx, float(sm) / float(100 * n))
        for k, (n, sm, mn, mx) in agg.items()
    }


def test_rollup_store_range_matches_model(spark, tmp_path):
    ev = _events(spark, _ROWS)
    store = str(tmp_path / "store")
    R.save_rollup_store(ev, store, key_cols=["event_type"])
    out = {
        r["event_type"]: (
            r["n_events"], r["sum_cents"], r["min_cents"], r["max_cents"],
            r["avg_value"],
        )
        for r in R.rollup_range(
            spark, store, "2024-01-01", "2024-01-03", by=["event_type"]
        ).collect()
    }
    assert out == _model(_ROWS, "2024-01-01", "2024-01-03")
    # grand total (empty `by`): one row folding every surviving partial
    tot = R.rollup_range(spark, store, "2024-01-01", "2024-01-05").collect()
    assert len(tot) == 1
    m = _model(_ROWS, "2024-01-01", "2024-01-05", by_type=False)[()]
    r = tot[0]
    assert (
        r["n_events"], r["sum_cents"], r["min_cents"], r["max_cents"],
        r["avg_value"],
    ) == m


def test_rollup_series_folds_duplicate_partials(spark, tmp_path):
    """An append-heavy store holds multiple partial rows per (bucket,
    key); the series read folds them back to one row per bucket."""
    ev = _events(spark, _ROWS)
    store = str(tmp_path / "store")
    R.save_rollup_store(ev, store, key_cols=["event_type"])
    R.append_rollup_epoch(_events(spark, _ROWS), store)  # duplicate epoch
    series = R.rollup_series(
        spark, store, "2024-01-01", "2024-01-01", by=["event_type"]
    ).collect()
    by_key = {(r["bucket"], r["event_type"]): r for r in series}
    assert len(series) == 2  # one (day, type) row each, not two epochs
    clk = by_key[(dt.datetime(2024, 1, 1), "click")]
    # doubled counts/sums, idempotent min/max
    assert (clk["n_events"], clk["sum_cents"]) == (4, 2 * (125 - 10))
    assert (clk["min_cents"], clk["max_cents"]) == (-10, 125)


def test_rollup_merge_algebra(spark, tmp_path):
    """merge(parts) == rollup(union): split the events arbitrarily,
    build partials per part, fold — identical to the one-shot store."""
    ev = _events(spark, _ROWS)
    parts = [
        R.rollup_partials(_events(spark, _ROWS[:3]), key_cols=["event_type"]),
        R.rollup_partials(_events(spark, _ROWS[3:5]), key_cols=["event_type"]),
        R.rollup_partials(_events(spark, _ROWS[5:]), key_cols=["event_type"]),
    ]
    merged = {
        tuple(r): None
        for r in R.merge_rollup_partials(parts, ["event_type"]).collect()
    }
    whole = {
        tuple(r): None
        for r in R._merge(
            R.rollup_partials(ev, key_cols=["event_type"]), ["event_type"]
        ).collect()
    }
    assert merged == whole


@pytest.mark.slow
def test_rollup_append_epoch_equals_oneshot(spark, tmp_path):
    store1 = str(tmp_path / "s1")
    store2 = str(tmp_path / "s2")
    R.save_rollup_store(
        _events(spark, _ROWS[:4]), store1, key_cols=["event_type"]
    )
    R.append_rollup_epoch(_events(spark, _ROWS[4:]), store1)
    R.save_rollup_store(_events(spark, _ROWS), store2, key_cols=["event_type"])
    a = sorted(
        tuple(r)
        for r in R.rollup_range(
            spark, store1, "2024-01-01", "2024-01-05", by=["event_type"]
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in R.rollup_range(
            spark, store2, "2024-01-01", "2024-01-05", by=["event_type"]
        ).collect()
    )
    assert a == b


def test_rollup_range_prunes_partitions(spark, tmp_path):
    """The range predicate must land as a directory-level partition
    filter on the bucket partition copy, not a post-scan filter."""
    ev = _events(spark, _ROWS)
    store = str(tmp_path / "store")
    R.save_rollup_store(ev, store, key_cols=["event_type"])
    plan = (
        R.rollup_range(spark, store, "2024-01-02", "2024-01-03")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    seg = plan[plan.index("PartitionFilters"):]
    assert "bucket_part" in seg[: seg.index("]")]
    # and the pruned read really excludes the other days' rows
    rows = R.rollup_range(
        spark, store, "2024-01-02", "2024-01-03", by=["event_type"]
    ).collect()
    assert {r["event_type"] for r in rows} == {"click", "view"}


def test_rollup_meta_guard_and_grains(spark, tmp_path):
    ev = _events(spark, _ROWS)
    store = str(tmp_path / "store")
    R.save_rollup_store(ev, store, key_cols=["event_type"], grain="hour")
    with pytest.raises(ValueError, match="grain"):
        R.rollup_range(spark, store, "2024-01-01", "2024-01-02", grain="day")
    with pytest.raises(ValueError, match="grain"):
        R.save_rollup_store(ev, str(tmp_path / "bad"), grain="minute")
    # hour-grain series: 2024-01-01 has three distinct hours
    series = R.rollup_series(
        spark, store, "2024-01-01", "2024-01-01 23:00:00", grain="hour"
    ).collect()
    assert {r["bucket"].hour for r in series} == {3, 21}


@pytest.mark.slow
def test_rollup_stream_two_epochs(spark, tmp_path):
    """Continuous ingest: each micro-batch appends its own partials;
    the reader's fold makes the store equal to the one-shot rollup of
    everything ingested so far."""
    base = str(tmp_path)
    ev = _events(spark, _ROWS)
    for cut in (4, len(_ROWS)):
        lo = 0 if cut == 4 else 4
        _events(spark, _ROWS[lo:cut]).coalesce(1).write.mode("append").parquet(
            base + "/feed"
        )
    stream = (
        spark.readStream.schema(spark.read.parquet(base + "/feed").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/feed")
    )
    R.rollup_stream(
        stream, base + "/store", base + "/ckpt", key_cols=["event_type"]
    ).awaitTermination()
    got = sorted(
        tuple(r)
        for r in R.rollup_range(
            spark, base + "/store", "2024-01-01", "2024-01-05",
            by=["event_type"],
        ).collect()
    )
    oneshot = str(tmp_path / "oneshot")
    R.save_rollup_store(ev, oneshot, key_cols=["event_type"])
    want = sorted(
        tuple(r)
        for r in R.rollup_range(
            spark, oneshot, "2024-01-01", "2024-01-05", by=["event_type"]
        ).collect()
    )
    assert got == want
    # replay: a fresh checkpoint redelivers every batch; epoch-keyed
    # overwrite keeps the store EXACT (no double counting)
    stream2 = (
        spark.readStream.schema(spark.read.parquet(base + "/feed").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/feed")
    )
    R.rollup_stream(
        stream2, base + "/store", base + "/ckpt2", key_cols=["event_type"]
    ).awaitTermination()
    replayed = sorted(
        tuple(r)
        for r in R.rollup_range(
            spark, base + "/store", "2024-01-01", "2024-01-05",
            by=["event_type"],
        ).collect()
    )
    assert replayed == want
    # drifted keying must raise, not silently merge
    stream3 = (
        spark.readStream.schema(spark.read.parquet(base + "/feed").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/feed")
    )
    q = R.rollup_stream(
        stream3, base + "/store", base + "/ckpt3", key_cols=["user_id"]
    )
    with pytest.raises(Exception, match="built with"):
        q.awaitTermination()
    # a streamed store refuses the batch append path
    with pytest.raises(ValueError, match="epoch-layout"):
        R.append_rollup_epoch(ev, base + "/store")


def test_rollup_bad_bound_raises(spark, tmp_path):
    ev = _events(spark, _ROWS)
    store = str(tmp_path / "store")
    R.save_rollup_store(ev, store, key_cols=["event_type"])
    with pytest.raises(ValueError, match="bound"):
        R.rollup_range(spark, store, "01-05-2024", "2024-01-06")
    with pytest.raises(ValueError, match="bound"):
        R.rollup_series(spark, store, "2024-01-01", "2024-02-30")


# --- feature-hashing vectorizer ---------------------------------------------

import hashlib


def _hash_model(text, dim=64):
    v = [0] * dim
    for w in (text or "").split(" "):
        b = int(hashlib.md5(w.encode()).hexdigest()[:12], 16) % dim
        v[b] += 1
    return v


def test_hashed_features_matches_model(spark):
    from osmexpress_spark.operators import text as T

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, ""),
        (3, None),
        (4, "spark spark spark hash join"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["v"])
        for r in df.select(
            "doc_id", T.hashed_features(F.col("text"), dim=16).alias("v")
        ).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == [float(c) for c in _hash_model(text, 16)], doc_id
    # stats derive from the same vector
    st = {
        r["doc_id"]: (r["nnz"], r["l2sq"], r["top_bucket"])
        for r in T.hashed_features_stats(df, dim=16).collect()
    }
    for doc_id, text in rows:
        m = _hash_model(text, 16)
        nnz = sum(1 for c in m if c)
        l2 = sum(c * c for c in m)
        top = m.index(max(m))
        assert st[doc_id] == (nnz, l2, top), doc_id


def test_hashed_features_is_jvm_side(spark):
    from osmexpress_spark.operators import text as T

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        T.hashed_features_stats(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.slow
def test_hashed_features_feed_kmeans(spark):
    """The bridge into the embedding stack: two token-disjoint doc
    families vectorize into linearly separable hashed vectors, and
    kmeans_train_distributed recovers the families exactly."""
    from osmexpress_spark.operators import similarity as S
    from osmexpress_spark.operators import text as T

    docs = [(i, "alpha beta gamma delta " * 3) for i in range(10)] + [
        (i, "omega psi chi phi " * 3) for i in range(10, 20)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    vec = df.select(
        F.col("doc_id").alias("vec_id"),
        T.hashed_features(F.col("text"), dim=16).alias("embedding"),
    )
    asg = {
        r["vec_id"]: r["cluster"]
        for r in S.kmeans_train_distributed(
            vec, dim=16, k=2, iters=3
        ).collect()
    }
    fam_a = {asg[i] for i in range(10)}
    fam_b = {asg[i] for i in range(10, 20)}
    assert len(fam_a) == 1 and len(fam_b) == 1 and fam_a != fam_b


def test_hashed_features_feed_semantic_dedup(spark):
    """Text-only semantic dedup: hashed vectors make bag-of-words
    equivalence geometric — token-permuted rewrites land on the SAME
    vector (cosine 1, dropped at the 0.95 threshold) while distinct
    texts in the same cluster stay below it and survive."""
    from osmexpress_spark.operators import similarity as S
    from osmexpress_spark.operators import text as T

    base = "solar panels convert sunlight into electric power"
    shuffled = "electric power convert panels sunlight into solar"
    docs = [(1, base), (2, shuffled), (3, "deep ocean currents move heat"),
            (4, "parrots imitate human speech sounds"),
            (5, "glaciers carve valleys over millennia"),
            (6, "compilers translate source code to machine code")]
    vec = spark.createDataFrame(docs, "doc_id long, text string").select(
        F.col("doc_id").alias("vec_id"),
        T.hashed_features(F.col("text"), dim=32).alias("embedding"),
    )
    out = {r["id"]: r for r in S.semantic_dedup(
        vec, dim=32, n_centroids=2, threshold=0.95
    ).collect()}
    assert len(out) == 6
    # the permuted rewrite collapses onto doc 1's vector: exactly one
    # of the pair survives
    assert out[1]["keep"] != out[2]["keep"]
    assert out[2]["rep_sim"] == 1.0 or out[1]["rep_sim"] == 1.0
    # every distinct text survives
    assert all(out[i]["keep"] for i in (3, 4, 5, 6))


@pytest.mark.slow
def test_rollup_regrain_cascade(spark, tmp_path):
    """hour -> day regrain from the partials alone is bit-identical to
    a day store built from the raw events; coarsen-only is enforced."""
    ev = _events(spark, _ROWS)
    hour_store = str(tmp_path / "hour")
    day_direct = str(tmp_path / "day")
    day_derived = str(tmp_path / "day2")
    R.save_rollup_store(ev, hour_store, key_cols=["event_type"], grain="hour")
    R.save_rollup_store(ev, day_direct, key_cols=["event_type"], grain="day")
    R.rollup_regrain(spark, hour_store, day_derived, "day")
    a = sorted(
        tuple(r)
        for r in R.rollup_series(
            spark, day_derived, "2024-01-01", "2024-01-05",
            by=["event_type"], grain="day",
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in R.rollup_series(
            spark, day_direct, "2024-01-01", "2024-01-05",
            by=["event_type"], grain="day",
        ).collect()
    )
    assert a == b and len(a) > 0
    with pytest.raises(ValueError, match="coarsen"):
        R.rollup_regrain(spark, day_direct, str(tmp_path / "x"), "hour")
    with pytest.raises(ValueError, match="coarsen"):
        R.rollup_regrain(spark, day_direct, str(tmp_path / "x"), "day")


@pytest.mark.slow
def test_rollup_quantiles_bracket_truth(spark, tmp_path):
    """The sketch sidecar answers range quantiles with [lo, hi] cents
    bounds that bracket the TRUE quantile of the raw values in the
    range — globally and per key — and a store built without the
    sidecar refuses the query."""
    import math

    rows = [
        (i, f"2024-01-{1 + i % 5:02d}T10:00:00",
         "a" if i % 3 else "b", float(i) * 0.37)
        for i in range(1, 121)
    ]
    ev = _events(spark, rows)
    store = str(tmp_path / "store")
    R.save_rollup_store(ev, store, key_cols=["event_type"], sketch_bits=4)

    def true_q(vals, num, den):
        vals = sorted(vals)
        rank = -(-num * len(vals) // den)  # ceil
        return vals[rank - 1]

    in_range = [
        (etype, math.floor(val * 100))
        for _i, ts, etype, val in rows
        if "2024-01-01" <= ts[:10] <= "2024-01-03"
    ]
    # global
    got = {
        (r["q_num"], r["q_den"]): (r["lo"], r["hi"])
        for r in R.rollup_quantiles(
            spark, store, "2024-01-01", "2024-01-03",
            [(1, 2), (99, 100)],
        ).collect()
    }
    allv = [c for _t, c in in_range]
    for (num, den), (lo, hi) in got.items():
        t = true_q(allv, num, den)
        assert lo <= t <= hi, (num, den, lo, t, hi)
    # per key
    by = {
        (r["event_type"], r["q_num"], r["q_den"]): (r["lo"], r["hi"])
        for r in R.rollup_quantiles(
            spark, store, "2024-01-01", "2024-01-03", [(1, 2)],
            by=["event_type"],
        ).collect()
    }
    for etype in ("a", "b"):
        vals = [c for t, c in in_range if t == etype]
        lo, hi = by[(etype, 1, 2)]
        t = true_q(vals, 1, 2)
        assert lo <= t <= hi, (etype, lo, t, hi)
    # no sidecar -> explicit refusal
    bare = str(tmp_path / "bare")
    R.save_rollup_store(ev, bare, key_cols=["event_type"])
    with pytest.raises(ValueError, match="sidecar"):
        R.rollup_quantiles(spark, bare, "2024-01-01", "2024-01-02", [(1, 2)])


@pytest.mark.slow
def test_rollup_quantiles_follow_appends_and_streams(spark, tmp_path):
    """The sketch sidecar stays in lockstep across every write path:
    batch appends extend it, and a streamed store with sketch_bits
    answers the same quantiles as a one-shot sketched store."""
    rows = [
        (i, f"2024-01-{1 + i % 3:02d}T09:00:00", "t", float(i))
        for i in range(1, 61)
    ]
    ev = _events(spark, rows)
    # batch: save half, append half -> same answers as one-shot
    half = str(tmp_path / "half")
    full = str(tmp_path / "full")
    R.save_rollup_store(_events(spark, rows[:30]), half, sketch_bits=4)
    R.append_rollup_epoch(_events(spark, rows[30:]), half)
    R.save_rollup_store(ev, full, sketch_bits=4)
    qa = sorted(
        tuple(r)
        for r in R.rollup_quantiles(
            spark, half, "2024-01-01", "2024-01-03", [(1, 2), (9, 10)]
        ).collect()
    )
    qb = sorted(
        tuple(r)
        for r in R.rollup_quantiles(
            spark, full, "2024-01-01", "2024-01-03", [(1, 2), (9, 10)]
        ).collect()
    )
    assert qa == qb and len(qa) == 2
    # streaming: two epochs, sketch sidecar lands per epoch
    base = str(tmp_path)
    for lo, hi in ((0, 30), (30, 60)):
        _events(spark, rows[lo:hi]).coalesce(1).write.mode("append").parquet(
            base + "/feed"
        )
    stream = (
        spark.readStream.schema(spark.read.parquet(base + "/feed").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base + "/feed")
    )
    R.rollup_stream(
        stream, base + "/sstore", base + "/ckpt", sketch_bits=4
    ).awaitTermination()
    qs = sorted(
        tuple(r)
        for r in R.rollup_quantiles(
            spark, base + "/sstore", "2024-01-01", "2024-01-03",
            [(1, 2), (9, 10)],
        ).collect()
    )
    assert qs == qb


@pytest.mark.slow
def test_rollup_distinct_sidecar(spark, tmp_path):
    """KMV distinct sidecar: exact below k (the common dashboard
    case), deduplicated across cells (a user active on many days
    counts once per range), per-group and global, append-lockstep,
    and explicit refusal without the sidecar."""
    rows = [
        # user u{i%7} fires on multiple days and both types
        (i, f"2024-01-{1 + i % 4:02d}T12:00:00",
         "a" if i % 2 else "b", float(i % 7))
        for i in range(1, 41)
    ]
    data = [
        (eid, dt.datetime.fromisoformat(ts), etype, val)
        for eid, ts, etype, val in rows
    ]
    ev = spark.createDataFrame(
        data, "event_id long, ts timestamp, event_type string, value double"
    ).withColumn("user_id", (F.col("event_id") % 7))
    store = str(tmp_path / "store")
    R.save_rollup_store(
        ev, store, key_cols=["event_type"], distinct_col="user_id"
    )
    # global over the full range: 7 distinct users despite 40 events
    g = R.rollup_distinct(spark, store, "2024-01-01", "2024-01-04").collect()
    assert len(g) == 1 and g[0]["est_distinct"] == 7.0
    # per type: evens -> type b, odds -> type a; users split by parity of id%7 cycle
    by = {
        r["event_type"]: r["est_distinct"]
        for r in R.rollup_distinct(
            spark, store, "2024-01-01", "2024-01-04", by=["event_type"]
        ).collect()
    }
    truth = {}
    for eid, _ts, etype, _v in rows:
        truth.setdefault(etype, set()).add(eid % 7)
    assert by == {k: float(len(v)) for k, v in truth.items()}
    # narrower range matches the exact distinct of that range
    nar = R.rollup_distinct(spark, store, "2024-01-02", "2024-01-03").collect()
    want = len({eid % 7 for eid, ts, _t, _v in rows
                if "2024-01-02" <= ts[:10] <= "2024-01-03"})
    assert nar[0]["est_distinct"] == float(want)
    # append keeps the sidecar in lockstep
    extra = ev.withColumn("user_id", F.col("user_id") + 100)
    R.append_rollup_epoch(extra, store)
    g2 = R.rollup_distinct(spark, store, "2024-01-01", "2024-01-04").collect()
    assert g2[0]["est_distinct"] == 14.0
    # no sidecar -> refusal
    bare = str(tmp_path / "bare")
    R.save_rollup_store(ev, bare, key_cols=["event_type"])
    with pytest.raises(ValueError, match="sidecar"):
        R.rollup_distinct(spark, bare, "2024-01-01", "2024-01-02")
