"""Sampling/mixture operators: semantic invariants beyond the oracle
gate (determinism across partitionings, rate accuracy, quota
exactness) and the plan properties that make them scale (scan-side
predicate for rate sampling, broadcast contamination join)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from osmexpress_spark.operators import dedup, sample

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_stratified_sample_rate_and_determinism(spark):
    d = _docs(spark)
    rates = {"src0": 0.5, "src1": 0.2}
    s1 = sample.stratified_sample(d, "doc_id", "source", rates)
    ids1 = {r.doc_id for r in s1.select("doc_id").collect()}
    # repartitioning must not change the kept set (the rand() failure)
    s2 = sample.stratified_sample(
        d.repartition(7, "source"), "doc_id", "source", rates
    )
    ids2 = {r.doc_id for r in s2.select("doc_id").collect()}
    assert ids1 == ids2 and ids1
    # unlisted strata contribute nothing
    kept_sources = {r.source for r in s1.select("source").distinct().collect()}
    assert kept_sources <= {"src0", "src1"}
    # rate is approximately honored per stratum (25 docs/stratum at
    # sf0.001 -> loose bounds)
    n0 = s1.where(F.col("source") == "src0").count()
    assert 0 < n0 < 25


def test_stratified_sample_is_scan_side(spark):
    d = _docs(spark)
    s = sample.stratified_sample(d, "doc_id", "source", {"src0": 0.5})
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter: no shuffle at any scale


def test_reservoir_per_key_exact_k(spark):
    from osmexpress_spark.queries import t

    e = t(spark, SF_DIR, "events")
    r = sample.reservoir_per_key(e, "user_id", "event_id", k=5)
    per_key = r.groupBy("user_id").count().collect()
    assert per_key and all(row["count"] <= 5 for row in per_key)
    # deterministic under repartitioning
    r2 = sample.reservoir_per_key(
        e.repartition(13), "user_id", "event_id", k=5
    )
    assert {tuple(x) for x in r.select("user_id", "event_id").collect()} == {
        tuple(x) for x in r2.select("user_id", "event_id").collect()
    }


def test_global_shuffle_is_permutation(spark):
    d = _docs(spark)
    g = sample.global_shuffle(d, "doc_id").select("pos", "doc_id")
    rows = g.collect()
    n = d.count()
    assert sorted(r.pos for r in rows) == list(range(1, n + 1))
    assert len({r.doc_id for r in rows}) == n
    # not the identity order (it actually shuffles)
    assert [r.doc_id for r in sorted(rows, key=lambda r: r.pos)] != sorted(
        r.doc_id for r in rows
    )


def test_domain_mix_quota_exact(spark):
    d = _docs(spark)
    quotas = {"src0": 7, "src1": 3}
    m = sample.domain_mix_quota(d, "source", "doc_id", quotas)
    got = dict(
        (r.source, r["count"])
        for r in m.groupBy("source").count().collect()
    )
    assert got == {"src0": 7, "src1": 3}


def test_contamination_self_join_matches_bruteforce(spark):
    d = _docs(spark).limit(60).cache()
    bench = d.where(F.col("doc_id") % 7 == 0)
    got = {
        (r.doc_id, r.bench_id, r.n_common)
        for r in dedup.contamination_pairs(
            d, bench, "doc_id", "text", k=3, min_common=2
        ).collect()
    }
    # independent model: python shingle sets
    rows = [(r.doc_id, r.text) for r in d.collect()]

    def sh(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    bench_rows = [(i, sh(t)) for i, t in rows if i % 7 == 0]
    want = set()
    for i, t in rows:
        s = sh(t)
        for bi, bs in bench_rows:
            if bi == i:
                continue
            n = len(s & bs)
            if n >= 2:
                want.add((i, bi, n))
    assert got == want
    d.unpersist()


def test_contamination_broadcasts_bench_side(spark):
    d = _docs(spark)
    bench = d.where(F.col("doc_id") % 97 == 0)
    res = dedup.contamination_pairs(d, bench, "doc_id", "text", k=3)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus never shuffles for the join


def test_chunks_cover_text_with_overlap(spark):
    from osmexpress_spark.operators import text as text_mod

    d = _docs(spark).limit(40)
    W, O = 64, 16
    got = text_mod.chunks(d, "doc_id", "text", W, O).collect()
    texts = {r.doc_id: r.text for r in d.collect()}
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk_text
    step = W - O
    for doc_id, t in texts.items():
        cks = by_doc[doc_id]
        assert sorted(cks) == list(range(len(cks)))
        # chunks reconstruct the text exactly (drop the overlap prefix
        # of every chunk after the first)
        rebuilt = cks[0] + "".join(cks[i][O:] for i in range(1, len(cks)))
        assert rebuilt == t
        # every chunk is full-width except possibly the last
        assert all(len(cks[i]) == W for i in range(len(cks) - 1))
        # one more chunk would start past the end
        assert len(cks) * step + 1 > len(t) - W + step or len(cks) == 1


def test_repetition_stats_match_python(spark):
    from collections import Counter

    from osmexpress_spark.operators import text as text_mod

    d = _docs(spark).limit(50)
    got = {
        r.doc_id: (r.n_grams, r.n_distinct_grams, r.max_gram_freq)
        for r in text_mod.repetition_stats(d, "doc_id", "text", k=2).collect()
    }
    for r in d.collect():
        w = r.text.split(" ")
        grams = [" ".join(w[i : i + 2]) for i in range(max(len(w) - 2, 0) + 1)]
        c = Counter(grams)
        assert got[r.doc_id] == (len(grams), len(c), max(c.values())), r.doc_id


def test_pack_sequences_respects_order_and_budget(spark):
    from osmexpress_spark.operators import sample as sample_mod
    from osmexpress_spark.operators import text as text_mod

    d = _docs(spark).select(
        "doc_id",
        text_mod.token_count(F.col("text")).cast("long").alias("n"),
    )
    packed = sorted(
        sample_mod.pack_sequences(d, "doc_id", "n", 512).collect(),
        key=lambda r: r.doc_id,
    )
    cum = 0
    for r in packed:
        assert r.bin == cum // 512
        cum += r.n
    # bins are non-decreasing in doc order and contiguous from 0
    bins = [r.bin for r in packed]
    assert bins == sorted(bins) and bins[0] == 0


def test_pii_redact_scrubs_and_counts(spark):
    from osmexpress_spark.operators import text as text_mod

    rows = [
        (1, "contact alice@example.com or bob@corp.io today"),
        (2, "no pii here"),
        (3, "x@y.zz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n, r.red)
        for r in df.select(
            "doc_id",
            text_mod.pii_count(F.col("text")).alias("n"),
            text_mod.pii_redact(F.col("text")).alias("red"),
        ).collect()
    }
    assert got[1] == (2, "contact <REDACTED> or <REDACTED> today")
    assert got[2] == (0, "no pii here")
    assert got[3] == (1, "<REDACTED>")


def test_global_shuffle_sharded_is_parallel_permutation(spark):
    g = sample.global_shuffle_sharded(_docs(spark), "doc_id", shards=8)
    rows = g.select("doc_id", "shard", "pos").collect()
    n = len({r.doc_id for r in rows})
    assert n == _docs(spark).count()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    # positions are contiguous 1..k within every shard
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # the window is hash-partitioned (parallel), not single-partition
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan
    assert "Exchange SinglePartition" not in plan


def test_train_eval_split_deterministic_and_proportional(spark):
    d = _docs(spark)
    s1 = {(r.doc_id, r.split) for r in
          sample.train_eval_split(d, "doc_id", 50).select("doc_id", "split").collect()}
    s2 = {(r.doc_id, r.split) for r in
          sample.train_eval_split(d.repartition(5), "doc_id", 50)
          .select("doc_id", "split").collect()}
    assert s1 == s2
    n_eval = sum(1 for _, sp in s1 if sp == "eval")
    assert 0 < n_eval < len(s1) * 0.15  # ~5% of 500, loose bound


def test_quality_buckets_exact_and_threshold_agree_on_clean_quartiles(spark):
    """With a uniform score distribution the approx-threshold path
    reproduces the exact NTILE split; bucket 1 is the best scores."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id long, score double"
    )
    exact = {
        r["id"]: r["bucket"]
        for r in sample.quality_buckets(df, "score", "id", n_buckets=4).collect()
    }
    approx = {
        r["id"]: r["bucket"]
        for r in sample.quality_buckets_by_threshold(
            df, "score", n_buckets=4, relative_error=0.0001
        ).collect()
    }
    assert exact[100] == 1 and exact[1] == 4
    # both assign monotone buckets; the approx cut may move ties by one
    # id at a boundary, never more
    diffs = [i for i in exact if exact[i] != approx[i]]
    assert len(diffs) <= 3  # one per boundary


def test_quality_buckets_threshold_is_scan_side(spark):
    df = spark.createDataFrame(
        [(i, float(i % 17)) for i in range(1000)], "id long, score double"
    )
    out = sample.quality_buckets_by_threshold(df, "score", n_buckets=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan          # no global sort window
    assert "Exchange hashpartitioning" not in plan


def test_boilerplate_ngrams_counts_distinct_docs(spark):
    from osmexpress_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [
            (1, "click here to subscribe now"),
            (2, "click here to subscribe today"),
            (3, "click here to unsubscribe"),
            (4, "totally original content piece"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["gram"]: r["n_docs"]
        for r in text_ops.boilerplate_ngrams(
            docs, "doc_id", "text", n=3, min_docs=2
        ).collect()
    }
    assert got["click here to"] == 3
    assert got["here to subscribe"] == 2
    assert "totally original content" not in got


@pytest.mark.slow
def test_temperature_mixture_rates_and_determinism(spark):
    from osmexpress_spark.operators.sample import (
        KNUTH, temperature_mixture,
    )
    import math

    # domains: a=200 docs, b=50, c=10 (ids partition the ranges)
    rows = [(i, "a") for i in range(200)]
    rows += [(200 + i, "b") for i in range(50)]
    rows += [(250 + i, "c") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    kept = temperature_mixture(df, "domain", alpha=0.5).collect()
    by_dom: dict[str, set] = {}
    for r in kept:
        by_dom.setdefault(r.domain, set()).add(r.doc_id)
    # smallest domain keeps everything
    assert by_dom["c"] == set(range(250, 260))
    # python model of the same threshold math
    for dom, n in (("a", 200), ("b", 50), ("c", 10)):
        cut = math.floor((n / 10) ** -0.5 * 1_000_000)
        ids = {i for i, d in rows if d == dom
               and (i * KNUTH) % 1_000_000 < cut}
        assert by_dom.get(dom, set()) == ids, dom
    # determinism: second run identical
    again = temperature_mixture(df, "domain", alpha=0.5).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, kept))


@pytest.mark.slow
def test_write_training_shards_layout_and_order(spark, tmp_path):
    from osmexpress_spark.operators.sample import global_shuffle_sharded
    from osmexpress_spark.sources.sink import write_training_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    out = str(tmp_path / "shards")
    dirs = write_training_shards(df, out, shards=4)
    assert dirs == [f"shard={s}" for s in range(4)]
    back = spark.read.parquet(out)
    assert back.count() == 200
    # every shard is one file, rows inside are pos-ascending, and the
    # (shard, pos) assignment replays global_shuffle_sharded exactly
    import glob
    want = {(r.doc_id): (r.shard, r.pos)
            for r in global_shuffle_sharded(df, "doc_id", 4).collect()}
    for s in range(4):
        files = glob.glob(f"{out}/shard={s}/*.parquet")
        assert len(files) == 1, files
        rows = spark.read.parquet(files[0]).collect()
        poss = [r.pos for r in rows]
        assert poss == sorted(poss)
        for r in rows:
            assert want[r.doc_id] == (s, r.pos)


def test_temperature_mixture_excludes_null_domains(spark):
    from osmexpress_spark.operators.sample import temperature_mixture
    rows = [(i, "a") for i in range(100)] + [(100, None)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    kept = temperature_mixture(df, "domain", alpha=0.5).collect()
    # single real domain => rate 1 (n_min = its own count), all kept;
    # the NULL row is excluded rather than silently poisoning n_min
    assert sorted(r.doc_id for r in kept) == list(range(100))


def test_read_training_shards_round_robin_order(spark, tmp_path):
    from osmexpress_spark.sources.sink import (
        read_training_shards, write_training_shards,
    )
    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(60)], "doc_id long, text string"
    )
    out = str(tmp_path / "s")
    write_training_shards(df, out, shards=3)
    rows = read_training_shards(spark, out).collect()
    assert len(rows) == 60
    order = [(r.pos, r.shard) for r in rows]
    assert order == sorted(order)


def test_global_shuffle_rejects_null_ids(spark):
    import pytest
    from osmexpress_spark.operators.sample import (
        global_shuffle, global_shuffle_sharded,
    )
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, "c")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="NULL"):
        global_shuffle(df, "doc_id")
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception) as ei:
        global_shuffle_sharded(df, "doc_id", shards=4).collect()
    assert "NULL id" in str(ei.value)


@pytest.mark.slow
def test_pack_balanced_loads_within_one_max_doc(spark):
    from osmexpress_spark.operators.sample import pack_balanced

    rows = [(i, 10 + (i * 37) % 90) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    budget = 500
    out = pack_balanced(df, "doc_id", "n", budget).collect()
    total = sum(n for _, n in rows)
    nbins = -(-total // budget)
    loads: dict[int, int] = {}
    for r in out:
        loads[r.bin] = loads.get(r.bin, 0) + r.n
    assert set(loads) == set(range(nbins))
    # LPT round-robin: spread bounded by the largest document
    assert max(loads.values()) - min(loads.values()) <= max(n for _, n in rows)
    # deterministic
    again = pack_balanced(df, "doc_id", "n", budget).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_budget_select_by_model_and_plan(spark):
    """Per-domain greedy budgets vs a hand model: each key fills its
    own budget greedily (order desc, id tie-break), unlisted keys
    contribute nothing, int budget applies uniformly, and the plan
    windows by key (no single-partition sort)."""
    from osmexpress_spark.operators import sample

    rows = [
        # (id, key, weight): key 'a' budget 25 -> picks w=10,9,5 (cum 24)
        (1, "a", 10), (2, "a", 9), (3, "a", 5), (4, "a", 2),
        # key 'b' budget 10 -> picks w=8 (cum 8); next w=8 would hit 16
        (5, "b", 8), (6, "b", 8),
        # key 'c' unlisted -> nothing
        (7, "c", 1),
    ]
    d = spark.createDataFrame(rows, "doc_id long, k string, w long")
    got = sample.budget_select_by(
        d, "k", F.col("w"), F.col("w"), {"a": 25, "b": 10}, "doc_id"
    )
    picked = {r["doc_id"]: (r["cum_w"], r["budget"]) for r in got.collect()}
    assert picked == {1: (10, 25), 2: (19, 25), 3: (24, 25), 5: (8, 10)}
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # uniform int budget
    uni = sample.budget_select_by(
        d, "k", F.col("w"), F.col("w"), 9, "doc_id"
    ).collect()
    # 'a' orders w desc, so its first cum is already 10 > 9 and greedy
    # running-total semantics exclude everything after; b keeps 8, c 1
    assert {r["doc_id"] for r in uni} == {5, 7}
    import pytest as _p

    with _p.raises(ValueError, match="empty budget"):
        sample.budget_select_by(d, "k", F.col("w"), F.col("w"), {}, "doc_id")
    with _p.raises(ValueError, match="nonnegative"):
        sample.budget_select_by(
            d, "k", F.col("w"), F.col("w"), {"a": -1}, "doc_id"
        )
