"""Round-6 regression tests: the four ADVICE r05 closures and the
staged q_bpe_merges oracle machinery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_signature_store_roundtrips_through_hadoop_fs(spark, tmp_path):
    """ADVICE r05 #1: meta.json must live on the SAME filesystem as the
    signature parquet. Writing the store to an explicit file: URI goes
    through Spark's Hadoop FS layer end-to-end — the old local open()
    on such a path would have created a literal './file:...' directory
    (or failed), splitting the store."""
    from osmexpress_spark.operators import dedup

    store = "file:" + str(tmp_path / "sigstore")
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(40)
    sigs = dedup.ensure_signature_store(
        docs, store, "doc_id", "text", n_hashes=8, k=2, fingerprint="a"
    )
    assert sigs.count() > 0
    # no stray local directory named 'file:...' (the old failure mode)
    import os

    assert not any(n.startswith("file:") for n in os.listdir("."))
    # sidecar is readable back through the same layer: unchanged
    # fingerprint serves without rebuild, changed fingerprint rebuilds
    again = dedup.ensure_signature_store(
        docs, store, "doc_id", "text", n_hashes=8, k=2, fingerprint="a"
    )
    assert again.count() == sigs.count()
    with pytest.raises(ValueError, match="built with"):
        dedup.load_signature_store(spark, store, "doc_id", n_hashes=4, k=2)


def test_kmeans_rejects_coordinates_outside_offset_range(spark):
    """ADVICE r05 #2: a coordinate < -2 yields negative offset micros,
    where Python floor-div and DuckDB truncate-div diverge — the
    quantizer must fail loudly instead."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from osmexpress_spark.operators import similarity

    bad = spark.createDataFrame(
        [(1, [0.5, -3.0]), (2, [0.1, 0.2])],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(SparkRuntimeException, match="KM_OFFSET"):
        similarity.kmeans_train_distributed(
            bad, dim=2, k=2, iters=1
        ).collect()
    ok = spark.createDataFrame(
        [(1, [-2.0, 0.0]), (2, [0.1, 0.2]), (3, [1.5, -1.5])],
        "vec_id bigint, embedding array<double>",
    )
    got = similarity.kmeans_train_distributed(ok, dim=2, k=2, iters=1)
    assert got.count() == 3  # boundary x = -2 quantizes to exactly 0


def test_bpe_encode_rejects_reserved_id_col(spark):
    """ADVICE r05 #4: an id column named like the output/internal
    columns must fail loudly, not produce ambiguous duplicates."""
    from osmexpress_spark.operators import bpe

    df = spark.createDataFrame([(1, "ab")], "tokens bigint, text string")
    with pytest.raises(ValueError, match="id_col"):
        bpe.bpe_encode(df, "tokens", F.col("text"), [("a", "b")])
    df2 = spark.createDataFrame([(1, "ab")], "_t bigint, text string")
    with pytest.raises(ValueError, match="id_col"):
        bpe.bpe_encode(df2, "_t", F.col("text"), [("a", "b")])


def test_bpe_merges_query_matches_train_loop(spark):
    """The staged q_bpe_merges contract query returns exactly
    bpe_train's merge table (rank-aligned) — the query is a thin
    wrapper, so a drift between the two would be a registration bug."""
    from osmexpress_spark import queries_data as QD
    from osmexpress_spark.operators import bpe

    sf = "/root/testdata/sf0.001"
    got = sorted(
        map(
            tuple,
            QD.PENDING_SPARK_QUERIES["q_bpe_merges"](spark, sf).collect(),
        )
    )
    d = spark.read.parquet(sf + "/documents.parquet")
    merges = bpe.bpe_train(
        bpe.word_counts(d, F.col("text")), n_merges=QD._BPE_N_MERGES
    )
    assert got == [(i + 1, a, b) for i, (a, b) in enumerate(merges)]
    # the loop feedback is actually exercised at this SF: some merge
    # consumes a previously-merged (multi-char) symbol
    assert any(len(a) > 1 or len(b) > 1 for _, a, b in got)


def test_exact_quantiles_by_sharded_past_group_cap(spark):
    """VERDICT r05 ask #5: >4096 groups, exact results. The unsharded
    operator must refuse; the sharded escape hatch must agree with the
    sorted-list model on every group while each shard keeps the
    bounded-driver contract (its own <=4096-group refinement)."""
    import random

    from osmexpress_spark.operators import sketch

    rng = random.Random(66)
    rows, model = [], {}
    qs = [(50, 100), (9, 10)]
    for g in range(5000):
        key = f"g{g:04d}"
        vals = [rng.randrange(0, 10_000) for _ in range(rng.randrange(3, 8))]
        rows.extend((key, v) for v in vals)
        sv, n = sorted(vals), len(vals)
        for num, den in qs:
            rank = -(-num * n // den)
            model[(key, num, den)] = (rank, sv[rank - 1])
    df = spark.createDataFrame(rows, "k string, v long").repartition(8)

    with pytest.raises(ValueError, match="sharded"):
        sketch.exact_quantiles_by(df, F.col("k"), F.col("v"), qs)

    got = sketch.exact_quantiles_by_sharded(
        df, F.col("k"), F.col("v"), qs
    ).collect()
    assert len(got) == len(model)
    for r in got:
        rank, value = model[(r["key"], r["q_num"], r["q_den"])]
        assert (r["rank"], r["value"]) == (rank, value), r
