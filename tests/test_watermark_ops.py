"""watermark_ops must behave identically on batch DataFrames (where
they degrade to dropDuplicates / plain range join) and bound state on
streams — the streaming paths are exercised end-to-end by the contract
queries q_stream_dedup / q_stream_interval_join in oracle parity."""

from __future__ import annotations

import pytest

import datetime as dt

from pyspark.sql import functions as F

from osmexpress_spark.streaming import watermark_ops

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_dedup_batch_fallback(spark):
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(1)), (2, _ts(2))], "k long, ts timestamp"
    )
    got = watermark_ops.dedup_stream(df, keys=["k"])
    assert got.count() == 2
    assert sorted(r.k for r in got.select("k").collect()) == [1, 2]


def test_interval_join_batch_matches_sql(spark):
    left = spark.createDataFrame(
        [(10, 1, _ts(0)), (11, 1, _ts(30)), (12, 2, _ts(0))],
        "lid long, user_id long, v_ts timestamp",
    )
    right = spark.createDataFrame(
        [(20, 1, _ts(5)), (21, 1, _ts(90)), (22, 3, _ts(5))],
        "rid long, user_id long, p_ts timestamp",
    )
    got = watermark_ops.interval_join(
        left,
        right,
        on="user_id",
        left_ts="v_ts",
        right_ts="p_ts",
        upper="INTERVAL 1 HOUR",
    )
    # (10,20): +5min in range; (11,21): +60min boundary inclusive;
    # (10,21): +90min out; (12,*): user 2 has no right rows
    assert sorted((r.lid, r.rid) for r in got.collect()) == [(10, 20), (11, 21)]
    assert "user_id" in got.columns and got.columns.count("user_id") == 1


def test_interval_join_self_source(spark):
    # both sides projected from the SAME DataFrame — the ambiguous
    # self-join regime the alias qualification exists for
    base = spark.createDataFrame(
        [(1, 1, "a", _ts(0)), (2, 1, "b", _ts(10)), (3, 1, "b", _ts(200))],
        "id long, user_id long, kind string, ts timestamp",
    )
    a = base.where(F.col("kind") == "a").select(
        F.col("id").alias("aid"), "user_id", F.col("ts").alias("a_ts")
    )
    b = base.where(F.col("kind") == "b").select(
        F.col("id").alias("bid"), "user_id", F.col("ts").alias("b_ts")
    )
    got = watermark_ops.interval_join(
        a, b, on="user_id", left_ts="a_ts", right_ts="b_ts",
        upper="INTERVAL 1 HOUR",
    )
    assert [(r.aid, r.bid) for r in got.collect()] == [(1, 2)]


def test_interval_join_left_outer(spark):
    left = spark.createDataFrame(
        [(10, 1, _ts(0)), (12, 2, _ts(0))], "lid long, user_id long, v_ts timestamp"
    )
    right = spark.createDataFrame(
        [(20, 1, _ts(5))], "rid long, user_id long, p_ts timestamp"
    )
    got = watermark_ops.interval_join(
        left, right, on="user_id", left_ts="v_ts", right_ts="p_ts", how="left"
    )
    rows = sorted((r.lid, r.rid) for r in got.collect())
    assert rows == [(10, 20), (12, None)]


def test_curate_docs_stream_end_to_end(spark, tmp_path):
    """Real readStream: json file drops -> gates + watermarked content
    dedup -> memory sink. Gated-out and duplicate docs must not reach
    the sink; the same call degrades to batch semantics on a plain
    DataFrame."""
    import json

    good = " ".join(["the", "and", "words"] + ["token"] * 20)
    src = tmp_path / "drops"
    src.mkdir()
    rows = [
        {"doc_id": 1, "text": good, "ts": "2024-01-01T00:00:00"},
        {"doc_id": 2, "text": good, "ts": "2024-01-01T00:01:00"},  # dup
        {"doc_id": 3, "text": "too short", "ts": "2024-01-01T00:02:00"},
        {"doc_id": 4, "text": good + " extra", "ts": "2024-01-01T00:03:00"},
    ]
    with open(src / "batch0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .json(str(src))
    )
    curated = watermark_ops.curate_docs_stream(stream)
    q = (
        curated.writeStream.outputMode("append")
        .format("memory")
        .queryName("curated_docs")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        r.doc_id for r in spark.sql("SELECT * FROM curated_docs").collect()
    )
    assert got == [1, 4]  # 2 deduped, 3 gated out

    # batch fallback: identical survivors
    batch = spark.createDataFrame(
        [(r["doc_id"], r["text"],
          dt.datetime.fromisoformat(r["ts"])) for r in rows],
        "doc_id long, text string, ts timestamp",
    )
    got_b = sorted(
        r.doc_id
        for r in watermark_ops.curate_docs_stream(batch).collect()
    )
    assert got_b == [1, 4]


@pytest.mark.slow
def test_windowed_quantile_sketch_stream_and_batch(spark, tmp_path):
    """Real readStream: the per-window sketches arriving at the memory
    sink must equal the batch groupBy on the same rows, and feeding
    them to quantile_sketch_query must bracket the true per-window
    quantile."""
    import json

    from osmexpress_spark.operators import sketch
    from pyspark.sql import functions as F

    rows = [
        {"doc_id": i, "n": (37 * i) % 500, "ts": f"2024-01-01T00:{m:02d}:00"}
        for i, m in enumerate([0, 1, 2, 3, 6, 7, 8, 9] * 4)
    ]
    src = tmp_path / "qs_drops"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema("doc_id long, n long, ts timestamp").json(
        str(src)
    )
    sk = watermark_ops.windowed_quantile_sketch
    out = sk(stream, F.col("n"), window="5 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_sketch")
        .option("checkpointLocation", str(tmp_path / "qs_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # append mode emits a window only when a LATER micro-batch
        # advances the watermark past its end — drop a far-future row
        # in a second batch to close the earlier windows
        with open(src / "b1.json", "w") as f:
            f.write(
                json.dumps(
                    {"doc_id": 999, "n": 1, "ts": "2024-01-01T01:00:00"}
                )
                + "\n"
            )
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM win_sketch").collect())
    )
    # note: with one input file the final windows may still be open at
    # stream end; processAllAvailable + append emits only closed ones —
    # compare against the batch result restricted to emitted windows
    batch = spark.createDataFrame(
        [(r["doc_id"], r["n"], dt.datetime.fromisoformat(r["ts"])) for r in rows],
        "doc_id long, n long, ts timestamp",
    )
    want_all = sorted(map(tuple, sk(batch, F.col("n"), window="5 minutes").collect()))
    emitted_windows = {t[0] for t in got}
    want = [t for t in want_all if t[0] in emitted_windows]
    assert got == want
    assert len(got) > 0

    # the emitted rows are real sketches: per-window p50 brackets truth
    for wstart in emitted_windows:
        rows_w = [
            r["n"]
            for r in rows
            if wstart <= dt.datetime.fromisoformat(r["ts"]) < wstart + dt.timedelta(minutes=5)
        ]
        rows_w.sort()
        skdf = spark.createDataFrame(
            [(t[2], t[3]) for t in got if t[0] == wstart], "bucket int, cnt long"
        )
        r50 = sketch.quantile_sketch_query(skdf, [(1, 2)]).collect()[0]
        true = rows_w[(len(rows_w) + 1) // 2 - 1]
        assert r50["lo"] <= true <= r50["hi"]


@pytest.mark.slow
def test_dedup_docs_stream_vs_corpus_e2e(spark, tmp_path):
    """Continuous-ingest dedup against the persisted signature store:
    batch-1 drop admits the novel doc and rejects the corpus near-dup;
    after the survivor signatures append, a batch-2 drop duplicating a
    BATCH-1 survivor is rejected too — the store grows with admissions.
    Corpus text is never read by the stream (only the signature
    parquet)."""
    import json

    from osmexpress_spark.operators import dedup
    from osmexpress_spark.streaming import watermark_ops

    base = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [(100, base), (101, "totally different words here now then")],
        "doc_id long, text string",
    )
    store = str(tmp_path / "store")
    dedup.ensure_signature_store(
        corpus, store, "doc_id", "text", n_hashes=8, k=2, fingerprint="v1"
    )

    src = tmp_path / "drops"
    src.mkdir()
    novel = "completely fresh content nothing shares these tokens"
    with open(src / "day1.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": base}) + "\n")     # corpus dup
        f.write(json.dumps({"doc_id": 2, "text": novel}) + "\n")    # admit

    out = str(tmp_path / "out")

    def run_drop():
        stream = spark.readStream.schema("doc_id long, text string").json(
            str(src)
        )
        q = watermark_ops.dedup_docs_stream_vs_corpus(
            stream, store, out, str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

    run_drop()
    admitted = {
        r.doc_id for r in spark.read.parquet(out).collect()
    }
    assert admitted == {2}

    # day 2: a near-dup of the DAY-1 SURVIVOR and one more novel doc
    with open(src / "day2.json", "w") as f:
        f.write(json.dumps({"doc_id": 3, "text": novel}) + "\n")    # dup of 2
        f.write(json.dumps(
            {"doc_id": 4, "text": "yet another disjoint vocabulary set"}
        ) + "\n")
    run_drop()
    admitted = {
        r.doc_id for r in spark.read.parquet(out).collect()
    }
    assert admitted == {2, 4}, admitted


@pytest.mark.slow
def test_shard_sink_stream_epochs_and_verify(spark, tmp_path):
    """Continuous shard sink: each drop lands as its own verifiable
    epoch; verify_shard_epochs is clean over both, localizes a
    tampered file to (epoch, shard), and fails loudly on an empty
    sink path."""
    import glob
    import json
    import shutil

    from osmexpress_spark.streaming import watermark_ops

    src = tmp_path / "drops"
    src.mkdir()
    with open(src / "day1.json", "w") as f:
        for i in range(20):
            f.write(json.dumps(
                {"doc_id": i, "text": f"day one doc {i}", "n_chars": 10 + i}
            ) + "\n")
    sink = str(tmp_path / "sink")

    def run_drop():
        stream = spark.readStream.schema(
            "doc_id long, text string, n_chars long"
        ).json(str(src))
        q = watermark_ops.shard_sink_stream(
            stream, sink, str(tmp_path / "ckpt"), shards=4
        )
        q.awaitTermination(120)

    run_drop()
    with open(src / "day2.json", "w") as f:
        for i in range(20, 35):
            f.write(json.dumps(
                {"doc_id": i, "text": f"day two doc {i}", "n_chars": 10 + i}
            ) + "\n")
    run_drop()

    epochs = sorted(
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(f"{sink}/epoch=*")
    )
    assert len(epochs) == 2
    # all rows across all epochs, exactly once
    from functools import reduce

    total = reduce(
        lambda a, b: a.unionByName(b),
        [spark.read.parquet(f"{sink}/epoch={e}/shards") for e in epochs],
    )
    assert sorted(r.doc_id for r in total.collect()) == list(range(35))
    assert watermark_ops.verify_shard_epochs(spark, sink).count() == 0

    # tamper: drop a row from one shard of epoch 0
    e0 = f"{sink}/epoch={epochs[0]}"
    s = spark.read.parquet(f"{e0}/shards").where("shard = 1")
    victim = s.first()["doc_id"]
    rewrite = s.where(f"doc_id != {victim}").drop("shard")
    tmp = str(tmp_path / "rw")
    rewrite.write.mode("overwrite").parquet(tmp)
    shard_dir = f"{e0}/shards/shard=1"
    shutil.rmtree(shard_dir)
    import os as _os
    _os.makedirs(shard_dir)
    for f in glob.glob(f"{tmp}/*.parquet"):
        shutil.copy(f, shard_dir)
    bad = watermark_ops.verify_shard_epochs(spark, sink).collect()
    assert [(r.epoch, r.shard) for r in bad] == [(epochs[0], 1)]

    import pytest as _pytest
    with _pytest.raises(FileNotFoundError, match="no sink"):
        watermark_ops.verify_shard_epochs(spark, str(tmp_path / "nowhere"))


@pytest.mark.slow
def test_drift_monitor_stream_alerts_on_shift(spark, tmp_path):
    """Drift monitor: an in-distribution drop stays quiet, a shifted
    drop (x100 lengths) raises the alert; the reference corpus is read
    only once, at sketch-build time."""
    import glob
    import json

    from osmexpress_spark.operators import sketch
    from osmexpress_spark.streaming import watermark_ops

    rng = __import__("random").Random(5)
    ref = spark.createDataFrame(
        [(i, rng.randint(200, 800)) for i in range(400)],
        "doc_id long, n_chars long",
    )
    ref_path = str(tmp_path / "ref_sketch")
    sketch.quantile_sketch_build(ref, F.col("n_chars")).write.parquet(
        ref_path
    )

    src = tmp_path / "drops"
    src.mkdir()
    out = str(tmp_path / "alerts")

    def drop(name, rows):
        with open(src / name, "w") as f:
            for i, v in rows:
                f.write(json.dumps({"doc_id": i, "n_chars": v}) + "\n")
        stream = spark.readStream.schema("doc_id long, n_chars long").json(
            str(src)
        )
        watermark_ops.drift_monitor_stream(
            stream, ref_path, out, str(tmp_path / "ckpt"),
            value_col="n_chars", threshold=0.5,
        ).awaitTermination(120)

    drop("day1.json", [(i, rng.randint(200, 800)) for i in range(300)])
    drop("day2.json", [(1000 + i, rng.randint(20000, 80000))
                       for i in range(300)])

    epochs = sorted(glob.glob(f"{out}/epoch=*"))
    assert len(epochs) == 2
    rows = [spark.read.parquet(e).collect()[0] for e in epochs]
    quiet, shifted = rows
    # a 300-row sample against a 400-row reference carries real PSI
    # sampling noise at octave-bucket granularity (~0.28 here) — the
    # threshold separates regimes, it does not chase zero
    assert quiet.alert is False and quiet.psi < 0.5
    assert shifted.alert is True and shifted.psi > 1.0
    assert quiet.n_rows == 300 and shifted.n_rows == 300


@pytest.mark.slow
def test_drift_census_stream_epoch_label_keying(spark, tmp_path):
    """drift_census_stream keys output by the epoch LABEL in the data,
    not the trigger id: two epochs arriving in ONE micro-batch still
    produce two correct per-epoch census directories, each matching
    the batch census of that epoch's rows alone."""
    from osmexpress_spark.operators import sketch
    from osmexpress_spark.streaming import watermark_ops

    rng = __import__("random").Random(11)
    ref = spark.createDataFrame(
        [(i, rng.randint(100, 900)) for i in range(300)],
        "doc_id long, n_chars long",
    )
    ref_path = str(tmp_path / "ref_sketch")
    sketch.quantile_sketch_build(ref, F.col("n_chars")).write.parquet(
        ref_path
    )
    feed_rows = [
        (i, 1 if i % 2 == 0 else 2, rng.randint(100, 2000))
        for i in range(200)
    ]
    feed = spark.createDataFrame(
        feed_rows, "doc_id long, epoch long, n_chars long"
    )
    feed_path = str(tmp_path / "feed")
    # ONE file -> one micro-batch carrying both epochs
    feed.coalesce(1).write.parquet(feed_path)
    out = str(tmp_path / "census")
    stream = spark.readStream.schema(feed.schema).parquet(feed_path)
    watermark_ops.drift_census_stream(
        stream, ref_path, out, str(tmp_path / "ckpt"),
        value_col="n_chars", epoch_col="epoch",
    ).awaitTermination(120)

    for e in (1, 2):
        got = sorted(
            map(tuple, spark.read.parquet(f"{out}/epoch={e}").collect())
        )
        want = sorted(
            map(
                tuple,
                sketch.drift_census_from_sketches(
                    spark.read.parquet(ref_path),
                    sketch.quantile_sketch_build(
                        feed.where(F.col("epoch") == e), F.col("n_chars")
                    ),
                ).collect(),
            )
        )
        assert got == want and len(got) > 0, e


@pytest.mark.slow
def test_file_stream_prod_path_matches_per_file_gate(spark, tmp_path):
    """r12 production entry (VERDICT r11 #7): file_stream with the
    default trigger (whole backlog in one availableNow batch) produces
    byte-identical census output to the per-file gate cadence
    (maxFilesPerTrigger=1) — the operators key on the epoch LABEL, so
    trigger chunking must not matter."""
    from osmexpress_spark.operators import sketch
    from osmexpress_spark.streaming import watermark_ops

    rng = __import__("random").Random(13)
    ref = spark.createDataFrame(
        [(i, rng.randint(100, 900)) for i in range(300)],
        "doc_id long, n_chars long",
    )
    ref_path = str(tmp_path / "ref_sketch")
    sketch.quantile_sketch_build(ref, F.col("n_chars")).write.parquet(
        ref_path
    )
    feed = spark.createDataFrame(
        [
            (i, 1 if i % 2 == 0 else 2, rng.randint(100, 2000))
            for i in range(200)
        ],
        "doc_id long, epoch long, n_chars long",
    )
    feed_path = str(tmp_path / "feed")
    for e in (1, 2):  # one file per epoch, like the gate fixture
        feed.where(F.col("epoch") == e).coalesce(1).write.mode(
            "append"
        ).parquet(feed_path)

    outs = {}
    for name, mfpt in (("gate", 1), ("prod", None)):
        out = str(tmp_path / f"census_{name}")
        stream = watermark_ops.file_stream(
            spark, feed_path, schema=feed.schema,
            max_files_per_trigger=mfpt,
        )
        watermark_ops.drift_census_stream(
            stream, ref_path, out, str(tmp_path / f"ckpt_{name}"),
            value_col="n_chars", epoch_col="epoch",
        ).awaitTermination(120)
        outs[name] = {
            e: sorted(
                map(
                    tuple,
                    spark.read.parquet(f"{out}/epoch={e}").collect(),
                )
            )
            for e in (1, 2)
        }
    assert outs["prod"] == outs["gate"]
    assert all(len(v) > 0 for v in outs["gate"].values())
