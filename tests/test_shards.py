"""Training-shard sink (operators/shards.py): manifest exactness,
write/verify round-trip, tamper localization, order-independence of
the checksum, and plan quality (Python-free, map-side combined)."""

from __future__ import annotations

import glob
import hashlib
import os
import shutil

import pytest
from pyspark.sql import functions as F

from osmexpress_spark.operators import shards as SH
from osmexpress_spark.operators.sample import KNUTH

SF_DIR = os.environ.get("OSMX_TEST_SF_DIR", "/root/testdata/sf0.001")


def _hand_manifest(rows, n_shards):
    """Independent Python model of the manifest."""
    out = {}
    for doc_id, text, w in rows:
        shard = (doc_id * KNUTH) % n_shards
        digest = hashlib.md5(
            f"{doc_id}:{text if text is not None else ''}".encode()
        ).hexdigest()
        h = int(digest[:15], 16)
        d, t, c = out.get(shard, (0, 0, 0))
        out[shard] = (d + 1, t + w, c ^ h)
    return out


def test_manifest_matches_hand_model(spark):
    rows = [(i, f"doc number {i} body", 10 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string, w long")
    got = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["checksum"])
        for r in SH.shard_manifest(df, "doc_id", "text", "w", 4).collect()
    }
    assert got == _hand_manifest(rows, 4)


def test_checksum_invariant_to_partition_layout(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = SH.shard_manifest(df, "doc_id", "text", "n_chars", 8)
    scrambled = SH.shard_manifest(
        df.repartition(13, F.md5(F.col("text"))),
        "doc_id", "text", "n_chars", 8,
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, scrambled.collect())
    )


def test_null_text_and_null_id(spark):
    ok = spark.createDataFrame(
        [(1, None, 5)], "doc_id long, text string, w long"
    )
    [row] = SH.shard_manifest(ok, "doc_id", "text", "w", 4).collect()
    # NULL content folds to '' (still checksummed), never to a NULL row
    assert row["n_docs"] == 1 and row["checksum"] is not None
    bad = spark.createDataFrame(
        [(None, "x", 5)], "doc_id long, text string, w long"
    )
    with pytest.raises(Exception, match="NULL id"):
        SH.shard_manifest(bad, "doc_id", "text", "w", 4).collect()


@pytest.mark.slow
def test_write_verify_roundtrip_and_tamper(spark, tmp_path):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "sink")
    manifest = sorted(
        map(
            tuple,
            SH.write_training_shards(
                df, path, "doc_id", "text", "n_chars", 8
            ).collect(),
        )
    )
    assert len(manifest) == 8
    # every row landed in the directory its hash names
    data = spark.read.parquet(os.path.join(path, "shards"))
    stray = data.where(
        (F.col("doc_id") * F.lit(KNUTH)) % 8 != F.col("shard")
    ).count()
    assert stray == 0
    assert (
        SH.verify_training_shards(
            spark, path, "doc_id", "text", "n_chars"
        ).count()
        == 0
    )
    # idempotent re-run: overwrite produces the identical manifest
    again = SH.write_training_shards(
        df, path, "doc_id", "text", "n_chars", 8
    )
    assert sorted(map(tuple, again.collect())) == manifest
    # tamper: rewrite shard 3 with one document dropped (re-list the
    # directory — the overwrite above replaced the files `data` saw)
    s3 = spark.read.parquet(os.path.join(path, "shards")).where("shard = 3")
    victim = s3.select("doc_id").orderBy("doc_id").first()["doc_id"]
    tampered = s3.where(F.col("doc_id") != victim).drop("shard")
    tmp = str(tmp_path / "tampered")
    tampered.write.mode("overwrite").parquet(tmp)
    shard_dir = os.path.join(path, "shards", "shard=3")
    shutil.rmtree(shard_dir)
    os.makedirs(shard_dir)
    for f in glob.glob(os.path.join(tmp, "*.parquet")):
        shutil.copy(f, shard_dir)
    bad = SH.verify_training_shards(
        spark, path, "doc_id", "text", "n_chars"
    ).collect()
    assert [r["shard"] for r in bad] == [3]
    assert bad[0]["a_docs"] == bad[0]["e_docs"] - 1
    assert bad[0]["a_checksum"] != bad[0]["e_checksum"]


def test_verify_catches_missing_and_extra_shard(spark, tmp_path):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    path = str(tmp_path / "sink")
    SH.write_training_shards(df, path, "doc_id", "text", "n_chars", 4)
    shutil.rmtree(os.path.join(path, "shards", "shard=2"))
    bad = SH.verify_training_shards(
        spark, path, "doc_id", "text", "n_chars"
    ).collect()
    assert [r["shard"] for r in bad] == [2]
    assert bad[0]["a_docs"] is None and bad[0]["e_docs"] is not None


def test_manifest_plan_python_free_and_map_side(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        SH.shard_manifest(df, "doc_id", "text", "n_chars", 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # partial + final HashAggregate around one shards-keyed exchange:
    # the corpus never shuffles, only per-map-task partial rows do
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1


def test_manifest_diff_localizes_changes(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    old = SH.shard_manifest(df, "doc_id", "text", "n_chars", 4)
    # re-publish: one document's text changed (same id, same shard)
    changed_id = df.select("doc_id").first()["doc_id"]
    touched = (changed_id * KNUTH) % 4
    new_df = df.withColumn(
        "text",
        F.when(F.col("doc_id") == changed_id, F.lit("REDACTED")).otherwise(
            F.col("text")
        ),
    )
    new = SH.shard_manifest(new_df, "doc_id", "text", "n_chars", 4)
    rows = SH.manifest_diff(old, new).collect()
    # same counts and weights, different checksum: content substitution
    assert [(r.shard, r.status) for r in rows] == [(touched, "changed")]
    assert rows[0].old_docs == rows[0].new_docs
    assert rows[0].old_tokens == rows[0].new_tokens


@pytest.mark.slow
def test_manifest_diff_added_removed_identical(spark):
    a = spark.createDataFrame(
        [(0, "x", 1), (1, "y", 1)], "doc_id long, text string, w long"
    )
    b = spark.createDataFrame(
        [(0, "x", 1)], "doc_id long, text string, w long"
    )
    ma = SH.shard_manifest(a, "doc_id", "text", "w", 64)
    mb = SH.shard_manifest(b, "doc_id", "text", "w", 64)
    assert SH.manifest_diff(ma, ma.alias("copy")).count() == 0
    [r] = SH.manifest_diff(ma, mb).collect()
    assert r.status == "removed" and r.shard == (1 * KNUTH) % 64
    [r2] = SH.manifest_diff(mb, ma).collect()
    assert r2.status == "added" and r2.shard == (1 * KNUTH) % 64


def test_manifest_merge_equals_manifest_of_union(spark):
    """The merge algebra: manifest_merge(per-part manifests) must be
    bit-identical to shard_manifest(union) — counts add, XOR composes."""
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    parts = [df.where(F.col("doc_id") % 3 == i) for i in range(3)]
    merged = SH.manifest_merge(
        [SH.shard_manifest(p, "doc_id", "text", "n_chars", 8) for p in parts]
    )
    whole = SH.shard_manifest(df, "doc_id", "text", "n_chars", 8)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    with pytest.raises(ValueError, match="at least one"):
        SH.manifest_merge([])


def _write_epochs(spark, tmp_path, n_epochs=2, shards=4):
    import json

    from osmexpress_spark.streaming import watermark_ops

    src = tmp_path / "drops"
    src.mkdir()
    sink = str(tmp_path / "sink")
    n = 0
    for e in range(n_epochs):
        with open(src / f"day{e}.json", "w") as f:
            for i in range(n, n + 15):
                f.write(json.dumps(
                    {"doc_id": i, "text": f"epoch {e} doc {i}",
                     "n_chars": 7 + i}
                ) + "\n")
        n += 15
        stream = spark.readStream.schema(
            "doc_id long, text string, n_chars long"
        ).json(str(src))
        watermark_ops.shard_sink_stream(
            stream, sink, str(tmp_path / "ckpt"), shards=shards
        ).awaitTermination(120)
    return sink, n


@pytest.mark.slow
def test_compact_epochs_same_and_rehashed_shard_count(spark, tmp_path):
    sink, n = _write_epochs(spark, tmp_path, n_epochs=2, shards=4)
    # same shard count: per-shard algebra holds, result verifies clean
    out1 = str(tmp_path / "compact4")
    man = SH.compact_epochs(
        spark, sink, out1, "doc_id", "text", "n_chars", 4
    )
    assert man.agg(F.sum("n_docs")).collect()[0][0] == n
    assert (
        SH.verify_training_shards(
            spark, out1, "doc_id", "text", "n_chars"
        ).count()
        == 0
    )
    # different shard count: the grouping-invariant global fold still
    # proves the rewrite, and the new sink verifies clean
    out2 = str(tmp_path / "compact8")
    man8 = SH.compact_epochs(
        spark, sink, out2, "doc_id", "text", "n_chars", 8
    )
    assert man8.agg(F.sum("n_docs")).collect()[0][0] == n
    assert (
        SH.verify_training_shards(
            spark, out2, "doc_id", "text", "n_chars"
        ).count()
        == 0
    )


@pytest.mark.slow
def test_compact_epochs_catches_manifest_data_disagreement(spark, tmp_path):
    """A corrupted epoch manifest (data says one thing, metadata says
    another) must fail the compaction's algebra check loudly."""
    sink, _ = _write_epochs(spark, tmp_path, n_epochs=1, shards=4)
    mpath = f"{sink}/epoch=0/manifest"
    m = spark.read.parquet(mpath)
    forged = m.withColumn(
        "n_docs",
        F.when(F.col("shard") == 0, F.col("n_docs") + 1).otherwise(
            F.col("n_docs")
        ),
    )
    tmp = str(tmp_path / "forged")
    forged.write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(mpath)
    shutil.copytree(tmp, mpath)
    with pytest.raises(ValueError, match="disagrees"):
        SH.compact_epochs(
            spark, sink, str(tmp_path / "out"),
            "doc_id", "text", "n_chars", 4,
        )


@pytest.mark.slow
def test_manifest_describes_disk_under_nondeterministic_input(
    spark, tmp_path
):
    """ADVICE r06: the manifest must be computed from the files just
    written, not from a second scan of the input — a non-deterministic
    content column (here a per-row random payload) yields different
    values on every scan, so a writer that re-scanned df would publish
    a manifest whose checksums disagree with the shards on disk."""
    path = str(tmp_path / "epoch_nondet")
    # a Python UDF drawing fresh OS entropy per call, declared
    # nondeterministic so Catalyst cannot fold or cache it — test
    # scaffolding only, modelling "source mutated between actions"
    fresh = F.udf(
        lambda: os.urandom(8).hex(), "string"
    ).asNondeterministic()
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("payload "), fresh()).alias("text"),
        F.lit(1).alias("w"),
    )
    # sanity: the input really is scan-nondeterministic (rand re-draws)
    a = {r["doc_id"]: r["text"] for r in df.collect()}
    b = {r["doc_id"]: r["text"] for r in df.collect()}
    assert a != b
    manifest = SH.write_training_shards(df, path, "doc_id", "text", "w", 4)
    assert manifest.count() == 4
    mism = SH.verify_training_shards(spark, path, "doc_id", "text", "w")
    assert mism.count() == 0


def test_jsonl_shards_roundtrip_verify_and_tamper(spark, tmp_path):
    """The JSONL sink: write/verify round-trip with the writer's
    schema pinned (json inference must never pick the checksum input
    types), tamper detection localizes the shard, and the files really
    are one JSON object per line."""
    import glob
    import json as _json

    path = str(tmp_path / "epoch_jsonl")
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "n_chars"
    )
    schema = df.withColumn("shard", F.lit(0).cast("long")).schema
    manifest = SH.write_training_shards(
        df, path, "doc_id", "text", "n_chars", 4, data_format="json"
    )
    assert manifest.count() == 4
    ok = SH.verify_training_shards(
        spark, path, "doc_id", "text", "n_chars",
        data_format="json", schema=schema,
    )
    assert ok.count() == 0
    # files are JSONL
    a_file = sorted(glob.glob(f"{path}/shards/shard=*/part-*"))[0]
    with open(a_file) as f:
        first = f.readline()
    row = _json.loads(first)
    assert "doc_id" in row and "text" in row
    # tamper one line -> exactly that shard flagged
    with open(a_file) as f:
        lines = f.readlines()
    # same-length substitution (compact separators, padded text): the
    # session's file-status cache pins the pre-tamper file SIZE, and a
    # length-changing in-place rewrite fails the read instead of
    # failing the checksum — content corruption with unchanged size is
    # also the nastier real-world case
    victim = _json.loads(lines[0])
    victim["text"] = "X" * len(victim["text"])
    lines[0] = _json.dumps(victim, separators=(",", ":")) + "\n"
    with open(a_file, "w") as f:
        f.writelines(lines)
    # Hadoop's LocalFileSystem keeps a .crc sidecar that would catch
    # the rewrite before our checksum can; object stores (the real
    # deployment) have no such sidecar, so drop it and prove the
    # MANIFEST catches the corruption
    crc = os.path.join(
        os.path.dirname(a_file), f".{os.path.basename(a_file)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    bad = SH.verify_training_shards(
        spark, path, "doc_id", "text", "n_chars",
        data_format="json", schema=schema,
    ).collect()
    assert len(bad) == 1
    import pytest as _p

    with _p.raises(ValueError, match="schema"):
        SH.verify_training_shards(
            spark, path, "doc_id", "text", "n_chars", data_format="json"
        )
    with _p.raises(ValueError, match="unsupported"):
        SH.write_training_shards(
            df, path, "doc_id", "text", "n_chars", 4, data_format="csv"
        )
