"""Multimodal column plumbing: binary payload + metadata schema, Arrow
mapInPandas feature extraction, stub-decoder failure path."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmexpress_spark.operators import multimodal


def _blobs(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "x" * 500)], "doc_id long, text string"
    )
    return multimodal.attach_binary(df, "text", "doc_id")


def test_attach_binary_schema(spark):
    b = _blobs(spark)
    assert dict(b.dtypes) == {
        "item_id": "bigint",
        "payload": "binary",
        "meta": "struct<mime:string,n_bytes:int>",
    }
    rows = {r.item_id: r for r in b.collect()}
    assert bytes(rows[1].payload) == b"hello world"
    assert rows[3].meta.n_bytes == 500


def test_extract_features_deterministic(spark):
    feats = multimodal.extract_features(_blobs(spark))
    rows = {r.item_id: r for r in feats.collect()}
    assert all(r.decode_ok for r in rows.values())
    assert rows[1].n_bytes == 11
    assert rows[2].feat == [0.0, 0.0, 0.0, 0.0]  # empty payload
    assert rows[3].feat[0] == 500.0
    # deterministic across runs
    again = {r.item_id: r for r in multimodal.extract_features(_blobs(spark)).collect()}
    assert {k: list(v.feat) for k, v in rows.items()} == {
        k: list(v.feat) for k, v in again.items()
    }


def test_extract_features_strict_stub(spark):
    """A NotImplementedError decoder (the strict stub for absent codec
    libs) marks rows decode_ok=false instead of failing the job."""

    def strict(payload: bytes) -> list:
        raise NotImplementedError("no codec in this container")

    feats = multimodal.extract_features(_blobs(spark), decoder=strict)
    rows = feats.collect()
    assert len(rows) == 3
    assert all(not r.decode_ok for r in rows)
    assert all(r.feat is None for r in rows)


def test_extract_features_no_shuffle(spark):
    """Feature extraction must be map-only — no Exchange in the plan."""
    feats = multimodal.extract_features(_blobs(spark))
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_frame_sample_slices_and_strides(spark):
    from osmexpress_spark.operators import multimodal

    rows = [(1, b"a" * 100), (2, b"xy"), (3, b"")]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "item_id long, payload binary"
    )
    got = {}
    for r in multimodal.frame_sample(df, frame_bytes=32, stride=3).collect():
        got.setdefault(r.item_id, []).append(
            (r.frame_idx, bytes(r.frame), r.n_frame_bytes)
        )
    # 100 bytes -> 4 frames (idx 0..3), stride 3 keeps 0 and 3
    assert [i for i, _, _ in sorted(got[1])] == [0, 3]
    assert sorted(got[1])[0][1] == b"a" * 32
    assert sorted(got[1])[1] == (3, b"a" * 4, 4)  # tail frame is short
    assert got[2] == [(0, b"xy", 2)]
    assert 3 not in got  # empty payload -> no frames


def test_resize_bytes_decimates(spark):
    from osmexpress_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(10))))], "item_id long, payload binary"
    )
    r = multimodal.resize_bytes(df, factor=2).collect()[0]
    assert bytes(r.resized) == bytes([0, 2, 4, 6, 8]) and r.n_bytes_out == 5
