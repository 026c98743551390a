"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode/feature-extraction runs as Arrow-batched `mapInPandas` so the
bytes never round-trip through Python row-by-row. The actual codec
libraries are not in this container, so the decode step is STUBBED
behind `decoder=`: the default `fake_decoder` is a deterministic
byte-statistics extractor that keeps the whole Spark-side contract
(schema, batching, partitioning) real and testable; swap in a real
decoder (PIL/torchaudio/ffmpeg) in production.

Scale notes: batches arrive as Arrow RecordBatches sized by
`spark.sql.execution.arrow.maxRecordsPerBatch`; for large blobs set it
low (memory = batch_rows x blob size). Feature extraction is
embarrassingly parallel — no shuffle at all; repartition upstream only
to even out blob-size skew.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "item_id long, n_bytes long, modality string, "
    "feat array<double>, decode_ok boolean"
)


def fake_decoder(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real image/audio decoder: fixed-size
    byte-statistics feature vector. Replace with a real codec in prod —
    raising NotImplementedError here would be the strict-stub variant."""
    if not payload:
        return [0.0] * 4
    n = len(payload)
    return [
        float(n),
        payload[0] / 255.0,
        payload[-1] / 255.0,
        sum(payload[:64]) / (255.0 * min(n, 64)),
    ]


def attach_binary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Demo wrapper: treat utf-8 text bytes as an opaque blob column with
    typed metadata — the exact shape an image/audio table would have."""
    return df.select(
        F.col(id_col).alias("item_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("blob/demo").alias("mime"),
            F.octet_length(F.col(text_col).cast("binary")).alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], list[float]] = fake_decoder,
    modality: str = "demo",
) -> DataFrame:
    """Arrow-batched feature extraction over (item_id, payload, meta)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(decoder(bytes(payload)))
                    ok.append(True)
                except NotImplementedError:
                    feats.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "modality": modality,
                    "feat": feats,
                    "decode_ok": ok,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "item_id long, frame_idx int, frame binary, n_frame_bytes int"
)


def frame_sample(
    df: DataFrame,
    frame_bytes: int = 32,
    stride: int = 3,
) -> DataFrame:
    """Video-style frame sampling over opaque payloads: the payload is
    treated as a sequence of fixed-size frames and every `stride`-th
    frame is emitted as its own row (item_id, frame_idx, frame bytes).

    This is the 1->N explode shape of real video pipelines (decode
    container -> sample keyframes -> per-frame rows), run as
    Arrow-batched mapInPandas with zero shuffle; a real implementation
    swaps the byte-slicing for an ffmpeg/pyav keyframe iterator with
    the SAME output contract. Byte-slicing keeps the stub deterministic
    and exactly SQL-checkable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, sizes = [], [], [], []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    fr = b[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(item_id)
                    idxs.append(i)
                    frames.append(fr)
                    sizes.append(len(fr))
            yield pd.DataFrame(
                {
                    "item_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype=object),
                    "n_frame_bytes": pd.Series(sizes, dtype="int32"),
                }
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


RESIZE_SCHEMA = "item_id long, resized binary, n_bytes_out long"


def resize_bytes(df: DataFrame, factor: int = 2) -> DataFrame:
    """Resize/downsample stub: keep every `factor`-th byte of the
    payload. The real op is an image resize (PIL/opencv) with the same
    (payload in) -> (payload out) mapInPandas contract; the byte
    decimation keeps the plumbing deterministic and testable without
    codec libraries."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [bytes(p)[::factor] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "resized": pd.Series(resized, dtype=object),
                    "n_bytes_out": pd.Series(
                        [len(r) for r in resized], dtype="int64"
                    ),
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)
