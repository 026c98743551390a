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
