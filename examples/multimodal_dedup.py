"""End-to-end multimodal dedup on synthetic image + audio payloads:

    format triage -> real decode (Arrow seam) -> JVM hash packing ->
    banded Hamming self-join -> persisted band store ->
    continuous-ingest scoring of a second batch

Run:  python examples/multimodal_dedup.py [SF_DIR] [STORE_DIR]

Everything past the decode seam is declarative DataFrame ops — the
hash packing is whole-stage-codegen integer expressions and both pair
joins are (band_idx, band_value) equi-joins, never all-pairs.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osmexpress_spark import get_spark  # noqa: E402
from osmexpress_spark.operators import multimodal as M  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    store = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="band_store_"
    )
    spark = get_spark(app_name="multimodal-dedup", cpus=8,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. a mixed blob drop: even docs are BMP images, odd docs PCM WAVs
    blobs = M.synth_bmp24(
        docs.where(F.col("doc_id") % 2 == 0), "doc_id"
    ).unionByName(
        M.synth_wav8(docs.where(F.col("doc_id") % 2 == 1), "doc_id")
    )

    # 2. triage: what is actually in the drop (scan-side, no decode)
    print("== format census ==")
    M.format_census(blobs).orderBy("format").show()

    # 3. image near-dup: decode -> aHash bands -> banded Hamming join
    img_bands = M.ahash_bands(
        M.extract_features(
            M.synth_bmp24(docs, "doc_id"), decoder=M.bmp_gray_grid,
            modality="image",
        ),
        threshold="mid",
    )
    img_pairs = M.near_dup_by_bands(img_bands, max_hamming=3)
    print("== image near-dup pairs (hamming <= 3) ==")
    print(img_pairs.count(), "pairs")

    # 3b. pairs -> keep/drop decisions via the shared closure operator
    from osmexpress_spark.operators import dedup

    clusters = dedup.dup_clusters(img_pairs)
    print("== image dup clusters ==")
    print(clusters.where("id != cluster_id").count(), "images to drop")

    # 4. audio near-dup over the SAME join machinery
    wav_bands = M.sign_delta_bands(
        M.extract_features(
            M.synth_wav8(docs, "doc_id"), decoder=M.wav_frame_energies,
            modality="audio",
        ),
        n_frames=64,
    )
    print("== audio near-dup pairs ==")
    print(M.near_dup_by_bands(wav_bands, max_hamming=3).count(), "pairs")

    # 5. continuous ingest: persist the image bands, score a new batch
    #    against the store without re-decoding the reference
    M.save_band_store(img_bands, store, fingerprint="demo-v1")
    new_batch = M.ahash_bands(
        M.extract_features(
            M.synth_bmp24(
                docs.where(F.col("doc_id") % 7 == 0), "doc_id"
            ),
            decoder=M.bmp_gray_grid,
            modality="image",
        ),
        threshold="mid",
    )
    hits = M.near_dup_against_store(
        new_batch, M.load_band_store(spark, store)
    )
    print("== new-batch hits against the persisted store ==")
    print(hits.count(), "hits (re-ingested items match themselves at 0)")

    # 6. the compressed-audio path: FLAC decodes through the same seam
    flac_feats = M.extract_features(
        M.synth_flac8(docs.where(F.col("doc_id") < 100), "doc_id"),
        decoder=M.audio_decoder,
        modality="audio",
    )
    print("== FLAC decode census ==")
    flac_feats.groupBy("decode_ok").count().show()


if __name__ == "__main__":
    main()
