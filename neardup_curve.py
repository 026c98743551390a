#!/usr/bin/env python
"""Banded-Hamming near-dup candidate economics (the ann_curve.py
sibling for the multimodal dedup path): for each modality, count the
pair space, the banded equi-join's candidate volume (rows and distinct
pairs), and the verified output at hamming <= 3 — the numbers that
show the join is pruning, not scanning.  Recall at hamming <=
n_bands-1 is pigeonhole-exact, so there is no recall axis to sweep;
the cost axis is candidate volume.

Usage: python neardup_curve.py [SF_DIR]   (default /root/testdata/sf0.1)
Prints one JSON line per modality.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from osmexpress_spark import get_spark  # noqa: E402
from osmexpress_spark.operators import multimodal as M  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="neardup-curve",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    modalities = {
        "image": M.ahash_bands(
            M.extract_features(
                M.synth_bmp24(d, "doc_id"), decoder=M.bmp_gray_grid
            ),
            threshold="mid",
        ),
        "audio": M.sign_delta_bands(
            M.extract_features(
                M.synth_wav8(d, "doc_id"), decoder=M.wav_frame_energies
            ),
            n_frames=64,
        ),
    }
    for name, bands in modalities.items():
        b = bands.localCheckpoint()
        n = b.count()
        melted = b.select(
            "item_id",
            F.posexplode(
                F.array(*[F.col(f"band_{i}") for i in range(4)])
            ).alias("b_idx", "b_val"),
        )
        a2, b2 = melted.alias("a"), melted.alias("b")
        cand = a2.join(
            b2,
            on=[
                F.col("a.b_idx") == F.col("b.b_idx"),
                F.col("a.b_val") == F.col("b.b_val"),
                F.col("a.item_id") < F.col("b.item_id"),
            ],
        ).select(
            F.col("a.item_id").alias("x"), F.col("b.item_id").alias("y")
        )
        rows = cand.count()
        pairs = cand.distinct().count()
        final = M.near_dup_by_bands(b).count()
        allp = n * (n - 1) // 2
        print(json.dumps({
            "modality": name,
            "items": n,
            "all_pairs": allp,
            "candidate_rows": rows,
            "distinct_candidates": pairs,
            "final_pairs": final,
            "prune_factor": round(allp / max(pairs, 1)),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
