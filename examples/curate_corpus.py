"""Curate a mixed-source corpus with the round-7 signal stack: score
every document (novelty vs an existing reference, compression density,
sketch-rank quality blend), soft-weight near-duplicate clusters instead
of dropping them, then fill per-domain token budgets from the blended
ranking — the full "which documents get into the next training mix"
decision in one declarative pipeline.

Usage: python examples/curate_corpus.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osmexpress_spark import get_spark  # noqa: E402
from osmexpress_spark.operators import dedup, sample, sketch  # noqa: E402
from osmexpress_spark.operators import text as text_ops  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curate-corpus", cpus="8", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # 1. Novelty: how much NEW text does each doc add over the corpus we
    #    already trained on (stand-in: the doc_id % 4 == 0 quarter)?
    reference = docs.where(F.col("doc_id") % 4 == 0)
    incoming = docs.where(F.col("doc_id") % 4 != 0)
    novelty = dedup.ngram_novelty(incoming, reference)

    # 2. Information density: zlib census (one Arrow stage).
    density = text_ops.compression_stats(incoming)

    # 3. Near-dup clusters: soft_dedup_weights gives every doc its
    #    cluster and size; the mix keeps ONE representative per cluster
    #    (cluster label == smallest id) and remembers dup_count — a
    #    cluster of 154 boilerplate copies enters the budget race once.
    pairs = dedup.minhash_lsh_pairs(incoming, "doc_id", "text")
    weights = dedup.soft_dedup_weights(incoming, pairs, "doc_id")
    reps = weights.where(F.col("cluster") == F.col("doc_id"))

    # 4. Blend the signals scale-free: sketch-granular quantile ranks
    #    (no global sort anywhere).
    scored = (
        incoming.select("doc_id", "source", "n_chars")
        .join(novelty, "doc_id")
        .join(density, "doc_id")
        .join(reps.select("doc_id", "dup_count"), "doc_id")
    )
    blended = sketch.rank_blend(
        scored,
        {
            "novel": F.col("n_novel"),
            "density": F.col("n_compressed"),
        },
        ["doc_id", "source", "n_chars", "dup_count"],
    )

    # 5. Fill per-domain character budgets from the blended ranking.
    #    (Sources here correlate with doc_id, so pick ones the incoming
    #    split actually contains.)
    budgets = {"src1": 8_000, "src2": 8_000, "src3": 5_000}
    picked = sample.budget_select_by(
        blended,
        "source",
        F.col("blend_rank"),
        F.col("n_chars"),
        budgets,
        "doc_id",
    )

    summary = (
        picked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_chars").alias("chars"),
            F.max("cum_w").alias("budget_used"),
        )
        .orderBy("source")
        .collect()
    )
    print("per-domain selection (source, docs, chars, budget_used):")
    for r in summary:
        print(f"  {r['source']}  {r['docs']:4d}  {r['chars']:8d}  "
              f"{r['budget_used']:8d}")
    total = picked.count()
    assert total > 0
    print(f"CURATED {total} documents")


if __name__ == "__main__":
    main()
