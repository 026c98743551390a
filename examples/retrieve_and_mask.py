"""Slice, clean, and pair a corpus with the round-7 retrieval stack:
build the persisted BM25 index once and query it (never rescanning the
corpus), turn cross-document duplicate windows into the exact token
ranges a trainer masks, census per-source unique text with the
per-group KMV sketch, and mine mutual-best-margin embedding pairs
(the bitext recipe) — four operators, one session.

Usage: python examples/retrieve_and_mask.py [SF_DIR] [INDEX_DIR]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osmexpress_spark import get_spark  # noqa: E402
from osmexpress_spark.operators import (  # noqa: E402
    dedup, retrieval, similarity, sketch,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    index = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="bm25_index_")
    )
    spark = get_spark(app_name="retrieve-and-mask", cpus="8",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    # 1. Index once; every later ad-hoc slice reads only its own
    #    terms' postings (the corpus never rescans).
    retrieval.save_bm25_index(docs, index)
    hits = retrieval.bm25_topk_from_index(
        spark, index, ["hash", "join", "spark"], k=5
    ).collect()
    print("top-5 for [hash join spark] from the persisted index:")
    for r in hits:
        print(f"  doc {r.doc_id:>6}  score {r.score:.4f}  hit {r.n_hit}/3")

    # 2. The token ranges a trainer actually drops: merged spans
    #    covered by cross-document duplicate 5-gram windows.
    masks = dedup.dedup_span_masks(docs, "doc_id", "text", k=5)
    cover = masks.select(
        F.count(F.lit(1)).alias("ranges"),
        F.countDistinct("doc_id").alias("docs"),
        F.sum(F.col("end_tok") - F.col("start_tok")).alias("tokens"),
    ).collect()[0]
    print(
        f"dedup masks: {cover.ranges} ranges over {cover.docs} docs, "
        f"{cover.tokens} tokens to drop"
    )

    # 3. Per-source unique-text census: the KMV sketch, one row per
    #    provider — the number a mixture designer reads next to the
    #    source-overlap census.
    sh = docs.where(F.size(F.split("text", " ")) >= 3).select(
        "source", F.explode(dedup.shingles(F.col("text"), k=3)).alias("s")
    )
    uniq = sketch.kmv_distinct_estimate_by(sh, "source", F.col("s"), k=128)
    print("distinct 3-gram estimate per source (first 5):")
    for r in uniq.orderBy("source").limit(5).collect():
        print(f"  {r.source:>8}  ~{r.est_distinct:,.0f}")

    # 4. Mine parallel pairs across the label split with the ratio
    #    margin (mutual best in both directions).
    src = emb.where((F.col("label") % 2 == 0) & (F.col("vec_id") < 100))
    tgt = emb.where((F.col("label") % 2 == 1) & (F.col("vec_id") < 300))
    pairs = similarity.bitext_mine(src, tgt, nn_k=4, margin_threshold=1.0)
    n = pairs.count()
    print(f"bitext mining: {n} mutual-best pairs above margin 1.0")
    spark.stop()


if __name__ == "__main__":
    main()
