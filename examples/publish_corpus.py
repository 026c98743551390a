"""Publish a curated corpus as verifiable training shards, then answer
the re-publish question: filter -> shard-write with an integrity
manifest -> verify from the files alone -> re-publish with one edit ->
manifest diff naming exactly the shards a trainer must refetch.

Usage: python examples/publish_corpus.py [SF_DIR] [OUT_DIR]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osmexpress_spark import get_spark  # noqa: E402
from osmexpress_spark.operators import shards, text  # noqa: E402

SHARDS = 8


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="corpus_publish_")
    )
    spark = get_spark(app_name="publish-corpus", cpus="8", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # light quality gate (scan-side, composes with pushdown)
    kept = docs.where(text.token_count(F.col("text")) >= 5)
    print(f"kept {kept.count()} / {docs.count()} documents")

    v1 = os.path.join(out, "v1")
    manifest = shards.write_training_shards(
        kept, v1, "doc_id", "text", "n_chars", SHARDS
    )
    print("manifest (shard, n_docs, n_tokens, checksum):")
    for r in manifest.orderBy("shard").collect():
        print(f"  {r.shard}  {r.n_docs:6d}  {r.n_tokens:9d}  {r.checksum}")

    bad = shards.verify_training_shards(spark, v1, "doc_id", "text", "n_chars")
    print(f"verify v1: {bad.count()} mismatched shards (expect 0)")

    # re-publish: one document redacted; which shards must refetch?
    victim = kept.select("doc_id").orderBy("doc_id").first()["doc_id"]
    v2_docs = kept.withColumn(
        "text",
        F.when(F.col("doc_id") == victim, F.lit("[removed]")).otherwise(
            F.col("text")
        ),
    )
    old = shards.shard_manifest(kept, "doc_id", "text", "n_chars", SHARDS)
    new = shards.shard_manifest(v2_docs, "doc_id", "text", "n_chars", SHARDS)
    print(f"redacted doc {victim}; manifest diff:")
    for r in shards.manifest_diff(old, new).collect():
        print(f"  shard {r.shard}: {r.status}")
    print("PUBLISH OK")


if __name__ == "__main__":
    main()
