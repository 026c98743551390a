"""End-to-end training-data curation on the synthetic corpus:

    gates -> exact dedup -> substring screen -> LM perplexity cut ->
    temperature rebalance -> sharded training layout

Run:  python examples/curation_pipeline.py [SF_DIR] [OUT_DIR]

Every stage is a declarative DataFrame op from osmexpress_spark; the
whole chain is one Catalyst-planned job per action, no driver loops.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osmexpress_spark import get_spark  # noqa: E402
from osmexpress_spark.operators import dedup, importance, sample, text  # noqa: E402
from osmexpress_spark.sources.sink import write_training_shards  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="curated_") + "/shards"
    spark = get_spark(app_name="curation-example", cpus="8",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()

    # 1. quality gates (Gopher rules; scan-side predicates)
    gated = docs.where(text.gopher_flags(F.col("text"))["keep"])

    # 2. exact dedup (lowest doc_id survives its md5 group)
    from pyspark.sql import Window
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    uniq = gated.withColumn("rn", F.row_number().over(w)) \
                .where(F.col("rn") == 1).drop("rn")

    # 3. substring screen: duplicated 5-gram windows cover <= 20%
    spans = dedup.doc_dup_spans(docs, "doc_id", "text", k=5)
    screened = uniq.join(spans, "doc_id", "left").where(
        F.coalesce(F.col("n_dup_spans"), F.lit(0)) * 5
        <= F.coalesce(F.col("n_spans"), F.lit(0))
    ).drop("n_spans", "n_dup_spans")

    # 4. LM perplexity cut (hashed-unigram LM on the English subset)
    keep_ids = importance.perplexity_filter(
        docs, F.col("lang") == "en", max_mean_micro=3_500_000
    ).select(F.col("id").alias("doc_id"))
    selected = screened.join(keep_ids, "doc_id", "left_semi")

    # 5. temperature rebalance across languages (T=2)
    mixed = sample.temperature_mixture(selected, "lang", alpha=0.5)

    # 6. deterministic sharded training layout
    dirs = write_training_shards(mixed, out, shards=4)

    n1 = spark.read.parquet(out).count()
    print(f"{n0} docs -> {n1} curated rows across {len(dirs)} shards at {out}")
    spark.stop()


if __name__ == "__main__":
    main()
