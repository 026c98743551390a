"""Corpus profiling with the deterministic sketch family: distinct
shingles (KMV), heavy tokens (Count-Min), length quantiles (integer-log
sketch -> exact refinement), per-source profiles, and a freshly trained
BPE tokenizer's compression rate — every number reproducible
bit-for-bit, nothing corpus-sized ever reaching the driver.

Usage: python examples/corpus_profile.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osmexpress_spark import get_spark  # noqa: E402
from osmexpress_spark.operators import bpe, dedup, sketch  # noqa: E402

QUANTS = [(50, 100), (90, 100), (99, 100)]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="corpus-profile", cpus="8", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    shingles = docs.where(F.size(F.split("text", " ")) >= 3).select(
        F.explode(dedup.shingles(F.col("text"), k=3)).alias("s")
    )
    est = sketch.kmv_distinct_estimate(shingles, F.col("s")).collect()[0]
    print(f"distinct 3-gram shingles ~ {est['est_distinct']:.0f} (KMV)")

    toks = docs.select(F.explode(F.split("text", " ")).alias("item"))
    cms = sketch.cms_build(toks, F.col("item"))
    for r in sketch.cms_estimate(cms, ["the", "and", "data"]).collect():
        print(f"token freq[{r['item']}] <= {r['est_count']} (Count-Min)")

    sk = sketch.quantile_sketch_build(docs, F.col("n_chars"))
    for r in sketch.quantile_sketch_query(sk, QUANTS).collect():
        print(
            f"len p{100 * r['q_num'] // r['q_den']} in "
            f"[{r['lo']}, {r['hi']}] (sketch)"
        )
    for r in sketch.exact_quantiles(docs, F.col("n_chars"), QUANTS).collect():
        print(f"len p{100 * r['q_num'] // r['q_den']} = {r['value']} (exact)")

    by = sketch.quantile_sketch_build_by(docs, F.col("source"), F.col("n_chars"))
    for r in sorted(
        sketch.quantile_sketch_query_by(by, [(99, 100)]).collect(),
        key=lambda r: r["key"],
    ):
        print(f"len p99[{r['key']}] in [{r['lo']}, {r['hi']}]")
    for r in sorted(
        sketch.exact_quantiles_by(
            docs, F.col("source"), F.col("n_chars"), [(99, 100)]
        ).collect(),
        key=lambda r: r["key"],
    )[:3]:
        print(f"len p99[{r['key']}] = {r['value']} (exact)")

    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    freq = sketch.exact_frequent_items(toks, F.col("tok"), min_count=200)
    print("frequent tokens (>=200):", freq.count(), "(CMS-pruned exact)")

    # drift between the even/odd halves (a stand-in for two snapshots)
    cen = sketch.drift_census(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        F.col("n_chars"),
    )
    print(f"length-distribution PSI even/odd = {sketch.psi_drift(cen):.4f}")
    for lang, psi in sorted(
        sketch.psi_drift_by(
            sketch.drift_census_by(
                docs.where(F.col("doc_id") % 2 == 0),
                docs.where(F.col("doc_id") % 2 == 1),
                F.col("lang"), F.col("n_chars"),
            )
        ).items()
    )[:3]:
        print(f"  PSI[{lang}] = {psi:.4f}")

    out = sketch.mad_outliers(docs, F.col("n_chars"), ["doc_id"], 2, 1)
    print(f"MAD length outliers (2x): {out.count()}")

    from osmexpress_spark.operators import sample as smp
    sel = smp.budget_select(
        docs.select(
            "doc_id", "n_chars",
            F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        ),
        F.col("n_chars"), F.col("n_tok"), 1500, "doc_id",
    )
    print(f"token-budget(1500) selects {sel.count()} docs")

    words = bpe.word_counts(docs, F.col("text")).localCheckpoint()
    merges = bpe.bpe_train(words, n_merges=40)
    enc = bpe.bpe_encode(docs, "doc_id", F.col("text"), merges)
    stats = enc.select(F.size("tokens").alias("n")).agg(
        F.sum("n").alias("tok")
    ).collect()[0]
    chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    print(
        f"BPE({len(merges)} merges): {stats['tok']} tokens over "
        f"{chars} chars = {chars / stats['tok']:.2f} chars/token"
    )
    print("PROFILE OK")
    spark.stop()


if __name__ == "__main__":
    main()
