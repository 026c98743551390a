"""The embedding-search tier ladder on one corpus: exact brute force ->
LSH buckets -> IVF -> PQ -> IVF+PQ with rerank, plus the recall report
that justifies each approximation.

Usage: python examples/ann_search.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from osmexpress_spark import get_spark  # noqa: E402
from osmexpress_spark.operators import similarity  # noqa: E402

DIM = 64


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="ann-example", cpus="8", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.where(F.col("vec_id") < 10)

    exact = similarity.topk_bruteforce(queries, emb, k=5)
    tiers = {
        "lsh": similarity.topk_bucketed(queries, emb, dim=DIM, k=5),
        "lsh x3 probes": similarity.topk_bucketed(
            queries, emb, dim=DIM, k=5, probes=3
        ),
        "ivf": similarity.topk_ivf(queries, emb, dim=DIM, k=5),
        "ivfpq": similarity.topk_ivfpq(queries, emb, dim=DIM, k=5),
        "ivfpq+rerank": similarity.topk_ivfpq_rerank(
            queries, emb, dim=DIM, k=5
        ),
    }
    for name, approx in tiers.items():
        rec = similarity.ann_recall(exact, approx).agg(
            F.sum("n_overlap"), F.sum("n_exact")
        ).collect()[0]
        print(f"{name:>13}: recall@5 = {rec[0]}/{rec[1]}")


if __name__ == "__main__":
    main()
