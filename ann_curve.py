#!/usr/bin/env python
"""Recall-vs-cost curve for the ANN searcher family (VERDICT r05 #7).

Sweeps the documented knobs at one scale factor and reports, per
configuration: mean recall@K against exact brute force, wall seconds
(median of --reps runs, first run discarded as JIT warmup), and the
number of candidate pairs scored — the engine-independent cost measure
(bytes-scanned tracks it: LSH/IVF read full vectors for the scored
subset; IVFPQ reads m code bytes instead of dim floats per scored row,
a further 32x byte reduction noted in the table).

The point of the curve is searcher CHOICE: all knobs were already
implemented and tested; this script publishes which one to pick at a
given recall target. Usage:

    python ann_curve.py [--sf /root/testdata/sf0.01] [--reps 3] [--json out]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osmexpress_spark import get_spark  # noqa: E402

K = 10
N_QUERIES = 50
IVF_CENTROIDS = 16
PQ_M, PQ_KSUB = 8, 16


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", default=None)
    ap.add_argument("--band", default="0.1,0.3",
                    help="hard-negative band lo,hi for the mining rows")
    ap.add_argument("--only", default=None,
                    help="substring filter on config names")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from osmexpress_spark.operators import similarity as S

    spark = get_spark(app_name="ann-curve", cpus=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"), shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(args.sf, "embeddings.parquet"))
    emb = emb.localCheckpoint()  # pin the corpus: time searches, not IO
    dim = len(emb.select("embedding").first()[0])
    n = emb.count()
    q = emb.where(F.col("vec_id") < N_QUERIES).localCheckpoint()
    nq = q.count()

    exact = S.topk_bruteforce(q, emb, k=K).localCheckpoint()

    def pairs_lsh(probes: int) -> int:
        qb = q.select(
            F.col("vec_id").alias("query_id"),
            F.explode(S.lsh_probe_buckets(
                F.col("embedding"), dim, S.N_PLANES, probes)).alias("b"),
        )
        cb = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            S.lsh_bucket(F.col("embedding"), dim).alias("b"),
        )
        return (qb.join(cb, "b")
                .where(F.col("query_id") != F.col("neighbor_id")).count())

    def pairs_ivf(nprobe: int) -> int:
        cents = S.ivf_train(emb, dim, IVF_CENTROIDS, 2)
        qc = q.select(
            F.col("vec_id").alias("query_id"),
            F.explode(S._probe_cids(
                F.col("embedding"), cents, nprobe)).alias("cid"),
        )
        cc = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            S._argmax(S._centroid_scores(
                F.col("embedding"), cents)).alias("cid"),
        )
        return (qc.join(cc, "cid")
                .where(F.col("query_id") != F.col("neighbor_id")).count())

    configs = [
        ("bruteforce", lambda: S.topk_bruteforce(q, emb, k=K),
         lambda: nq * (n - 1)),
        ("lsh probes=1", lambda: S.topk_bucketed(q, emb, dim=dim, k=K,
                                                 probes=1),
         lambda: pairs_lsh(1)),
        ("lsh probes=3", lambda: S.topk_bucketed(q, emb, dim=dim, k=K,
                                                 probes=3),
         lambda: pairs_lsh(3)),
        ("lsh probes=5", lambda: S.topk_bucketed(q, emb, dim=dim, k=K,
                                                 probes=5),
         lambda: pairs_lsh(5)),
        ("ivf nprobe=1", lambda: S.topk_ivf(q, emb, dim=dim, k=K,
                                            n_centroids=IVF_CENTROIDS,
                                            nprobe=1),
         lambda: pairs_ivf(1)),
        ("ivf nprobe=2", lambda: S.topk_ivf(q, emb, dim=dim, k=K,
                                            n_centroids=IVF_CENTROIDS,
                                            nprobe=2),
         lambda: pairs_ivf(2)),
        ("ivf nprobe=4", lambda: S.topk_ivf(q, emb, dim=dim, k=K,
                                            n_centroids=IVF_CENTROIDS,
                                            nprobe=4),
         lambda: pairs_ivf(4)),
        ("ivfpq nprobe=4", lambda: S.topk_ivfpq(
            q, emb, dim=dim, k=K, n_centroids=IVF_CENTROIDS, nprobe=4,
            m=PQ_M, ksub=PQ_KSUB),
         lambda: pairs_ivf(4)),
        ("ivfpq+rerank=30", lambda: S.topk_ivfpq_rerank(
            q, emb, dim=dim, k=K, rerank=30, n_centroids=IVF_CENTROIDS,
            nprobe=4, m=PQ_M, ksub=PQ_KSUB),
         lambda: pairs_ivf(4)),
    ]

    # Banded mining rows (VERDICT r06 #5): what nprobe costs in recall
    # when the target is a similarity BAND (hard negatives), not the
    # top-k — band members sit in lists farther from the query, so the
    # banded curve falls off faster than the top-k curve at the same
    # nprobe; this table is what lets a user pick the mining nprobe.
    lo, hi = (float(x) for x in args.band.split(","))
    exact_band = S.hard_negatives(
        q, emb, k=K, lo=lo, hi=hi
    ).localCheckpoint()
    configs += [
        (f"negatives bruteforce band=({lo},{hi}]",
         lambda: S.hard_negatives(q, emb, k=K, lo=lo, hi=hi),
         lambda: nq * (n - 1)),
    ] + [
        (f"negatives ivf nprobe={np_} band=({lo},{hi}]",
         lambda np_=np_: S.hard_negatives_ivf(
             q, emb, dim=dim, k=K, lo=lo, hi=hi,
             n_centroids=IVF_CENTROIDS, nprobe=np_),
         lambda np_=np_: pairs_ivf(np_))
        for np_ in (1, 2, 4, 8)
    ]

    # PCA-composition rows: project to pca_dims first (pca_project,
    # basis from the candidate corpus), search the projected space —
    # what dimension reduction costs in recall at the same nprobe.
    # The projection is timed inside the build, like ivf_train is.
    def build_pca_ivf(pca_dims: int):
        proj = S.pca_project(emb, dim, pca_dims).withColumnRenamed(
            "proj", "embedding"
        )
        pq = proj.where(F.col("vec_id") < N_QUERIES)
        return S.topk_ivf(
            pq, proj, dim=pca_dims, k=K,
            n_centroids=IVF_CENTROIDS, nprobe=4,
        )

    configs += [
        (f"ivf nprobe=4 pca-{d_}",
         lambda d_=d_: build_pca_ivf(d_),
         lambda: pairs_ivf(4))
        for d_ in (32, 16)
    ]

    if args.only:
        configs = [c for c in configs if args.only in c[0]]

    results = []
    for name, build, cost in configs:
        exact_ref = exact_band if name.startswith("negatives") else exact
        walls = []
        for rep in range(args.reps + 1):
            t0 = time.time()
            approx = build()
            approx.write.format("noop").mode("overwrite").save()
            if rep > 0:  # rep 0 = plan-JIT warmup, discarded
                walls.append(time.time() - t0)
        rec = (S.ann_recall(exact_ref, build())
               .agg(F.sum("n_overlap").alias("o"), F.sum("n_exact").alias("e"))
               .collect()[0])
        results.append({
            "config": name,
            "recall_at_k": round(rec["o"] / rec["e"], 4),
            "wall_sec": round(statistics.median(walls), 3),
            "pairs_scored": int(cost()),
        })
        print(json.dumps(results[-1]), flush=True)

    out = {"sf": args.sf, "k": K, "n_queries": nq, "n_vectors": n,
           "dim": dim, "reps": args.reps, "results": results}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps({"summary": [
        (r["config"], r["recall_at_k"], r["wall_sec"]) for r in results
    ]}))


if __name__ == "__main__":
    main()
