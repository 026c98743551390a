"""DSIR-style hashed importance weighting (operators/importance.py,
arXiv:2302.03169) against an independent Python model."""

from __future__ import annotations

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from osmexpress_spark.operators import importance

WORDS_TGT = ["alpha", "beta", "gamma", "delta"]
WORDS_RAW = ["epsilon", "zeta", "eta", "theta", "iota", "kappa"]


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(11)
    rows = []
    for i in range(120):
        tgt = i % 3 == 0
        pool = WORDS_TGT if tgt else WORDS_RAW
        # mix in shared vocabulary so distributions overlap
        words = [rng.choice(pool if rng.random() < 0.7 else WORDS_TGT + WORDS_RAW)
                 for _ in range(30)]
        rows.append((i, " ".join(words), "en" if tgt else "de"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _model(rows):
    """Independent model: md5-prefix buckets, add-one smoothing,
    micro-nat rounding, exact integer doc sums."""
    B = importance.N_BUCKETS
    raw: dict[str, int] = {}
    tgt: dict[str, int] = {}
    per_doc: dict[int, dict[str, int]] = {}
    for doc_id, text, lang in rows:
        buckets = per_doc.setdefault(doc_id, {})
        for w in text.split(" "):
            b = hashlib.md5(w.encode()).hexdigest()[:2]
            raw[b] = raw.get(b, 0) + 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
            buckets[b] = buckets.get(b, 0) + 1
    raw_t, tgt_t = sum(raw.values()), sum(tgt.values())
    micro = {
        b: int(round(math.log(((tgt.get(b, 0) + 1.0) / (tgt_t + float(B))) /
                              ((raw[b] + 1.0) / (raw_t + float(B)))) * 1e6))
        for b in raw
    }
    return {
        doc_id: sum(n * micro[b] for b, n in buckets.items())
        for doc_id, buckets in per_doc.items()
    }


def test_weights_match_python_model(spark, docs):
    rows = [(r["doc_id"], r["text"], r["lang"]) for r in docs.collect()]
    want = _model(rows)
    got = {
        r["id"]: r["weight_micro"]
        for r in importance.hashed_importance_weights(
            docs, F.col("lang") == "en"
        ).collect()
    }
    assert got == want


def test_target_docs_score_higher(spark, docs):
    w = importance.hashed_importance_weights(docs, F.col("lang") == "en")
    joined = w.join(docs, w["id"] == docs["doc_id"]).collect()
    tgt = [r["weight_micro"] for r in joined if r["lang"] == "en"]
    raw = [r["weight_micro"] for r in joined if r["lang"] != "en"]
    assert sum(tgt) / len(tgt) > sum(raw) / len(raw)


def test_resample_is_deterministic_topk(spark, docs):
    res = importance.importance_resample(
        docs, F.col("lang") == "en", n_keep=25
    ).collect()
    assert len(res) == 25
    assert [r["rnk"] for r in res] == list(range(1, 26))
    ws = [(r["weight_micro"], r["id"]) for r in res]
    assert ws == sorted(ws, key=lambda x: (-x[0], x[1]))
    # the cut is the global top-25 of the full weight frame
    full = sorted(
        ((r["weight_micro"], r["id"]) for r in
         importance.hashed_importance_weights(
             docs, F.col("lang") == "en").collect()),
        key=lambda x: (-x[0], x[1]),
    )[:25]
    assert ws == full


def test_unigram_nll_scores_match_python_model(spark):
    from osmexpress_spark.operators import importance
    import hashlib
    import math

    docs = [
        (1, True, "aa bb aa cc"),
        (2, True, "aa aa bb"),
        (3, False, "zz yy xx aa"),
        (4, False, "bb bb bb"),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, is_lm boolean, text string"
    )
    got = {r.id: (r.n_tokens, r.nll_micro)
           for r in importance.unigram_nll_scores(
               df, F.col("is_lm"), "doc_id", "text").collect()}

    bucket = lambda t: hashlib.md5(t.encode()).hexdigest()[:2]
    lm_counts: dict[str, int] = {}
    for _, is_lm, text in docs:
        if is_lm:
            for t in text.split(" "):
                lm_counts[bucket(t)] = lm_counts.get(bucket(t), 0) + 1
    lm_t = sum(lm_counts.values())
    nll_b = {}
    all_buckets = {bucket(t) for _, _, txt in docs for t in txt.split(" ")}
    for b in all_buckets:
        p = (lm_counts.get(b, 0) + 1.0) / (lm_t + 256.0)
        nll_b[b] = round(-math.log(p) * 1e6)
    want = {}
    for did, _, text in docs:
        toks = text.split(" ")
        want[did] = (len(toks), sum(nll_b[bucket(t)] for t in toks))
    assert got == want
    # in-LM docs must score lower (more likely) than the OOV doc
    mean = lambda d: want[d][1] / want[d][0]
    assert mean(1) < mean(3) and mean(2) < mean(3)


def test_perplexity_filter_integer_threshold(spark):
    from osmexpress_spark.operators import importance

    df = spark.createDataFrame(
        [(1, True, "aa bb aa"), (2, False, "qq rr ss tt")],
        "doc_id long, is_lm boolean, text string",
    )
    scores = {r.id: r.nll_micro // r.n_tokens
              for r in importance.unigram_nll_scores(
                  df, F.col("is_lm"), "doc_id", "text").collect()}
    cut = (scores[1] + scores[2]) // 2
    kept = [r.id for r in importance.perplexity_filter(
        df, F.col("is_lm"), max_mean_micro=cut, id_col="doc_id",
        text_col="text").collect()]
    assert kept == [1]
