"""Data-selection importance weighting (DSIR-style).

Hashed n-gram importance resampling after Xie et al. 2023
(arXiv:2302.03169): score every raw document by how much more likely
its hashed unigram profile is under a TARGET distribution (e.g. a
high-quality or in-domain subset) than under the RAW corpus
distribution, then keep the top-weighted documents. The published
method trains two hashed bag-of-n-grams models and resamples by the
log-likelihood ratio; this module is that estimator as two tiny
aggregations plus one broadcast join.

Determinism/oracle contract:
- the feature hash is the first two hex chars of md5(token) — 256
  buckets, bit-identical in Spark and DuckDB (no engine hash());
- per-bucket log-likelihood ratios (add-one smoothing) are rounded to
  integer MICRO-NATS (round(ln(...) * 1e6)), so per-document weights
  are exact BIGINT sums — no float accumulation order anywhere in the
  output.

100 TB shape: the two distribution tables are <= `buckets` rows each —
they broadcast, and the model "training" is one map-side-combined
aggregation over the corpus. The per-document scoring pass is
explode -> partial-agg on (doc, bucket) -> broadcast join -> final agg
on doc; the corpus shuffles only as (doc_id, bucket, count) partial
counts (<= 256 rows per document), never as raw text. The reference
engine has no analog; this is part of the training-data-curation
surface the Spark port adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 256


def token_bucket(token: Column) -> Column:
    """Feature-hash bucket: first two hex chars of md5 (256 values,
    kept as the 2-char string — engines agree on md5, not on hash())."""
    return F.substring(F.md5(token), 1, 2)


def hashed_importance_weights(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, weight_micro): DSIR log-likelihood-ratio weight per doc in
    integer micro-nats. `target` is a boolean Column marking the
    target-domain rows inside df (the in-domain sample the raw corpus
    is being steered toward)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        target.alias("is_target"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).select("id", "is_target", token_bucket(F.col("token")).alias("b"))
    # (doc, bucket) partial counts: the only corpus-sized shuffle, with
    # map-side combine collapsing each doc's tokens to <= 256 rows
    per_doc = toks.groupBy("id", "is_target", "b").agg(
        F.count(F.lit(1)).alias("n")
    )
    dist = per_doc.groupBy("b").agg(
        F.sum("n").alias("raw_n"),
        F.sum(F.when(F.col("is_target"), F.col("n")).otherwise(0)).alias(
            "tgt_n"
        ),
    )
    totals = dist.agg(
        F.sum("raw_n").alias("raw_t"), F.sum("tgt_n").alias("tgt_t")
    )
    # identical formula text on the oracle side: association order of
    # the double arithmetic must match for the micro-nat round to agree
    lnr = F.log(
        ((F.col("tgt_n") + F.lit(1.0)) / (F.col("tgt_t") + F.lit(float(N_BUCKETS))))
        / ((F.col("raw_n") + F.lit(1.0)) / (F.col("raw_t") + F.lit(float(N_BUCKETS))))
    )
    ratios = dist.crossJoin(F.broadcast(totals)).select(
        "b", F.round(lnr * F.lit(1e6)).cast("long").alias("micro")
    )
    return (
        per_doc.join(F.broadcast(ratios), "b")
        .groupBy("id")
        .agg(F.sum(F.col("n") * F.col("micro")).alias("weight_micro"))
    )


def importance_resample(
    df: DataFrame,
    target: Column,
    n_keep: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The selection step: top n_keep docs by importance weight
    (deterministic: ties break on id).

    orderBy().limit() compiles to TakeOrdered — each partition keeps
    its local top-n_keep and only those reach the driver-side merge, so
    the corpus-sized weight frame is never globally sorted and never
    lands in one partition. The rank window runs AFTER the limit, over
    exactly n_keep rows (bounded by the caller, like every top-k here)."""
    w = hashed_importance_weights(df, target, id_col, text_col)
    top = w.orderBy(F.col("weight_micro").desc(), F.col("id")).limit(n_keep)
    win = Window.orderBy(F.col("weight_micro").desc(), F.col("id"))
    return top.withColumn(
        "rnk", F.row_number().over(win)
    ).select("id", "weight_micro", "rnk")


def unigram_nll_scores(
    df: DataFrame,
    lm_subset: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020,
    arXiv:1911.00359 §3.3, with the hashed-unigram model standing in
    for KenLM): score every document by its total negative
    log-likelihood under a unigram LM trained on ``lm_subset`` (the
    high-quality reference corpus — Wikipedia in the paper).

    Returns (id, n_tokens, nll_micro): nll_micro is the exact BIGINT
    sum of per-token NLLs in integer micro-nats; mean NLL (the
    log-perplexity) is the rational nll_micro / (1e6 * n_tokens),
    emitted as numerator+denominator per the no-rounded-rationals
    rule. Same shape as the DSIR estimator: one map-side-combined
    aggregation trains the <=256-row model, the model broadcasts, and
    the corpus shuffles only (doc, bucket, count) partials."""
    toks = df.select(
        F.col(id_col).alias("id"),
        lm_subset.alias("is_lm"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).select("id", "is_lm", token_bucket(F.col("token")).alias("b"))
    per_doc = toks.groupBy("id", "is_lm", "b").agg(
        F.count(F.lit(1)).alias("n")
    )
    dist = per_doc.groupBy("b").agg(
        F.sum(F.when(F.col("is_lm"), F.col("n")).otherwise(0)).alias("lm_n")
    )
    totals = dist.agg(F.sum("lm_n").alias("lm_t"))
    # -ln(p_b) with add-one smoothing; formula text mirrored in the
    # oracle so the double association order matches before the round
    nll = -F.log(
        (F.col("lm_n") + F.lit(1.0))
        / (F.col("lm_t") + F.lit(float(N_BUCKETS)))
    )
    model = dist.crossJoin(F.broadcast(totals)).select(
        "b", F.round(nll * F.lit(1e6)).cast("long").alias("nll_micro_b")
    )
    return (
        per_doc.join(F.broadcast(model), "b")
        .groupBy("id")
        .agg(
            F.sum("n").cast("int").alias("n_tokens"),
            F.sum(F.col("n") * F.col("nll_micro_b")).alias("nll_micro"),
        )
    )


def perplexity_filter(
    df: DataFrame,
    lm_subset: Column,
    max_mean_micro: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The CCNet head/middle cut as an integer inequality: keep
    documents whose mean token NLL under the reference LM is at most
    ``max_mean_micro`` MICRO-nats — nll_micro <= max_mean_micro *
    n_tokens, no float division anywhere."""
    s = unigram_nll_scores(df, lm_subset, id_col, text_col)
    return s.where(
        F.col("nll_micro") <= F.lit(int(max_mean_micro)) * F.col("n_tokens")
    )


def bigram_nll_scores(
    df: DataFrame,
    lm_subset: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram LM quality scoring — the conditional-probability upgrade
    of unigram_nll_scores (CCNet's KenLM is a 5-gram; the hashed
    bigram is the smallest model that captures word ORDER). Each
    document's consecutive-token-bucket pairs (b1, b2) are scored by
    -ln p(b2 | b1) with add-one smoothing over the lm_subset's bigram
    table: p = (c(b1,b2) + 1) / (c(b1,*) + B^2) where B = N_BUCKETS.

    Returns (id, n_bigrams, nll_micro): per-pair NLLs are rounded to
    integer micro-nats BEFORE the per-document sum (the module's
    determinism contract), so nll_micro is an exact BIGINT and mean
    NLL is the rational nll_micro / (1e6 * n_bigrams).

    100 TB shape: the model trains from ONE aggregate over the
    lm-subset's pairs (map-side combine collapses to <= B^2 = 65536
    rows before the shuffle) and broadcasts; scoring then joins the
    exploded pair stream against the broadcast model BEFORE any
    shuffle, so the only corpus-sized shuffle carries per-doc partial
    sums (one row per doc per partition after map-side combine) —
    never per-pair rows. Pairs absent from the lm model fall back to
    the broadcast 256-row context table (-ln(1/(ctx+B^2))), the same
    value the dense formula gives them.
    """
    ws = F.split(F.col(text_col), " ")
    pair_len = F.greatest(F.size(ws) - 1, F.lit(0))
    pairs = df.select(
        F.col(id_col).alias("id"),
        lm_subset.alias("is_lm"),
        F.explode(
            F.zip_with(
                F.slice(ws, 1, pair_len),
                F.slice(ws, 2, pair_len),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select(
        "id",
        "is_lm",
        token_bucket(F.col("p.w1")).alias("b1"),
        token_bucket(F.col("p.w2")).alias("b2"),
    )
    bsq = float(N_BUCKETS * N_BUCKETS)
    dist = (
        pairs.where(F.col("is_lm"))
        .groupBy("b1", "b2")
        .agg(F.count(F.lit(1)).alias("lm_n"))
    )
    ctx = dist.groupBy("b1").agg(F.sum("lm_n").alias("ctx_n"))
    # -ln((lm_n + 1) / (ctx_n + B^2)); formula text mirrored in the
    # oracle so the double association order matches before the round
    micro = lambda e: F.round(-F.log(e) * F.lit(1e6)).cast("long")  # noqa: E731
    model = dist.join(ctx, "b1").select(
        "b1",
        "b2",
        micro((F.col("lm_n") + F.lit(1.0)) / (F.col("ctx_n") + F.lit(bsq))).alias(
            "nll_micro_b"
        ),
    )
    # unseen-pair fallback per context; contexts absent from the lm
    # subset entirely cost -ln(1/B^2)
    ctx_fallback = ctx.select(
        "b1",
        micro(F.lit(1.0) / (F.col("ctx_n") + F.lit(bsq))).alias("nll_micro_ctx"),
    )
    nll_cold = int(round(-__import__("math").log(1.0 / bsq) * 1e6))
    scored = (
        pairs.join(F.broadcast(model), ["b1", "b2"], "left_outer")
        .join(F.broadcast(ctx_fallback), "b1", "left_outer")
        .select(
            "id",
            F.coalesce(
                F.col("nll_micro_b"),
                F.col("nll_micro_ctx"),
                F.lit(nll_cold).cast("long"),
            ).alias("nll"),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.sum("nll").alias("nll_micro"),
    )
