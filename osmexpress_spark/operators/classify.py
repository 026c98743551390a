"""Multinomial Naive Bayes over hashed token buckets: distributed
TRAINING and inference as one Catalyst plan, engine-exact end to end.

The fastText-shaped corpus classifier (language ID, quality, domain)
that curation pipelines train on their own labels: training is pure
counting (one map-side-combined aggregate over token buckets — the
only corpus-sized shuffle, collapsed to <= 256 rows per document by
the combine), and the model is a (classes x 256)-row table that
broadcasts. Scoring sums integer micro-nat log-probabilities, so
document scores are exact BIGINTs; the only doubles are the per-cell
`ln` calls, rounded to micro-nats with the identical formula text on
the oracle side (the operators/importance.py idiom, driver-green
since round 3).

Reference parity note: the reference engine (bdon/OSMExpress) has no
classifier surface; this is a SURVEY §2.9 training-data extension.

Scale shape at 100 TB: tokenize+bucket is scan-side; per-doc bucket
counts shuffle once (map-side combined); the model aggregate folds
that to classes*256 rows; scoring re-broadcasts the model and the
argmax window runs over |classes| rows per document. Nothing
corpus-sized ever reaches the driver; nothing quadratic anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .importance import N_BUCKETS, token_bucket

MICRO = 1_000_000


def nb_token_counts(
    df: DataFrame,
    label: Column,
    text: Column,
) -> DataFrame:
    """NB sufficient statistics: (label, b, cnt) token-bucket counts
    per class — the training aggregate. Null labels are dropped (an
    unlabeled row can train nothing)."""
    return (
        df.where(label.isNotNull())
        .select(
            label.alias("label"),
            F.explode(F.split(text, " ")).alias("token"),
        )
        .where(F.length("token") > 0)
        .select("label", token_bucket(F.col("token")).alias("b"))
        .groupBy("label", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _micro_model(counts: DataFrame) -> DataFrame:
    """(label, b, micro): Laplace-smoothed log P(bucket|class) in
    integer micro-nats — round(1e6 * ln((cnt+1)/(tot+256))). The
    formula text matches the oracle byte-for-byte (one addition chain,
    one division, one ln)."""
    tot = counts.groupBy("label").agg(F.sum("cnt").alias("tot"))
    return counts.join(tot, "label").select(
        "label",
        "b",
        F.round(
            F.log(
                (F.col("cnt") + F.lit(1.0))
                / (F.col("tot") + F.lit(float(N_BUCKETS)))
            )
            * F.lit(float(MICRO))
        )
        .cast("long")
        .alias("micro"),
    )


def _micro_default(counts: DataFrame) -> DataFrame:
    """(label, micro0): the unseen-bucket score ln(1/(tot+256)) per
    class — buckets absent from a class's training rows still
    contribute Laplace mass at scoring time."""
    return (
        counts.groupBy("label")
        .agg(F.sum("cnt").alias("tot"))
        .select(
            "label",
            F.round(
                F.log(F.lit(1.0) / (F.col("tot") + F.lit(float(N_BUCKETS))))
                * F.lit(float(MICRO))
            )
            .cast("long")
            .alias("micro0"),
        )
    )


def _nb_scored(
    df: DataFrame,
    id_col: str,
    text: Column,
    counts: DataFrame,
    priors: DataFrame,
) -> DataFrame:
    """(id, label, score_micro) for EVERY (document, class) pair —
    the shared TRAIN + SCORE plan nb_predict and nb_reliability read
    out differently (argmax vs top-2 margin).

    Plan: per-doc bucket counts (ONE corpus shuffle, map-side
    combined, <= 256 rows/doc) x broadcast model on b, summed per
    (doc, class), plus the per-class unseen-bucket default for the
    buckets the doc has but the class never saw."""
    per_doc = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(text, " ")).alias("token"),
        )
        .where(F.length("token") > 0)
        .select("id", token_bucket(F.col("token")).alias("b"))
        .groupBy("id", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    model = _micro_model(counts)
    dflt = _micro_default(counts)
    n_total = priors.agg(F.sum("n_docs").alias("nt"))
    prior_micro = priors.crossJoin(F.broadcast(n_total)).select(
        "label",
        F.round(
            F.log(F.col("n_docs").cast("double") / F.col("nt"))
            * F.lit(float(MICRO))
        )
        .cast("long")
        .alias("prior_micro"),
    )
    # per (doc, class): seen buckets score model.micro, unseen buckets
    # score the class default — join per-doc rows with every class's
    # default (broadcast), overlay the model where (label, b) matches
    return (
        per_doc.crossJoin(F.broadcast(dflt))
        .join(F.broadcast(model), ["label", "b"], "left_outer")
        .groupBy("id", "label")
        .agg(
            F.sum(
                F.col("n") * F.coalesce(F.col("micro"), F.col("micro0"))
            ).alias("ll")
        )
        .join(F.broadcast(prior_micro), "label")
        .select(
            "id",
            "label",
            (F.col("ll") + F.col("prior_micro")).alias("score_micro"),
        )
    )


def nb_predict(
    df: DataFrame,
    id_col: str,
    text: Column,
    counts: DataFrame,
    priors: DataFrame,
) -> DataFrame:
    """(id, pred, score_micro): argmax-class per document under the
    trained model. `counts` is nb_token_counts' output; `priors` is
    (label, n_docs). Ties break on label ASC — deterministic. The
    argmax is a |classes|-row window per doc over _nb_scored's plan."""
    scored = _nb_scored(df, id_col, text, counts, priors)
    w = Window.partitionBy("id").orderBy(
        F.col("score_micro").desc(), F.col("label")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", F.col("label").alias("pred"), "score_micro")
    )


def nb_self_confusion(
    df: DataFrame,
    id_col: str,
    label: Column,
    text: Column,
) -> DataFrame:
    """Train on the labeled corpus and classify the SAME corpus —
    (label, pred, n) confusion counts, the calibration readout before
    trusting the classifier on unlabeled data. Training and inference
    compose into one Catalyst plan; the whole thing is oracle-checkable
    because every score is an exact BIGINT micro-nat sum."""
    counts = nb_token_counts(df, label, text)
    priors = (
        df.where(label.isNotNull())
        .groupBy(label.alias("label"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    preds = nb_predict(df, id_col, text, counts, priors)
    truth = df.select(F.col(id_col).alias("id"), label.alias("label"))
    return (
        truth.join(preds, "id")
        .groupBy("label", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def nb_reliability(
    df: DataFrame,
    id_col: str,
    label: Column,
    text: Column,
) -> DataFrame:
    """Reliability (calibration) table for the self-trained classifier:
    ``(bucket, n, n_correct)`` where ``bucket`` is the integer-log
    bucket (sketch.quantile_bucket) of the top-1-minus-top-2 score
    MARGIN in micro-nats. This is the table that sets an auto-label
    threshold: pick the lowest margin bucket whose n_correct/n clears
    the target precision, then the threshold is that bucket's lower
    bound — without it a confusion matrix says how good the classifier
    is on average, not WHICH predictions to trust.

    Engine-exact end to end: scores and margins are BIGINT micro-nats
    (a top-2 tie gives margin 0; a single-class corpus has no runner-up
    and folds to margin 0 too), and the bucketing is the pure-integer
    sketch binning — so the whole train + score + margin + bin pipeline
    sits behind the value-hash gate. Scale shape: _nb_scored's one
    corpus shuffle, a |classes|-row window per doc for the top-2, and
    a <= 1025-row output aggregate."""
    from .sketch import quantile_bucket

    counts = nb_token_counts(df, label, text)
    priors = (
        df.where(label.isNotNull())
        .groupBy(label.alias("label"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    scored = _nb_scored(df, id_col, text, counts, priors)
    w = Window.partitionBy("id").orderBy(
        F.col("score_micro").desc(), F.col("label")
    )
    # top-1/top-2 in ONE pass: the old top1-join-top2 referenced the
    # ranked frame twice, and Catalyst replicated the whole
    # train+score subtree per reference (26 scans in the pre-fix
    # q_nb_reliability plan).  max(when(rn=k, ...)) over rn <= 2 rows
    # reads each rank exactly once, the groupBy rides the window's
    # id-partitioning (no extra Exchange), and the margin algebra is
    # unchanged: s1 - coalesce(s2, s1).
    ranked = scored.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= 2
    )
    margins = (
        ranked.groupBy("id")
        .agg(
            F.max(
                F.when(
                    F.col("rn") == 1, F.struct("score_micro", "label")
                )
            ).alias("t1"),
            F.max(
                F.when(F.col("rn") == 2, F.col("score_micro"))
            ).alias("s2"),
        )
        .select(
            "id",
            F.col("t1.label").alias("pred"),
            (
                F.col("t1.score_micro")
                - F.coalesce(F.col("s2"), F.col("t1.score_micro"))
            ).alias("margin"),
        )
    )
    truth = df.select(F.col(id_col).alias("id"), label.alias("truth"))
    return (
        truth.join(margins, "id")
        .select(
            quantile_bucket(F.col("margin")).alias("bucket"),
            F.when(F.col("pred") == F.col("truth"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("ok"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ok").cast("long").alias("n_correct"),
        )
    )
