"""Record linkage: phonetic blocking + bounded edit-distance verify.

The entity-resolution step a training-data pipeline needs when the
same real-world entity (author, venue, organization, place name)
appears under spelling variants across sources — the string-identity
analog of the near-dup stack (dedup.py handles documents; this
handles short attribute strings).

Spark-first design: the classic quadratic all-pairs compare is
replaced by the standard blocking strategy, and every stage is a
BUILT-IN JVM expression — ``F.soundex`` for the phonetic block key,
``F.levenshtein`` (with its max-distance short-circuit overload) for
the verify — so the whole operator is one equi-join inside
whole-stage codegen, no Python anywhere:

1. block: each record maps to its soundex code (one pure column
   expression) — candidate pairs only form INSIDE a block, turning
   O(n^2) into sum over blocks of O(|block|^2);
2. hot-block cap: a frequency count + filter drops degenerate blocks
   (the skew guard every banded self-join in this repo carries —
   dedup.py's LSH join uses the same pattern);
3. verify: ``levenshtein(a, b, max_dist)`` — Spark's bounded variant
   stops early at max_dist+1, so the verify cost per pair is
   O(max_dist * min(len)) not O(len^2).

At 100 TB: the join shuffles on the block key (bounded fan-out after
the cap), the corpus never self-crosses, and everything stays in
codegen — the plan test pins zero Python stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import lineage


def phonetic_blocks(
    df: DataFrame, id_col: str, name_col: str
) -> DataFrame:
    """(id, name) -> (id, name, block) with the soundex block key.
    NULL/empty names get no block (they cannot match anything)."""
    return (
        df.select(F.col(id_col).alias("id"), F.col(name_col).alias("name"))
        .where(F.col(name_col).isNotNull() & (F.length(name_col) > 0))
        .withColumn("block", F.soundex(F.upper(F.col("name"))))
    )


def linkage_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 2,
    max_block: int = 200,
) -> DataFrame:
    """Self-linkage: (id_a, id_b, name_a, name_b, dist) for every pair
    in the same soundex block with edit distance <= max_dist, id_a <
    id_b.  Blocks larger than ``max_block`` are dropped (the hot-key
    cap; a block that big is a degenerate token like 'INC' and would
    quadratically dominate the join)."""
    # materialize the blocked names once: `b` feeds the hot-block
    # count AND both join sides, and its own lineage (often a union of
    # variant projections over an aggregate) would otherwise be
    # replicated per reference — the pre-fix q_record_linkage plan
    # held 96 parquet scans / 138 Exchanges (plans/r11).  The frame is
    # record-count-sized (id, name, block), the linkage proxy shape.
    b = lineage.cut(phonetic_blocks(df, id_col, name_col))
    hot = (
        b.groupBy("block")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_block)
        .select("block")
    )
    b = b.join(F.broadcast(hot), "block", "left_anti")
    left = b.select(
        "block", F.col("id").alias("id_a"), F.col("name").alias("name_a")
    )
    right = b.select(
        "block", F.col("id").alias("id_b"), F.col("name").alias("name_b")
    )
    return (
        left.join(right, "block")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "dist",
            F.levenshtein(F.col("name_a"), F.col("name_b"), max_dist),
        )
        .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )


def linkage_against(
    new: DataFrame,
    reference: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 2,
    max_block: int = 200,
) -> DataFrame:
    """Incremental form: link a NEW batch against a reference corpus
    without the reference self-joining (the incremental-dedup shape,
    dedup.py:incremental_dedup_pairs): pairs are (new_id, ref_id,
    dist), blocks capped on the REFERENCE side."""
    nb = phonetic_blocks(new, id_col, name_col)
    # the reference side feeds the hot-block count and the join:
    # materialize it once (same rationale as linkage_pairs)
    rb = lineage.cut(phonetic_blocks(reference, id_col, name_col))
    hot = (
        rb.groupBy("block")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_block)
        .select("block")
    )
    rb = rb.join(F.broadcast(hot), "block", "left_anti")
    return (
        nb.select("block", F.col("id").alias("new_id"),
                  F.col("name").alias("new_name"))
        .join(
            rb.select("block", F.col("id").alias("ref_id"),
                      F.col("name").alias("ref_name")),
            "block",
        )
        .withColumn(
            "dist",
            F.levenshtein(F.col("new_name"), F.col("ref_name"), max_dist),
        )
        .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("new_id", "ref_id", "new_name", "ref_name", "dist")
    )


def canonical_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 2,
    max_block: int = 200,
    max_iters: int = 20,
) -> DataFrame:
    """Entity resolution end-to-end: linkage pairs -> connected
    components (the dedup stack's min-label propagation, closure
    reuse) -> (id, entity_id) where entity_id is the smallest member
    id of each linked cluster.  Unlinked records are their own
    entity."""
    from . import dedup as _dedup

    pairs = linkage_pairs(df, id_col, name_col, max_dist, max_block)
    clusters = _dedup.dup_clusters(pairs, max_iterations=max_iters)
    ids = df.select(F.col(id_col).alias("id")).distinct()
    labeled = clusters.select("id", F.col("cluster_id").alias("entity_id"))
    return (
        ids.join(labeled, "id", "left_outer")
        .select(
            "id",
            F.coalesce(F.col("entity_id"), F.col("id")).alias("entity_id"),
        )
    )
