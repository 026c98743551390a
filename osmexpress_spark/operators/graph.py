"""Graph analytics over derived edge tables (PageRank, triangles).

The engine's data model is a property graph (SURVEY §1.1: elements =
vertices, membership = edges) and several derived graphs fall out of
the operator surface — way-intersection junctions
(spatial_join.way_intersections), relation containment
(edges.relation_relation), near-dup clusters (dedup.dup_clusters).
This module adds the two classic whole-graph measures without any
graph library:

- PageRank in EXACT INTEGER micro-units: state is pr_micro BIGINT;
  each iteration is contribution = pr_micro DIV out_degree (integer
  division) summed per target, then new = jump_micro + (17 * sum) DIV
  20 for damping 0.85 — pure BIGINT arithmetic end to end, so the
  fixpoint is bit-identical on any engine (an oracle can unroll it)
  and immune to float summation order. The integer truncation loses
  < 1 micro-unit per edge per iteration — measurement noise at
  rank-comparison granularity, and a price worth paying for
  cross-engine determinism.
- Triangle counting by rank orientation: each undirected edge is
  oriented low-id -> high-id, wedges join on the middle vertex, and a
  semi-join against the edge set closes them. The orientation bounds
  the wedge explosion by the max ORIENTED out-degree.

Scale shape: every iteration is one equi-join on vertex id + one
map-side-combined sum (the canonical distributed PageRank); the loop
localCheckpoints so plans stay flat. Triangles are two equi-joins, no
cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JUMP_MICRO = 150_000  # (1 - 0.85) * 1e6


def pagerank_micro(
    edges: DataFrame,
    iterations: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id, pr_micro) after `iterations` damped power steps from the
    uniform 1.0 start (1_000_000 micro-units per vertex). `edges` is
    DIRECTED; pass both orientations for an undirected graph. Vertices
    = every id appearing as src or dst; a vertex with no out-edges
    contributes nothing (its mass evaporates — the simple variant;
    re-injection is a one-line change the oracle would mirror)."""
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).localCheckpoint(eager=False)
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    pr = verts.select("id", F.lit(1_000_000).cast("long").alias("pr_micro"))
    for _ in range(iterations):
        contrib = (
            e.join(pr.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                F.expr("pr_micro DIV deg").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            verts.join(contrib, "id", "left_outer")
            .select(
                "id",
                (
                    F.lit(JUMP_MICRO)
                    + F.expr("17 * coalesce(s, 0) DIV 20")
                ).cast("long").alias("pr_micro"),
            )
            .localCheckpoint(eager=True)
        )
    return pr


def triangle_count(
    edges: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """One row (n_triangles BIGINT) for an undirected edge list given
    as canonical a < b pairs (way_intersections' output shape). Each
    triangle {a < b < c} is counted exactly once: wedges (a->b, b->c)
    join closing edges (a->c)."""
    e = (
        edges.select(
            F.least(F.col(id_a), F.col(id_b)).cast("long").alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).cast("long").alias("b"),
        )
        .where(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    wedge = e.alias("x").join(
        e.select(F.col("a").alias("b"), F.col("b").alias("c")).alias("y"), "b"
    )
    closed = wedge.join(
        e.select(F.col("a"), F.col("b").alias("c")).select("a", "c"), ["a", "c"],
        "left_semi",
    )
    return closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
