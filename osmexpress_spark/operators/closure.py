"""Fixpoint transitive closure over an edge table (operator A2).

The reference's super-relation discovery loops over the
`relation_relation` index until no new ids appear
(`/root/reference/src/extract.cpp:211-237`). Spark SQL has no recursive
CTE execution, so this is our one hand-written iterative physical
operator (SURVEY.md §4): a driver-side loop of

    frontier ⋈ edges  →  anti-join against seen  →  union into seen

with `localCheckpoint()` per iteration to truncate the growing lineage
(plan growth is the classic failure mode of iterative DataFrame code).

Scale notes: OSM relation nesting is 2-3 deep in practice, so the loop
runs a handful of iterations; each iteration is one shuffle join on the
(child, parent) edge table. The frontier is usually tiny relative to
the edge table — AQE broadcasts it automatically. `max_iterations`
bounds pathological/cyclic inputs (cycles terminate naturally because
the anti-join empties the frontier, but the bound keeps us honest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    seeds: DataFrame,
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    id_col: str = "id",
    max_iterations: int = 50,
    checkpoint: bool = True,
) -> DataFrame:
    """All ids reachable from `seeds` by repeatedly following
    src_col -> dst_col edges; result includes the seeds.

    seeds: DataFrame with a single column `id_col`.
    edges: DataFrame with columns (src_col, dst_col).
    """
    seen = seeds.select(F.col(id_col).cast("long").alias(id_col)).distinct()
    frontier = seen
    for _ in range(max_iterations):
        discovered = (
            edges.join(frontier, edges[src_col] == frontier[id_col], "inner")
            .select(F.col(dst_col).alias(id_col))
            .distinct()
        )
        fresh = discovered.join(seen, id_col, "left_anti")
        if checkpoint:
            fresh = fresh.localCheckpoint(eager=True)
        if fresh.isEmpty():
            break
        seen = seen.union(fresh)
        if checkpoint:
            seen = seen.localCheckpoint(eager=True)
        frontier = fresh
    return seen
