"""Table profiling: per-column health stats in one scan.

Training-data pipelines gate every ingest batch on a profile (null
explosions, cardinality collapse, range drift); the reference's only
introspection is the per-table count report (`osmx query`,
`/root/reference/src/cmd.cpp:96-109`) — this generalizes it per column.

Scale shape: ONE aggregate job over the table — every statistic is a
map-side-combinable aggregate (count / count-if-null / HLL-free exact
distinct via hash aggregate / min / max), so the scan parallelizes and
only k×5 partial values shuffle. The per-column output rows are an
unpivot of the single aggregate row, not extra scans.

Determinism contract: min/max are emitted as strings via CAST, which
matches DuckDB for integer/string/timestamp columns; floating-point
columns are formatted by the caller if needed (engine float-to-string
differs, so the oracle-checked query profiles non-float columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) — min/max as strings, NULL-only columns give
    NULL min/max. n_distinct ignores NULLs (COUNT(DISTINCT) semantics
    on both engines).

    `approx_distinct=True` swaps the exact distinct for
    `approx_count_distinct` (HLL++). The exact form pays twice at
    scale: Catalyst rewrites k DISTINCT aggregates into an Expand that
    multiplies every input row (k+1)x before the first aggregate
    (verified in the physical plan), and the partial distinct sets
    shuffle. The sketch version has no Expand and constant memory —
    it IS the 100 TB path. Default exact — that is the oracle-checked
    contract."""
    cols = columns if columns is not None else df.columns
    nd = F.approx_count_distinct if approx_distinct else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        aggs.extend(
            [
                F.sum(F.isnull(c).cast("long")).alias(f"nn{i}"),
                nd(F.col(c)).alias(f"nd{i}"),
                F.min(F.col(c)).cast("string").alias(f"mn{i}"),
                F.max(F.col(c)).cast("string").alias(f"mx{i}"),
            ]
        )
    one = df.agg(*aggs)
    # unpivot by exploding an array of per-column structs over the ONE
    # aggregate row — a union of per-column selects would duplicate the
    # whole aggregate subtree per column (k full table scans)
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("n_rows"),
                        F.col(f"nn{i}").alias("n_nulls"),
                        F.col(f"nd{i}").alias("n_distinct"),
                        F.col(f"mn{i}").alias("min_value"),
                        F.col(f"mx{i}").alias("max_value"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("p")
    ).select("p.*")


def profile_oracle_sql(table: str, columns: list[str]) -> str:
    """DuckDB SQL computing the identical profile (one UNION ALL branch
    per column off a shared single-row aggregate CTE)."""
    aggs = ["count(*) AS n_rows"]
    for i, c in enumerate(columns):
        aggs.extend(
            [
                f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn{i}",
                f"count(DISTINCT {c}) AS nd{i}",
                f"CAST(min({c}) AS VARCHAR) AS mn{i}",
                f"CAST(max({c}) AS VARCHAR) AS mx{i}",
            ]
        )
    branches = "\n    UNION ALL ".join(
        f"SELECT '{c}' AS \"column\", n_rows, nn{i} AS n_nulls, nd{i} AS n_distinct,"
        f" mn{i} AS min_value, mx{i} AS max_value FROM one"
        for i, c in enumerate(columns)
    )
    return f"""
    WITH one AS (SELECT {", ".join(aggs)} FROM {table})
    {branches}
    """


def modality_alignment(
    docs: DataFrame,
    vecs: DataFrame,
    doc_id: str = "doc_id",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Cross-modality integrity census in one row: when a pipeline
    carries a text table and an embedding (or image/audio feature)
    table keyed by the same ids, every downstream join silently drops
    whatever does not align — this gate measures the damage FIRST.
    Output: (n_docs, n_vecs, n_matched, n_doc_only, n_vec_only,
    n_dim_bad) — exact BIGINTs; n_dim_bad counts embeddings whose
    length differs from ``dim`` (0 when dim is None). Launchable ==
    n_doc_only = n_vec_only = n_dim_bad = 0.

    Scale shape: both sides project to id (+ one size() for the dim
    check) before the full-outer join — two narrow column-pruned
    scans, one equi-join on id, one aggregate row out. Nothing wide
    ever shuffles."""
    d = docs.select(F.col(doc_id).alias("__id"), F.lit(1).alias("__d"))
    dim_bad = (
        (F.size(F.col(vec_col)) != F.lit(int(dim))).cast("int")
        if dim is not None
        else F.lit(0)
    )
    v = vecs.select(
        F.col(vec_id).alias("__id"),
        F.lit(1).alias("__v"),
        dim_bad.alias("__bad"),
    )
    j = d.join(v, "__id", "full_outer")
    return j.agg(
        F.sum(F.coalesce(F.col("__d"), F.lit(0))).alias("n_docs"),
        F.sum(F.coalesce(F.col("__v"), F.lit(0))).alias("n_vecs"),
        F.sum(
            (F.col("__d").isNotNull() & F.col("__v").isNotNull()).cast(
                "long"
            )
        ).alias("n_matched"),
        F.sum(
            (F.col("__d").isNotNull() & F.col("__v").isNull()).cast("long")
        ).alias("n_doc_only"),
        F.sum(
            (F.col("__d").isNull() & F.col("__v").isNotNull()).cast("long")
        ).alias("n_vec_only"),
        F.sum(F.coalesce(F.col("__bad"), F.lit(0)).cast("long")).alias(
            "n_dim_bad"
        ),
    )


def profile_diff(
    old: DataFrame,
    new: DataFrame,
    rel_tolerance_permille: int = 0,
) -> DataFrame:
    """Epoch-over-epoch profile gate: diff two ``profile()`` frames and
    return one row per column that changed — the ingest-batch alarm for
    null explosions, cardinality collapse, and range drift, from
    metadata alone (two bounded per-column frames join; neither corpus
    is rescanned here). Output: (column, status, old/new n_rows,
    n_nulls, n_distinct, min/max) with status 'added' / 'removed' /
    'changed'; an empty result == the new epoch profiles identically.

    ``rel_tolerance_permille`` relaxes the count comparisons (n_rows,
    n_nulls, n_distinct): a count change within x/1000 of the OLD value
    does not flag — integer cross-multiplication, no floats — while
    min/max strings always compare exactly. 0 = exact gate (the
    oracle-checked contract)."""
    if rel_tolerance_permille < 0:
        raise ValueError("rel_tolerance_permille must be nonnegative")
    o = old.select(
        F.col("column"),
        F.col("n_rows").alias("old_n_rows"),
        F.col("n_nulls").alias("old_n_nulls"),
        F.col("n_distinct").alias("old_n_distinct"),
        F.col("min_value").alias("old_min"),
        F.col("max_value").alias("old_max"),
    )
    n = new.select(
        F.col("column"),
        F.col("n_rows").alias("new_n_rows"),
        F.col("n_nulls").alias("new_n_nulls"),
        F.col("n_distinct").alias("new_n_distinct"),
        F.col("min_value").alias("new_min"),
        F.col("max_value").alias("new_max"),
    )
    j = o.join(n, "column", "full_outer")
    tol = F.lit(int(rel_tolerance_permille))

    def count_moved(a: str, b: str):
        # |new - old| * 1000 > tol * old  (exact integer arithmetic)
        return (
            F.abs(F.col(b) - F.col(a)) * F.lit(1000) > tol * F.col(a)
        )

    changed = (
        count_moved("old_n_rows", "new_n_rows")
        | count_moved("old_n_nulls", "new_n_nulls")
        | count_moved("old_n_distinct", "new_n_distinct")
        | ~(F.col("old_min").eqNullSafe(F.col("new_min")))
        | ~(F.col("old_max").eqNullSafe(F.col("new_max")))
    )
    status = (
        F.when(F.col("old_n_rows").isNull(), F.lit("added"))
        .when(F.col("new_n_rows").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
    )
    return j.withColumn("status", status).where(
        F.col("status").isNotNull()
    ).select(
        "column", "status",
        "old_n_rows", "new_n_rows", "old_n_nulls", "new_n_nulls",
        "old_n_distinct", "new_n_distinct",
        "old_min", "new_min", "old_max", "new_max",
    )
