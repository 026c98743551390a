"""Bucketed-table layout: the co-located-join storage primitive.

At 100 TB the single biggest join cost is the shuffle of the fact
table. Spark's bucketing fixes the partitioning INTO THE LAYOUT: both
sides written with `bucketBy(n, key)` hash-place rows identically, so
an equi-join on the bucket key runs with NO Exchange on either side
(SortMergeJoin directly over the buckets). This module is the thin,
tested wrapper the engine exposes for that layout — the lakehouse
sibling of the expand layout's cell/id sort.

Bucketed tables must live in the session catalog (saveAsTable), not
bare parquet paths: the bucket metadata travels through the catalog.
Tests assert the no-Exchange property on the join plan, which is the
entire point of the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` hash-bucketed (and optionally sorted) by `key`.
    `buckets` must match on every table that will join on `key`
    (matching bucket counts is what removes BOTH exchanges; a 2:1
    ratio removes one side only)."""
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (a plain
    spark.read.parquet on the files would DROP the bucket metadata and
    reintroduce the shuffle)."""
    return spark.table(table)
