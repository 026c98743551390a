"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      -> flagship query on /root/testdata/sf0.001
queries()         -> {name: (spark, sf_dir) -> DataFrame} per SURVEY.md §2
oracle_sql()      -> {name: DuckDB SQL} for every SQL-expressible query

Implementations live in osmexpress_spark.queries (relational inventory)
and osmexpress_spark.queries_data (LLM-pipeline operators); OSM-domain
pipelines (extract/closure/WKT over the fixture dataset) are registered
as rows-only checks — their semantics are golden-tested in tests/
against an independent Python model instead of SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the star-join revenue rollup (Catalyst join ordering +
    broadcast dims + decimal-exact aggregation) at sf0.001."""
    from osmexpress_spark import queries as Q

    return Q.SPARK_QUERIES["q_star_join_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from osmexpress_spark import queries as Q
    from osmexpress_spark import queries_data as QD
    from osmexpress_spark import queries_osm as QO
    from osmexpress_spark import queries_update as QU

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(Q.SPARK_QUERIES)
    out.update(QD.SPARK_QUERIES)
    out.update(QO.SPARK_QUERIES)
    out.update(QU.SPARK_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from osmexpress_spark import queries as Q
    from osmexpress_spark import queries_data as QD
    from osmexpress_spark import queries_osm as QO
    from osmexpress_spark import queries_update as QU

    out: dict[str, str] = {}
    out.update(Q.ORACLE_SQL)
    out.update(QD.ORACLE_SQL)
    out.update(QO.oracle_sql())
    out.update(QU.ORACLE_SQL)
    return out
