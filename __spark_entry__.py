"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual implementations live in ``django_indexer_spark.plans``:
``fixture_queries.QUERIES`` (Spark callables) and ``oracles.ORACLES``
(DuckDB SQL twins). See SURVEY.md §2 for the operator inventory each
query covers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from django_indexer_spark.plans.fixture_queries import QUERIES
from django_indexer_spark.plans.oracles import ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the /stats endpoint shape, base/api.py:60-89) on
    sf0.001; driver checks rows>0."""
    return QUERIES["stats_overview"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted entries =
    non-SQL-expressible ops, driver records rows-only check)."""
    return dict(ORACLES)
