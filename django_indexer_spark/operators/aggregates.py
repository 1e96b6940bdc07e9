"""Aggregation operators — SURVEY.md §2.4 (A1-A10).

The reference computes its stats with O(entities x queries) Python loops
(tasks.py:188-327, one QuerySet per pot/account); here each stats family is
ONE grouped aggregation — map-side partial aggregation + a single shuffle —
then a broadcast join back to the entity table (plans/account_stats.py,
plans/pot_stats.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.amounts import guarded_amount


def conditional_sum(flag: Column, value: Column, alias: str) -> Column:
    """A5 — pivot-by-flag aggregation (tasks.py:188-257 matching_pool split):
    sum(value) restricted to rows where ``flag`` holds, in ONE pass over the
    fact table instead of the reference's two filtered queries per pot."""
    return F.sum(F.when(flag, value)).alias(alias)


def conditional_count(flag: Column, alias: str) -> Column:
    return F.count(F.when(flag, F.lit(1))).alias(alias)


def guarded_amount_sum(col: str, alias: str) -> Column:
    """A6 — digit-guarded sum of u128 string amounts (tasks.py:200-204)."""
    return F.sum(guarded_amount(col)).alias(alias)


def distinct_count(df: DataFrame, col: str) -> DataFrame:
    """A3 exact — countDistinct (base/api.py:74-79, tasks.py:285-287)."""
    return df.agg(F.countDistinct(col).alias(f"distinct_{col}"))


def approx_distinct_count(df: DataFrame, col: str, rsd: float = 0.02) -> DataFrame:
    """A3 at 100 TB — HyperLogLog++ sketch. Exact countDistinct of a
    high-cardinality key is a full shuffle of the key; the sketch is a
    map-side-combinable fixed-size state. Exposed as a first-class variant
    (SURVEY.md §2.4 A3 note)."""
    return df.agg(F.approx_count_distinct(col, rsd).alias(f"approx_distinct_{col}"))
