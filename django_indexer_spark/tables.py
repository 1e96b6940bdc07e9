"""Fixture/table loading.

``load`` reads the driver's parquet tables with the EXPLICIT schemas from
``schemas.FIXTURE_SCHEMAS`` (never inferred) and returns them as a dict.
``register_views`` additionally registers temp views so plans can use
``spark.sql``.

At 100 TB these reads are the bronze layer: parquet scans benefit from
Catalyst column pruning + predicate pushdown automatically because every
downstream operator is declarative. Partitioning guidance for production
tables lives in README.md (donations by date(donated_at), clustered by
donor/recipient/pot — SURVEY.md §4 index row).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every fixture table under ``sf_dir`` as a DataFrame.

    The parquet footers already carry the authoritative schema; we read
    without inference and let tests assert the footer matches
    FIXTURE_SCHEMAS (types are enforced at write time by the driver).
    """
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in FIXTURE_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    dfs = load(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
