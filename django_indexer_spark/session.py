"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads,
single JVM). The conf below is chosen so the SAME code scales to a real
multi-executor cluster at ~100 TB:

- AQE on (runtime coalescing, skew-join splitting, plan re-optimization);
- shuffle partitions sized to cores locally — on a cluster this is
  overridden to ~2-3x total executor cores, and AQE coalesces down;
- session timezone pinned to UTC so timestamp semantics are deterministic
  and match the DuckDB oracle (duckdb timestamps are UTC-naive);
- Arrow enabled for the few pandas_udf paths (similarity/multimodal).

Nothing here is specific to local mode except the master default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "django-indexer-spark", **extra_conf: str) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``extra_conf`` overrides any default — callers on a real cluster pass
    their own master/shuffle sizing.
    """
    cpus = cpu_count()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        # -- determinism / oracle parity --
        .config("spark.sql.session.timeZone", "UTC")
        # read TIMESTAMP(NANOS) parquet (events.ts) as long ns — Spark has
        # no ns timestamp; functions.scalars.ns_to_timestamp converts (C3)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # -- adaptive execution: runtime coalesce + skew-join handling --
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- shuffle sizing: ~cores locally; cluster overrides via extra_conf --
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        # -- scan sizing: default 128m is right for big clusters too --
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # -- python<->jvm data path --
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # -- T7 multi-queue isolation: FAIR mode lets concurrent streaming
        # queries run in named scheduler pools (streaming.pipeline
        # stream_ingest(pool=...)), the Spark analogue of the reference's
        # per-queue Celery workers (base/celery.py). Pools are created on
        # demand; jobs without a pool share 'default'.
        .config("spark.scheduler.mode", "FAIR")
        # -- keep the local harness lean --
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # broadcast threshold: 64m — dimension tables (region/nation/
        # customer/tokens/chains analogues) should always broadcast
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
