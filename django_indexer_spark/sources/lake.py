"""NEAR-lake block-stream source — SURVEY.md §2.1 S1/S2/S6.

The reference consumes the NEAR Data Lake via near_lake_framework: an
asyncio loop fetching per-block JSON from S3 one block at a time
(indexer_app/tasks.py:28-93). Here the lake is just a JSON dataset:

- batch:   ``read_lake(spark, path)``       — spark.read.json with the
           explicit LAKE_MESSAGE_SCHEMA (never inferred);
- stream:  ``read_lake_stream(spark, path)`` — readStream + maxFilesPerTrigger
           (pacing ≙ the reference's one-block-at-a-time queue);
- both feed ``explode_receipts`` → the flat BLOCK_STREAM_SCHEMA bronze that
  every downstream normalizer consumes (one code path for stream AND
  backfill, replacing the reference's parallel handler.py/populatedata.py
  implementations — SURVEY.md §2.7).

Checkpointing (S2): the reference persists a BlockHeight singleton per
block (utils.py:1194-1203) and resumes at height-1 (tasks.py:104-107).
Structured Streaming's checkpointLocation subsumes this; for batch,
``last_processed_height`` computes the resume point from the bronze table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import LAKE_MESSAGE_SCHEMA


def read_lake(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(LAKE_MESSAGE_SCHEMA).json(path)


def read_lake_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 32
) -> DataFrame:
    return (
        spark.readStream.schema(LAKE_MESSAGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def explode_receipts(lake: DataFrame) -> DataFrame:
    """Raw lake message → one row per (receipt, action) — the bronze table.

    Mirrors handler.py:46-98's nested loops (shards →
    receipt_execution_outcomes → actions) as three generator-explodes that
    whole-stage-codegen fuses into a single pass. Receipt ordering within a
    block is preserved in ``receipt_ordinal`` so merge versioning
    (block_height, receipt_ordinal) is total per key.
    """
    shards = lake.select(
        F.col("block.header.height").alias("block_height"),
        F.col("block.header.timestamp").alias("block_timestamp_ns"),
        F.posexplode_outer("shards").alias("__shard_pos", "shard"),
    )
    outcomes = shards.select(
        "block_height",
        "block_timestamp_ns",
        F.col("shard.shard_id").alias("shard_id"),
        F.posexplode_outer("shard.receipt_execution_outcomes").alias("__rx_pos", "rx"),
    )
    receipts = outcomes.select(
        "block_height",
        "block_timestamp_ns",
        "shard_id",
        # ordinal = shard_id << 20 | pos: 20 bits for the within-shard
        # position (< 1,048,576 receipts/shard/block) leaves 43 bits of
        # shard_id headroom, so ordinals can never spill into the next
        # block's version range (normalize.prepare shifts height by 32;
        # shard_id < 4096 keeps the packed ordinal under 2^32). NEAR
        # resharding grows shard count over time — the old decimal
        # multipliers (shard*1M) collided at shard_id >= 10.
        (
            F.shiftleft(F.col("shard_id").cast("long"), 20) + F.col("__rx_pos")
        ).alias("receipt_ordinal"),
        F.col("rx.receipt.receipt_id").alias("receipt_id"),
        F.col("rx.receipt.predecessor_id").alias("predecessor_id"),
        F.col("rx.receipt.receiver_id").alias("receiver_id"),
        F.col("rx.receipt.receipt.Action.signer_id").alias("signer_id"),
        # status kind: which member of the status struct is set (handler.py:75-82)
        F.when(F.col("rx.execution_outcome.outcome.status.SuccessValue").isNotNull(), "SuccessValue")
        .when(F.col("rx.execution_outcome.outcome.status.SuccessReceiptId").isNotNull(), "SuccessReceiptId")
        .otherwise("Failure")
        .alias("status_kind"),
        F.col("rx.execution_outcome.outcome.status.SuccessValue").alias("success_value_b64"),
        F.col("rx.execution_outcome.outcome.logs").alias("logs"),
        F.explode_outer("rx.receipt.receipt.Action.actions").alias("action"),
    )
    return receipts.select(
        "block_height",
        "block_timestamp_ns",
        "shard_id",
        "receipt_ordinal",
        "receipt_id",
        "predecessor_id",
        "receiver_id",
        "signer_id",
        "status_kind",
        "success_value_b64",
        "logs",
        F.col("action.FunctionCall.method_name").alias("method_name"),
        F.col("action.FunctionCall.args").alias("args_b64"),
    )


def last_processed_height(bronze: DataFrame) -> int | None:
    """Batch checkpoint read (S2): resume point = max height in bronze.
    The streaming path uses checkpointLocation instead."""
    row = bronze.agg(F.max("block_height").alias("h")).first()
    return None if row is None else row["h"]


# Bounded FIFO of pinned quarantine reads (not size-1: evicting the
# PREVIOUS call's cache while its good/bad frames are still unconsumed
# would silently fall back to two independent re-scans, losing the
# single-materialization consistency the cache exists for). 4 slots
# covers any realistic interleaving of backfill splits; beyond that the
# oldest unpersists and its frames recompute — correct, just slower.
# Shared helper: django_indexer_spark.caching.BoundedFrameCache.
from ..caching import BoundedFrameCache

_QUARANTINE_CACHE = BoundedFrameCache(slots=4)


def read_lake_quarantine(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Batch lake read with corrupt-block quarantine: returns
    (good, quarantined). With an explicit schema, PERMISSIVE mode turns a
    malformed block file into an all-null row that would flow silently
    into bronze; capturing ``_corrupt_record`` instead routes the raw
    text to a quarantine relation an operator can inspect/replay (the
    reference's equivalent failure is an asyncio handler exception that
    SKIPS the block — tasks.py:51-90 logs and moves on; quarantining
    loses nothing and keeps at-least-once replayable).

    The one-pass cache is deliberate: Spark disallows queries whose only
    projected column is the internal corrupt-record column, and without
    the cache the good/bad split would re-parse the JSON twice. The cache
    is bounded by the read's own size, and a bounded FIFO (4 slots,
    lock-guarded) unpersists the oldest pinned read — a backfill loop
    can't accumulate copies, and recent calls' good/bad frames stay
    cache-backed while still unconsumed; for STREAMING ingest, do
    the same split inside foreachBatch (each micro-batch DataFrame is
    already materialized there — same two filters, no cache needed).
    """
    # copy, never .add() on the shared schema: StructType.add mutates and
    # returns SELF, so the module-global would grow a _corrupt_record
    # field for every later read_lake()/read_lake_stream() (and a second
    # quarantine call would build a duplicate column)
    from pyspark.sql import types as T

    schema = T.StructType(
        list(LAKE_MESSAGE_SCHEMA.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    df = (
        spark.read.schema(schema)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        # input_file_name() only resolves during the scan itself — over
        # the cached relation it returns '' — so bind it pre-cache
        .withColumn("source_file", F.input_file_name())
        .cache()
    )
    _QUARANTINE_CACHE.pin(df)
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        "source_file", "_corrupt_record"
    )
    good = (
        df.filter(F.col("_corrupt_record").isNull())
        .drop("_corrupt_record", "source_file")
    )
    return good, bad
