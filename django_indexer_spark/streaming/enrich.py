"""S4/S5 live enrichment — foreachBatch dimension refresh with an
injectable HTTP transport.

The reference fetches prices inline while handling each donation:
FastNEAR token metadata (tokens/models.py:76-104) and Coingecko
historical price (indexer_app/utils.py:917-943) — one blocking HTTP call
per row in the hot path. That shape cannot scale: at 100 TB the hot path
must stay enrichment-free (SURVEY §2.1 models these feeds as dimension
tables, which VERDICT r1 accepted). This module closes the remaining gap
— HOW the dimension stays fresh — with the Spark-native pattern:

- the stream's ``foreachBatch`` step computes the batch's DISTINCT keys
  that are MISSING from the dimension (a left-anti join; the collect is
  bounded by the batch's distinct-key count, not table size);
- the driver calls the transport ONCE per batch for just those keys
  (batched HTTP, retry/ratelimit live in the transport, never in
  executors — executors never open sockets);
- results merge into the bucketed dimension table (sources.silver), so
  the NEXT batch's as-of join (J6) sees them. Enrichment is eventually
  consistent by one trigger — the same lag the reference's repair loop
  tolerates (tasks.py:153-161, J7/T5 re-picks NULL-USD rows).

``fetch`` is any ``Callable[[list[str]], dict[key, dict[field, value]]]``:
tests inject a mock; production wraps requests/aiohttp against FastNEAR /
Coingecko. The engine is transport-agnostic by design — no HTTP library
is imported here.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import silver

log = logging.getLogger(__name__)

Fetch = Callable[[list[str]], dict[str, dict]]

# token-price dimension row (S5): the fields utils.py:917-943 persists
PRICE_DIM_SCHEMA = "token_id string, price_usd double, fetched_at_ms long, version long"


# per-trigger ceiling on keys pulled to the driver for fetching. A
# steady-state batch has a handful of new tokens, but a COLD-START batch
# over a historical backfill can carry millions of distinct keys — an
# unbounded collect would buffer them all driver-side before the first
# HTTP call. The cap bounds driver memory AND per-trigger HTTP work; the
# left-anti join re-surfaces everything uncollected next trigger, so the
# remainder drains at max_keys per trigger with no bookkeeping.
DEFAULT_MAX_KEYS_PER_TRIGGER = 10_000


def refresh_dimension(
    spark: SparkSession,
    batch: DataFrame,
    dim_dir: str,
    key_col: str,
    fetch: Fetch,
    batch_id: int = 0,
    n_buckets: int = 4,
    schema: str = PRICE_DIM_SCHEMA,
    max_keys: int = DEFAULT_MAX_KEYS_PER_TRIGGER,
) -> int:
    """One foreachBatch step: fetch + merge the batch's missing dim keys.
    Returns the number of keys fetched (0 → the transport was not called).

    At most ``max_keys`` keys are collected/fetched per call; a logged
    remainder stays missing and is picked up by the next trigger's
    left-anti join (eventual consistency, one extra trigger per
    ``max_keys`` of backlog)."""
    wanted = batch.select(key_col).where(F.col(key_col).isNotNull()).distinct()
    existing = silver.read_table(spark, dim_dir)
    if existing is not None:
        wanted = wanted.join(existing.select(key_col), key_col, "left_anti")
    # deterministic drain order; +1 probes for an over-limit remainder
    # without a separate count() job over the full key set
    head = wanted.orderBy(key_col).limit(max_keys + 1).collect()
    if len(head) > max_keys:
        log.warning(
            "enrich[%s]: key backlog exceeds max_keys=%d; deferring remainder "
            "to the next trigger",
            dim_dir,
            max_keys,
        )
        head = head[:max_keys]
    missing = sorted(r[0] for r in head)  # ≤ max_keys
    if not missing:
        return 0
    fetched = fetch(missing)
    if not fetched:
        return 0
    incoming = spark.createDataFrame(
        [
            {key_col: k, **fields, "version": int(batch_id)}
            for k, fields in fetched.items()
        ],
        schema,
    )
    silver.merge_batch(
        spark,
        dim_dir,
        incoming,
        [key_col],
        "version",
        keep="last",
        batch_id=batch_id,
        n_buckets=n_buckets,
    )
    return len(fetched)


def enrich_stream(
    spark: SparkSession,
    source: DataFrame,
    dim_dir: str,
    checkpoint_dir: str,
    key_col: str,
    fetch: Fetch,
    n_buckets: int = 4,
    available_now: bool = True,
):
    """Streaming wrapper: keep a dimension fresh from a key-bearing stream.
    ``source`` is any streaming DataFrame carrying ``key_col`` (e.g. the
    bronze receipt stream's ft token ids)."""

    def step(batch: DataFrame, batch_id: int) -> None:
        refresh_dimension(
            spark, batch, dim_dir, key_col, fetch, batch_id=batch_id, n_buckets=n_buckets
        )

    writer = source.writeStream.foreachBatch(step).option(
        "checkpointLocation", checkpoint_dir
    )
    writer = (
        writer.trigger(availableNow=True)
        if available_now
        else writer.trigger(processingTime="300 seconds")
    )
    return writer.start()
