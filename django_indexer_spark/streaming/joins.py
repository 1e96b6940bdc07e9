"""Stream-stream interval join — the two-unbounded-sides correlation.

The reference correlates streams imperatively (e.g. a payout transfer
fulfills an earlier set_payouts row — utils.py:667-733 — via point
lookups against already-persisted rows). That works because Django sees
one row at a time; a scale engine instead joins the two LIVE streams:
each side buffers state, and the join emits as matches arrive from
either direction.

What makes this safe on an unbounded input (and what Structured
Streaming REQUIRES for stream-stream inner joins): BOTH sides carry a
watermark AND the join condition bounds event time on both sides
(key equality + right_ts ∈ [left_ts, left_ts + tolerance]). The range
condition tells the state store exactly how long a buffered row can
still match, so state is evicted at the watermark — bounded memory on
an unbounded stream. Without the interval the state grows forever.

The same function runs on batch frames (watermarks are a no-op there),
keeping the single-code-path rule: the batch twin is the J6 interval
join family (operators/joins.py), checked by the oracle gate; this
module's tests cover the streaming execution semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance: str = "10 minutes",
    left_watermark: str = "30 minutes",
    right_watermark: str = "30 minutes",
) -> DataFrame:
    """Inner-join two streams on ``key`` where the right event lands in
    [left_ts, left_ts + tolerance]. Output: key, left_ts, right_ts plus
    every other column of both sides (left columns first).

    ``left_ts``/``right_ts`` must be distinct column names (rename before
    calling if both streams use the same one) — the condition references
    both, so they both survive into the output."""
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    l = left.withWatermark(left_ts, left_watermark)
    r = right.withWatermark(right_ts, right_watermark).withColumnRenamed(
        key, "__rkey"
    )
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"interval {tolerance}"))
    )
    return l.join(r, cond, "inner").drop("__rkey")
