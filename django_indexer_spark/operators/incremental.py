"""Incremental maintenance of grouped aggregates (gold-table deltas).

The reference recomputes its denormalized stats from scratch on a 5-minute
beat (tasks.py:188-327: every pot/account re-aggregated per tick — A8).
At 100 TB a full recompute per tick is the scale-killer; the engine-native
alternative is MERGEABLE PARTIAL AGGREGATES: keep the gold table in
partial form (count / sum / min / max per group — every one a commutative
monoid), aggregate ONLY the new batch, and merge the two partial tables
with an outer join + element-wise combine. Work per tick is O(batch +
touched groups), the exact analogue of sources/silver.py's touched-bucket
merge but for aggregate state. Derived measures (avg = sum/n) project at
read time, so they stay exact under merging.

Combine rules (all null-safe — a group absent from one side keeps the
other side's state):
  count, sum -> a + b      min -> least(a, b)      max -> greatest(a, b)

Sums should be exact types (long / decimal) so merge order can't drift
the result — the same policy as functions/amounts.grouped_exact_sums.

This is also WHY Spark's own partial aggregation works (map-side combine
merges the identical monoid); here the monoid is materialized across
micro-batches instead of across tasks. replay-safety: merging the same
batch twice WOULD double-count — feed this from an idempotent keyed
source (sources/merge.upsert output, or foreachBatch with batch-id
dedup), never from a raw at-least-once stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# measure kind -> (per-row partial expression builder, merge combiner)
_KINDS = {
    "count": (
        lambda c: F.count(F.lit(1) if c is None else c),
        lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    ),
    "sum": (
        lambda c: F.sum(c),
        lambda a, b: (
            F.when(a.isNull(), b).when(b.isNull(), a).otherwise(a + b)
        ),
    ),
    "min": (
        lambda c: F.min(c),
        lambda a, b: F.least(a, b),  # least/greatest skip nulls
    ),
    "max": (
        lambda c: F.max(c),
        lambda a, b: F.greatest(a, b),
    ),
}


def grouped_partials(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, Column | str | None]],
) -> DataFrame:
    """Aggregate ``df`` into partial form: one row per key combination
    with one column per measure. ``measures`` maps output column name ->
    (kind, input column), kind in {count, sum, min, max}; input column
    None is only valid for count. One uniform-keyed shuffle."""
    aggs = []
    for name, (kind, col) in measures.items():
        build, _ = _KINDS[kind]
        c = F.col(col) if isinstance(col, str) else col
        aggs.append(build(c).alias(name))
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    gold: DataFrame | None,
    delta: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, Column | str | None]],
) -> DataFrame:
    """Merge a batch's partial table into the gold partial table (None →
    bootstrap). Full outer join on the group keys + per-measure monoid
    combine; groups untouched by the batch pass through unchanged, new
    groups appear. The join is keyed on the group key — with gold
    bucketed by that key the shuffle is one-sided (sources/storage.py's
    bucketed-write path)."""
    if gold is None:
        return delta
    d = delta.select(
        *keys, *[F.col(n).alias(f"__d_{n}") for n in measures]
    )
    merged = gold.join(d, keys, "full_outer")
    out_cols: list[Column] = [F.col(k) for k in keys]
    for name, (kind, _col) in measures.items():
        _, combine = _KINDS[kind]
        out_cols.append(
            combine(F.col(name), F.col(f"__d_{name}")).alias(name)
        )
    return merged.select(*out_cols)


def apply_batch(
    gold: DataFrame | None,
    batch: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, Column | str | None]],
) -> DataFrame:
    """One maintenance tick: aggregate the batch, merge into gold.
    Invariant (tested): folding any partition of the input through
    apply_batch equals grouped_partials over the whole input."""
    return merge_partials(gold, grouped_partials(batch, keys, measures), keys, measures)
