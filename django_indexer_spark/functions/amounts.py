"""u128 digit-string amount arithmetic (SURVEY.md §1.2).

The reference stores yoctoNEAR / token amounts as Rust U128 rendered to
decimal strings (donations/models.py:38-43, indexer_app/examples.txt:11-14)
and sums them in Python ints guarded by str.isdigit() (tasks.py:200-204).

Policy here:
- storage stays StringType (lossless);
- arithmetic casts to DecimalType(38,0). u128 max ≈ 3.4e38 exceeds
  Decimal(38) by a hair; amounts in practice are ≪ 1e38. ``guarded_amount``
  additionally drops >38-digit strings so the cast can never overflow-null
  silently — the drop is explicit and test-asserted.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .scalars import is_digits

DEC38 = "decimal(38,0)"


def canonical_digits(col: Column | str) -> Column:
    """Digit-string minus leading zeros ('000123'→'123', '000'→'0') — the
    canonical form whose LENGTH decides Decimal(38,0) fit. No lookahead so
    the same regex runs on DuckDB/RE2 oracles."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, "^0+", "")
    return F.when(stripped == "", F.lit("0")).otherwise(stripped)


def amount_overflow(col: Column | str) -> Column:
    """SURVEY §7 hard-part (c): TRUE for valid digit-strings that exceed
    Decimal(38,0) — u128 max (2^128-1) is 39 digits, Decimal tops out at
    38, so the overflow band is real input, not a hypothetical. These rows
    would otherwise be silently NULLed by ``guarded_amount``; flag them so
    pipelines can quarantine instead (``with_amount_quarantine``).
    Non-digit strings are NOT overflow — they're invalid, a different bucket
    (reference skips them via isdigit(), tasks.py:203)."""
    c = F.col(col) if isinstance(col, str) else col
    return is_digits(c) & (F.length(canonical_digits(c)) > 38)


def with_amount_quarantine(
    df, amount_cols: list[str], flag: str = "amount_overflow"
):
    """Analysis-time overflow guard: adds a boolean ``flag`` column that is
    TRUE when ANY of ``amount_cols`` exceeds Decimal(38,0). Route
    flag=true rows to a quarantine sink (keeping the lossless string) and
    aggregate the rest — sums stay exact and nothing vanishes silently."""
    cond = F.lit(False)
    for c in amount_cols:
        cond = cond | F.coalesce(amount_overflow(c), F.lit(False))
    return df.withColumn(flag, cond)


def guarded_amount(col: Column | str) -> Column:
    """Digit-guarded decimal cast: non-digit or >Decimal(38,0) strings →
    NULL (leading zeros stripped first, so '0…0' padding can't spuriously
    overflow).

    Mirrors the reference's ``if d.total_amount.isdigit()`` guard
    (tasks.py:203) — sum() then skips the NULLs exactly as the Python
    loop skipped the rows. Pair with ``with_amount_quarantine`` when the
    dropped overflow rows must stay visible.
    """
    c = F.col(col) if isinstance(col, str) else col
    canon = canonical_digits(c)
    return F.when(is_digits(c) & (F.length(canon) <= 38), canon.cast(DEC38))


def guarded_sum(col: Column | str, alias: str) -> Column:
    return F.sum(guarded_amount(col)).alias(alias)


def usd_sum(col: Column | str, alias: str) -> Column:
    """Null-skipping USD sum matching the reference's falsy filter
    (tasks.py:208-212): Python ``if d.total_amount_usd`` skips NULL *and 0*.
    Spark sum() skips NULL natively; we add the ≠0 guard for exact parity.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.when(c.isNotNull() & (c != 0), c)).alias(alias)


# ---------------------------------------------------------------------------
# Exact fixed-point money aggregation — the fast path for decimal sums.
#
# Summing DecimalType beyond precision 18 leaves Tungsten's compact-long
# representation and drops to BigDecimal arithmetic (~3x slower per row,
# measured: a 4-column decimal q1 runs 1.15s vs 0.48s in long fixed-point
# at sf0.1). Money values are fixed-point by nature, so we sum exact
# integer "cents" in 64-bit longs instead — with a two-stage shape that
# stays overflow-safe at ANY data scale:
#
#   stage 1  groupBy(keys, input_partition_id): per-partition partial sums
#            in long. A 128 MB scan partition holds ~6M rows; at e6 cent
#            scale (~1e11/row worst case) a partial tops out ~6e17 < 2^63.
#   stage 2  groupBy(keys): merge partials in Decimal(38,0) — only
#            |groups| x |partitions| tiny rows — then exact scale-down and
#            a single correctly-rounded cast to double.
#
# The result is bit-identical to the all-decimal plan (both are correctly
# rounded doubles of the same exact rational) at long-sum speed.
# ---------------------------------------------------------------------------


def to_fixed(col: Column | str, dp: int = 2) -> Column:
    """Exact fixed-point rendering of a money column: value x 10^dp as
    long. Inputs must carry at most ``dp`` decimals (true for 2dp money);
    the round() only undoes double representation noise."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double") * (10**dp)).cast("long")


def grouped_exact_sums(
    df,
    group_cols: list[str],
    sums: dict[str, tuple[Column, int]],
    counts: dict[str, Column] | None = None,
):
    """Two-stage exact money aggregation (see module comment above).

    ``sums``:   alias -> (long fixed-point column, total decimal scale dp);
                emitted as exact doubles. NULL-skipping like SQL SUM.
    ``counts``: alias -> column counted when non-null (count(when(...)))
                — merged as sums of partial counts.
    """
    pid = F.spark_partition_id().alias("__pid")
    partials = [F.sum(c).alias(f"__s_{n}") for n, (c, _) in sums.items()]
    partials += [F.count(c).alias(f"__c_{n}") for n, c in (counts or {}).items()]
    staged = df.groupBy(*group_cols, pid).agg(*partials)
    finals = [
        (F.sum(F.col(f"__s_{n}").cast(DEC38)) / F.lit(10**dp)).cast("double").alias(n)
        for n, (_, dp) in sums.items()
    ]
    finals += [F.sum(f"__c_{n}").alias(n) for n in (counts or {})]
    return staged.groupBy(*group_cols).agg(*finals)
