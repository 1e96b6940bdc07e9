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


def guarded_amount(col: Column | str) -> Column:
    """Digit-guarded decimal cast: non-digit or >38-digit strings → NULL.

    Mirrors the reference's ``if d.total_amount.isdigit()`` guard
    (tasks.py:203) — sum() then skips the NULLs exactly as the Python
    loop skipped the rows.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(is_digits(c) & (F.length(c) <= 38), c.cast(DEC38))


def guarded_sum(col: Column | str, alias: str) -> Column:
    return F.sum(guarded_amount(col)).alias(alias)


def usd_sum(col: Column | str, alias: str) -> Column:
    """Null-skipping USD sum matching the reference's falsy filter
    (tasks.py:208-212): Python ``if d.total_amount_usd`` skips NULL *and 0*.
    Spark sum() skips NULL natively; we add the ≠0 guard for exact parity.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.when(c.isNotNull() & (c != 0), c)).alias(alias)
