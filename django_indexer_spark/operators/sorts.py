"""Sort / limit / top-k / pagination / sampling — SURVEY.md §2.6 (O1-O5).

Deterministic pagination is a *convention* the engine enforces: every
paginated read must carry a total order (the reference's Meta.ordering,
accounts/models.py:64-65), otherwise pages are not reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PAGE_SIZE = 30  # reference DRF default (base/settings.py:111-115)


def paginate(df: DataFrame, order_by: list, page: int = 1, page_size: int = DEFAULT_PAGE_SIZE) -> DataFrame:
    """O3 — page slice with a REQUIRED total order (O2).

    Spark >= 3.4 has a native offset; it pushes limit+offset into a single
    TakeOrderedAndProject when the order is present — no full sort
    materialization for early pages.
    """
    return df.orderBy(*order_by).offset((page - 1) * page_size).limit(page_size)


def top_k(df: DataFrame, order_by: list, k: int) -> DataFrame:
    """O4 — leaderboard head. Compiles to TakeOrderedAndProject: each task
    keeps a k-heap, driver merges — no global sort even at 100 TB."""
    return df.orderBy(*order_by).limit(k)


def seeded_sample_one(df: DataFrame, seed: int = 42) -> DataFrame:
    """O5 — the reference's random.choice over registrations
    (lists/api.py:216-223), made reproducible with a seeded rand()."""
    return df.orderBy(F.rand(seed)).limit(1)
