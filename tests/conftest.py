from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from django_indexer_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def rows(df, *order_cols):
    """Deterministic collect helper."""
    if order_cols:
        df = df.orderBy(*order_cols)
    return [r.asDict() for r in df.collect()]
