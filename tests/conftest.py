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


from contextlib import contextmanager  # noqa: E402


@contextmanager
def spark_confs(spark, confs: dict[str, str]):
    """Temporarily apply session confs; restore (or unset) on exit.
    The session fixture is session-scoped, so any test that mutates conf
    MUST use this to avoid leaking settings into later tests."""
    old: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
