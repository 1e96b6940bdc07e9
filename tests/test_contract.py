"""Driver-contract guards: catch interface drift in CI, cheaply.

- Every oracle key has a query (and the rows-only set is exactly the
  two documented exceptions).
- Column-name parity per query: the Spark result schema (analysis only,
  no execution) must equal the oracle's DuckDB schema (LIMIT 0) — the
  driver hash-compares by sorted column name, so an alias drift fails
  the gate even when values match. This runs in seconds; full value
  parity lives in tools/parity_check.py.
"""

from __future__ import annotations

import duckdb
import pytest

from django_indexer_spark.plans.fixture_queries import QUERIES
from django_indexer_spark.plans.oracles import ORACLES

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def test_rows_only_set_is_exactly_the_documented_exceptions():
    assert set(QUERIES) - set(ORACLES) == {"o5_seeded_sample", "a3_approx_distinct"}
    assert set(ORACLES) - set(QUERIES) == set()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_column_names_match_oracles(spark, duck):
    mismatches = []
    for name, sql in ORACLES.items():
        spark_cols = sorted(QUERIES[name](spark, SF_DIR).columns)
        duck_cols = sorted(
            d[0] for d in duck.execute(f"SELECT * FROM ({sql}) LIMIT 0").description
        )
        if spark_cols != duck_cols:
            mismatches.append((name, spark_cols, duck_cols))
    assert not mismatches, mismatches


def test_bench_emits_valid_json_line(tmp_path):
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001", SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        [sys.executable, "/root/repo/bench.py"], capture_output=True, text=True, env=env,
        timeout=480,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["unit"] == "sec" and out["sf"] == 0.001
    assert out["value"] == round(sum(out["queries"].values()), 3)
    from bench import HEADLINE

    assert set(out["queries"]) == set(HEADLINE)


def test_driver_rotation_order():
    """Round-4 driver-budget rotation (__spark_entry__._ordered): canary
    first, every name with no r3 correctness row before every name with
    one, and new (post-r3) queries between the two groups — so the
    driver's ~50-query budget reaches unchecked queries first."""
    import __spark_entry__ as m

    names = list(m.queries())
    assert names[0] == "f1_eq_filter"
    assert set(names) == set(m.queries())  # no dupes/drops
    checked = m._R3_CHECKED
    # after the canary: first all-unchecked block, then all-checked block
    tail = names[1:]
    flags = [n in checked for n in tail]
    first_checked = flags.index(True) if True in flags else len(flags)
    assert all(flags[first_checked:]), "checked block interrupted by unchecked name"
    assert not any(flags[:first_checked]), "unchecked block contains checked name"
    # oracles keep query ordering
    onames = [n for n in m.oracle_sql()]
    assert onames == [n for n in names if n in set(onames)]
