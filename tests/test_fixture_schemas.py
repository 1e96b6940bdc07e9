"""Fixture-schema snapshot guard.

The round driver owns /root/testdata and regenerates it between rounds; it
has changed a column's physical type once already (events.ts: parquet
TIMESTAMP(NANOS) in round 1 → timestamp[us] in round 2+), which surfaced
as 15 cryptic AnalysisExceptions through one shared helper. This test
fails LOUDLY with the actual-vs-expected dtype diff instead, so a fixture
regeneration is diagnosed in one pytest line (FIXTURES.md §A records the
history; fixture readers stay branch-on-dtype regardless — see
fixture_queries._events).

Columns listed with a set of types are KNOWN-VOLATILE: any member is fine
(the readers adapt); the test only flags types outside the known set.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))

# expected arrow dtype (string form) per table column; a set means any of
# these is handled by the type-adaptive readers
EXPECTED: dict[str, dict[str, object]] = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": {"timestamp[us]", "timestamp[ms]", "timestamp[ns]"},
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": {"timestamp[us]", "timestamp[ms]", "timestamp[ns]"},
    },
    "events": {
        "event_id": "int64",
        "ts": {"timestamp[us]", "timestamp[ms]", "timestamp[ns]"},
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": "int32",
    },
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_fixture_schemas_match_snapshot(sf_dir):
    diffs: list[str] = []
    for table, expected_cols in EXPECTED.items():
        path = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(path):
            diffs.append(f"{table}: MISSING at {path}")
            continue
        schema = pq.read_schema(path)
        actual = {n: str(t) for n, t in zip(schema.names, schema.types)}
        for col, exp in expected_cols.items():
            got = actual.pop(col, None)
            ok = got in exp if isinstance(exp, set) else got == exp
            if got is None:
                diffs.append(f"{table}.{col}: expected {exp}, column MISSING")
            elif not ok:
                diffs.append(f"{table}.{col}: expected {exp}, got {got}")
        for col, got in actual.items():
            diffs.append(f"{table}.{col}: UNEXPECTED new column ({got})")
    assert not diffs, (
        "fixture schema drift (driver regenerated /root/testdata?) — "
        "update type-adaptive readers/FIXTURES.md, then this snapshot:\n  "
        + "\n  ".join(diffs)
    )
