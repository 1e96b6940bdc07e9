"""End-to-end Structured Streaming ingest (SURVEY.md §2.9 T1/T2/T6).

Drives ``stream_ingest`` in availableNow mode against a real lake
directory of block JSON files and verifies:
  - the silver donations table materializes with merge semantics
    (last writer wins across micro-batch replays, T3);
  - checkpoint resume (T2): a second run with the same checkpoint
    processes only files added since, yet the silver tables keep the
    earlier state (the BlockHeight-singleton role,
    reference indexer_app/utils.py:1194-1203).
"""

from __future__ import annotations

import base64
import json
import os

from django_indexer_spark.streaming.pipeline import stream_ingest


def b64(obj) -> str:
    return base64.b64encode(json.dumps(obj).encode()).decode()


def lake_message(height: int, donations: list[dict]) -> dict:
    """One StreamerMessage-shaped block carrying N donate receipts
    (shape: reference indexer_app/handler.py:46-98)."""
    outcomes = [
        {
            "receipt": {
                "receipt_id": f"r{height}_{i}",
                "predecessor_id": "pred.near",
                "receiver_id": "donate.potlock.near",
                "receipt": {
                    "Action": {
                        "signer_id": d["donor_id"],
                        "actions": [
                            {"FunctionCall": {"method_name": "donate", "args": b64({})}}
                        ],
                    }
                },
            },
            "execution_outcome": {
                "outcome": {"logs": [], "status": {"SuccessValue": b64(d)}}
            },
        }
        for i, d in enumerate(donations)
    ]
    return {
        "block": {
            "header": {"height": height, "timestamp": height * 10**9 + 1_700_000_000_000_000_000}
        },
        "shards": [{"shard_id": 0, "receipt_execution_outcomes": outcomes}],
    }


def donation(on_chain_id: int, donor: str, amount: str) -> dict:
    return {
        "id": on_chain_id,
        "donor_id": donor,
        "total_amount": amount,
        "protocol_fee": "0",
        "recipient_id": "charity.near",
        "donated_at_ms": 1_700_000_000_000 + on_chain_id,
    }


def write_block(lake_dir: str, height: int, donations: list[dict]) -> None:
    with open(os.path.join(lake_dir, f"block_{height}.json"), "w") as f:
        f.write(json.dumps(lake_message(height, donations)))


def drain(spark, lake, out, ckpt) -> None:
    q = stream_ingest(spark, lake, out, ckpt, available_now=True)
    assert q.awaitTermination(120), "stream did not drain within 120s"


def test_stream_ingest_available_now_and_resume(spark, tmp_path):
    lake = str(tmp_path / "lake")
    out = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(lake)

    # batch 1: two blocks; donation #1 re-written at height 101 (replay /
    # update) and #2 appears once — last writer must win on the F11 key
    write_block(lake, 100, [donation(1, "alice.near", "100")])
    write_block(lake, 101, [donation(1, "alice.near", "150"), donation(2, "bob.near", "50")])
    drain(spark, lake, out, ckpt)

    donations = {
        r["on_chain_id"]: r.asDict()
        for r in spark.read.parquet(f"{out}/donations").collect()
    }
    assert set(donations) == {1, 2}
    assert donations[1]["total_amount"] == "150"  # height-101 writer won
    assert donations[1]["net_amount"] == "150"
    assert donations[2]["donor_id"] == "bob.near"

    accounts = {r["id"] for r in spark.read.parquet(f"{out}/accounts").collect()}
    assert {"alice.near", "bob.near", "charity.near"} <= accounts

    # batch 2: same checkpoint — only the new block is read; existing
    # silver rows survive and the new donation lands
    write_block(lake, 102, [donation(3, "carol.near", "75")])
    drain(spark, lake, out, ckpt)

    after = {
        r["on_chain_id"]: r.asDict()
        for r in spark.read.parquet(f"{out}/donations").collect()
    }
    assert set(after) == {1, 2, 3}
    assert after[1]["total_amount"] == "150"
    assert after[3]["donor_id"] == "carol.near"
