"""Stream-stream interval join semantics (streaming/joins.py).

Two file streams (clicks, purchases) joined on user with purchase_ts in
[click_ts, click_ts + 15 min]. Covers: in-window match emitted, out-of-
window purchase NOT matched, both-directions arrival (purchase file lands
in the same availableNow drain as the click), and batch-mode execution of
the same function (single code path).
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

from django_indexer_spark.streaming.joins import interval_join_streams

CLICK_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("click_id", T.LongType()),
        T.StructField("click_ts", T.TimestampType()),
    ]
)
BUY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("buy_id", T.LongType()),
        T.StructField("buy_ts", T.TimestampType()),
    ]
)


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_stream_interval_join(spark, tmp_path):
    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    clicks_dir.mkdir()
    buys_dir.mkdir()
    _write(
        clicks_dir / "c0.json",
        [
            {"user_id": 1, "click_id": 10, "click_ts": "2024-01-01T10:00:00"},
            {"user_id": 2, "click_id": 20, "click_ts": "2024-01-01T10:00:00"},
        ],
    )
    _write(
        buys_dir / "b0.json",
        [
            # in window (+5 min) -> matches
            {"user_id": 1, "buy_id": 100, "buy_ts": "2024-01-01T10:05:00"},
            # out of window (+40 min) -> no match
            {"user_id": 2, "buy_id": 200, "buy_ts": "2024-01-01T10:40:00"},
            # before the click -> no match
            {"user_id": 1, "buy_id": 101, "buy_ts": "2024-01-01T09:59:00"},
        ],
    )
    clicks = spark.readStream.schema(CLICK_SCHEMA).json(str(clicks_dir))
    buys = spark.readStream.schema(BUY_SCHEMA).json(str(buys_dir))
    joined = interval_join_streams(
        clicks, buys, "user_id", "click_ts", "buy_ts", tolerance="15 minutes"
    )
    out: list = []
    q = (
        joined.writeStream.foreachBatch(lambda df, _id: out.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {(r["click_id"], r["buy_id"]) for r in out}
    assert got == {(10, 100)}


def test_interval_join_same_code_runs_batch(spark):
    clicks = spark.createDataFrame(
        [(1, 10, "2024-01-01 10:00:00")], "user_id long, click_id long, ts string"
    ).selectExpr("user_id", "click_id", "CAST(ts AS TIMESTAMP) AS click_ts")
    buys = spark.createDataFrame(
        [(1, 100, "2024-01-01 10:05:00"), (1, 101, "2024-01-01 11:00:00")],
        "user_id long, buy_id long, ts string",
    ).selectExpr("user_id", "buy_id", "CAST(ts AS TIMESTAMP) AS buy_ts")
    got = {
        (r["click_id"], r["buy_id"])
        for r in interval_join_streams(
            clicks, buys, "user_id", "click_ts", "buy_ts", tolerance="15 minutes"
        ).collect()
    }
    assert got == {(10, 100)}
