"""Event-time window + watermark semantics (streaming/windows.py).

Run 1 establishes windows and a watermark; run 2 (same checkpoint, so
the watermark is recovered) delivers one on-time row and one row far
below the watermark — the late row must be dropped, the on-time row
must update its window. Update output mode surfaces exactly the windows
each batch changed.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from django_indexer_spark.streaming.windows import windowed_counts

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def write_events(path: str, rows: list[tuple[int, str, int]]) -> None:
    with open(path, "w") as f:
        for eid, ts, uid in rows:
            f.write(json.dumps({"event_id": eid, "ts": ts, "user_id": uid}) + "\n")


def run_update(spark, src, ckpt, name):
    stream = spark.readStream.schema(SCHEMA).json(src)
    out = windowed_counts(stream, "ts", "10 minutes", "30 minutes")
    updates: list = []

    def sink(batch_df, batch_id):
        updates.extend(batch_df.collect())

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    return {
        (r["window_start"].isoformat(), r["window_end"].isoformat()): r["n_events"]
        for r in updates
    }


def test_windowed_counts_watermark_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # run 1: events across two 10-min windows, max ts 12:25
    write_events(
        os.path.join(src, "a.jsonl"),
        [
            (1, "2024-01-01 12:00:01", 1),
            (2, "2024-01-01 12:05:00", 2),
            (3, "2024-01-01 12:21:00", 1),
            (4, "2024-01-01 12:25:00", 3),
        ],
    )
    got1 = run_update(spark, src, ckpt, "win1")
    assert got1[("2024-01-01T12:00:00", "2024-01-01T12:10:00")] == 2
    assert got1[("2024-01-01T12:20:00", "2024-01-01T12:30:00")] == 2

    # recovered watermark = 12:25 - 30 min = 11:55.
    # run 2: one on-time row (12:26) + one too-late row (11:00 < 11:55)
    write_events(
        os.path.join(src, "b.jsonl"),
        [
            (5, "2024-01-01 12:26:00", 4),
            (6, "2024-01-01 11:00:00", 9),  # below watermark → dropped
        ],
    )
    got2 = run_update(spark, src, ckpt, "win2")
    assert got2 == {("2024-01-01T12:20:00", "2024-01-01T12:30:00"): 3}


def test_windowed_counts_same_code_runs_batch(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 12:00:01", 1), (2, "2024-01-01 12:15:00", 1)],
        "event_id long, ts string, user_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["window_start"].isoformat(): r["n_events"]
        for r in windowed_counts(df, "ts", "10 minutes").collect()
    }
    assert got == {"2024-01-01T12:00:00": 1, "2024-01-01T12:10:00": 1}


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Streaming dedup on event id across micro-batches: the built-in
    state-bounded exactly-once-per-id guard (T3's streaming-native form —
    state for ids older than the watermark is evicted, so memory stays
    bounded on an unbounded stream)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    write_events(
        os.path.join(src, "a.jsonl"),
        [(1, "2024-01-01 12:00:00", 1), (2, "2024-01-01 12:01:00", 2)],
    )
    write_events(
        os.path.join(src, "b.jsonl"),
        [(2, "2024-01-01 12:01:00", 2), (3, "2024-01-01 12:02:00", 3)],  # 2 is a replay
    )
    os.utime(os.path.join(src, "a.jsonl"), (1000000000, 1000000000))
    os.utime(os.path.join(src, "b.jsonl"), (1000000010, 1000000010))

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
    out: list = []

    q = (
        deduped.writeStream.foreachBatch(lambda df, _id: out.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert sorted(r["event_id"] for r in out) == [1, 2, 3]  # replayed 2 dropped
