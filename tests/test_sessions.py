"""Sessionization (applyInPandasWithState) semantics.

One availableNow run over four files delivered one per micro-batch
(mtimes force the order). Watermark delay 0 → watermark = max event
time of the PREVIOUS batch, so:

  batch a: user 1 events 12:00, 12:05 → open session
  batch b: user 1 event 12:30 → gap 25 min ≥ 10 min: closes
           (12:00-12:05, n=2), opens a new session at 12:30
  batch c: unrelated user 99 event 13:00 → advances watermark
  batch d: user 99 event 13:10 → batch watermark 13:00 passes user 1's
           timeout (12:30 + 10 min): closes (12:30-12:30, n=1). The
           13:10 event sits exactly one gap after 13:00 (gap must be
           STRICTLY below the threshold to extend) → closes
           (13:00-13:00, n=1) and opens a 13:10 session, which stays
           open at end of run (its timeout 13:20 is past the final
           watermark 13:10).
"""

from __future__ import annotations

import json
import os
import time

from django_indexer_spark.streaming.sessions import sessionize

SCHEMA = "event_id long, ts timestamp, user_id long"


def write_file(src: str, name: str, rows: list[tuple[int, str, int]], mtime: float) -> None:
    path = os.path.join(src, name)
    with open(path, "w") as f:
        for eid, ts, uid in rows:
            f.write(json.dumps({"event_id": eid, "ts": ts, "user_id": uid}) + "\n")
    os.utime(path, (mtime, mtime))


def test_sessionize_gap_close_and_timeout_close(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    t0 = time.time() - 1000
    write_file(src, "a.jsonl", [(1, "2024-01-01 12:00:00", 1), (2, "2024-01-01 12:05:00", 1)], t0)
    write_file(src, "b.jsonl", [(3, "2024-01-01 12:30:00", 1)], t0 + 10)
    write_file(src, "c.jsonl", [(4, "2024-01-01 13:00:00", 99)], t0 + 20)
    write_file(src, "d.jsonl", [(5, "2024-01-01 13:10:00", 99)], t0 + 30)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    sessions = sessionize(stream, "user_id", "ts", gap="10 minutes")
    out: list = []

    def sink(batch_df, batch_id):
        out.extend(batch_df.collect())

    q = (
        sessions.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)

    got = sorted(
        (r["user_id"], r["session_start"].isoformat(), r["session_end"].isoformat(), r["n_events"])
        for r in out
    )
    assert got == [
        (1, "2024-01-01T12:00:00", "2024-01-01T12:05:00", 2),
        (1, "2024-01-01T12:30:00", "2024-01-01T12:30:00", 1),
        (99, "2024-01-01T13:00:00", "2024-01-01T13:00:00", 1),
    ]
