"""Continuous crawl ingest (streaming/crawl.py): WARC shards through
Structured Streaming land as scored documents AND feed the incremental
near-dup index — the batch-split-equivalence invariant of the text index
holds end-to-end from raw crawl bytes."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from django_indexer_spark.operators import dedup
from django_indexer_spark.sources import warc as warc_src
from django_indexer_spark.streaming import crawl, dedup_index


def _http_block(body: bytes) -> bytes:
    return (
        f"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _record(uri: str, body: bytes) -> bytes:
    block = _http_block(body)
    hdr = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode()
    return hdr + block + b"\r\n\r\n"


_DUP = b"<html><body><p>the quick brown fox jumps over the lazy dog tonight</p></body></html>"
_SHARDS = [
    _record("http://a.example/dup1", _DUP)
    + _record("http://a.example/other", b"<html><p>pack my box with five dozen liquor jugs</p></html>"),
    _record("http://b.example/dup2", _DUP)
    + _record("http://b.example/unique", b"<html><p>sphinx of black quartz judge my vow today</p></html>"),
]


def test_stream_crawl_ingest_end_to_end(spark, tmp_path):
    work = str(tmp_path)
    in_dir = f"{work}/in"
    os.makedirs(in_dir)
    df = spark.createDataFrame(
        [(i, bytearray(s)) for i, s in enumerate(_SHARDS)],
        "warc_id long, payload binary",
    )
    stage = f"{work}/stage"
    (
        df.withColumn("half", F.col("warc_id").cast("int"))
        .repartition("half")
        .write.partitionBy("half")
        .parquet(stage)
    )
    for i in range(2):
        part = glob.glob(f"{stage}/half={i}/part-*.parquet")[0]
        dst = f"{in_dir}/{i}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("warc_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = crawl.stream_crawl_ingest(
        spark,
        stream,
        docs_dir=f"{work}/docs",
        index_dir=f"{work}/index",
        pairs_dir=f"{work}/pairs",
        checkpoint_dir=f"{work}/ckpt",
    )
    assert q.awaitTermination(120), "crawl ingest stream timed out"

    docs = spark.read.parquet(f"{work}/docs")
    rows = {r["source_uri"]: r for r in docs.collect()}
    assert len(rows) == 4
    assert rows["http://a.example/dup1"]["text"].startswith("the quick brown fox")
    assert all(r["lang"] is not None and r["quality"] is not None for r in rows.values())
    # two micro-batches really ran
    assert set(r["batch_id"] for r in docs.collect()) == {0, 1}

    # the cross-batch near-dup pair was found incrementally, and matches
    # the one-shot batch operator on the final docs table exactly
    id_of = {r["source_uri"]: r["doc_id"] for r in docs.collect()}
    got = {
        tuple(sorted((r["id_new"], r["id_seen"])))
        for r in spark.read.parquet(f"{work}/pairs").collect()
    }
    want = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in dedup.minhash_candidate_pairs(
            dedup_index.index_bands(docs.select("doc_id", "text")), "doc_id"
        ).collect()
    }
    assert got == want
    assert tuple(sorted((id_of["http://a.example/dup1"], id_of["http://b.example/dup2"]))) in got


def test_stream_crawl_ingest_replay_idempotent(spark, tmp_path):
    """Round-10 ADVICE: the docs/pairs logs are batch_id-partitioned
    with dynamic-partition overwrite, so replaying the same micro-batch
    (fresh checkpoint, same inputs → same batch ids) rewrites its own
    partition instead of appending duplicate rows."""
    work = str(tmp_path)
    in_dir = f"{work}/in"
    os.makedirs(in_dir)
    df = spark.createDataFrame(
        [(i, bytearray(s)) for i, s in enumerate(_SHARDS)],
        "warc_id long, payload binary",
    )
    stage = f"{work}/stage"
    (
        df.withColumn("half", F.col("warc_id").cast("int"))
        .repartition("half")
        .write.partitionBy("half")
        .parquet(stage)
    )
    for i in range(2):
        part = glob.glob(f"{stage}/half={i}/part-*.parquet")[0]
        dst = f"{in_dir}/{i}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    def run(ckpt: str) -> None:
        stream = (
            spark.readStream.schema("warc_id long, payload binary")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = crawl.stream_crawl_ingest(
            spark,
            stream,
            docs_dir=f"{work}/docs",
            index_dir=f"{work}/index",
            pairs_dir=f"{work}/pairs",
            checkpoint_dir=ckpt,
        )
        assert q.awaitTermination(120), "crawl ingest stream timed out"

    run(f"{work}/ckpt1")
    docs1 = sorted(r["source_uri"] for r in spark.read.parquet(f"{work}/docs").collect())
    pairs1 = spark.read.parquet(f"{work}/pairs").count()
    run(f"{work}/ckpt2")  # full replay: same files, same batch ids
    docs2 = sorted(r["source_uri"] for r in spark.read.parquet(f"{work}/docs").collect())
    pairs2 = spark.read.parquet(f"{work}/pairs").count()
    assert docs1 == docs2 and len(docs1) == 4
    assert pairs1 == pairs2


def test_polite_frontier_tick_crash_replay(spark, tmp_path):
    """polite_frontier_tick is a pure function of (prior state, batch,
    robots corpus), so a crashed-and-replayed batch 0 (the Structured
    Streaming replay contract: same batch df, same batch id, versioned
    writes) leaves state and schedule byte-identical to a clean run —
    and only allowed, first-seen URLs are ever scheduled."""
    from django_indexer_spark.streaming import crawl

    robots = spark.createDataFrame(
        [("h.example", "User-agent: *\nDisallow: /no\nCrawl-delay: 2\n")],
        "host string, robots_body string",
    )
    b0 = spark.createDataFrame(
        [
            (0, "https://h.example/ok/a"),
            (1, "HTTPS://H.EXAMPLE:443/ok/a#frag"),  # same canonical key
            (2, "https://h.example/no/blocked"),
            (3, "https://other.example/x"),
        ],
        "id long, url string",
    )
    b1 = spark.createDataFrame(
        [
            (4, "https://h.example/ok/a?utm_source=x"),  # already seen
            (5, "https://h.example/ok/b"),  # new
        ],
        "id long, url string",
    )

    def run(work: str) -> tuple[list, list]:
        s0, sched0 = crawl.polite_frontier_tick(None, b0, robots, url_col="url")
        s0.write.mode("overwrite").parquet(f"{work}/v0")
        sched0.write.mode("overwrite").parquet(f"{work}/s0")
        gold = spark.read.parquet(f"{work}/v0")
        s1, sched1 = crawl.polite_frontier_tick(gold, b1, robots, url_col="url")
        s1.write.mode("overwrite").parquet(f"{work}/v1")
        sched1.write.mode("overwrite").parquet(f"{work}/s1")
        state = sorted(map(tuple, spark.read.parquet(f"{work}/v1").collect()))
        scheds = [
            sorted(map(tuple, spark.read.parquet(f"{work}/s{i}").collect()))
            for i in range(2)
        ]
        return state, scheds

    w1 = str(tmp_path / "clean")
    state_clean, sched_clean = run(w1)

    # crash replay: batch 0 runs twice (versioned overwrite) mid-run
    w2 = str(tmp_path / "replay")
    s0, sched0 = crawl.polite_frontier_tick(None, b0, robots, url_col="url")
    s0.write.mode("overwrite").parquet(f"{w2}/v0")
    sched0.write.mode("overwrite").parquet(f"{w2}/s0")
    s0r, sched0r = crawl.polite_frontier_tick(None, b0, robots, url_col="url")
    s0r.write.mode("overwrite").parquet(f"{w2}/v0")
    sched0r.write.mode("overwrite").parquet(f"{w2}/s0")
    gold = spark.read.parquet(f"{w2}/v0")
    s1, sched1 = crawl.polite_frontier_tick(gold, b1, robots, url_col="url")
    s1.write.mode("overwrite").parquet(f"{w2}/v1")
    sched1.write.mode("overwrite").parquet(f"{w2}/s1")
    state_replay = sorted(map(tuple, spark.read.parquet(f"{w2}/v1").collect()))
    sched_replay = [
        sorted(map(tuple, spark.read.parquet(f"{w2}/s{i}").collect()))
        for i in range(2)
    ]
    assert state_replay == state_clean
    assert sched_replay == sched_clean

    # semantics: batch 0 schedules the deduped allowed keys only
    # (blocked /no never appears; the no-robots host defaults allowed);
    # batch 1 schedules ONLY the genuinely new key, on the host clock
    sched0_keys = {(r[0], r[4]) for r in sched_clean[0]}  # (url_canon, slot)
    assert sched0_keys == {
        ("https://h.example/ok/a", 0),
        ("https://other.example/x", 0),
    }
    assert [(r[0], r[5]) for r in sched_clean[1]] == [
        ("https://h.example/ok/b", 0)
    ]
    # state carries every canonical key ever seen, schedule never re-emits
    assert {r[0] for r in state_clean} == {
        "https://h.example/ok/a",
        "https://h.example/ok/b",
        "https://h.example/no/blocked",
        "https://other.example/x",
    }
