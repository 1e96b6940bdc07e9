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
