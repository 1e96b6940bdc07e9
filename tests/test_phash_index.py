"""Incremental perceptual-hash image index (streaming/phash_index.py).

The invariant that matters — the text index's batch-split equivalence
applied to media: feeding a media corpus through the index in ANY batch
split finds exactly the pairs the batch operator
(multimodal.phash_near_dup_pairs) finds on the whole corpus at once.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from django_indexer_spark.operators import multimodal as mm
from django_indexer_spark.sources import silver
from django_indexer_spark.streaming import phash_index


def _smooth_rgb(w, h, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    planes = []
    for _ in range(3):
        fy, fx = rng.uniform(0, 0.2, size=2)
        phase, amp, base = rng.uniform(0, 2 * math.pi), rng.uniform(20, 60), rng.uniform(80, 160)
        planes.append(base + amp * np.sin(fy * yy + fx * xx + phase))
    return np.clip(np.stack(planes, axis=-1), 0, 255).astype(np.uint8)


def _png(arr):
    return bytearray(mm.encode_png(arr.shape[1], arr.shape[0], arr.tobytes(), "RGB"))


def _media_rows():
    """7 payloads: id 1/3 identical (within-batch dup), id 5 a brightness
    edit of 1 (CROSS-batch near-dup), 2/4/6 unrelated, 7 undecodable."""
    a = _smooth_rgb(48, 32, 1)
    a_edit = np.clip(a.astype(int) + 10, 0, 255).astype(np.uint8)
    return [
        (1, _png(a)),
        (2, _png(_smooth_rgb(48, 32, 2))),
        (3, _png(a)),
        (4, _png(_smooth_rgb(48, 32, 4))),
        (5, _png(a_edit)),
        (6, _png(_smooth_rgb(48, 32, 6))),
        (7, bytearray(b"not an image at all")),
    ]


def _media_df(spark, rows):
    return spark.createDataFrame(rows, "media_id long, payload binary")


def _pair_set(rows):
    return {tuple(sorted((r["id_new"], r["id_seen"]))) for r in rows}


def test_incremental_equals_batch_phash(spark, tmp_path):
    idx = str(tmp_path / "phash_index")
    rows = _media_rows()
    batches = [rows[:3], rows[3:5], rows[5:]]
    found = set()
    for i, batch in enumerate(batches, start=1):
        pairs = phash_index.probe_and_update(
            spark, idx, _media_df(spark, batch), batch_id=i, n_buckets=8
        )
        found |= _pair_set(pairs.collect())

    whole = mm.phash_near_dup_pairs(
        mm.image_phash(_media_df(spark, rows)), max_hamming=3
    ).collect()
    expected = {tuple(sorted((r["id_a"], r["id_b"]))) for r in whole}
    assert found == expected
    assert (1, 3) in found  # within-batch exact dup
    assert (1, 5) in found and (3, 5) in found  # cross-batch brightness edit
    assert not any(7 in p for p in found)  # undecodable never pairs

    # the index holds band rows only for decodable images
    t = silver.read_table(spark, idx)
    assert t.select("media_id").distinct().count() == 6
    assert t.count() == 6 * 4  # bands rows per image, never blobs


def test_phash_replay_is_idempotent(spark, tmp_path):
    idx = str(tmp_path / "phash_index")
    rows = _media_rows()
    first = phash_index.probe_and_update(spark, idx, _media_df(spark, rows[:5]), batch_id=1)
    # crash-replay of the SAME batch: no self-pairs, same pairs re-found,
    # no index growth (merge keyed on (media_id, band) is idempotent)
    again = phash_index.probe_and_update(spark, idx, _media_df(spark, rows[:5]), batch_id=1)
    assert not any(r["id_new"] == r["id_seen"] for r in again.collect())
    assert _pair_set(first.collect()) <= _pair_set(again.collect())
    t = silver.read_table(spark, idx)
    assert t.select("media_id").distinct().count() == 5  # ids 1-5, all decodable
    assert t.count() == 5 * 4


def test_stream_phash_end_to_end(spark, tmp_path):
    """Real micro-batches through Structured Streaming: two input files,
    availableNow trigger, pairs land in the distributed log and match
    the one-shot batch operator."""
    import glob as _glob
    import os as _os
    import shutil

    rows = _media_rows()
    work = str(tmp_path)
    in_dir = f"{work}/in"
    _os.makedirs(in_dir)
    df = _media_df(spark, rows)
    stage = f"{work}/stage"
    (
        df.withColumn("half", (F.col("media_id") % 2).cast("int"))
        .repartition("half")
        .write.partitionBy("half")
        .parquet(stage)
    )
    for i in range(2):
        part = _glob.glob(f"{stage}/half={i}/part-*.parquet")[0]
        dst = f"{in_dir}/{i}.parquet"
        shutil.copy(part, dst)
        _os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = phash_index.stream_phash(
        spark,
        stream,
        index_dir=f"{work}/index",
        pairs_dir=f"{work}/pairs",
        checkpoint_dir=f"{work}/ckpt",
    )
    assert q.awaitTermination(120), "phash streaming gate timed out"

    got = _pair_set(spark.read.parquet(f"{work}/pairs").collect())
    whole = mm.phash_near_dup_pairs(mm.image_phash(df), max_hamming=3).collect()
    assert got == {tuple(sorted((r["id_a"], r["id_b"]))) for r in whole}


def test_incremental_equals_batch_nondefault_bands(spark, tmp_path):
    """Review regression: with bands=8/max_hamming=6 (lossless by
    pigeonhole, unlike the 4-band default at that distance), the
    incremental path must STILL equal the one-shot operator — the
    within-batch probe once silently re-banded at the default and
    could miss same-batch pairs at Hamming 4-6."""
    idx = str(tmp_path / "phash_index8")
    rows = _media_rows()
    # ids 1,3,5 all mutually near-dup; 1+3+5 arrive in ONE batch so the
    # within-batch path is what's exercised at d>3
    batches = [[rows[0], rows[2], rows[4]], [rows[1], rows[3], rows[5], rows[6]]]
    found = set()
    for i, batch in enumerate(batches, start=1):
        pairs = phash_index.probe_and_update(
            spark, idx, _media_df(spark, batch), batch_id=i,
            max_hamming=6, bands=8, n_buckets=8,
        )
        found |= _pair_set(pairs.collect())

    whole = mm.phash_near_dup_pairs(
        mm.image_phash(_media_df(spark, rows)), max_hamming=6, bands=8
    ).collect()
    expected = {tuple(sorted((r["id_a"], r["id_b"]))) for r in whole}
    assert found == expected
    assert {(1, 3), (1, 5), (3, 5)} <= found  # the same-batch near-dups
