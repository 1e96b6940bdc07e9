"""BoundedFrameCache — the shared lazy-return cache ownership helper
(caching.py). Round-5 verdict #3 / ADVICE: the one-slot pop/append
pattern in dedup._SIG_CACHE and text._BPE_VOCAB_CACHE could evict a
frame another call's unconsumed plan still needed, and the mutation
was not thread-safe. All three sites (lake quarantine, minhash
signatures, BPE vocab) now share this helper."""

from __future__ import annotations

import threading

import pytest

from django_indexer_spark.caching import BoundedFrameCache


def _persisted(spark, n):
    df = spark.range(n).persist()
    df.count()  # materialize so is_cached reflects real storage
    return df


def test_fifo_eviction_unpersists_oldest(spark):
    cache = BoundedFrameCache(slots=2)
    a, b, c = (_persisted(spark, i + 1) for i in range(3))
    cache.pin(a)
    cache.pin(b)
    assert len(cache) == 2
    cache.pin(c)  # evicts a (oldest), keeps b and c
    assert len(cache) == 2
    assert not a.storageLevel.useMemory or not a.is_cached
    assert b.is_cached and c.is_cached
    cache.clear()
    assert len(cache) == 0
    assert not b.is_cached and not c.is_cached


def test_recent_frames_survive_next_call(spark):
    """The bug the one-slot pattern had: call 2 must NOT evict call 1's
    frame while call 1's returned plan is still unconsumed."""
    cache = BoundedFrameCache(slots=4)
    first = cache.pin(_persisted(spark, 10))
    cache.pin(_persisted(spark, 20))
    assert first.is_cached  # old pattern would have unpersisted it here
    cache.clear()


def test_concurrent_pins_never_leak_or_double_evict(spark):
    """32 threads × 8 pins against a 4-slot FIFO: afterwards exactly 4
    frames remain pinned and every other frame is unpersisted."""
    cache = BoundedFrameCache(slots=4)
    frames = [_persisted(spark, 2) for _ in range(256)]
    idx = iter(range(256))
    lock = threading.Lock()

    def worker():
        while True:
            with lock:
                try:
                    i = next(idx)
                except StopIteration:
                    return
            cache.pin(frames[i])

    threads = [threading.Thread(target=worker) for _ in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(cache) == 4
    assert sum(1 for f in frames if f.is_cached) == 4
    cache.clear()
    assert sum(1 for f in frames if f.is_cached) == 0


def test_invalid_slots_rejected():
    with pytest.raises(ValueError):
        BoundedFrameCache(slots=0)
