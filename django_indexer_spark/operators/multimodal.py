"""Multimodal column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side machinery — schema, partition-friendly batching,
Arrow-batched UDF signatures — is real and tested; the codec calls
themselves are STUBBED (no image/audio libraries in this container):

- ``decode_image`` raises NotImplementedError (clearly marked stub);
- ``fake_decode_meta`` is the deterministic stand-in used by tests: it
  "decodes" byte length / md5 / a fake (width, height) derived from the
  bytes, exercising the exact mapInPandas plumbing a real decoder uses.

Design for 100 TB of media:
- binary payloads live in their own column so parquet column pruning skips
  them unless a query touches bytes;
- decode/feature-extract runs via mapInPandas (per-partition Arrow batches,
  bounded by spark.sql.execution.arrow.maxRecordsPerBatch) — never
  row-at-a-time UDFs;
- outputs are narrow typed columns (metadata/features), so downstream
  queries never reshuffle the blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source_uri", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Fixture adapter: wrap the documents table's text bytes as fake media
    payloads so the binary plumbing is testable without real assets."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.concat(F.lit("fixture://documents/"), F.col("doc_id")).alias("source_uri"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """STUB — real deployment plugs in PIL/libvips here. The container has
    no image codecs; the engine's contract is the surrounding plumbing."""
    raise NotImplementedError(
        "image decoding is stubbed in this environment; "
        "use fake_decode_meta for deterministic tests"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: derive a fake (width, height)
    from the payload bytes. Keeps tests meaningful without codecs."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction — the real-decoder shape.

    Each Arrow batch arrives as a pandas DataFrame; a real implementation
    calls decode_image per payload (optionally on GPU); the stub computes
    deterministic features so plumbing (schema, batching, null payloads)
    is fully exercised.
    """
    import hashlib

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "content_md5": payloads.map(
                        lambda b: None if b is None else hashlib.md5(b).hexdigest()
                    ),
                    "width": payloads.map(
                        lambda b: None if b is None else fake_decode_meta(b)[0]
                    ).astype("Int32"),
                    "height": payloads.map(
                        lambda b: None if b is None else fake_decode_meta(b)[1]
                    ).astype("Int32"),
                }
            )
            yield out

    return media.select("media_id", "payload").mapInPandas(extract, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas 1→1 resize — the transcode shape. A real deployment
    decodes, resizes, re-encodes per payload inside the batch loop; the
    stub emits a deterministic payload (md5 of input + target dims) so
    schema/batching are exercised without codecs."""
    import hashlib

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(
                        lambda b: None
                        if b is None
                        else hashlib.md5(b).digest() + bytes([width % 256, height % 256])
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(resize, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """mapInPandas 1→N frame sampling — the video-explode shape (output
    cardinality differs from input, which plain pandas_udf can't do). The
    stub slices the payload into n_frames chunks standing in for decoded
    frames; a real implementation seeks keyframes via the video codec.

    Scale note: frames inherit the input's partitioning — no shuffle; a
    60-frame-per-video sample only multiplies rows inside each task."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes | None] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                step = max(1, len(payload) // n_frames)
                for i in range(min(n_frames, len(payload))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(payload[i * step : i * step + step]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_payload": frames})

    return media.select("media_id", "payload").mapInPandas(sample, FRAME_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata projection (no UDF): byte length + md5 — the part
    of feature extraction Spark can do without decoding, and therefore the
    oracle-checkable slice."""
    return media.select(
        "media_id",
        F.col("kind"),
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.col("meta.source_uri").alias("source_uri"),
    )
