"""WARC (Web ARChive) record parsing — the Common Crawl ingest shape.

Web-scale text corpora ship as WARC files: a concatenation of records,
each a ``WARC/1.x`` header block (named fields, ``Content-Length``) plus
a content block, usually gzip-compressed PER RECORD (multi-member gzip,
so a reader can split work without decompressing the whole file). The
reference ingests chain blocks from an indexer lake
(indexer_app/handler.py:33-60 — pull container, split records, normalize
each); this module is that loop for the public WARC format, as a 1→N
``mapInPandas`` over binary payload columns:

- ``parse_warc`` — pure-Python record splitter (header parse,
  Content-Length-bounded block reads, multi-member gunzip when the
  payload is compressed);
- ``warc_records`` — the Spark operator: one input row per WARC chunk,
  one output row per record with the fields a text pipeline filters on
  (type, target URI, content type, HTTP status) and the HTTP body for
  response records (headers stripped) — downstream goes straight to
  ``text.html_to_text``.

Scale shape: WARC chunks arrive as binary columns (the multimodal
blob rule — parquet column pruning skips them unless touched); records
explode INSIDE each task's Arrow batches, so the big payloads never
shuffle, and the narrow metadata columns are what downstream queries
aggregate on. At 100 TB, one ~1 GB WARC per row is the natural unit —
the same per-file parallelism Common Crawl's own layout assumes.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the per-record compression
    WARC uses) into one byte stream."""
    out = []
    pos, n = 0, len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        try:
            out.append(d.decompress(data[pos:]))
        except zlib.error as exc:  # corrupt stream: zlib.error is NOT a
            # ValueError subclass — translate so callers' totality
            # catches (except ValueError) actually fire
            raise ValueError(f"corrupt gzip member in WARC payload: {exc}") from exc
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("corrupt gzip member in WARC payload")
        pos += consumed
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    """Case-insensitive named fields of one header block (WARC or HTTP);
    keys are lowered, continuation lines folded per RFC 822."""
    headers: dict[str, str] = {}
    last = None
    for line in block.split(b"\r\n"):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        if b":" not in line:
            continue
        k, v = line.split(b":", 1)
        last = k.strip().decode("latin-1").lower()
        headers[last] = v.strip().decode("latin-1")
    return headers


def parse_warc(payload: bytes) -> list[dict]:
    """Split one WARC payload (raw or multi-member gzip) into records:
    each a dict with ``warc_type``, ``target_uri``, ``content_type``,
    ``http_status`` (response records), and ``body`` (the HTTP body for
    responses, the raw content block otherwise). Raises ValueError for
    non-WARC payloads; tolerates a truncated final record by dropping it
    (streaming writers)."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members(payload)
    if not payload.startswith(b"WARC/"):
        raise ValueError("not a WARC payload")
    records = []
    pos, n = 0, len(payload)
    while pos < n and payload[pos : pos + 5] == b"WARC/":
        head_end = payload.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break  # truncated header: drop the tail
        headers = _parse_headers(payload[pos:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError as exc:
            raise ValueError("WARC record missing Content-Length") from exc
        if length < 0:
            # a negative length would move the scan backwards — with the
            # right header size that pins pos to the same offset forever
            # (an executor-hanging DoS, not just a parse error)
            raise ValueError("negative WARC Content-Length")
        block_start = head_end + 4
        block_end = block_start + length
        if block_end > n:
            break  # truncated block: drop it
        block = payload[block_start:block_end]
        rec = {
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "content_type": headers.get("content-type"),
            "http_status": None,
            "body": block,
        }
        if rec["warc_type"] == "response" and block[:5] == b"HTTP/":
            split = block.find(b"\r\n\r\n")
            if split >= 0:
                status_line = block[: block.find(b"\r\n")].decode("latin-1", "replace")
                parts = status_line.split(None, 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                http_headers = _parse_headers(block[:split])
                rec["content_type"] = http_headers.get("content-type", rec["content_type"])
                rec["body"] = block[split + 4 :]
        records.append(rec)
        # records are separated by two CRLFs after the block
        pos = block_end
        while payload[pos : pos + 2] == b"\r\n":
            pos += 2
    return records


WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("warc_id", T.LongType()),
        T.StructField("record_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("body", T.BinaryType()),
    ]
)


def warc_records(df: DataFrame, id_col: str = "warc_id", payload_col: str = "payload") -> DataFrame:
    """mapInPandas 1→N record explode over WARC payload columns (raw or
    per-record-gzip): one output row per record with the filterable
    metadata plus the HTTP body. Non-WARC payloads emit no rows — the
    operator stays total over mixed inputs, like every multimodal
    extractor."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, types, uris, ctypes, statuses, bodies = [], [], [], [], [], [], []
            for wid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    recs = parse_warc(bytes(payload))
                except ValueError:
                    continue
                for i, r in enumerate(recs):
                    ids.append(wid)
                    idxs.append(i)
                    types.append(r["warc_type"])
                    uris.append(r["target_uri"])
                    ctypes.append(r["content_type"])
                    statuses.append(r["http_status"])
                    bodies.append(r["body"])
            yield pd.DataFrame(
                {
                    "warc_id": ids,
                    "record_idx": pd.array(idxs, dtype="int32"),
                    "warc_type": types,
                    "target_uri": uris,
                    "content_type": ctypes,
                    "http_status": pd.array(statuses, dtype="Int32"),
                    "body": bodies,
                }
            )

    return df.select(
        df[id_col].alias(id_col), df[payload_col].alias(payload_col)
    ).mapInPandas(extract, WARC_RECORD_SCHEMA)


# --------------------------------------------------------------------------
# WebDataset tar shards (the standard multimodal training-corpus packaging)
# --------------------------------------------------------------------------

# parts as PARALLEL ARRAYS, not MapType/list<struct>: Spark's
# Python→Arrow serializer converts object columns through numpy, whose
# converter implements plain lists but not nested map/struct values —
# JVM callers rebuild the map with
# F.map_from_entries(F.arrays_zip("exts", "datas"))
WDS_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType()),
        T.StructField("sample_key", T.StringType()),
        T.StructField("exts", T.ArrayType(T.StringType())),
        T.StructField("datas", T.ArrayType(T.BinaryType())),
        T.StructField("n_parts", T.IntegerType()),
        T.StructField("total_bytes", T.LongType()),
    ]
)


def tar_samples(payload: bytes):
    """Sequential WebDataset walk of one tar payload (plain or gzip):
    yields (sample_key, {ext: bytes}) per adjacent-member group —
    basename before the first dot is the key, the rest the extension.
    Non-tar payloads yield nothing; directories/metadata members are
    skipped. The pure-Python core ``webdataset_samples`` batches."""
    import io
    import tarfile

    try:
        tf = tarfile.open(fileobj=io.BytesIO(payload), mode="r:*")
    except tarfile.TarError:
        return
    key, parts = None, {}
    truncated = False
    try:
        with tf:
            for m in tf:
                if not m.isfile():
                    continue
                base = m.name.rsplit("/", 1)[-1]
                if "." in base:
                    k, ext = base.split(".", 1)
                else:
                    k, ext = base, ""
                if key is not None and k != key:
                    yield key, parts
                    parts = {}
                key = k
                fobj = tf.extractfile(m)
                parts[ext] = fobj.read() if fobj is not None else b""
    except (tarfile.TarError, OSError, EOFError, zlib.error):
        # truncated mid-member (partial upload / streaming writer — the
        # same case parse_warc tolerates): keep the complete samples
        # already yielded, drop the partial group (its parts may be cut)
        truncated = True
    if key is not None and not truncated:
        yield key, parts


def webdataset_samples(
    df: DataFrame, id_col: str = "shard_id", payload_col: str = "payload"
) -> DataFrame:
    """Explode WebDataset tar shards into training samples — the public
    convention: a shard is a (possibly gzipped) tar whose members group
    into samples by basename-before-the-first-dot, each sample holding
    one file per modality (``0001.jpg`` + ``0001.txt`` + ``0001.json``
    → key ``0001``, parts {jpg, txt, json}). One output row per sample
    with parallel ext/bytes arrays (rebuild the map JVM-side with
    ``map_from_entries(arrays_zip(exts, datas))``); members of a sample
    are ADJACENT in the tar by convention, so grouping happens inside
    the task during the sequential walk — the blobs never shuffle,
    exactly the WARC rule.

    stdlib ``tarfile`` over an in-memory buffer (``r:*`` sniffs plain vs
    gzip); non-tar payloads emit no rows (total over mixed inputs);
    directories and PAX/metadata members are skipped."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, keys, exts, datas, counts, sizes = [], [], [], [], [], []
            for sid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                for k, parts in tar_samples(bytes(payload)):
                    ids.append(sid)
                    keys.append(k)
                    exts.append(list(parts.keys()))
                    datas.append(list(parts.values()))
                    counts.append(len(parts))
                    sizes.append(sum(len(v) for v in parts.values()))
            yield pd.DataFrame(
                {
                    "shard_id": ids,
                    "sample_key": keys,
                    # dtype=object: an EMPTY batch would otherwise infer
                    # float64 columns, which Arrow can't convert to
                    # list types (NumPyConverter has no float→list path)
                    "exts": pd.Series(exts, dtype="object"),
                    "datas": pd.Series(datas, dtype="object"),
                    "n_parts": pd.array(counts, dtype="int32"),
                    "total_bytes": pd.array(sizes, dtype="int64"),
                }
            )

    return df.select(
        df[id_col].alias(id_col), df[payload_col].alias(payload_col)
    ).mapInPandas(extract, WDS_SAMPLE_SCHEMA)


def crawl_to_documents(
    warc_df: DataFrame,
    id_col: str = "warc_id",
    payload_col: str = "payload",
    main_content_only: bool = False,
) -> DataFrame:
    """The assembled crawl-ingest pipeline — WARC shards in, a
    ``documents``-shaped table out, every step from this round composed:

        warc_records (1→N explode, blobs in-task)
          → keep 200-OK text/html responses
          → html_to_text (codegen strip/decode)
          → drop empties, derive doc_id = xxhash64(uri), score with
            text.lang_id + text.quality_score (codegen heuristics)

    ``main_content_only=True`` swaps html_to_text for
    text.extract_main_content — the Readability-lite boilerplate cut —
    so a corpus build can land article bodies instead of full pages
    (chrome-only pages then drop at the empty-text filter, which is the
    curation intent).

    Output: (doc_id, source_uri, text, lang, quality) — the schema the
    dedup / sampling / decontamination operators take from here. One
    Python stage total (the record split); everything downstream is
    whole-stage codegen, so the per-page cost at 100 TB is the one
    Arrow pass plus JVM expressions."""
    from ..operators import text as text_ops

    recs = warc_records(warc_df, id_col, payload_col)
    # windows-1252 == ISO-8859-1 except the 0x80-0x9F block (smart
    # quotes, dashes, €, ™ — the chars that make mojibake famous);
    # Spark's decode has no cp1252 charset, so decode latin-1 and
    # translate those 27 code points (undefined slots pass through)
    cp1252_from, cp1252_to = "", ""
    for byte in range(0x80, 0xA0):
        try:
            cp1252_to += bytes([byte]).decode("cp1252")
        except UnicodeDecodeError:
            continue
        cp1252_from += chr(byte)
    # charset-aware body decode: a bare binary→string cast assumes
    # UTF-8 and mangles the latin-1/windows-1252 pages real crawls are
    # full of. The declared charset (Content-Type header first, <meta
    # charset> probe second) routes to the right F.decode literal;
    # unknown/absent charsets default to UTF-8 with replacement chars.
    declared = F.lower(
        F.coalesce(
            F.nullif(
                F.regexp_extract(F.col("content_type"), r"(?i)charset=\"?([A-Za-z0-9_-]+)", 1),
                F.lit(""),
            ),
            F.nullif(
                F.regexp_extract(
                    # probe only the head for the meta declaration —
                    # spec says it must appear in the first 1024 bytes;
                    # anchored to <meta so a stray 'charset=' in an href
                    # or code sample can't misroute the decode
                    F.decode(F.expr("substr(body, 1, 1024)"), "ISO-8859-1"),
                    r"(?i)<meta[^>]{0,200}charset\s*=\s*[\"']?([A-Za-z0-9_-]+)",
                    1,
                ),
                F.lit(""),
            ),
        )
    )
    body_text = (
        F.when(
            declared.isin("iso-8859-1", "latin-1", "latin1"),
            F.decode(F.col("body"), "ISO-8859-1"),
        )
        .when(
            declared.isin("windows-1252", "cp1252"),
            F.translate(F.decode(F.col("body"), "ISO-8859-1"), cp1252_from, cp1252_to),
        )
        # default/UTF-8: plain cast, NOT F.decode — Spark 4's decode
        # RAISES on malformed sequences (one mis-labeled page would kill
        # the task), while the cast substitutes replacement chars; the
        # two single-byte charsets above are total for any input
        .otherwise(F.col("body").cast("string"))
    )
    pages = recs.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        # header VALUES keep their case in real crawls ('Text/HTML;
        # charset=...') — only the keys are normalized by the parser
        & F.lower(F.col("content_type")).startswith("text/html")
    ).select(
        "target_uri",
        # main_content_only swaps the full-page strip for the
        # Readability-lite boilerplate cut (text.extract_main_content) —
        # both single codegen expressions, so the 100 TB cost is the
        # same one JVM pass per page either way
        (
            text_ops.extract_main_content(body_text)
            if main_content_only
            else text_ops.html_to_text(body_text)
        ).alias("text"),
    )
    return (
        pages.filter(F.length("text") > 0)
        .select(
            F.xxhash64("target_uri").alias("doc_id"),
            F.col("target_uri").alias("source_uri"),
            "text",
            text_ops.lang_id("text").alias("lang"),
            text_ops.quality_score("text").alias("quality"),
        )
    )


WDS_SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard_idx", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
    ]
)


def webdataset_pack(
    samples: DataFrame,
    n_shards: int,
    key_col: str = "sample_key",
    exts_col: str = "exts",
    datas_col: str = "datas",
) -> DataFrame:
    """The egress twin of ``webdataset_samples``: pack sample rows back
    into WebDataset tar shards — one output row per shard with the
    assembled tar payload. Samples route to shards by
    ``xxhash64(key) % n_shards`` (deterministic; ONE shuffle, the
    unavoidable one — packing means co-locating a shard's blobs), then
    each shard's tar is assembled INSIDE its task via applyInPandas,
    members sorted by key so the same input always produces
    byte-identical shards (headers are written with zeroed mtime/uid
    for reproducibility — a re-run must re-produce the same corpus).

    Memory bound: one shard's tar materializes in its task, so size
    shards to executors (total_bytes / n_shards well under task
    memory) — the standard WebDataset shard-sizing rule (~1 GB shards),
    not a scale limit."""
    import io
    import tarfile

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard_idx = int(pdf["__shard"].iloc[0])
        buf = io.BytesIO()
        n = 0
        with tarfile.open(fileobj=buf, mode="w") as tf:
            order = pdf.sort_values(key_col)
            for key, exts, datas in zip(order[key_col], order[exts_col], order[datas_col]):
                n += 1
                for ext, data in sorted(zip(exts, datas)):
                    b = bytes(data)
                    info = tarfile.TarInfo(f"{key}.{ext}" if ext else str(key))
                    info.size = len(b)
                    info.mtime = 0
                    tf.addfile(info, io.BytesIO(b))
        payload = buf.getvalue()
        return pd.DataFrame(
            {
                "shard_idx": pd.array([shard_idx], dtype="int32"),
                "payload": [payload],
                "n_samples": pd.array([n], dtype="int64"),
                "total_bytes": pd.array([len(payload)], dtype="int64"),
            }
        )

    routed = samples.filter(
        # a null key has no tar member name and would route to a null
        # shard (int(None) kills the task); unpackable rows drop here
        F.col(key_col).isNotNull()
    ).withColumn(
        "__shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int")
    )
    return routed.groupBy("__shard").applyInPandas(build, WDS_SHARD_SCHEMA)


def sitemap_entries(df: DataFrame, id_col: str = "warc_id", xml_col: str = "xml") -> DataFrame:
    """Sitemap XML → one row per entry, pure codegen (the html_to_text
    rule — once-per-sitemap parsing never enters Python): split on the
    ``<url>``/``<sitemap>`` element opens, posexplode, regexp-extract
    ``<loc>`` / ``<lastmod>`` / ``<priority>``. Handles both urlsets
    and sitemap-index files (``kind`` column says which); blocks
    without a <loc> (the preamble before the first element) drop out.
    lastmod stays the raw W3C datetime string — timezone policy is the
    caller's, like EXIF timestamps."""
    blocks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(xml_col), r"<(?:url|sitemap)>")).alias(
            "entry_idx", "block"
        ),
        F.col(xml_col).contains("<sitemapindex").alias("is_index"),
    )
    loc = F.regexp_extract("block", r"<loc>\s*([^<\s]+)\s*</loc>", 1)
    return (
        blocks.withColumn("loc", loc)
        .filter(F.col("loc") != "")
        .select(
            F.col("id").alias(id_col),
            (F.col("entry_idx") - 1).cast("int").alias("entry_idx"),
            F.when(F.col("is_index"), "sitemap").otherwise("url").alias("kind"),
            "loc",
            F.nullif(
                F.regexp_extract("block", r"<lastmod>\s*([^<\s]+)\s*</lastmod>", 1),
                F.lit(""),
            ).alias("lastmod"),
            F.nullif(
                F.regexp_extract("block", r"<priority>\s*([^<\s]+)\s*</priority>", 1),
                F.lit(""),
            ).cast("double").alias("priority"),
        )
    )
