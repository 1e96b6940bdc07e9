"""Property-based invariants (SURVEY.md §5.3) via hypothesis.

Small max_examples: each example spins Spark jobs, so we trade example
count for breadth of generated shapes. Deadline disabled for JVM warmup.
"""

from __future__ import annotations

import decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from django_indexer_spark.functions.amounts import grouped_exact_sums, to_fixed
from django_indexer_spark.operators import sorts
from django_indexer_spark.sources.merge import upsert

MONEY = st.decimals(
    min_value=decimal.Decimal("-99999999.99"),
    max_value=decimal.Decimal("99999999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)
ROWS = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), MONEY), min_size=1, max_size=30
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=ROWS)
def test_grouped_exact_sums_equals_python_decimal(spark, rows):
    df = spark.createDataFrame(
        [(g, float(v)) for g, v in rows], "grp string, amt double"
    ).repartition(4)
    got = {
        r["grp"]: r["total"]
        for r in grouped_exact_sums(
            df, ["grp"], sums={"total": (to_fixed("amt", 2), 2)}
        ).collect()
    }
    want: dict[str, decimal.Decimal] = {}
    for g, v in rows:
        want[g] = want.get(g, decimal.Decimal(0)) + v
    assert set(got) == set(want)
    for g in want:
        assert got[g] == float(want[g]), g  # exact, not approx


VERSIONED = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 100), st.integers(0, 10)),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(batch=VERSIONED)
def test_upsert_idempotent_and_order_free(spark, batch):
    df = spark.createDataFrame(batch, "k int, v int, version int")
    once = upsert(None, df, ["k"], "version")
    twice = upsert(once, df, ["k"], "version")  # replay (T3)
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    # one winner per key, and it carries the max version
    win = {r["k"]: r["version"] for r in once.collect()}
    expect = {}
    for k, _, ver in batch:
        expect[k] = max(expect.get(k, -1), ver)
    assert win == expect


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(n=st.integers(0, 120), page_size=st.integers(1, 40))
def test_pagination_partitions_any_sized_set(spark, n, page_size):
    df = spark.range(n).withColumnRenamed("id", "k")
    seen: list[int] = []
    page = 1
    while True:
        chunk = [r["k"] for r in sorts.paginate(df, [F.asc("k")], page, page_size).collect()]
        if not chunk:
            break
        seen.extend(chunk)
        page += 1
    assert seen == list(range(n))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(n=st.integers(0, 120), page_size=st.integers(1, 40))
def test_keyset_pagination_partitions_any_sized_set(spark, n, page_size):
    """Walking all pages by cursor partitions the ordered set — the seek
    twin of the offset property above, on a COMPOSITE (grp, k) order so
    the lexicographic cursor predicate is exercised across group
    boundaries."""
    df = spark.range(n).select(
        (F.col("id") % 3).alias("grp"), F.col("id").alias("k")
    )
    expect = sorted((i % 3, i) for i in range(n))
    seen: list[tuple[int, int]] = []
    cursor = None
    while True:
        chunk = [
            (r["grp"], r["k"])
            for r in sorts.paginate_after(
                df, ["grp", "k"], last_seen=cursor, page_size=page_size
            ).collect()
        ]
        if not chunk:
            break
        seen.extend(chunk)
        cursor = chunk[-1]
    assert seen == expect


# ------------------------------------------------- silver store vs dict model

BATCHES = st.lists(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 100), st.integers(0, 8)),
        min_size=0,
        max_size=8,
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(batches=BATCHES, keep=st.sampled_from(["last", "first"]))
def test_silver_store_matches_dict_model(spark, tmp_path_factory, batches, keep):
    """Any sequence of merge_batch calls must equal the trivial dict model
    (per-key keep-last/keep-first by version), regardless of how keys
    spread over buckets, batches, or versions — including equal-version
    conflicts where incoming wins on 'last' and loses on 'first'."""
    from django_indexer_spark.sources import silver

    d = str(tmp_path_factory.mktemp("silver") / "t")
    model: dict[int, tuple[int, int]] = {}
    for bid, batch in enumerate(batches):
        if batch:
            df = spark.createDataFrame(batch, "k int, v int, version int")
            silver.merge_batch(spark, d, df, ["k"], "version", keep=keep,
                               batch_id=bid, n_buckets=4)
        # the dict model applies the same conflict policy row-by-row
        # (within a batch, upsert picks one winner per key first)
        for k, v, ver in batch:
            if k not in model:
                model[k] = (v, ver)
            elif keep == "last" and ver >= model[k][1]:
                model[k] = (v, ver)
            elif keep == "first" and ver < model[k][1]:
                model[k] = (v, ver)
    got_df = silver.read_table(spark, d)
    got = {} if got_df is None else {
        r["k"]: (r["v"], r["version"]) for r in got_df.collect()
    }
    assert {k: v[1] for k, v in got.items()} == {k: v[1] for k, v in model.items()}


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    s=st.text(alphabet="ab1", min_size=1, max_size=8),
    edit=st.tuples(st.integers(0, 7), st.sampled_from("ab1"), st.sampled_from("sid")),
)
def test_deletion_signatures_cover_all_distance1_pairs(s, edit):
    """The pigeonhole behind dedup_fuzzy_names: ANY string within edit
    distance 1 of s shares a deletion-neighborhood signature with s.
    Pure-Python mirror of the SQL transform() expression."""
    pos, ch, kind = edit
    pos = pos % len(s)
    if kind == "s":
        t = s[:pos] + ch + s[pos + 1 :]
    elif kind == "i":
        t = s[:pos] + ch + s[pos:]
    else:
        t = s[:pos] + s[pos + 1 :]

    def sigs(x: str) -> set:
        return {x} | {x[:i] + x[i + 1 :] for i in range(len(x))}

    assert sigs(s) & sigs(t), (s, t)


# --- dup-span coverage vs brute-force set union -----------------------------

_WORDS = ["aa", "bb", "cc", "dd", "ee"]
DOCS = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


def _brute_dup_coverage(texts: list[str], n: int) -> dict[int, tuple[int, int]]:
    """Reference model: per doc (n_tokens, |union of positions covered by a
    word n-gram that appears in >=2 distinct docs|) via plain sets."""
    toks = [t.split() if t else [] for t in texts]
    grams: dict[tuple[str, ...], set[int]] = {}
    for d, ts in enumerate(toks):
        for i in range(len(ts) - n + 1):
            grams.setdefault(tuple(ts[i : i + n]), set()).add(d)
    out = {}
    for d, ts in enumerate(toks):
        covered: set[int] = set()
        for i in range(len(ts) - n + 1):
            if len(grams[tuple(ts[i : i + n])]) >= 2:
                covered.update(range(i, i + n))
        out[d] = (len(ts), len(covered))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=DOCS, n=st.integers(2, 4))
def test_dup_span_coverage_matches_set_union_model(spark, texts, n):
    from django_indexer_spark.operators import text as text_ops

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in text_ops.dup_span_coverage(df, "doc_id", "text", n=n).collect()
    }
    assert got == _brute_dup_coverage(texts, n)


_SCD_ROWS = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 50), st.integers(0, 9)),
    min_size=0,
    max_size=30,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_SCD_ROWS, split=st.integers(0, 29))
def test_scd2_merge_any_split_equals_full_build(spark, rows, split):
    """Folding ANY prefix/suffix split of a change set through scd2_merge
    must equal scd2_build over the whole set — the invariant that makes
    the incremental interval table trustworthy under arbitrary batch
    boundaries. Duplicate (k, ts) change rows collapse to one interval
    (dedup on key+ts), mirroring replay semantics."""
    from django_indexer_spark.operators import windows as W

    uniq = {}
    for k, ts, v in rows:
        uniq[(k, ts)] = v
    data = [(k, ts, str(v)) for (k, ts), v in uniq.items()]
    schema = "k int, ts long, v string"
    full = spark.createDataFrame(data or [(0, 0, "0")], schema)
    if not data:
        return
    a = spark.createDataFrame(data[:split] or [], schema) if data[:split] else None
    b = spark.createDataFrame(data[split:] or data, schema)
    built = W.scd2_build(full, ["k"], "ts")
    if a is None:
        merged = W.scd2_merge(
            W.scd2_build(b, ["k"], "ts"), b, ["k"], "ts"
        )  # replaying the only batch must be a no-op
    else:
        merged = W.scd2_merge(W.scd2_build(a, ["k"], "ts"), b, ["k"], "ts")
    cols = ["k", "ts", "v", "valid_from", "valid_to", "is_current"]
    assert sorted(map(tuple, merged.select(cols).collect())) == sorted(
        map(tuple, built.select(cols).collect())
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    keys=st.lists(st.integers(0, 500), min_size=2, max_size=60),
    n_parts=st.integers(1, 8),
)
def test_sequence_gaps_matches_single_window_reference(spark, keys, n_parts):
    """Range-partitioned gap detection (in-partition lag + boundary
    stitch) must find EXACTLY the gaps a single global lag would, for any
    key multiset and any partition count — including duplicate keys and
    partitions that end up empty."""
    from django_indexer_spark.operators import quality

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = sorted(
        (r["prev_key"], r["next_key"], r["gap"])
        for r in quality.sequence_gaps(df, "k", num_partitions=n_parts).collect()
    )
    ks = sorted(set(keys))
    want = sorted(
        (a, b, b - a) for a, b in zip(ks, ks[1:]) if b - a > 1
    )
    assert got == want


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    subsampling=st.sampled_from(["4:4:4", "4:2:2", "4:2:0"]),
)
def test_jpeg_roundtrip_property_smooth_images(w, h, seed, subsampling):
    """Pure-Python codec property (no Spark): for SMOOTH images (random
    low-frequency sinusoid mixes — JPEG's design regime, where
    quantization loss is bounded), encode→decode round-trips every
    size/subsampling within a small error bound, and the output buffer
    is always exactly w*h*channels bytes."""
    import math

    import numpy as np

    from django_indexer_spark.operators import multimodal as mm

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    planes = []
    for _ in range(3):
        fy, fx = rng.uniform(0, 0.2, size=2)  # low spatial frequency
        phase, amp, base = rng.uniform(0, 2 * math.pi), rng.uniform(10, 80), rng.uniform(60, 180)
        planes.append(base + amp * np.sin(fy * yy + fx * xx + phase))
    rgb = np.clip(np.stack(planes, axis=-1), 0, 255).astype(np.uint8)

    data = mm.encode_jpeg(w, h, rgb.tobytes(), "RGB", subsampling=subsampling)
    assert mm.jpeg_dimensions(data) == (w, h, 3)
    img = mm._decode_jpeg(data)
    assert (img.width, img.height, img.mode) == (w, h, "RGB")
    assert len(img.pixels) == w * h * 3
    got = np.frombuffer(img.pixels, dtype=np.uint8).reshape(h, w, 3)
    err = np.abs(got.astype(int) - rgb.astype(int))
    # bounds from a 900-image scan (worst measured: max 63 / mean 9.5,
    # tiny 4:2:0 images at amplitude 80, where chroma averaging + 8x8
    # edge padding dominate); a broken huffman/IDCT/upsample path
    # produces mean errors an order of magnitude larger
    assert err.max() <= 80, (w, h, subsampling, err.max())
    assert err.mean() <= 12.0, (w, h, subsampling, err.mean())


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    w=st.integers(min_value=1, max_value=4000),
    h=st.integers(min_value=1, max_value=4000),
    timescale=st.integers(min_value=1, max_value=1_000_000),
    duration=st.integers(min_value=0, max_value=2**40),
    v1=st.booleans(),
    largesize=st.booleans(),
)
def test_mp4_builder_parser_roundtrip_property(w, h, timescale, duration, v1, largesize):
    """MP4 box-walk property (no Spark): a hand-assembled container with
    random dims/timescale/duration (incl. 64-bit v1 durations past 2^32
    and largesize moov boxes) parses back to exactly the written values —
    the builder and parser are independent encodings of the ISO-BMFF
    spec, so agreement pins both."""
    import struct as _struct

    from django_indexer_spark.operators import multimodal as mm

    def box(btype, body, large=False):
        if large:
            return _struct.pack(">I", 1) + btype + _struct.pack(">Q", len(body) + 16) + body
        return _struct.pack(">I", len(body) + 8) + btype + body

    def full(version, rest):
        return bytes([version, 0, 0, 0]) + rest

    if v1:
        mvhd = full(1, b"\x00" * 16 + _struct.pack(">IQ", timescale, duration) + b"\x00" * 80)
    else:
        duration &= 0xFFFFFFFF
        mvhd = full(0, b"\x00" * 8 + _struct.pack(">II", timescale, duration) + b"\x00" * 80)
    tkhd = full(1 if v1 else 0, b"\x00" * (32 if v1 else 20)) + b"\x00" * 52
    tkhd += _struct.pack(">II", w << 16, h << 16)
    stsd = full(0, _struct.pack(">I", 1) + _struct.pack(">I", 16) + b"av01" + b"\x00" * 8)
    mdia = box(b"hdlr", full(0, b"\x00" * 4 + b"vide" + b"\x00" * 12)) + box(
        b"minf", box(b"stbl", box(b"stsd", stsd))
    )
    moov = box(b"mvhd", mvhd) + box(b"trak", box(b"tkhd", tkhd) + box(b"mdia", mdia))
    payload = box(b"ftyp", b"iso5" + b"\x00" * 4) + box(b"moov", moov, large=largesize)

    i = mm.mp4_info(payload)
    assert i.brand == "iso5"
    assert i.timescale == timescale
    assert abs(i.duration_s - duration / timescale) < 1e-9
    assert (i.n_tracks, i.width, i.height, i.video_codec) == (1, w, h, "av01")


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    bin_idx=st.integers(min_value=5, max_value=480),
    amp=st.floats(min_value=0.05, max_value=0.9),
    n_frames_sig=st.integers(min_value=2, max_value=6),
)
def test_spectral_dominant_bin_property(bin_idx, amp, n_frames_sig):
    """Spectral property (no Spark): a pure tone placed EXACTLY on rfft
    bin k of a 1024-sample frame at 8 kHz (f = k·7.8125 Hz) must come
    back as the dominant frequency regardless of amplitude or signal
    length, with near-zero flatness — the estimator never mistakes a
    tone for noise."""
    import numpy as np

    from django_indexer_spark.operators import multimodal as mm

    sr = 8000
    f = bin_idx * sr / 1024.0
    n = 1024 * n_frames_sig
    t = np.arange(n) / sr
    x = (amp * np.sin(2 * np.pi * f * t)).reshape(-1, 1)
    centroid, _bw, _roll, flat, dom, _zcr = mm._spectral_features(x, sr)
    assert abs(dom - f) < 1e-9
    assert abs(centroid - f) < sr / 1024.0  # leakage stays within one bin
    assert flat < 0.02


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    bodies=st.lists(st.binary(min_size=0, max_size=400), min_size=1, max_size=6),
    statuses=st.lists(st.sampled_from([200, 301, 404, 500]), min_size=6, max_size=6),
    gzipped=st.booleans(),
)
def test_warc_roundtrip_property(bodies, statuses, gzipped):
    """WARC property (no Spark): records built independently of the
    parser — arbitrary binary HTTP bodies (including empty and
    CRLF-containing ones, the splitter's adversarial case), mixed
    statuses, optional per-record gzip — round-trip to exactly the
    written URIs, statuses, and bodies in order."""
    import gzip

    from django_indexer_spark.sources import warc

    records = []
    for i, body in enumerate(bodies):
        block = (
            f"HTTP/1.1 {statuses[i]} X\r\nContent-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        hdr = (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: http://e.com/{i}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(block)}\r\n\r\n"
        ).encode()
        records.append(hdr + block + b"\r\n\r\n")
    payload = (
        b"".join(gzip.compress(r) for r in records)
        if gzipped
        else b"".join(records)
    )
    got = warc.parse_warc(payload)
    assert len(got) == len(bodies)
    for i, r in enumerate(got):
        assert r["target_uri"] == f"http://e.com/{i}"
        assert r["http_status"] == statuses[i]
        assert r["body"] == bodies[i]


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=st.binary(min_size=0, max_size=300), cut=st.integers(min_value=0, max_value=300))
def test_metadata_walks_total_over_garbage(data, cut):
    """Totality fuzz (no Spark): every round-9 header walk must reject
    arbitrary bytes AND truncated prefixes of valid containers with
    ValueError/NotImplementedError only — never KeyError/IndexError/
    struct.error/ZeroDivisionError — because one corrupt blob inside an
    Arrow batch must hit the operators' narrow except clauses, not kill
    the task."""
    import io
    import struct as _struct
    import wave as _wave

    import numpy as np

    from django_indexer_spark.operators import multimodal as mm
    from django_indexer_spark.sources import warc

    # valid containers to take adversarial prefixes of
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.zeros(64, dtype="<i2").tobytes())
    wav = buf.getvalue()
    gif = b"GIF89a" + _struct.pack("<HH", 4, 4) + bytes([0, 0, 0, 0x2C]) + b"\x00" * 9 + bytes([2, 1, 0x44, 0, 0x3B])
    seeds = [data, wav[: cut % (len(wav) + 1)], gif[: cut % (len(gif) + 1)]]

    allowed = (ValueError, NotImplementedError)
    for payload in seeds:
        for parser in (
            mm.wav_info, mm.decode_wav, mm.flac_info, mm.mp3_info, mm.ogg_info,
            mm.mp4_info, mm.gif_info, mm.bmp_info, mm.tiff_info, mm.webp_info,
            mm.jpeg_exif, mm.jpeg_dimensions, mm.id3_tags, mm.animation_frames,
            warc.parse_warc,
        ):
            try:
                parser(payload)
            except allowed:
                pass  # honest rejection
            # anything else (KeyError, struct.error, ...) propagates = FAIL


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    keys=st.lists(
        st.text(alphabet="abcdefgh0123456789", min_size=1, max_size=8),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    n_exts=st.integers(min_value=1, max_value=3),
    payload_seed=st.integers(min_value=0, max_value=2**31 - 1),
    gzipped=st.booleans(),
)
def test_webdataset_grouping_property(keys, n_exts, payload_seed, gzipped):
    """WebDataset grouping property (no Spark, REAL code path —
    warc.tar_samples is what the Spark operator batches): a tar whose
    members are key-adjacent (the format's contract) always regroups
    into exactly one sample per key with every part byte-intact,
    regardless of key shapes, extension counts, payload bytes, or gzip.
    """
    import gzip as _gzip
    import io
    import tarfile

    import numpy as np

    from django_indexer_spark.sources import warc

    rng = np.random.default_rng(payload_seed)
    want = {}
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for k in keys:
            want[k] = {}
            for e in ("jpg", "txt", "json")[:n_exts]:
                data = (
                    rng.integers(0, 256, size=int(rng.integers(0, 64)))
                    .astype("uint8")
                    .tobytes()
                )
                want[k][e] = data
                info = tarfile.TarInfo(f"{k}.{e}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    payload = _gzip.compress(buf.getvalue()) if gzipped else buf.getvalue()
    got = dict(warc.tar_samples(payload))
    assert got == want


_ROBOTS_LINES = st.sampled_from(
    [
        "User-agent: alpha",
        "User-agent: beta",
        "User-agent: *",
        "User-agent: TrainBot",
        "User-agent:",  # empty agent: group boundary, names no one
        "Allow: /a",
        "Allow: /a/b",
        "Allow:",  # blank Allow is a real rule
        "Disallow: /",
        "Disallow: /tmp*",
        "Disallow: /*.x$",
        "Disallow:",  # blank Disallow drops
        "Crawl-delay: 1",
        "Crawl-delay: 2.5",
        "Crawl-delay: -3",  # negative: ignored
        "Crawl-delay: x",  # invalid: ignored
        "Sitemap: https://e.example/s.xml",
        "# a comment line",
        "",
        "garbage without colon",
        "weird-field: value",
    ]
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    bodies=st.lists(
        st.lists(_ROBOTS_LINES, min_size=0, max_size=12), min_size=1, max_size=5
    )
)
def test_rules_and_delays_from_robots_match_driver_parsers(spark, bodies):
    """Randomized parity: the DISTRIBUTED robots readers agree with the
    driver-side parsers on arbitrary line soups — group boundaries,
    empty agents, blank rules, invalid delays, comments, garbage —
    for a specific token and an unknown one ('*' fallback)."""
    from django_indexer_spark.functions import urls

    corpus = {f"h{i}.example": "\n".join(lines) for i, lines in enumerate(bodies)}
    df = spark.createDataFrame(
        list(corpus.items()), "host string, robots_body string"
    )
    for ua in ("TrainBot/9.0", "nobody"):
        got_rules: dict[str, set] = {h: set() for h in corpus}
        for r in urls.rules_from_robots(df, ua).collect():
            got_rules[r["host"]].add((r["path_prefix"], r["allowed"]))
        want_rules = {h: set(urls.parse_robots(b, ua)) for h, b in corpus.items()}
        assert got_rules == want_rules, f"rules mismatch for ua={ua}"

        got_delays = {
            r["host"]: r["delay_s"] for r in urls.delays_from_robots(df, ua).collect()
        }
        want_delays = {}
        for h, b in corpus.items():
            _, d = urls.parse_robots_extras(b, ua)
            if d is not None:
                want_delays[h] = d
        assert got_delays == want_delays, f"delays mismatch for ua={ua}"

    got_sm = {
        (r["host"], r["line_no"], r["sitemap_url"])
        for r in urls.sitemaps_from_robots(df).collect()
    }
    want_sm = set()
    for h, b in corpus.items():
        for i, raw in enumerate(b.split("\n")):
            line = raw.split("#", 1)[0].strip()
            if ":" in line:
                f, v = line.split(":", 1)
                if f.strip().lower() == "sitemap" and v.strip():
                    want_sm.add((h, i, v.strip()))
    assert got_sm == want_sm
