"""Subtitle/caption parsing and frame alignment (video-text pairs).

A video-text training pipeline needs (frame, caption) pairs: captions
ship as SRT or WebVTT sidecar files, frames come from
``multimodal.sample_frames``'s real mvhd timestamps. Both steps stay
JVM-side:

- ``caption_cues`` parses SRT/VTT into (cue_idx, start_s, end_s, text)
  rows with NO UDF — blank-line split → posexplode → regexp_extract →
  timestamp arithmetic, all whole-stage codegen (the html_to_text rule:
  once-per-document parsing never enters Python);
- ``align_frames_to_captions`` interval-joins sampled frames into their
  covering cue (equi-join on media_id + range predicate — the J6
  interval-join family's shape; captions per video are tiny, so the
  per-key range scan is bounded).

Format notes (public specs): SRT cues are ``idx\\n
HH:MM:SS,mmm --> HH:MM:SS,mmm\\ntext...`` separated by blank lines;
WebVTT adds a ``WEBVTT`` header, optional cue ids, ``.`` millisecond
separators, optional hours, and cue settings after the arrow — the
timestamp regex accepts both dialects, and non-cue blocks (headers,
NOTE comments) simply extract no timestamp and are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# (hh:)?mm:ss(,|.)mmm --> same, tolerating cue settings after the arrow;
# WebVTT permits 2+ digit hours (100h+ livestream archives — round-10
# ADVICE), so the hours group takes up to 4 digits; the arrow-line
# anchor keeps the wider group unambiguous
_TS = r"(?:(\d{1,4}):)?(\d{1,2}):(\d{2})[.,](\d{3})"
_TS_PAIR_RE = rf"^\s*{_TS}\s*-->\s*{_TS}"


def _seconds(h, m, s, ms):
    return (
        F.coalesce(h.cast("double"), F.lit(0.0)) * 3600.0
        + m.cast("double") * 60.0
        + s.cast("double")
        + ms.cast("double") / 1000.0
    )


def caption_cues(df: DataFrame, id_col: str = "media_id", text_col: str = "captions") -> DataFrame:
    """Parse SRT/WebVTT caption documents into one row per cue:
    (id, cue_idx, start_s, end_s, text). Pure Column expressions —
    split on blank lines, posexplode, extract the timestamp pair, drop
    blocks without one (WEBVTT headers, NOTE comments, trailing
    blanks). Cue text keeps its internal newlines collapsed to single
    spaces while whitespace runs WITHIN a line survive verbatim (they
    are cue formatting, not noise); a timestamp line with no text lines
    after it emits an empty-text cue — the timestamps are data."""
    # Split each block into lines ONCE, find the (short) arrow line, and
    # run the timestamp regex over that line only — extracting 9 groups
    # straight off the whole block would re-run the full-block regex per
    # group (Catalyst doesn't CSE regexp_extract calls), a ~9x cost
    # multiplier in the once-per-document path (review finding).
    blocks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), r"\r?\n\s*\r?\n")).alias("block_idx", "block"),
    )
    lined = blocks.select(
        "id",
        "block_idx",
        F.split("block", r"\r?\n").alias("lines"),
    ).select(
        "id",
        "block_idx",
        "lines",
        # try_element_at: blocks WITHOUT an arrow line (WEBVTT headers,
        # NOTE comments) filter to an empty array — plain element_at
        # throws on index 1 there instead of returning null
        F.try_element_at(
            F.filter("lines", lambda ln: ln.contains("-->")), F.lit(1)
        ).alias("arrow"),
    )
    ext = (
        lined.filter(F.col("arrow").isNotNull())
        .select(
            "id",
            "block_idx",
            "lines",
            F.array_position("lines", F.col("arrow")).alias("arrow_pos"),
            *[
                F.regexp_extract("arrow", _TS_PAIR_RE, g).alias(f"g{g}")
                for g in range(1, 9)
            ],
        )
        .filter(F.col("g2") != "")
    )
    cues = ext.select(
        "id",
        "block_idx",
        _seconds(
            F.nullif(F.col("g1"), F.lit("")), F.col("g2"), F.col("g3"), F.col("g4")
        ).alias("start_s"),
        _seconds(
            F.nullif(F.col("g5"), F.lit("")), F.col("g6"), F.col("g7"), F.col("g8")
        ).alias("end_s"),
        # per-line trim + single-space join: collapses whitespace AROUND
        # the original newlines only — runs of spaces WITHIN a line
        # (karaoke/alignment formatting) are cue content and must
        # survive verbatim (review finding); empty interior lines can't
        # occur (blocks split on blank lines)
        F.array_join(
            F.filter(
                F.transform(
                    F.slice(
                        "lines",
                        F.col("arrow_pos") + 1,
                        F.greatest(
                            F.size("lines") - F.col("arrow_pos"), F.lit(0)
                        ),
                    ),
                    lambda ln: F.trim(ln),
                ),
                lambda ln: ln != "",
            ),
            " ",
        ).alias("text"),
    )
    w = F.row_number().over(Window.partitionBy("id").orderBy("block_idx"))
    return (
        cues.withColumn("cue_idx", (w - 1).cast("int"))
        .select(
            F.col("id").alias(id_col), "cue_idx", "start_s", "end_s", "text"
        )
    )


def align_frames_to_captions(frames: DataFrame, cues: DataFrame) -> DataFrame:
    """(frame, caption) training pairs: each sampled frame joins the cue
    covering its timestamp (start_s <= ts_s < end_s) on the same media —
    frames with no covering cue survive with a null caption (left join:
    silent stretches are data, not errors)."""
    c = cues.select(
        F.col("media_id").alias("__cid"),
        "cue_idx",
        "start_s",
        "end_s",
        F.col("text").alias("caption"),
    )
    return frames.join(
        c,
        (frames["media_id"] == c["__cid"])
        & (frames["ts_s"] >= c["start_s"])
        & (frames["ts_s"] < c["end_s"]),
        "left",
    ).select(
        frames["media_id"], "frame_idx", "ts_s", "cue_idx", "caption", "frame_payload"
    )
