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

# (hh:)?mm:ss(,|.)mmm --> same, tolerating cue settings after the arrow
_TS = r"(?:(\d{1,2}):)?(\d{1,2}):(\d{2})[.,](\d{3})"
# optional id line = any first line WITHOUT an arrow (SRT numeric ids,
# VTT free-text cue ids)
_CUE_RE = rf"(?s)^\s*(?:(?:(?!-->)[^\r\n])*\r?\n)?\s*{_TS}\s*-->\s*{_TS}[^\r\n]*\r?\n(.*)$"


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
    blanks). Cue text keeps its internal newlines collapsed to spaces
    (the downstream tokenizers' expectation)."""
    blocks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), r"\r?\n\s*\r?\n")).alias("block_idx", "block"),
    )
    ext = blocks.select(
        "id",
        "block_idx",
        *[
            F.regexp_extract("block", _CUE_RE, g).alias(f"g{g}")
            for g in range(1, 10)
        ],
    ).filter(F.col("g2") != "")
    cues = ext.select(
        "id",
        "block_idx",
        _seconds(
            F.nullif(F.col("g1"), F.lit("")), F.col("g2"), F.col("g3"), F.col("g4")
        ).alias("start_s"),
        _seconds(
            F.nullif(F.col("g5"), F.lit("")), F.col("g6"), F.col("g7"), F.col("g8")
        ).alias("end_s"),
        F.trim(F.regexp_replace("g9", r"\s*\r?\n\s*", " ")).alias("text"),
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
