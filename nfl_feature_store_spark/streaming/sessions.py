"""Structured Streaming sessionization (SURVEY.md §2.9).

The reference is batch-only (daily cron,
reference .github/workflows/feature_store_data_trigger.yaml:5-6); the north
rule adds streaming ingestion of late/duplicate turns. This is the
``session_window`` + watermark form of the batch sessionizer in
operators/sessionize.py — same gap semantics, incremental state.

Late turns older than the watermark are dropped by the state store;
duplicate turn deliveries within the watermark collapse via
``dropDuplicatesWithinWatermark`` on ``(conv_id, turn_idx)`` before the
session window. Streaming dedup keeps the FIRST delivery seen (the state
store has no retraction), a documented deviation from the batch
``dedup_latest`` which keeps the latest-``ts`` copy; the two agree whenever
re-deliveries carry identical payloads (the at-least-once transport case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_aggregates(
    turns: DataFrame,
    gap_s: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per (conv_id, session) streaming aggregates over a gap-based session
    window. ``turns`` must be a streaming DataFrame with the canonical
    transcript schema; output mode 'append' emits a session once the
    watermark passes its close. Duplicate ``(conv_id, turn_idx)`` deliveries
    inside the watermark are collapsed (keep-first) so re-delivered turns
    don't inflate ``n_turns``/``total_chars``.
    """
    deduped = turns.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )
    sess = deduped.groupBy(
        F.col("conv_id"),
        F.session_window(F.col("ts"), f"{gap_s} seconds").alias("session"),
    ).agg(
        F.count("*").alias("n_turns"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("total_chars"),
        F.sum((F.coalesce(F.col("tool"), F.lit("")) != "").cast("int")).alias("n_tool_turns"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
    return sess.select(
        "conv_id",
        F.col("session.start").alias("window_start"),
        F.col("session.end").alias("window_end"),
        "n_turns",
        "total_chars",
        "n_tool_turns",
        "session_start",
        "session_end",
    )
