"""Scalar column functions (SURVEY.md §2.8) — pure expressions, no UDFs.

The reference applies these per-row via ``.apply`` (banned here, §2.10):
F1 ``decode_gsis`` (reference src/pumps/player_game.py:23-31,57-62),
F2 ``calculate_success_points`` (:65-105 — dead code in the reference's
runner, implemented for surface parity), F4 fantasy linear form (:538-548).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decode_hex_id(col: Column | str, expected_len: int = 36) -> Column:
    """F1 analog of ``decode_gsis`` (reference src/pumps/player_game.py:23-31):
    for a length-36 ID, take ``new_id[4:-8]`` (24 chars), strip dashes, and
    hex-pair-decode the remaining 20 hex chars back to a 10-char ID; IDs of
    any other length pass through unchanged (the reference's length guard).

    Pure column algebra: substring + regexp_replace + unhex + decode — the
    reference does this per-row in Python."""
    c = F.col(col) if isinstance(col, str) else col
    # [4:-8] == 1-based substring(5, expected_len - 12); dashes inside the
    # span are stripped before hex decoding, exactly as the reference does
    span = F.substring(c, 5, expected_len - 12)
    decoded = F.decode(F.unhex(F.regexp_replace(span, "-", "")), "UTF-8")
    return F.when(F.length(c) == expected_len, decoded).otherwise(c)


def success_points(
    down: Column | str,
    ydstogo: Column | str,
    yards_gained: Column | str,
    turnover: Column | str,
) -> Column:
    """F2 analog: piecewise per-event success score — fraction of the
    needed distance gained (threshold 1/2 on early downs, 1 on late),
    clamped to [0, 1], +1 big-play bonus (>=20), -1 turnover penalty.
    F.when chain + least/greatest, mirroring the reference's dead-code
    semantics as column expressions."""
    d = F.col(down) if isinstance(down, str) else down
    togo = (F.col(ydstogo) if isinstance(ydstogo, str) else ydstogo).cast("double")
    gain = (F.col(yards_gained) if isinstance(yards_gained, str) else yards_gained).cast("double")
    to = (F.col(turnover) if isinstance(turnover, str) else turnover).cast("int")
    needed = F.when(d <= 2, togo / 2.0).otherwise(togo)
    frac = F.when(needed > 0, gain / needed).otherwise(F.lit(1.0))
    base = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    bonus = F.when(gain >= 20, F.lit(1.0)).otherwise(F.lit(0.0))
    penalty = F.when(to == 1, F.lit(-1.0)).otherwise(F.lit(0.0))
    return base + bonus + penalty


def linear_score(terms: dict[str, float]) -> Column:
    """F4 analog: weighted linear form over stat columns (the reference's
    fantasy-points formula shape)."""
    expr = F.lit(0.0)
    for col, w in terms.items():
        expr = expr + F.coalesce(F.col(col).cast("double"), F.lit(0.0)) * F.lit(w)
    return expr
