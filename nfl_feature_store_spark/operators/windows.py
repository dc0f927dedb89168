"""Strictly-past-only window-family compiler — the engine's core.

The reference hardcodes 59 player stats x {last, form_3, season_avg}
(verified semantics: SURVEY.md §2.5 W1-W3, reverse-engineered from
/root/reference/data/feature_store/player/off/** vs data/pump/player/game/**)
and ~190 team metrics x {strict expanding, ewm_10, roll_10} (W4-W6, from
data/feature_store/event/**). This module compiles an arbitrary metric list
into those families as Spark window expressions:

* ``last_{m}``        — ``lag(m, 1)``                                (W1)
* ``form_{m}``        — mean of previous <=3 rows ``rowsBetween(-3,-1)`` (W2;
  the reference's dictionary says window 5, its data says 3 — data wins)
* ``roll{k}_{m}``     — mean of previous <=k rows ``rowsBetween(-k,-1)`` (W6)
* ``expanding_{m}``   — ``avg over rowsBetween(unboundedPreceding, -1)`` (W4,
  the north rule's literal frame)
* ``session_avg_{m}`` — period-anchored expanding mean with the verified
  two-anchor rule (W3): for a non-first turn of session s the window anchors
  at s's first turn; for the FIRST turn of session s it anchors at session
  s-1's first turn (prior-period prior). NULL when no prior turn exists.

Zero temporal leakage is the invariant: every feature at row t is a function
of rows strictly before t. All families share one
``partitionBy(entity).orderBy(ts, turn_idx)`` sort so Catalyst plans a single
exchange; the session-anchored family sub-partitions by (entity, anchor),
which hash-partitioning on entity already satisfies (ClusteredDistribution
subset rule) — one extra sort, no extra shuffle.

Scale notes (10^12 turns): the entity window shuffle is hash(conv_id); skewed
conversations are bounded by max_turns (~5k) so a single window partition is
small — skew handling matters for the rank pass (global per-ts-bucket), not
here. For pathological single-entity streams see operators/salted.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec


@dataclass(frozen=True)
class FeatureSpec:
    """Declarative feature configuration — the engine-level replacement for
    the reference's hardcoded stat lists (reference
    src/pipelines/players/player_regular_season_game.py:17-18 invoking
    WeeklyPlayerStatComponent over its 59-stat list)."""

    entity_col: str = "conv_id"
    order_cols: tuple[str, ...] = ("ts", "turn_idx")
    metrics: tuple[str, ...] = ("chars", "words", "is_tool")
    lag: bool = True
    form_window: int | None = 3
    roll_windows: tuple[int, ...] = (10,)
    expanding: bool = True
    session_anchored: bool = True
    session_col: str = "session_id"
    protected_metrics: tuple[str, ...] = ()  # stay NULL, never zero-filled (P9 analog)


def _entity_window(spec: FeatureSpec) -> WindowSpec:
    return Window.partitionBy(spec.entity_col).orderBy(*[F.col(c) for c in spec.order_cols])


def compile_window_features(df: DataFrame, spec: FeatureSpec = FeatureSpec()) -> DataFrame:
    """Attach every configured window family for every metric.

    Returns the input plus ``last_/form_/roll{k}_/expanding_/session_avg_``
    columns per metric. EWM (W5) and Elo (W9) are sequential recurrences and
    live in operators/ewma.py / operators/elo.py (applyInPandas kernels).
    """
    w = _entity_window(spec)
    cols: dict[str, Column] = {}

    for m in spec.metrics:
        lag1 = F.lag(F.col(m).cast("double"), 1).over(w)
        # materialize the lag once per metric; downstream frames average it
        cols[f"__x_{m}"] = lag1

    df = df.withColumns(cols)
    cols = {}

    for m in spec.metrics:
        x = F.col(f"__x_{m}")
        if spec.lag:
            cols[f"last_{m}"] = x
        if spec.form_window:
            k = spec.form_window
            cols[f"form_{m}"] = F.avg(F.col(m).cast("double")).over(w.rowsBetween(-k, -1))
        for k in spec.roll_windows:
            cols[f"roll{k}_{m}"] = F.avg(F.col(m).cast("double")).over(w.rowsBetween(-k, -1))
        if spec.expanding:
            cols[f"expanding_{m}"] = F.avg(F.col(m).cast("double")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            )

    if spec.session_anchored:
        # Two-anchor rule (W3), verified against the reference's golden data
        # (tests/test_reference_regression.py::test_w3_season_avg_two_anchor,
        # e.g. Mahomes 2023w1 = mean({2021 last game} ∪ all 17 2022 games)):
        # the window for row t runs from the FIRST row of t's period — or of
        # the PREVIOUS period when t is a period's first row — through t,
        # averaging the lag-1 series x. Membership always includes
        # intermediate first-of-period rows (whose x is the prior period's
        # last value), so this is NOT a disjoint grouping: implement as
        # running-sum differences, base carried across the period boundary
        # with one lag — two window partitionings, zero joins.
        wrun = w.rowsBetween(Window.unboundedPreceding, 0)
        ws = Window.partitionBy(spec.entity_col, spec.session_col).orderBy(
            *[F.col(c) for c in spec.order_cols]
        )
        is_first = F.row_number().over(ws) == 1
        df = df.withColumns(
            {
                f"__sincl_{m}": F.coalesce(F.sum(f"__x_{m}").over(wrun), F.lit(0.0))
                for m in spec.metrics
            }
            | {f"__cincl_{m}": F.count(f"__x_{m}").over(wrun) for m in spec.metrics}
        )
        excl = {}
        for m in spec.metrics:
            excl[f"__sexcl_{m}"] = F.col(f"__sincl_{m}") - F.coalesce(F.col(f"__x_{m}"), F.lit(0.0))
            excl[f"__cexcl_{m}"] = F.col(f"__cincl_{m}") - F.col(f"__x_{m}").isNotNull().cast("long")
        df = df.withColumns(excl)
        for m in spec.metrics:
            base_s_cur = F.first(f"__sexcl_{m}").over(ws.rowsBetween(Window.unboundedPreceding, 0))
            base_c_cur = F.first(f"__cexcl_{m}").over(ws.rowsBetween(Window.unboundedPreceding, 0))
            # at a period's first row, the previous row (entity order) is the
            # last row of the prior period and carries that period's base
            base_s = F.when(is_first, F.lag(base_s_cur, 1).over(w)).otherwise(base_s_cur)
            base_c = F.when(is_first, F.lag(base_c_cur, 1).over(w)).otherwise(base_c_cur)
            num = F.col(f"__sincl_{m}") - F.coalesce(base_s, F.lit(0.0))
            den = F.col(f"__cincl_{m}") - F.coalesce(base_c, F.lit(0))
            cols[f"session_avg_{m}"] = F.when(den > 0, num / den)

    df = df.withColumns(cols)
    aux = []
    for m in spec.metrics:
        aux += [f"__x_{m}", f"__sincl_{m}", f"__cincl_{m}", f"__sexcl_{m}", f"__cexcl_{m}"]
    return df.drop(*aux)
