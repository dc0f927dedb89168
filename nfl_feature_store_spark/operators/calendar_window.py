"""Calendar-anchored rolling mean — the event/team store's verified W4 rule.

Reverse-engineered exactly from /root/reference/data/feature_store/event/**
(tests/test_reference_regression.py::test_w4_event_avg_strict_expanding):
the reference's ``avg_<stat>_{offense,defense}`` at week w is the mean of the
team's last ``w-1`` GAMES (game-indexed, crossing season boundaries — a bye
week makes the window reach one game into the previous season), and at the
team's week-1 it is the mean of the last ``k_max`` games (= 18, one NFL
season of weeks: {last game of s-2} ∪ {all 17 games of s-1}).

SURVEY.md §2.5 originally recorded W4 as a season-partitioned strict
expanding mean; that matches only bye-free prefixes. The golden data wins.

Spark has no per-row dynamic ROWS frame, so the window size k(t) = week-1 is
materialized as running sums + a bounded CASE over lag(S, k) for k in
[1, k_max] — all lags share one window buffer, no join, no shuffle beyond the
entity hash partitioning every other family uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def calendar_rolling_mean(
    df: DataFrame,
    value_col: str,
    period_col: str,
    entity_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
    k_max: int = 18,
    out_col: str | None = None,
) -> DataFrame:
    """mean of the last ``period-1`` rows (or ``k_max`` when period == 1).

    ``period_col`` is the 1-based position in the current calendar period
    (the reference's ``week``); rows are the entity's events ordered by
    ``order_cols`` crossing period boundaries.
    """
    out_col = out_col or f"cal_avg_{value_col}"
    w = Window.partitionBy(entity_col).orderBy(*[F.col(c) for c in order_cols])
    # strictly-past running sums: sum/count of v over rows < t, so the
    # window [t-k, t-1] is S_excl(t) - S_excl(t-k)
    wpast = w.rowsBetween(Window.unboundedPreceding, -1)
    v = F.col(value_col).cast("double")
    s_excl = F.coalesce(F.sum(v).over(wpast), F.lit(0.0))
    c_excl = F.count(v).over(wpast)
    df = df.withColumns({"__s": s_excl, "__c": c_excl})

    # clamp to k_max: periods beyond the lag budget fall back to the widest
    # window (callers pick k_max = max periods per cycle, e.g. 18 NFL weeks)
    k = F.when(F.col(period_col) == 1, F.lit(k_max)).otherwise(
        F.least(F.col(period_col) - 1, F.lit(k_max))
    )

    def case_over_lags(col: str) -> Column:
        """value of ``col`` k rows back (0 when the entity has fewer rows)."""
        expr = F.lit(None)
        for kk in range(1, k_max + 1):
            expr = F.when(k == kk, F.coalesce(F.lag(F.col(col), kk).over(w), F.lit(0))).otherwise(expr)
        return expr

    base_s = case_over_lags("__s")
    base_c = case_over_lags("__c")
    num = F.col("__s") - F.coalesce(base_s, F.lit(0.0))
    den = F.col("__c") - F.coalesce(base_c, F.lit(0)).cast("long")
    return df.withColumn(out_col, F.when(den > 0, num / den)).drop("__s", "__c")
