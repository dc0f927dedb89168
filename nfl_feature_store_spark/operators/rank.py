"""Per-period league-style ranks (SURVEY.md §2.5 W7).

The reference computes per-(season, week) descending ranks with pandas
``rank(method='max')`` — a tied group takes the WORST position (verified:
week-5 2023 five-way tie at 15.50 all rank 25) — on a copied frame and
re-joins (event_regular_season_game.py:74-77, J8). In Spark the rank is a
window expression computed in place, no re-join.

``method='max'`` descending == count of rows in the partition with value >=
current, which is exactly ``count(*) OVER (ORDER BY v DESC RANGE UNBOUNDED
PRECEDING TO CURRENT ROW)`` — ties share a RANGE frame so each tied row
counts the whole tied group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def max_rank(value: Column | str, partition_cols: list[str], descending: bool = True) -> Column:
    """pandas ``rank(method='max')`` as a Spark window expression.

    NULL values receive NULL rank (excluded from the count), matching pandas'
    ``rank`` NaN behavior.
    """
    v = F.col(value) if isinstance(value, str) else value
    order = v.desc_nulls_last() if descending else v.asc_nulls_last()
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    return F.when(v.isNotNull(), F.count(v).over(w)).otherwise(F.lit(None)).cast("int")


def composite_rank(
    df: DataFrame,
    metric_cols: list[str],
    period_cols: list[str],
    descending: bool = True,
    weights: list[float] | None = None,
    out_col: str = "composite_rank",
    keep_mean: bool = False,
) -> DataFrame:
    """Multi-metric composite rank (reference ``make_rank_cols``,
    event_regular_season_game.py:74-77: offensive_rank / defensive_rank are
    composites of six sub-metrics; the exact reference weighting is internal
    to its unvendored package, so this specs a crisp rule): per-period
    max-method rank of each metric, weighted mean of the sub-ranks, then the
    max-method ASCENDING rank of that mean — lower mean sub-rank = better
    composite position. All window passes share one (period) partitioning,
    computed in place (no copy-and-re-join, deliberately unlike the
    reference's J8).

    A NULL in any sub-metric yields a NULL composite for that row (NULLs are
    excluded from every rank count, pandas ``rank`` behavior)."""
    subs = [max_rank(m, period_cols, descending) for m in metric_cols]
    wts = weights or [1.0] * len(metric_cols)
    if len(wts) != len(metric_cols):
        raise ValueError(
            f"composite_rank: {len(metric_cols)} metrics but {len(wts)} weights"
        )
    total_w = sum(wts)
    mean_rank: Column = subs[0] * F.lit(wts[0] / total_w)
    for sub, wt in zip(subs[1:], wts[1:]):
        mean_rank = mean_rank + sub * F.lit(wt / total_w)
    df = df.withColumn("__mean_rank", mean_rank)
    out = df.withColumn(out_col, max_rank(F.col("__mean_rank"), period_cols, descending=False))
    return out.withColumnRenamed("__mean_rank", "mean_rank") if keep_mean else out.drop("__mean_rank")


def rank_features(
    df: DataFrame,
    metric_cols: list[str],
    period_cols: list[str],
    descending: bool = True,
    net_pairs: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Attach ``{m}_rank`` per metric over each period partition, plus
    composite ``net_rank``-style means of rank pairs
    (reference: net_rank = (offensive_rank + defensive_rank)/2, verified)."""
    cols = {f"{m}_rank": max_rank(m, period_cols, descending) for m in metric_cols}
    df = df.withColumns(cols)
    for out, (a, b) in (net_pairs or {}).items():
        df = df.withColumn(out, (F.col(a) + F.col(b)) / F.lit(2.0))
    return df
