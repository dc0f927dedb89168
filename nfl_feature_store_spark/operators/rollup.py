"""Multi-granularity time rollup — the "hypertable rollup" shape: one scan
produces per-entity aggregates at every requested time grain via GROUPING
SETS (a single shuffle; Catalyst expands the sets map-side, so each input
row is aggregated once per grain without re-scanning).

The reference materializes exactly one grain (season files,
feature_store_runner.py:54-55); a transcript store wants hour/day/week
rollups of the same stream for dashboards and drift monitors — this is the
operator that serves them from one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_GRAINS = ("hour", "day", "week")


def time_rollup(
    df: DataFrame,
    value_aggs: dict[str, Column],
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    grains: tuple[str, ...] = DEFAULT_GRAINS,
) -> DataFrame:
    """One-pass multi-grain rollup.

    ``value_aggs`` maps output names to aggregate Columns (e.g.
    ``{"n_turns": F.count("*"), "total_chars": F.sum("chars")}``). Returns
    one row per (entity, grain, bucket_start) with the aggregates; ``grain``
    is a label column, ``bucket_start`` the truncated timestamp of that
    grain's bucket.
    """
    ts = F.col(ts_col).cast("timestamp")
    grain_cols = {f"__g_{g}": F.date_trunc(g, ts) for g in grains}
    tagged = df.withColumns(grain_cols)
    sets = [[entity_col, f"__g_{g}"] for g in grains]
    # GROUPING() — not __g_* NULL-ness — identifies each row's grain, so rows
    # whose ts is NULL (every date_trunc NULL) still label their grain and
    # bucket correctly, matching the GROUPING()-based DuckDB oracle (Q48).
    # grouping() is only legal in the aggregate list, so the flags ride along.
    agged = tagged.groupingSets(sets, entity_col, *grain_cols.keys()).agg(
        *[c.alias(n) for n, c in value_aggs.items()],
        *[F.grouping(f"__g_{g}").alias(f"__on_{g}") for g in grains],
    )
    grain_label = F.coalesce(
        *[F.when(F.col(f"__on_{g}") == 0, F.lit(g)) for g in grains]
    )
    bucket = F.coalesce(
        *[F.when(F.col(f"__on_{g}") == 0, F.col(f"__g_{g}")) for g in grains]
    )
    return agged.select(
        entity_col,
        grain_label.alias("grain"),
        bucket.alias("bucket_start"),
        *value_aggs.keys(),
    )
