"""Gap-based sessionizer (SURVEY.md §2.9 — the north rule's addition; the
reference has no streaming/session concept, its period key is the given
(season, week)).

Batch form: a session boundary is a turn whose gap from the previous turn of
the same conversation exceeds ``gap_s``; ``session_id`` is the running count
of boundaries — one window pass, same (entity, order) shuffle the feature
families reuse. The streaming form lives in
``nfl_feature_store_spark.streaming.sessions`` (``F.session_window`` +
watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_GAP_S = 1800


def sessionize(
    df: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
    gap_s: int = DEFAULT_GAP_S,
    out_col: str = "session_id",
) -> DataFrame:
    """Assign 0-based ``session_id`` per entity; also emits ``gap_secs``.

    ``gap_secs`` is the W8 'rest' analog (reference event_feature_store.md:28,
    week-1 rows default): seconds since the entity's previous turn, 0 at the
    first turn.
    """
    w = Window.partitionBy(entity_col).orderBy(*[F.col(c) for c in order_cols])
    # cast via TIMESTAMP so TIMESTAMP_NTZ parquet columns (pandas-written)
    # also yield epoch seconds; session tz is UTC so the two types agree
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch, 1).over(w)
    df = df.withColumn("gap_secs", F.coalesce(gap, F.lit(0)).cast("long"))
    boundary = F.when(F.col("gap_secs") > gap_s, F.lit(1)).otherwise(F.lit(0))
    running = Window.partitionBy(entity_col).orderBy(*[F.col(c) for c in order_cols]).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(out_col, F.sum(boundary).over(running).cast("int"))
