"""Per-turn metric derivation — the transcript analog of the reference's
"pump" stat lanes (reference src/pumps/player_game.py:133-150,205-224:
group-agg lanes producing per-entity-period numeric stats).

Transcript grain is already one row per turn, so lanes reduce to pure column
expressions — JVM-side, whole-stage-codegen'd, no UDFs (SURVEY.md §2.10
policy: row `.apply` logic is banned, everything here is expressible as
column algebra like the reference's P7/P8/F3-F5 scalar functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# canonical metric columns every window family runs over (FIXTURES.md F2)
METRIC_COLS = ("chars", "words", "is_tool")


def with_turn_metrics(df: DataFrame) -> DataFrame:
    """Derive per-turn metrics from the raw transcript columns.

    * ``chars`` — length(text)               (analog of yards_gained-style stats)
    * ``words`` — whitespace token count
    * ``is_tool`` — tool-use indicator        (analog of boolean-masked cond. sums,
      reference src/pumps/player_game.py:141-148)
    * ``is_user`` / ``is_assistant`` — role one-hots (F.when chains, P7 analog)
    """
    txt = F.coalesce(F.col("text"), F.lit(""))
    return df.withColumns(
        {
            "chars": F.length(txt).cast("int"),
            "words": F.when(F.length(F.trim(txt)) == 0, F.lit(0))
            .otherwise(F.size(F.split(F.trim(txt), r"\s+")))
            .cast("int"),
            "is_tool": (F.coalesce(F.col("tool"), F.lit("")) != "").cast("int"),
            "is_user": (F.col("role") == "user").cast("int"),
            "is_assistant": (F.col("role") == "assistant").cast("int"),
        }
    )


def masked_zero_fill(df: DataFrame, protected: tuple[str, ...] = ()) -> DataFrame:
    """P9 analog (reference src/pumps/player_game.py:196-200,313-322,462-466,
    526-535): zero-fill NULLs in every numeric column EXCEPT a protected set
    whose NULLs are semantic ('no history yet' — the reference keeps its
    EPA family NaN while zero-filling all other stats)."""
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("integer", "long", "double", "float", "short")
    }
    fill = sorted(numeric - set(protected))
    return df.fillna(0, subset=fill) if fill else df


def dedup_latest(
    df: DataFrame,
    entity_col: str = "conv_id",
    turn_col: str = "turn_idx",
    order_col: str = "ts",
) -> DataFrame:
    """Duplicate-delivery dedup: keep the latest ``ts`` per ``(conv_id, turn_idx)``.

    FIXTURES.md F6 edge case; must run before any window family so strictly-
    past frames never see a turn twice.

    Deliberately windowed on ``partitionBy(entity)`` ONLY (ordered by
    (turn, ts); a row survives iff the next row is a different turn): hash
    partitioning on (entity, turn) would NOT satisfy the downstream window
    families' ClusteredDistribution(entity) and would force a second
    exchange. With the entity-only window the whole per-entity pipeline
    (dedup → sessionize → lag/rolling/expanding families) rides ONE shuffle
    — verified in the physical plan (a single Exchange hashpartitioning(conv_id)).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(entity_col).orderBy(F.col(turn_col), F.col(order_col))
    nxt = F.lead(F.col(turn_col), 1).over(w)
    return (
        df.withColumn("__next_turn", nxt)
        .filter(F.col("__next_turn").isNull() | (F.col("__next_turn") != F.col(turn_col)))
        .drop("__next_turn")
    )
