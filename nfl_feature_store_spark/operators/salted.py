"""Salted window computation for pathologically hot entities
(SURVEY.md §4.2.2, §7.4.3).

Normal conversations are bounded (~10^3 turns) so hash(conv_id) windows are
safe; a corpus can still contain degenerate single-entity streams (a bot
conversation with 10^9 turns) that would pin one executor. These operators
compute strictly-past running aggregates for such streams with bounded
per-task state:

1. range-split each entity's rows into up to ``n_salt`` contiguous ts-ranges.
   The salt comes from ``percentile_approx`` boundaries on ts — a
   partial-aggregatable sketch (GK quantiles, map-side combine) broadcast
   back and assigned by comparison. NO window over the unsalted entity is
   ever evaluated, so the hot entity never funnels through one task (the
   round-1 ntile implementation did exactly that and was flagged; this is
   the fix).
2. per (entity, salt) compute partial running state within the chunk — the
   heavy, parallel stage;
3. a tiny per-chunk summary table (<= n_salt rows/entity) is window-scanned
   to produce each chunk's carry-in (prior chunks' sums/counts, last-k rows,
   or EWM state);
4. broadcast the carries back and finalize per row.

Exactness: results equal the unsalted computation up to float summation
order — carries add CHUNK subtotals where the unsalted window adds rows
left-to-right, so doubles can differ in the last ulp (property-tested at
rtol 1e-12; integer-valued metrics are bit-identical because integer sums
are exact in float64).

Multi-pass note: the boundary/densify/summary branches each re-derive from
the source rather than caching the salted stream — Catalyst column-prunes
every auxiliary pass down to (entity, ts[, value]) (verified in the q36
executed plan: aux ReadSchemas carry 2-3 columns), and re-scanning a few
narrow columns beats materializing a 10^9-row hot stream in memory. Exchange
reuse is impossible here by construction (pruning specializes each branch's
subtree), so the recompute is deliberate, not an oversight.

Three families, mirroring the north rule's window set:

* :func:`salted_expanding_mean` — rowsBetween(unboundedPreceding, -1) mean;
  carry = (sum, count) of prior chunks.
* :func:`salted_rolling_mean` — rowsBetween(-k, -1) mean; carry = the last
  ``k`` rows of the previous chunk, shipped as warm-up rows and dropped
  after the window. Requires chunks longer than ``k`` (ranges of a hot
  entity are >> k by construction; asserted in the property test).
* :func:`salted_ewm` — span-EWM (adjust=False) of the lag-1 series, the
  operators/ewma.py semantics; carry = closed-form state merge
  ``e_chunk_start = (1-a)^{n_prior_updates} * seed + p_prior`` where ``p``
  is each chunk's zero-seeded partial EWM (the merge identity from
  ewma.py's docstring, now implemented).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _order_cols(order_cols: tuple[str, ...]) -> list[F.Column]:
    return [F.col(c) for c in order_cols]


def assign_range_salt(
    df: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    n_salt: int = 32,
    salt_col: str = "__salt",
    accuracy: int = 10000,
) -> DataFrame:
    """Attach a contiguous range-salt in [0, n_salt) per entity, derived from
    approximate ts quantiles — no global per-entity sort.

    ``percentile_approx`` is an ordinary aggregate (partial + merge), so the
    boundary computation parallelizes like any groupBy; boundaries are
    broadcast back and the salt is ``#{boundaries < ts}``. Rows with equal ts
    always share a salt, so chunk ranges stay contiguous in (ts, tie-break)
    order — the property every carry merge below relies on.

    Boundary ties can leave raw salt values with gaps (short entities hit
    this), so salts are densified to consecutive ranks per entity via a
    window over the tiny distinct (entity, salt) table — the rolling carry
    relies on "previous chunk == salt - 1".
    """
    ts_num = F.unix_micros(F.col(ts_col).cast("timestamp"))
    pcts = [i / n_salt for i in range(1, n_salt)]
    bounds = (
        df.select(entity_col, ts_num.alias("__ts_num"))
        .groupBy(entity_col)
        .agg(F.percentile_approx("__ts_num", pcts, accuracy).alias("__bounds"))
    ).withColumnRenamed(entity_col, "__ent_b")
    # null-safe joins: a NULL entity is its own partition in the unsalted
    # window semantics and must survive salting too
    out = df.join(F.broadcast(bounds), F.col(entity_col).eqNullSafe(F.col("__ent_b"))).drop("__ent_b")
    salt = F.size(F.filter(F.col("__bounds"), lambda b: b < ts_num))
    out = out.withColumn("__raw_salt", salt).drop("__bounds")
    present = out.select(entity_col, "__raw_salt").distinct()
    w = Window.partitionBy(entity_col).orderBy("__raw_salt")
    dense = present.withColumn(salt_col, (F.dense_rank().over(w) - 1).cast("int")).select(
        F.col(entity_col).alias("__ent_d"), F.col("__raw_salt").alias("__rs_d"), salt_col
    )
    cond = F.col(entity_col).eqNullSafe(F.col("__ent_d")) & (F.col("__raw_salt") == F.col("__rs_d"))
    return out.join(F.broadcast(dense), cond).drop("__ent_d", "__rs_d", "__raw_salt")


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
    entity. Exact up to float summation order for any entity; worth its
    extra shuffle only for entities too hot for a single task."""
    out_col = out_col or f"salted_expanding_{value_col}"
    v = F.col(value_col).cast("double")

    # 1. contiguous range-salt from broadcast approx-quantile boundaries
    salted = assign_range_salt(df, entity_col, order_cols[0], n_salt)

    # 2. per-chunk strictly-past partials — the heavy stage, (entity, salt) fan-out
    w_chunk = Window.partitionBy(entity_col, "__salt").orderBy(*_order_cols(order_cols))
    wp = w_chunk.rowsBetween(Window.unboundedPreceding, -1)
    salted = salted.withColumns(
        {
            "__psum": F.coalesce(F.sum(v).over(wp), F.lit(0.0)),
            "__pcnt": F.count(v).over(wp),
        }
    )

    # 3. tiny per-chunk totals → carry-in per chunk (<= n_salt rows per entity)
    chunk_totals = salted.groupBy(entity_col, "__salt").agg(
        F.coalesce(F.sum(v), F.lit(0.0)).alias("__csum"), F.count(v).alias("__ccnt")
    )
    w_carry = (
        Window.partitionBy(entity_col)
        .orderBy("__salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = chunk_totals.select(
        F.col(entity_col).alias("__ent_c"),
        F.col("__salt").alias("__salt_c"),
        F.coalesce(F.sum("__csum").over(w_carry), F.lit(0.0)).alias("__carry_sum"),
        F.coalesce(F.sum("__ccnt").over(w_carry), F.lit(0)).alias("__carry_cnt"),
    )

    # 4. broadcast carries back (null-safe on entity) and finalize
    cond = F.col(entity_col).eqNullSafe(F.col("__ent_c")) & (F.col("__salt") == F.col("__salt_c"))
    out = salted.join(F.broadcast(carries), cond)
    total_cnt = F.col("__pcnt") + F.col("__carry_cnt")
    total_sum = F.col("__psum") + F.col("__carry_sum")
    return out.withColumn(
        out_col, F.when(total_cnt > 0, total_sum / total_cnt)
    ).drop("__salt", "__psum", "__pcnt", "__carry_sum", "__carry_cnt", "__ent_c", "__salt_c")


def salted_rolling_mean(
    df: DataFrame,
    value_col: str,
    k: int = 10,
    entity_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
    n_salt: int = 32,
    out_col: str | None = None,
) -> DataFrame:
    """Strictly-past rolling-k mean (rowsBetween(-k, -1), min_periods=1)
    under (entity, salt) parallelism.

    Carry = the previous chunk's last ``k`` rows, re-tagged into the next
    chunk as warm-up rows (they sort first — their ts range is earlier by
    construction) and dropped after the window. CONTRACT: every chunk except
    an entity's last must hold >= k rows, i.e. pick ``n_salt <= n_rows / k``
    — trivially true for the hot entities this operator exists for. The
    contract is ENFORCED at execution: a violating chunk fails the job with
    guidance instead of silently under-filling windows (round-2 review
    finding), via an assert_true over a broadcast chunk-size table.
    """
    out_col = out_col or f"salted_roll{k}_{value_col}"
    v = F.col(value_col).cast("double")

    salted = assign_range_salt(df, entity_col, order_cols[0], n_salt).withColumn(
        "__warm", F.lit(False)
    )

    # tiny (entity, salt) size table -> runtime contract check, no extra job:
    # assert_true evaluates per row during the main pass
    sizes = salted.groupBy(entity_col, "__salt").agg(F.count("*").alias("__csize"))
    w_ent = Window.partitionBy(entity_col)
    # a chunk must hold >= k rows only when a LATER chunk warm-starts from it
    # AND earlier history exists beyond it: the first chunk is always a
    # complete history for chunk 1, and the last chunk feeds nobody
    sizes = sizes.withColumn("__max_salt", F.max("__salt").over(w_ent)).select(
        F.col(entity_col).alias("__ent_s"),
        F.col("__salt").alias("__salt_s"),
        (
            (F.col("__salt") == 0)
            | (F.col("__salt") == F.col("__max_salt"))
            | (F.col("__csize") >= k)
        ).alias("__chunk_ok"),
    )
    guard_cond = F.col(entity_col).eqNullSafe(F.col("__ent_s")) & (F.col("__salt") == F.col("__salt_s"))
    guard = F.assert_true(
        F.col("__chunk_ok"),
        F.lit(
            f"salted_rolling_mean: a non-final chunk holds < k={k} rows; "
            "lower n_salt (need n_salt <= n_rows/k per entity) or use the "
            "plain rolling window for small entities"
        ),
    )
    salted = (
        salted.join(F.broadcast(sizes), guard_cond)
        .filter(guard.isNull())  # assert_true: NULL on pass, throws on violation
        .drop("__ent_s", "__salt_s", "__chunk_ok")
    )

    # previous chunk's last k rows -> warm-up rows of chunk __salt+1
    w_desc = Window.partitionBy(entity_col, "__salt").orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    warmups = (
        salted.withColumn("__rn_end", F.row_number().over(w_desc))
        .filter(F.col("__rn_end") <= k)
        .drop("__rn_end")
        .withColumn("__salt", F.col("__salt") + 1)
        .withColumn("__warm", F.lit(True))
    )
    unioned = salted.unionByName(warmups)

    w_chunk = (
        Window.partitionBy(entity_col, "__salt")
        .orderBy(*_order_cols(order_cols))
        .rowsBetween(-k, -1)
    )
    out = unioned.withColumn(out_col, F.avg(v).over(w_chunk))
    return out.filter(~F.col("__warm")).drop("__salt", "__warm")


# --------------------------------------------------------------- salted EWM


def salted_ewm(
    df: DataFrame,
    value_col: str,
    span: int = 10,
    entity_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
    n_salt: int = 32,
    out_col: str | None = None,
) -> DataFrame:
    """Span-EWM (adjust=False) of the LAG-1 value series — operators/ewma.py
    semantics — under (entity, salt) parallelism.

    Decomposition (the ewma.py docstring's merge identity, implemented):
    with ``a = 2/(span+1)`` and the recursion ``e <- (1-a)e + a*x`` applied at
    every non-null lagged value, a chunk maps carry-in ``C`` to
    ``e_t = (1-a)^{u_t} * C + p_t`` where ``u_t`` counts the chunk's updates
    up to row t and ``p_t`` is the chunk's ZERO-seeded partial EWM. Pandas'
    first-value seeding is equivalent to ``C_1 = x_first`` (the entity's
    first value), since ``(1-a)x + ax = x``. So:

    * heavy stage (parallel per chunk): compute ``p_t``/``u_t`` with one
      vectorized pandas ewm over the chunk (seed-0 via a virtual leading 0);
    * tiny stage: sequential scan of the <= n_salt chunk summaries per entity
      (applyInPandas) yields each chunk's carry ``C_c`` and prior-update
      count ``U_c``;
    * finalize: ``e = (1-a)^{u} * C + p`` per row, NULL while no update has
      ever happened (pandas' leading NaNs).

    ``(1-a)^{u}`` underflows to 0.0 for huge chunks, which is the
    mathematically correct limit (old state decays away). Requires non-null
    ``value_col`` (the engine's turn metrics are non-null by construction).
    """
    out_col = out_col or f"salted_ewma_{value_col}"
    alpha = 2.0 / (span + 1.0)
    order = list(order_cols)

    salted = assign_range_salt(df, entity_col, order_cols[0], n_salt)

    # lag-1 within chunk; the chunk's first row takes the previous chunk's
    # last value via the summary join below (NULL for the first chunk)
    in_schema = salted.schema
    heavy_schema = T.StructType(
        list(in_schema.fields)
        + [
            T.StructField("__p", T.DoubleType(), True),
            T.StructField("__u", T.LongType(), False),
        ]
    )

    def heavy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values([entity_col, "__salt"] + order, kind="mergesort", ignore_index=True)
        g = pdf.groupby([entity_col, "__salt"], sort=False)
        lagged = g[value_col].shift(1).astype("float64")
        mask = lagged.notna()
        # zero-seeded partial EWM over the non-null lagged values, vectorized:
        # ewm(adjust=False) seeds at the first value; a virtual leading 0 per
        # chunk turns that seed into the 0-seeded recursion. Implemented by
        # ewm on the compacted non-null series with init handled closed-form:
        # p_i = (1-a) p_{i-1} + a x_i  ==  ewm(adjust=False) over [0, x...]
        x = lagged[mask]
        grp_keys = [pdf.loc[mask, entity_col], pdf.loc[mask, "__salt"]]
        if len(x):
            p_raw = x.groupby(grp_keys, sort=False).ewm(alpha=alpha, adjust=False).mean()
            p_raw.index = p_raw.index.get_level_values(-1)
            # pandas seeded e_1 = x_1; zero-seeded wants a*x_1: correct the
            # whole series by the decayed seeding error (x_1 - a*x_1)*(1-a)^{i-1}
            first_x = x.groupby(grp_keys, sort=False).transform("first")
            upd_idx = x.groupby(grp_keys, sort=False).cumcount()
            p = p_raw - (first_x * (1.0 - alpha)) * np.power(1.0 - alpha, upd_idx.to_numpy())
        else:
            p = x
        u_in = mask.groupby([pdf[entity_col], pdf["__salt"]], sort=False).cumsum()
        pdf["__p"] = p.reindex(pdf.index)
        # non-update rows keep the previous update's p (0.0 before any update)
        pdf["__p"] = (
            pdf.groupby([entity_col, "__salt"], sort=False)["__p"].ffill().fillna(0.0)
        )
        pdf["__u"] = u_in.astype("int64")
        yield pdf

    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    clustered = salted.repartition(n, entity_col, F.col("__salt")).sortWithinPartitions(
        entity_col, "__salt", *order
    )
    heavy_df = clustered.mapInPandas(heavy, schema=heavy_schema)

    # tiny per-chunk summaries: end state + last raw value (next chunk's lag-1)
    order_struct = F.struct(*_order_cols(order_cols))
    summaries = heavy_df.groupBy(entity_col, "__salt").agg(
        F.max_by("__p", order_struct).alias("p_end"),
        F.max("__u").alias("u_end"),
        F.max_by(F.col(value_col).cast("double"), order_struct).alias("last_val"),
        F.min_by(F.col(value_col).cast("double"), order_struct).alias("first_val"),
    )

    ent_type = df.schema[entity_col].dataType.simpleString()
    carry_schema = f"{entity_col} {ent_type}, __salt int, __carry double, __carry_updates long"

    def carry_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__salt", ignore_index=True)
        n_rows = len(pdf)
        carry = np.empty(n_rows)
        carry_updates = np.zeros(n_rows, dtype="int64")
        # pandas-equivalent seeding: C_1 = first value of the entity
        c = float(pdf.loc[0, "first_val"])
        u_total = 0
        for i in range(n_rows):
            carry[i] = c
            carry_updates[i] = u_total
            u_chunk = int(pdf.loc[i, "u_end"])
            p_chunk = float(pdf.loc[i, "p_end"]) if u_chunk else 0.0
            c = (1.0 - alpha) ** u_chunk * c + p_chunk
            u_total += u_chunk
            if i + 1 < n_rows:
                # boundary update: the NEXT chunk's first row's lag-1 value is
                # THIS chunk's last value, invisible to the heavy kernel —
                # fold it into the next chunk's carry here
                c = (1.0 - alpha) * c + alpha * float(pdf.loc[i, "last_val"])
                u_total += 1
        return pd.DataFrame(
            {
                entity_col: pdf[entity_col],
                "__salt": pdf["__salt"].astype("int32"),
                "__carry": carry,
                "__carry_updates": carry_updates,
            }
        )

    carries = (
        summaries.groupBy(entity_col)
        .applyInPandas(carry_scan, schema=carry_schema)
        .withColumnRenamed(entity_col, "__ent_c")
        .withColumnRenamed("__salt", "__salt_c")
    )

    join_cond = F.col(entity_col).eqNullSafe(F.col("__ent_c")) & (
        F.col("__salt") == F.col("__salt_c")
    )
    joined = heavy_df.join(F.broadcast(carries), join_cond).drop("__ent_c", "__salt_c")
    # e = (1-a)^u * C + p; C already folds the chunk-boundary update and u
    # counts only within-chunk updates, so the formula is consistent as-is
    decay = F.pow(F.lit(1.0 - alpha), F.col("__u"))
    e = decay * F.col("__carry") + F.col("__p")
    ever_updated = (F.col("__u") + F.col("__carry_updates")) > 0
    out = joined.withColumn(out_col, F.when(ever_updated, e))
    return out.drop("__salt", "__p", "__u", "__carry", "__carry_updates")
