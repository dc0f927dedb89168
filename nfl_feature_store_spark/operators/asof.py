"""Point-in-time as-of backfill join — the engine's core operator.

Generalizes the reference's latest-snapshot join
(reference src/pipelines/events/event_regular_season_game.py:46-58:
``team_features.groupby('team').nth(-1)`` then left-join future games on team
only) to arbitrary probe timestamps: every probe row receives the entity's
latest feature snapshot as of its timestamp.

Implementation is the union + ``last(ignorenulls)`` window trick
(SURVEY.md §4.2.4): tag feature rows and probe rows, union them, sort once
per entity by (ts, side), and carry the most recent non-null feature value
forward onto probe rows. One shuffle + one sort, NO join — at 10^12 turns
this beats a per-key merge join because the sort is the same
(entity, ts)-range partitioning every other window family already uses, and
there is no build side to skew. Probe-heavy entities never build hash tables.

Tie rule (FIXTURES.md F4): ``inclusive=True`` means a probe exactly on a
feature row's ts sees that snapshot (the snapshot itself is built from
strictly-past frames, so this is still leakage-free); ``inclusive=False``
takes strictly-earlier snapshots only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    features: DataFrame,
    probes: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    probe_ts_col: str = "probe_ts",
    feature_cols: list[str] | None = None,
    inclusive: bool = True,
    tolerance_s: float | None = None,
) -> DataFrame:
    """Attach each entity's latest feature snapshot as of every probe ts.

    ``features``: (entity, ts, feature...) — point-in-time snapshots.
    ``probes``:   (entity, probe_ts, ...payload) — arbitrary timestamps.
    Returns probes + one column per feature (NULL when no snapshot precedes).

    ``tolerance_s`` bounds feature STALENESS (the feature-store freshness
    window): a probe more than ``tolerance_s`` seconds past the entity's
    most recent snapshot row gets NULL features instead of arbitrarily old
    ones. Measured against the latest snapshot ROW's ts — per-column
    staleness is not tracked (a NULL in the latest snapshot still carries
    the prior row's value for that column, as without tolerance).
    """
    if feature_cols is None:
        feature_cols = [c for c in features.columns if c not in (entity_col, ts_col)]
    probe_payload = [c for c in probes.columns if c not in (entity_col, probe_ts_col)]
    clash = set(feature_cols) & set(probe_payload)
    if clash:
        # both sides alias back to bare names in the output; a shared name
        # would yield duplicate columns that break downstream select/toPandas
        raise ValueError(
            f"as-of join: probe payload and feature columns collide on "
            f"{sorted(clash)}; rename one side before joining"
        )

    f_side = features.select(
        F.col(entity_col),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__f_{c}") for c in feature_cols],
        *[F.lit(None).cast(probes.schema[c].dataType).alias(f"__p_{c}") for c in probe_payload],
    )
    p_side = probes.select(
        F.col(entity_col),
        F.col(probe_ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(features.schema[c].dataType).alias(f"__f_{c}") for c in feature_cols],
        *[F.col(c).alias(f"__p_{c}") for c in probe_payload],
    )
    # inclusive: features sort before probes at equal ts (probe sees snapshot);
    # strict: probes sort first so equal-ts snapshots are invisible to them.
    side_order = F.col("__side").asc() if inclusive else F.col("__side").desc()
    w = (
        Window.partitionBy(entity_col)
        .orderBy(F.col("__ts").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = f_side.unionByName(p_side)
    fill_cols = {
        f"__f_{c}": F.last(F.col(f"__f_{c}"), ignorenulls=True).over(w) for c in feature_cols
    }
    if tolerance_s is not None:
        # ts of the latest snapshot ROW, carried by the same window pass
        fill_cols["__snap_ts"] = F.last(
            F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
        ).over(w)
    filled = unioned.withColumns(fill_cols)
    feature_out = {c: F.col(f"__f_{c}") for c in feature_cols}
    if tolerance_s is not None:
        age = F.unix_seconds(F.col("__ts").cast("timestamp")) - F.unix_seconds(
            F.col("__snap_ts").cast("timestamp")
        )
        fresh = age <= F.lit(tolerance_s)
        feature_out = {c: F.when(fresh, F.col(f"__f_{c}")) for c in feature_cols}
    out = filled.filter(F.col("__side") == 1).select(
        F.col(entity_col),
        F.col("__ts").alias(probe_ts_col),
        *[F.col(f"__p_{c}").alias(c) for c in probe_payload],
        *[feature_out[c].alias(c) for c in feature_cols],
    )
    return out


def salted_asof_join(
    features: DataFrame,
    probes: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    probe_ts_col: str = "probe_ts",
    feature_cols: list[str] | None = None,
    inclusive: bool = True,
    n_salt: int = 32,
) -> DataFrame:
    """As-of backfill under (entity, salt) parallelism — the north rule's
    "salted (conv_id, ts) partitions" made literal for entities too hot for
    one task's sort.

    Same union + last(ignorenulls) semantics as :func:`asof_join`, decomposed
    exactly like operators/salted.py: quantile range-salt over the UNIONED
    (feature ∪ probe) stream, within-chunk carry-forward in parallel, then a
    tiny per-chunk "last snapshot" summary scanned per entity and broadcast
    back — a probe in chunk c falls back to the latest snapshot of chunks
    < c when its own chunk has no earlier feature row. Rows with equal ts
    always share a chunk, so the inclusive/strict tie rule never straddles a
    boundary. Property-tested equal to the unsalted operator.
    """
    from nfl_feature_store_spark.operators.salted import assign_range_salt

    if feature_cols is None:
        feature_cols = [c for c in features.columns if c not in (entity_col, ts_col)]
    probe_payload = [c for c in probes.columns if c not in (entity_col, probe_ts_col)]
    clash = set(feature_cols) & set(probe_payload)
    if clash:
        # both sides alias back to bare names in the output; a shared name
        # would yield duplicate columns that break downstream select/toPandas
        raise ValueError(
            f"as-of join: probe payload and feature columns collide on "
            f"{sorted(clash)}; rename one side before joining"
        )

    f_side = features.select(
        F.col(entity_col),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__f_{c}") for c in feature_cols],
        *[F.lit(None).cast(probes.schema[c].dataType).alias(f"__p_{c}") for c in probe_payload],
    )
    p_side = probes.select(
        F.col(entity_col),
        F.col(probe_ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(features.schema[c].dataType).alias(f"__f_{c}") for c in feature_cols],
        *[F.col(c).alias(f"__p_{c}") for c in probe_payload],
    )
    unioned = f_side.unionByName(p_side)
    salted = assign_range_salt(unioned, entity_col, "__ts", n_salt)

    side_order = F.col("__side").asc() if inclusive else F.col("__side").desc()
    # within-window order and the per-chunk "last row" key must agree; for
    # the strict rule probes sort first at equal ts, i.e. larger (1 - side)
    order_key = F.struct(
        F.col("__ts"), (F.col("__side") if inclusive else 1 - F.col("__side")).alias("__sk")
    )
    w_chunk = (
        Window.partitionBy(entity_col, "__salt")
        .orderBy(F.col("__ts").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = salted.withColumns(
        {f"__f_{c}": F.last(F.col(f"__f_{c}"), ignorenulls=True).over(w_chunk) for c in feature_cols}
    )

    # tiny per-chunk summary: the chunk's final carried snapshot per feature
    summaries = filled.groupBy(entity_col, "__salt").agg(
        *[F.max_by(F.col(f"__f_{c}"), order_key).alias(f"__f_{c}") for c in feature_cols]
    )
    w_prev = (
        Window.partitionBy(entity_col)
        .orderBy("__salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = summaries.select(
        F.col(entity_col).alias("__ent_c"),
        F.col("__salt").alias("__salt_c"),
        *[
            F.last(F.col(f"__f_{c}"), ignorenulls=True).over(w_prev).alias(f"__carry_{c}")
            for c in feature_cols
        ],
    )
    join_cond = F.col(entity_col).eqNullSafe(F.col("__ent_c")) & (
        F.col("__salt") == F.col("__salt_c")
    )
    merged = filled.join(F.broadcast(carries), join_cond).drop("__ent_c", "__salt_c")
    out = merged.filter(F.col("__side") == 1).select(
        F.col(entity_col),
        F.col("__ts").alias(probe_ts_col),
        *[F.col(f"__p_{c}").alias(c) for c in probe_payload],
        *[
            F.coalesce(F.col(f"__f_{c}"), F.col(f"__carry_{c}")).alias(c)
            for c in feature_cols
        ],
    )
    return out


def latest_snapshot(
    features: DataFrame,
    entity_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("ts",),
) -> DataFrame:
    """Latest row per entity — the reference's ``groupby('team').nth(-1)``
    (event_regular_season_game.py:47) as a window top-1 (SURVEY.md §2.6 O2)."""
    w = Window.partitionBy(entity_col).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        features.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
