"""Elo-style cumulative ratings (SURVEY.md §2.5 W9, §7.4 hard part #1).

The reference consumes pre-computed Elo from a sibling repo
(/root/reference/README.md:15,44-45 — theedgepredictor/elo-rating); this
engine implements the rating recursion as a first-class operator, per the
north star ("Elo-style cumulative ratings").

Update rule: ``r_new = r_old + K * (outcome - expected)``,
``expected = 1 / (1 + 10^(-(r_entity - r_opponent)/400))``; ``elo_pre`` is
the rating BEFORE the event (strictly-past, leakage-free).

Two execution strategies:

* :func:`elo_per_entity` — each entity rated against a fixed field (1500) or
  a supplied per-row opponent rating column. Updates are sequential PER
  ENTITY only => embarrassingly parallel by entity via ``applyInPandas``
  (the transcript case: one rating stream per conv_id).
* :func:`elo_pairwise` — two-sided matches (both ratings change per event):
  globally sequential, so Spark executes a driver-coordinated synchronous
  loop over time buckets; within a bucket each entity appears at most once
  (reference analog: one game per team per week). Ratings carry between
  buckets as a small DataFrame, localCheckpoint'ed to bound lineage; at
  resume the latest ratings table is the checkpoint (plans/checkpoint.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_K = 20.0
DEFAULT_INIT = 1500.0


def _elo_scan(outcomes: np.ndarray, opp: np.ndarray, k: float, init: float) -> np.ndarray:
    """Sequential Elo scan over one entity's ordered events.

    The recursion is nonlinear (logistic of the running rating) so it cannot
    be expressed as a prefix sum; the loop runs on numpy scalars inside an
    Arrow batch — bounded by per-conversation turn counts.
    """
    n = len(outcomes)
    pre = np.empty(n, dtype="float64")
    r = init
    for i in range(n):
        pre[i] = r
        if not np.isnan(outcomes[i]):
            expected = 1.0 / (1.0 + 10.0 ** (-(r - opp[i]) / 400.0))
            r = r + k * (outcomes[i] - expected)
    return pre


def elo_per_entity(
    df: DataFrame,
    outcome_col: str,
    entity_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
    opponent_rating_col: str | None = None,
    k: float = DEFAULT_K,
    init: float = DEFAULT_INIT,
    out_col: str = "elo_pre",
    presorted: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-entity cumulative rating before each event (parallel by entity).

    ``mapInPandas`` over entity-clustered partitions (same rationale as
    operators/ewma.py: per-group applyInPandas pays ~10ms Arrow overhead per
    conversation — ruinous at 10^9 entities). Within a partition, group
    boundaries are found once on the sorted entity column and the sequential
    scan runs per slice on raw numpy arrays.
    """
    from collections.abc import Iterator

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType(), True)]
    )
    order = list(order_cols)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values([entity_col] + order, kind="mergesort", ignore_index=True)
        outcomes = pdf[outcome_col].astype("float64").to_numpy()
        opp = (
            pdf[opponent_rating_col].astype("float64").to_numpy()
            if opponent_rating_col
            else np.full(len(pdf), init)
        )
        ent = pdf[entity_col].to_numpy()
        # group boundary indices on the sorted entity column
        starts = np.flatnonzero(np.r_[True, ent[1:] != ent[:-1]])
        ends = np.r_[starts[1:], len(ent)]
        pre = np.empty(len(ent), dtype="float64")
        for s, e in zip(starts, ends):
            pre[s:e] = _elo_scan(outcomes[s:e], opp[s:e], k, init)
        pdf[out_col] = pre
        yield pdf

    if presorted:
        clustered = df
    else:
        n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        clustered = df.repartition(int(n), entity_col).sortWithinPartitions(entity_col, *order)
    return clustered.mapInPandas(kernel, schema=out_schema)


def elo_pairwise(
    df: DataFrame,
    home_col: str,
    away_col: str,
    outcome_col: str,  # 1.0 home win, 0.0 away win, 0.5 draw
    bucket_col: str,  # time bucket; each entity appears <=1x per bucket
    k: float = DEFAULT_K,
    init: float = DEFAULT_INIT,
) -> DataFrame:
    """Two-sided Elo via driver-coordinated synchronous time-bucket loop.

    Returns the input plus ``elo_pre_home`` / ``elo_pre_away`` /
    ``elo_prob_home``. The per-bucket step is a broadcast join of the (small)
    ratings table onto that bucket's events — the ratings table has one row
    per entity, orders of magnitude smaller than the event stream.
    """
    # Pairwise Elo is for INTERACTING entity populations — leagues — which
    # are small by construction (the reference has 32 teams; README.md:44-45
    # points to its sibling elo-rating repo). Ratings state therefore lives
    # on the DRIVER as a dict, and each bucket's scoring is a vectorized
    # pandas pass over that bucket's matches. (The first implementation kept
    # ratings as a chained-localCheckpoint DataFrame; once Spark's
    # ContextCleaner evicted an old checkpoint block, recomputation recursed
    # through every prior bucket — geometric blowup. Per-entity streams at
    # 10^9-entity scale belong in elo_per_entity, which is embarrassingly
    # parallel.) The match stream itself is pulled bucket-at-a-time via
    # toPandas — bounded by matches-per-bucket <= |entities| / 2.
    spark = df.sparkSession
    pdf_all = df.toPandas().sort_values(bucket_col, kind="mergesort")
    ratings: dict = {}
    rows = []
    for b, grp in pdf_all.groupby(bucket_col, sort=True):
        pre_h = np.array([ratings.get(h, init) for h in grp[home_col]])
        pre_a = np.array([ratings.get(a, init) for a in grp[away_col]])
        prob_h = 1.0 / (1.0 + 10.0 ** (-(pre_h - pre_a) / 400.0))
        delta = k * (grp[outcome_col].to_numpy(dtype=float) - prob_h)
        out = grp.assign(elo_pre_home=pre_h, elo_pre_away=pre_a, elo_prob_home=prob_h)
        rows.append(out)
        for h, a, dh in zip(grp[home_col], grp[away_col], delta):
            ratings[h] = ratings.get(h, init) + dh
            ratings[a] = ratings.get(a, init) - dh
    result_pdf = pd.concat(rows, ignore_index=True)
    return spark.createDataFrame(result_pdf)
