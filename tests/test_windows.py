"""Vertical slice: transcripts → full strictly-past feature table, Spark vs
pandas referee, allclose at every (conv_id, ts, turn_idx) + per-turn text
equality under stable ordering (BASELINE.json input_hint invariant)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from nfl_feature_store_spark.plans.pipeline import backfill_features
from tests.referee import referee_features

METRICS = ("chars", "words", "is_tool")
FAMILIES = ("last", "form", "roll10", "expanding", "session_avg", "ewma")


def _sorted_pdf(df):
    return df.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").reset_index(drop=True)


def test_backfill_matches_referee(transcripts_sdf, transcripts_pdf):
    got = _sorted_pdf(backfill_features(transcripts_sdf).toPandas())
    exp = _sorted_pdf(referee_features(transcripts_pdf))

    assert len(got) == len(exp)
    # per-turn text equality under stable turn ordering
    assert (got["conv_id"].values == exp["conv_id"].values).all()
    assert (got["turn_idx"].values == exp["turn_idx"].values).all()
    assert (got["text"].fillna("").values == exp["text"].fillna("").values).all()
    assert (got["ts"].values == exp["ts"].values).all()

    assert (got["session_id"].values == exp["session_id"].values).all()
    assert (got["gap_secs"].values == exp["gap_secs"].values).all()

    for m in METRICS:
        np.testing.assert_array_equal(got[m].values, exp[m].values, err_msg=m)
        for fam in FAMILIES:
            col = f"{fam}_{m}"
            np.testing.assert_allclose(
                got[col].astype("float64").values,
                exp[col].astype("float64").values,
                rtol=1e-9,
                atol=0,
                equal_nan=True,
                err_msg=col,
            )
    np.testing.assert_allclose(
        got["roll10_chars_rank"].astype("float64").values,
        exp["roll10_chars_rank"].astype("float64").values,
        equal_nan=True,
    )


def test_no_temporal_leakage(spark, transcripts_pdf):
    """Mutate row t's metrics → features AT t must not change (only after)."""
    from nfl_feature_store_spark.sources.transcripts import transcripts_from_pandas

    pdf = transcripts_pdf[transcripts_pdf.conv_id == transcripts_pdf.conv_id.iloc[0]].copy()
    pdf = pdf.drop_duplicates(["conv_id", "turn_idx"], keep="last").reset_index(drop=True)
    t = len(pdf) // 2

    base = backfill_features(
        transcripts_from_pandas(spark, pdf), rank_metric=None, dedup=False
    ).toPandas()
    mutated_in = pdf.copy()
    mutated_in.loc[t, "text"] = (mutated_in.loc[t, "text"] or "") + " extra words " * 50
    mutated = backfill_features(
        transcripts_from_pandas(spark, mutated_in), rank_metric=None, dedup=False
    ).toPandas()

    base = _sorted_pdf(base)
    mutated = _sorted_pdf(mutated)
    feature_cols = [f"{fam}_{m}" for fam in FAMILIES for m in METRICS]
    row_b = base.loc[t, feature_cols].astype("float64")
    row_m = mutated.loc[t, feature_cols].astype("float64")
    pd.testing.assert_series_equal(row_b, row_m, check_names=False)
    # sanity: downstream rows DO change
    assert not np.allclose(
        base.loc[t + 1 :, "last_chars"].values.astype(float),
        mutated.loc[t + 1 :, "last_chars"].values.astype(float),
        equal_nan=True,
    )


def test_partitioning_invariance(spark, transcripts_pdf):
    """local shuffle-partition count must not affect results (FIXTURES F6)."""
    from nfl_feature_store_spark.sources.transcripts import transcripts_from_pandas

    sdf = transcripts_from_pandas(spark, transcripts_pdf)
    a = _sorted_pdf(backfill_features(sdf.repartition(3)).toPandas())
    b = _sorted_pdf(backfill_features(sdf.repartition(17)).toPandas())
    for col in a.columns:
        if a[col].dtype.kind in "fc":
            np.testing.assert_allclose(a[col].values, b[col].values, rtol=0, atol=0, equal_nan=True, err_msg=col)
        else:
            assert (a[col].fillna("").values == b[col].fillna("").values).all() if a[col].dtype == object else (
                a[col].values == b[col].values
            ).all(), col


def test_ewma_reset_col_reseeds_per_period(spark):
    """Round-1 VERDICT #8: the reset_col knob (reference-style season-boundary
    reseeding, SURVEY.md W5) — the EWM recursion must restart at each period
    boundary, exactly matching a pandas groupby([entity, period]) referee."""
    from nfl_feature_store_spark.operators.ewma import with_ewma
    from nfl_feature_store_spark.sources.transcripts import transcripts_from_pandas

    rng = np.random.default_rng(29)
    rows = []
    base = pd.Timestamp("2026-04-01")
    for c in range(6):
        for j in range(40):
            rows.append(
                (f"r{c}", j, "user", "x" * int(rng.integers(1, 200)), "",
                 base + pd.Timedelta(seconds=c * 13 + j * 60), j // 15)  # period flips every 15 turns
            )
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts", "season"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["chars"] = pdf["text"].str.len()

    sdf = spark.createDataFrame(pdf)
    got = (
        with_ewma(sdf, metrics=("chars",), span=10, reset_col="season")
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"])
        .reset_index(drop=True)
    )
    ref = pdf.sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    exp = (
        ref.groupby(["conv_id", "season"], sort=False)["chars"]
        .apply(lambda s: s.shift(1).ewm(span=10, adjust=False).mean())
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(
        got["ewma_chars"].to_numpy(dtype=float), exp.to_numpy(dtype=float),
        rtol=1e-12, equal_nan=True,
    )
    # the reseed is real: the first row of every later period is NaN again
    firsts = got[(got["turn_idx"] % 15 == 0)]
    assert firsts["ewma_chars"].isna().all()
