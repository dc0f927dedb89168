"""grouped_quantiles: the approx (t-digest/GK sketch) scale path must honor
its RANK-error guarantee against the exact mode on real data, and the exact
mode must match pandas interpolation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from nfl_feature_store_spark.operators.quantiles import grouped_quantiles

QS = (0.5, 0.95, 0.99)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_type", "value"
    )


def test_exact_matches_pandas_interpolation(spark, events):
    got = grouped_quantiles(events, ["event_type"], "value", QS, mode="exact").toPandas()
    pdf = events.toPandas()
    for _, row in got.iterrows():
        vals = pdf.loc[pdf.event_type == row.event_type, "value"].dropna()
        assert row.n == len(vals)
        for q in QS:
            exp = float(np.quantile(vals, q))  # linear interpolation, same def
            assert row[f"p{q * 100:g}".replace(".", "_")] == pytest.approx(exp, rel=1e-12)


def test_approx_rank_error_within_guarantee(spark, events):
    acc = 1000
    exact = grouped_quantiles(events, ["event_type"], "value", QS, mode="exact").toPandas()
    approx = grouped_quantiles(
        events, ["event_type"], "value", QS, mode="approx", accuracy=acc
    ).toPandas()
    pdf = events.toPandas()
    merged = exact.merge(approx, on="event_type", suffixes=("_e", "_a"))
    assert (merged["n_e"] == merged["n_a"]).all()
    for _, row in merged.iterrows():
        vals = np.sort(pdf.loc[pdf.event_type == row.event_type, "value"].dropna().values)
        n = len(vals)
        for q in QS:
            col = f"p{q * 100:g}".replace(".", "_")
            # rank of the approx answer must be within n/accuracy of target
            rank = np.searchsorted(vals, row[f"{col}_a"], side="right")
            assert abs(rank - q * n) <= n / acc + 1, (row.event_type, q)


def test_mode_and_q_validation(spark, events):
    with pytest.raises(ValueError, match="mode"):
        grouped_quantiles(events, ["event_type"], "value", QS, mode="tdigest")
    with pytest.raises(ValueError, match="out of"):
        grouped_quantiles(events, ["event_type"], "value", (1.5,))
