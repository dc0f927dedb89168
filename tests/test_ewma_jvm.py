"""with_ewma_jvm: the JVM-only segmented closed-form EWM must reproduce the
pandas mapInPandas kernel (the reference-semantics referee) and must not add
an exchange to the flagship plan."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

from nfl_feature_store_spark.functions.turn_metrics import dedup_latest, with_turn_metrics
from nfl_feature_store_spark.operators.ewma import with_ewma, with_ewma_jvm
from nfl_feature_store_spark.plans.pipeline import backfill_features

KEY = ["conv_id", "ts", "turn_idx"]
EWMA = ["ewma_chars", "ewma_words", "ewma_is_tool"]


def _sorted(df):
    return df.sort_values(KEY, kind="mergesort", ignore_index=True)


@pytest.mark.parametrize("chunk_rows", [None, 7])
def test_jvm_matches_pandas_kernel(spark, transcripts_sdf, chunk_rows):
    """chunk_rows=7 forces multi-chunk carries on every conversation longer
    than 7 turns (the fixture's hot conversation has 900)."""
    base = with_turn_metrics(dedup_latest(transcripts_sdf))
    a = _sorted(with_ewma(base).select(*KEY, *EWMA).toPandas())
    b = _sorted(with_ewma_jvm(base, chunk_rows=chunk_rows).select(*KEY, *EWMA).toPandas())
    for m in EWMA:
        av, bv = a[m].to_numpy("float64"), b[m].to_numpy("float64")
        assert (np.isnan(av) == np.isnan(bv)).all(), f"{m}: NULL pattern diverges"
        mask = ~np.isnan(av)
        np.testing.assert_allclose(av[mask], bv[mask], rtol=1e-9, atol=1e-12, err_msg=m)


def test_jvm_null_metric_fails_fast(spark):
    """Mid-stream NULL metric values violate the non-null contract (pandas
    renormalizes decay over gap widths — a different recursion); the operator
    must fail with guidance instead of silently diverging."""
    pdf = pd.DataFrame(
        {
            "conv_id": ["a"] * 6,
            "turn_idx": range(6),
            "ts": pd.date_range("2025-01-01", periods=6, freq="1min"),
            "m": [10.0, None, 30.0, None, 50.0, 60.0],
        }
    )
    sdf = spark.createDataFrame(pdf)
    out = with_ewma_jvm(sdf, metrics=("m",), chunk_rows=2, order_cols=("ts", "turn_idx"))
    with pytest.raises(Exception, match="non-null metrics"):
        out.select("ewma_m").collect()


def test_jvm_chunk_rows_overflow_guard(spark, transcripts_sdf):
    base = with_turn_metrics(dedup_latest(transcripts_sdf))
    with pytest.raises(ValueError, match="overflows the closed form"):
        with_ewma_jvm(base, chunk_rows=10_000)


def test_pipeline_jvm_ewma_adds_no_exchange(transcripts_sdf):
    """The flagship contract: ONE hash(conv_id) exchange shared by every
    per-entity stage + one hash(__bucket) for the rank — the JVM EWM must
    ride the existing partitioning, not branch or join."""
    feats = backfill_features(transcripts_sdf, ewma_engine="jvm")
    feats.write.format("noop").mode("overwrite").save()
    plan = feats._jdf.queryExecution().executedPlan().toString()
    exchanges = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert sorted(exchanges) == ["__bucket", "conv_id"], plan[:2000]
    # and no join/aggregate side-branch recomputing the stream
    assert "SortMergeJoin" not in plan
    assert "mapInPandas" not in plan.lower()
