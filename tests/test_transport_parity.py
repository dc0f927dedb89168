"""Cross-transport parity for the Arrow-batched scan operators (round-4 advice).

``with_ewma`` and ``elo_per_entity`` each offer two physical transports —
``mapInArrow`` (default; passthrough columns stay Arrow buffers) and the
original ``mapInPandas`` — with the docstring claim that results are
identical, including leading-window NaN -> NULL conversion. These tests pin
that claim: same values, same NULL mask, on data that exercises NULLs
(leading rows, NaN outcomes) and a metric name that collides with an order
column (the duplicate-projection crash fixed by the dict.fromkeys dedupe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _fixture(seed: int = 41) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    base = pd.Timestamp("2026-05-01")
    for c in range(12):
        n = int(rng.integers(1, 50))
        for i in range(n):
            rows.append(
                (
                    f"c{c}",
                    i,
                    "user" if i % 2 == 0 else "assistant",
                    "x" * int(rng.integers(0, 300)),
                    "",
                    base + pd.Timedelta(seconds=c * 7 + i * 60),
                )
            )
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["chars"] = pdf["text"].str.len().astype("float64")
    pdf["outcome"] = rng.integers(0, 2, len(pdf)).astype("float64")
    # NaN outcomes: the elo scan must SKIP these without updating the rating,
    # identically under both transports
    pdf.loc[pdf.sample(frac=0.15, random_state=7).index, "outcome"] = np.nan
    return pdf


def _assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame, cols: list[str]) -> None:
    a = a.sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    b = b.sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    for c in cols:
        # identical NULL mask (leading-window NaN->NULL claim), then values
        assert (a[c].isna().values == b[c].isna().values).all(), f"{c}: NULL masks differ"
        np.testing.assert_allclose(
            a[c].to_numpy(dtype=float), b[c].to_numpy(dtype=float),
            rtol=0, atol=0, equal_nan=True, err_msg=c,
        )


def test_ewma_transport_parity(spark):
    from nfl_feature_store_spark.operators.ewma import with_ewma

    sdf = spark.createDataFrame(_fixture())
    outs = {
        t: with_ewma(sdf, metrics=("chars", "outcome"), transport=t).toPandas()
        for t in ("arrow", "pandas")
    }
    assert list(outs["arrow"].columns) == list(outs["pandas"].columns)
    _assert_frames_equal(outs["arrow"], outs["pandas"], ["ewma_chars", "ewma_outcome"])
    # text payload rides through untouched on both transports
    _ = {
        t: o.sort_values(["conv_id", "ts", "turn_idx"]) for t, o in outs.items()
    }
    assert (
        outs["arrow"].sort_values(["conv_id", "ts", "turn_idx"])["text"].values
        == outs["pandas"].sort_values(["conv_id", "ts", "turn_idx"])["text"].values
    ).all()


def test_elo_transport_parity(spark):
    from nfl_feature_store_spark.operators.elo import elo_per_entity

    sdf = spark.createDataFrame(_fixture(seed=43))
    outs = {
        t: elo_per_entity(sdf, outcome_col="outcome", transport=t).toPandas()
        for t in ("arrow", "pandas")
    }
    assert list(outs["arrow"].columns) == list(outs["pandas"].columns)
    _assert_frames_equal(outs["arrow"], outs["pandas"], ["elo_pre"])


@pytest.mark.parametrize("transport", ["arrow", "pandas"])
def test_ewma_metric_coincides_with_order_col(spark, transport):
    """A metric that is ALSO an order column must not crash the arrow
    transport's projection (round-4 advice: duplicate names in
    pa.Table.select made sub[m] a DataFrame)."""
    from nfl_feature_store_spark.operators.ewma import with_ewma

    pdf = _fixture(seed=47)
    sdf = spark.createDataFrame(pdf)
    out = (
        with_ewma(sdf, metrics=("turn_idx", "chars"), transport=transport)
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"])
        .reset_index(drop=True)
    )
    ref = pdf.sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    exp = (
        ref.groupby("conv_id", sort=False)["turn_idx"]
        .apply(lambda s: s.shift(1).ewm(span=10, adjust=False).mean())
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(
        out["ewma_turn_idx"].to_numpy(dtype=float),
        exp.to_numpy(dtype=float),
        rtol=1e-12,
        equal_nan=True,
    )


@pytest.mark.parametrize("transport", ["arrow", "pandas"])
def test_elo_outcome_coincides_with_order_col(spark, transport):
    """Same dedupe guarantee for elo_per_entity: ordering by the outcome
    column itself (degenerate but legal) must not produce a duplicate
    projection."""
    from nfl_feature_store_spark.operators.elo import elo_per_entity

    pdf = _fixture(seed=53).dropna(subset=["outcome"])
    sdf = spark.createDataFrame(pdf)
    out = elo_per_entity(
        sdf,
        outcome_col="turn_idx",
        order_cols=("ts", "turn_idx"),
        transport=transport,
    ).toPandas()
    assert out["elo_pre"].notna().all()
    assert len(out) == len(pdf)


def test_simhash_null_text_matches_empty(spark):
    """Round-4 advice: NULL text must fingerprint exactly like '' (coalesce
    on the Spark side, matching the oracle SQL) for simhash AND shingles."""
    from nfl_feature_store_spark.operators.dedup import minhash_signature, simhash

    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "text": [None, "", "hello world"]})
    sdf = spark.createDataFrame(pdf)
    for hash_fn in ("xxhash64", "md5"):
        sh = simhash(sdf, "doc_id", "text", hash_fn=hash_fn).toPandas().set_index("doc_id")
        assert sh.loc[1, "simhash64"] == sh.loc[2, "simhash64"] == 0
        assert sh.loc[1, "n_tokens"] == sh.loc[2, "n_tokens"] == 0
        assert sh.loc[3, "n_tokens"] == 2
        sig = (
            minhash_signature(sdf, "doc_id", "text", hash_fn=hash_fn)
            .toPandas()
            .set_index("id")
        )
        assert list(sig.loc[1, "sig"]) == list(sig.loc[2, "sig"])
        assert all(v is not None for v in sig.loc[1, "sig"])
