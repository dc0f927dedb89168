"""Pandas referee — independent golden implementation of the verified
reference semantics (SURVEY.md §2.5, FIXTURES.md F3) used to check the Spark
engine allclose at every (conv_id, ts, turn_idx).

Deliberately written in plain pandas (the reference's own substrate) and kept
separate from the engine: the Spark code must agree with this, not vice
versa.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

SESSION_GAP_S = 1800


def _words(t: str) -> int:
    t = (t or "").strip()
    return 0 if not t else len(re.split(r"\s+", t))


def _session_avg_literal(df: pd.DataFrame, x: pd.Series) -> pd.Series:
    out = np.full(len(df), np.nan)
    xv = x.to_numpy(dtype=float)
    pos = 0
    for _, grp in df.groupby("conv_id", sort=False):
        n = len(grp)
        sess = grp["session_id"].to_numpy()
        # first index of each session within this conversation
        first_idx = {}
        for i in range(n):
            first_idx.setdefault(sess[i], i)
        for i in range(n):
            s = sess[i]
            anchor = s - 1 if first_idx[s] == i else s
            start = first_idx.get(anchor, 0)  # conv's very first session: no prior period
            window = xv[pos + start : pos + i + 1]
            if np.any(~np.isnan(window)):
                out[pos + i] = np.nanmean(window)
        pos += n
    return pd.Series(out, index=df.index)


def referee_features(
    pdf: pd.DataFrame,
    gap_s: int = SESSION_GAP_S,
    metrics: tuple[str, ...] = ("chars", "words", "is_tool"),
    form_window: int = 3,
    roll_window: int = 10,
    ewma_span: int = 10,
    rank_metric: str = "roll10_chars",
) -> pd.DataFrame:
    df = pdf.copy()
    # dedup: keep latest ts per (conv_id, turn_idx) — FIXTURES.md F6
    df = df.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
    df = df.drop_duplicates(["conv_id", "turn_idx"], keep="last")
    df = df.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").reset_index(drop=True)

    df["chars"] = df["text"].fillna("").str.len().astype("int64")
    df["words"] = df["text"].map(_words).astype("int64")
    df["is_tool"] = (df["tool"].fillna("") != "").astype("int64")

    g = df.groupby("conv_id", sort=False)
    df["gap_secs"] = (
        g["ts"].diff().dt.total_seconds().fillna(0).astype("int64")
    )
    df["session_id"] = (
        (df["gap_secs"] > gap_s).astype("int64").groupby(df["conv_id"], sort=False).cumsum()
    )

    for m in metrics:
        x = g[m].shift(1).astype("float64")
        df[f"last_{m}"] = x
        df[f"form_{m}"] = x.groupby(df["conv_id"], sort=False).transform(
            lambda s: s.rolling(form_window, min_periods=1).mean()
        )
        df[f"roll{roll_window}_{m}"] = x.groupby(df["conv_id"], sort=False).transform(
            lambda s: s.rolling(roll_window, min_periods=1).mean()
        )
        df[f"expanding_{m}"] = x.groupby(df["conv_id"], sort=False).transform(
            lambda s: s.expanding(min_periods=1).mean()
        )
        # two-anchor session-avg (W3): the window for row t starts at the
        # FIRST row of t's session — or the PREVIOUS session when t is a
        # session's first row — and runs through t over the lag-1 series x.
        # Literal slice implementation (independent of the engine's
        # running-sum formulation); semantics pinned by
        # test_reference_regression.py::test_w3_season_avg_two_anchor.
        df[f"session_avg_{m}"] = _session_avg_literal(df, x)
        df[f"ewma_{m}"] = x.groupby(df["conv_id"], sort=False).transform(
            lambda s: s.ewm(span=ewma_span, adjust=False).mean()
        )

    if rank_metric:
        bucket = df["ts"].dt.floor("D")
        df[f"{rank_metric}_rank"] = df.groupby(bucket)[rank_metric].rank(
            method="max", ascending=False
        )
    return df


def referee_asof(
    features: pd.DataFrame,
    probes: pd.DataFrame,
    feature_cols: list[str],
    inclusive: bool = True,
) -> pd.DataFrame:
    """Per-probe latest snapshot via pandas merge_asof (per entity)."""
    f = features.sort_values("ts", kind="mergesort")
    p = probes.sort_values("probe_ts", kind="mergesort")
    out = pd.merge_asof(
        p,
        f[["conv_id", "ts"] + feature_cols],
        left_on="probe_ts",
        right_on="ts",
        by="conv_id",
        allow_exact_matches=inclusive,
        direction="backward",
    )
    return out.drop(columns=["ts"])
