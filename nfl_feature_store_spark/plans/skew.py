"""Skew diagnostics: measure key-distribution imbalance BEFORE a shuffle
burns a day at cluster scale.

The engine's salted operators (operators/salted.py, asof.py) fix hot-key
skew once you know which keys are hot and how hot; this report is the
"know" step. One aggregation pass (count per key, partial-aggregated
map-side), one tiny top-N collect bounded by ``top_n`` — no full collect,
no sampling bias.

Output drives two decisions:
- ``skew_ratio`` (max key count / mean key count): >> shuffle-partition
  count means the hottest key alone overflows one task -> salt it or rely
  on AQE skew-join splitting (joins only; window/groupBy state needs the
  salted operators).
- ``suggested_salt``: buckets needed so the hottest key's shard fits the
  average partition load (ceil(max_count / mean_count)), the factor the
  salted window family takes directly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def skew_report(df: DataFrame, key_cols: list[str] | str, top_n: int = 20) -> dict:
    """Driver-side dict: {n_rows, n_keys, mean_per_key, max_per_key,
    skew_ratio, suggested_salt, top: [(key..., count), ...]}.

    Runs TWO Spark jobs (one agg for the scalars, one orderBy-limit for the
    top-N) over a cached per-key count — the count itself is computed once.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError("key_cols must name at least one column")
    counts = df.groupBy(*keys).agg(F.count("*").alias("__n")).cache()
    try:
        stats = counts.agg(
            F.sum("__n").alias("rows"),
            F.count("*").alias("nkeys"),
            F.max("__n").alias("mx"),
        ).collect()[0]
        if stats["nkeys"] == 0 or stats["rows"] is None:
            return {
                "n_rows": 0, "n_keys": 0, "mean_per_key": 0.0, "max_per_key": 0,
                "skew_ratio": 0.0, "suggested_salt": 1, "top": [],
            }
        mean = stats["rows"] / stats["nkeys"]
        top = [
            tuple(r[k] for k in keys) + (r["__n"],)
            for r in counts.orderBy(F.col("__n").desc(), *keys).limit(top_n).collect()
        ]
        return {
            "n_rows": int(stats["rows"]),
            "n_keys": int(stats["nkeys"]),
            "mean_per_key": mean,
            "max_per_key": int(stats["mx"]),
            "skew_ratio": stats["mx"] / mean,
            "suggested_salt": max(1, math.ceil(stats["mx"] / mean)),
            "top": top,
        }
    finally:
        counts.unpersist()
