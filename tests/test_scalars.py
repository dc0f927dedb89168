from __future__ import annotations

import pandas as pd

from nfl_feature_store_spark.functions.scalars import decode_hex_id, linear_score, success_points


def test_decode_hex_id(spark):
    # realistic 36-char dashed ESB-style id: [4:-8] = "3030-2d30-3033-3338-3733",
    # dashes stripped -> 20 hex chars -> "00-0033873" (reference
    # decode_gsis(new_id) == "00-0033873", verified against the pure-python
    # reference implementation); non-36-char ids pass through unchanged
    df = spark.createDataFrame(
        pd.DataFrame({"pid": ["32013030-2d30-3033-3338-373300000000", "short", "00-0033873"]})
    )
    out = df.select(decode_hex_id("pid").alias("d")).toPandas()
    assert out["d"].tolist() == ["00-0033873", "short", "00-0033873"]


def test_success_points(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "down": [1, 3, 1, 2],
                "ydstogo": [10, 10, 10, 4],
                "yards_gained": [5, 10, 25, -2],
                "turnover": [0, 0, 0, 1],
            }
        )
    )
    out = df.select(
        success_points("down", "ydstogo", "yards_gained", "turnover").alias("sp")
    ).toPandas()
    # d1 10togo gain5: needed 5 -> 1.0; d3 gain10/10 -> 1.0; big play -> 2.0;
    # d2 gain -2, turnover -> 0 - 1 = -1
    assert out["sp"].tolist() == [1.0, 1.0, 2.0, -1.0]


def test_linear_score(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [2.0, None], "b": [1.0, 3.0]}))
    out = df.select(linear_score({"a": 0.5, "b": 2.0}).alias("s")).toPandas()
    assert out["s"].tolist() == [3.0, 6.0]
