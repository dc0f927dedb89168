from __future__ import annotations

import pandas as pd

from nfl_feature_store_spark.functions.scalars import decode_hex_id, linear_score, success_points


def test_decode_hex_id(spark):
    # "00-0" prefix + hex pairs for "ABC" (len-guard uses a 10-char id here)
    df = spark.createDataFrame(pd.DataFrame({"pid": ["00-0414243", "short"]}))
    out = df.select(decode_hex_id("pid", expected_len=10).alias("d")).toPandas()
    assert out["d"].tolist() == ["ABC", "short"]


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
