"""skew_report: the operational pre-shuffle diagnostic feeding the salted
operator family's salt factor."""

import pytest

from nfl_feature_store_spark.plans.skew import skew_report


def test_skew_report_on_planted_hot_key(spark):
    # 1 hot key with 900 rows + 100 keys with 1 row each
    rows = [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "conv_id string, x int")
    rep = skew_report(df, "conv_id", top_n=3)
    assert rep["n_rows"] == 1000 and rep["n_keys"] == 101
    assert rep["max_per_key"] == 900
    assert rep["mean_per_key"] == pytest.approx(1000 / 101)
    assert rep["skew_ratio"] == pytest.approx(900 / (1000 / 101))
    # hottest key's shard fits mean load at this salt factor
    assert rep["suggested_salt"] == 91
    assert rep["top"][0] == ("hot", 900)
    assert len(rep["top"]) == 3


def test_skew_report_uniform_and_multicol(spark):
    rows = [(f"c{i % 10}", i % 4, i) for i in range(400)]
    df = spark.createDataFrame(rows, "a string, b int, x int")
    rep = skew_report(df, ["a", "b"], top_n=5)
    # (i%10, i%4) has lcm(10,4)=20 distinct combos, each hit 400/20=20 times
    assert rep["n_keys"] == 20 and rep["max_per_key"] == 20
    assert rep["skew_ratio"] == pytest.approx(1.0)
    assert rep["suggested_salt"] == 1
    assert all(len(t) == 3 for t in rep["top"])  # (a, b, count)


def test_skew_report_empty_and_validation(spark):
    df = spark.createDataFrame([], "a string, x int")
    rep = skew_report(df, "a")
    assert rep == {
        "n_rows": 0, "n_keys": 0, "mean_per_key": 0.0, "max_per_key": 0,
        "skew_ratio": 0.0, "suggested_salt": 1, "top": [],
    }
    with pytest.raises(ValueError, match="at least one"):
        skew_report(df, [])
