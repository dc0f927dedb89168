"""Staged CSV dimension ingestion (S2) and the partition-memory tripwires
on the pandas-kernel operators."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T
from pyspark.sql.utils import PythonException

from nfl_feature_store_spark.sources.staged_csv import stage_csv_dim


def test_stage_csv_dim_types_and_dedup(spark, tmp_path):
    csv = tmp_path / "players.csv"
    csv.write_text(
        "player_id,name,team,scrape_date\n"
        "p1,Alice,KC,2026-01-01\n"
        "p1,Alice Updated,KC,2026-02-01\n"  # later scrape wins
        "p2,Bob,DET,2026-01-15\n"
        ",Ghost,NYJ,2026-01-10\n"  # NULL key dropped
    )
    schema = T.StructType(
        [
            T.StructField("player_id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("team", T.StringType()),
            T.StructField("scrape_date", T.DateType()),
        ]
    )
    dest = str(tmp_path / "dim_players")
    dim = stage_csv_dim(
        spark, str(csv), dest, schema=schema,
        key_col="player_id", dedup_keep_last_by="scrape_date",
    )
    got = dim.toPandas().sort_values("player_id").reset_index(drop=True)
    assert got["player_id"].tolist() == ["p1", "p2"]
    assert got.loc[0, "name"] == "Alice Updated"
    assert str(dim.schema["scrape_date"].dataType) == "DateType()"
    # staged output is what downstream reads (storage, not the CSV)
    assert spark.read.parquet(dest).count() == 2


def _hot_df(spark, n=2000):
    pdf = pd.DataFrame(
        {
            "conv_id": ["hot"] * n,
            "turn_idx": np.arange(n, dtype="int32"),
            "ts": pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(n), unit="s"),
            "chars": np.arange(n, dtype="float64"),
            "outcome": (np.arange(n) % 2).astype("float64"),
        }
    )
    return spark.createDataFrame(pdf)


def test_ewma_partition_tripwire(spark):
    from nfl_feature_store_spark.operators.ewma import with_ewma

    df = _hot_df(spark)
    out = with_ewma(df, metrics=("chars",), max_partition_rows=100)
    with pytest.raises(PythonException, match="salted_ewm"):
        out.count()
    # generous bound: runs fine
    assert with_ewma(df, metrics=("chars",), max_partition_rows=10_000).count() == 2000


def test_elo_partition_tripwire(spark):
    from nfl_feature_store_spark.operators.elo import elo_per_entity

    df = _hot_df(spark)
    out = elo_per_entity(df, outcome_col="outcome", max_partition_rows=100)
    with pytest.raises(PythonException, match="max_partition_rows"):
        out.count()


def test_salted_and_elo_handle_empty_input(spark):
    """Degenerate inputs must not crash the planners (empty quantile bounds,
    empty snapshot table)."""
    from nfl_feature_store_spark.operators.elo import elo_pairwise
    from nfl_feature_store_spark.operators.salted import salted_expanding_mean

    empty = spark.createDataFrame(
        [], schema="conv_id string, turn_idx int, ts timestamp, value double"
    )
    assert salted_expanding_mean(empty, "value", n_salt=4).count() == 0

    empty_m = spark.createDataFrame(
        [], schema="home string, away string, outcome double, bucket string"
    )
    out = elo_pairwise(empty_m, "home", "away", "outcome", "bucket")
    assert out.count() == 0
    assert "elo_prob_home" in out.columns


def test_bucketed_table_makes_backfill_shuffle_free(spark, tmp_path_factory):
    """A table bucketed by conv_id satisfies every downstream window
    distribution: the ENTIRE backfill plans zero data exchanges, and results
    equal the unbucketed run exactly."""
    import re

    from nfl_feature_store_spark.plans.pipeline import backfill_features
    from nfl_feature_store_spark.sources.bucketed import (
        read_bucketed_transcripts,
        write_bucketed_transcripts,
    )
    from nfl_feature_store_spark.sources.transcripts import (
        gen_transcripts_pdf,
        transcripts_from_pandas,
    )

    pdf = gen_transcripts_pdf(n_convs=40, seed=9, max_turns=60)
    sdf = transcripts_from_pandas(spark, pdf)
    write_bucketed_transcripts(sdf, "t_bucketed_test", buckets=8)
    try:
        feats = backfill_features(read_bucketed_transcripts(spark, "t_bucketed_test"), rank_metric=None)
        feats.write.format("noop").mode("overwrite").save()
        plan = feats._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"Exchange hashpartitioning", plan) is None

        got = feats.toPandas().sort_values(["conv_id", "ts", "turn_idx"], ignore_index=True)
        exp = (
            backfill_features(sdf, rank_metric=None)
            .toPandas()
            .sort_values(["conv_id", "ts", "turn_idx"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, exp[got.columns], check_like=True)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucketed_test")


def test_salted_rolling_contract_enforced_at_runtime(spark):
    """Round-2 review: a non-final chunk smaller than k must FAIL the job
    with guidance, not silently under-fill windows."""
    import numpy as np

    from nfl_feature_store_spark.operators.salted import salted_rolling_mean

    pdf = pd.DataFrame(
        {
            "conv_id": ["small"] * 100,
            "turn_idx": np.arange(100, dtype="int32"),
            "ts": pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(100) * 60, unit="s"),
            "value": np.arange(100, dtype="float64"),
        }
    )
    sdf = spark.createDataFrame(pdf)
    bad = salted_rolling_mean(sdf, "value", k=10, n_salt=32)  # ~3-row chunks
    with pytest.raises(Exception, match="non-final chunk"):
        bad.count()
    # compliant n_salt passes
    assert salted_rolling_mean(sdf, "value", k=10, n_salt=4).count() == 100


def test_salted_preserves_null_entity_rows(spark):
    """NULL entity is its own window partition in the unsalted semantics and
    must survive the salted path's joins (null-safe equality)."""
    import numpy as np

    from nfl_feature_store_spark.operators.salted import salted_expanding_mean

    pdf = pd.DataFrame(
        {
            "conv_id": ["a"] * 5 + [None] * 5,
            "turn_idx": np.arange(10, dtype="int32"),
            "ts": pd.Timestamp("2026-01-01") + pd.to_timedelta(np.arange(10) * 60, unit="s"),
            "value": np.arange(10, dtype="float64"),
        }
    )
    sdf = spark.createDataFrame(pdf)
    out = salted_expanding_mean(sdf, "value", n_salt=2).toPandas()
    assert len(out) == 10
    nulls = out[out["conv_id"].isna()].sort_values("turn_idx")
    # expanding mean of the NULL-entity group's own history (values 5..9)
    assert nulls["salted_expanding_value"].isna().iloc[0]
    assert nulls["salted_expanding_value"].iloc[1] == 5.0


def test_elo_pairwise_null_outcome_scores_without_update(spark):
    """Unplayed matches (NULL outcome — the reference's inference set) get
    elo_pre/prob from the current ratings but never move them."""
    import pandas as pd

    from nfl_feature_store_spark.operators.elo import elo_pairwise

    m = pd.DataFrame(
        {
            "home": ["A", "A", "A"],
            "away": ["B", "B", "B"],
            "outcome": [1.0, None, 1.0],
            "bucket": ["b1", "b2", "b3"],
        }
    )
    out = (
        elo_pairwise(spark.createDataFrame(m), "home", "away", "outcome", "bucket", k=20.0)
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert out.loc[0, "elo_pre_home"] == 1500.0
    assert out.loc[1, "elo_pre_home"] == 1510.0  # after the b1 win
    assert out.loc[2, "elo_pre_home"] == 1510.0  # NULL b2 did NOT update


def test_elo_pairwise_resume_rejects_nonstring_buckets(spark, tmp_path):
    from nfl_feature_store_spark.operators.elo import elo_pairwise
    from nfl_feature_store_spark.plans.checkpoint import PartitionManifest

    m = spark.createDataFrame(
        [("A", "B", 1.0, 1)], schema="home string, away string, outcome double, bucket int"
    )
    mf = PartitionManifest(str(tmp_path / "m.jsonl"))
    elo_pairwise(m, "home", "away", "outcome", "bucket", manifest=mf).count()  # fresh run OK
    mf2 = PartitionManifest(str(tmp_path / "m.jsonl"))
    with pytest.raises(ValueError, match="string bucket"):
        elo_pairwise(m, "home", "away", "outcome", "bucket", manifest=mf2)


def test_elo_pairwise_rejects_null_bucket(spark):
    """ADVICE round-2: NULL buckets sort first under repartitionByRange and
    would pool under the None loop sentinel, never flushed — silently-NULL
    elo output. Must fail fast instead."""
    import pandas as pd

    from nfl_feature_store_spark.operators.elo import elo_pairwise

    m = pd.DataFrame(
        {
            "home": ["A", "A"],
            "away": ["B", "B"],
            "outcome": [1.0, 1.0],
            "bucket": ["b1", None],
        }
    )
    with pytest.raises(ValueError, match="NULL value in bucket"):
        elo_pairwise(spark.createDataFrame(m), "home", "away", "outcome", "bucket").count()


def test_elo_pairwise_vectorized_big_bucket_matches_referee(spark):
    """Round-2 VERDICT #5: within-bucket updates are one vectorized numpy pass
    over pre-bucket ratings. A many-matches-per-bucket fixture (200 pairs x 3
    buckets, every entity <=1x per bucket) must match a per-match scalar
    referee exactly — vectorization is a pure refactor of the math."""
    import numpy as np
    import pandas as pd

    from nfl_feature_store_spark.operators.elo import elo_pairwise

    rng = np.random.default_rng(41)
    n_pairs, k = 200, 20.0
    rows = []
    for b in range(3):
        perm = rng.permutation(2 * n_pairs)
        for i in range(n_pairs):
            h, a = f"e{perm[2 * i]}", f"e{perm[2 * i + 1]}"
            rows.append((h, a, float(rng.integers(0, 2)), f"b{b}"))
    pdf = pd.DataFrame(rows, columns=["home", "away", "outcome", "bucket"])

    # scalar referee: sequential per-match updates from pre-bucket ratings
    ratings: dict[str, float] = {}
    exp_pre = []
    for b in ("b0", "b1", "b2"):
        chunk = pdf[pdf.bucket == b]
        pre = {e: ratings.get(e, 1500.0) for e in pd.concat([chunk.home, chunk.away])}
        for r in chunk.itertuples():
            ph, pa = pre[r.home], pre[r.away]
            exp_pre.append((r.home, r.away, b, ph, pa))
            prob = 1.0 / (1.0 + 10.0 ** (-(ph - pa) / 400.0))
            ratings[r.home] = ph + k * (r.outcome - prob)
            ratings[r.away] = pa - k * (r.outcome - prob)
    exp = pd.DataFrame(exp_pre, columns=["home", "away", "bucket", "eh", "ea"])

    got = (
        elo_pairwise(spark.createDataFrame(pdf), "home", "away", "outcome", "bucket", k=k)
        .toPandas()
        .merge(exp, on=["home", "away", "bucket"])
    )
    assert len(got) == 3 * n_pairs
    np.testing.assert_allclose(got["elo_pre_home"], got["eh"], rtol=0, atol=0)
    np.testing.assert_allclose(got["elo_pre_away"], got["ea"], rtol=0, atol=0)


def test_asof_join_rejects_colliding_columns(spark):
    """ADVICE round-2: probe payload and feature columns both alias back to
    bare names — a shared name would produce duplicate output columns."""
    from nfl_feature_store_spark.operators.asof import asof_join, salted_asof_join

    feats = spark.createDataFrame(
        [("c1", 1.0, 5.0)], "conv_id string, ts double, score double"
    )
    probes = spark.createDataFrame(
        [("c1", 2.0, 9.0)], "conv_id string, probe_ts double, score double"
    )
    with pytest.raises(ValueError, match="collide.*score"):
        asof_join(feats, probes)
    with pytest.raises(ValueError, match="collide.*score"):
        salted_asof_join(feats, probes)


def test_time_rollup_null_ts_keeps_grain_label(spark):
    """ADVICE round-2: grain labels derive from GROUPING(), not __g_* NULLness,
    so rows with NULL ts still land in every grain with a correct label (and a
    NULL bucket_start), matching the GROUPING()-based DuckDB oracle."""
    import pandas as pd
    from pyspark.sql import functions as F

    from nfl_feature_store_spark.operators.rollup import time_rollup

    pdf = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b"],
            "ts": [pd.Timestamp("2026-01-01 10:30"), pd.NaT, pd.NaT],
            "chars": [10, 20, 30],
        }
    )
    out = time_rollup(
        spark.createDataFrame(pdf),
        {"n": F.count("*"), "total": F.sum("chars")},
        grains=("hour", "day"),
    ).toPandas()
    assert not out["grain"].isna().any()
    # entity a: NULL-ts and real-ts rows are separate buckets per grain
    a_hour = out[(out.conv_id == "a") & (out.grain == "hour")]
    assert len(a_hour) == 2
    assert set(a_hour["total"]) == {10, 20}
    # entity b (all NULL ts): one NULL bucket per grain, labeled correctly
    b = out[out.conv_id == "b"]
    assert sorted(b["grain"]) == ["day", "hour"]
    assert b["bucket_start"].isna().all()


def test_composite_rank_rejects_weight_mismatch(spark):
    from nfl_feature_store_spark.operators.rank import composite_rank

    df = spark.createDataFrame([(1.0, 2.0, 3.0, "p")], "a double, b double, c double, period string")
    with pytest.raises(ValueError, match="weights"):
        composite_rank(df, ["a", "b", "c"], ["period"], weights=[0.5, 0.5])
