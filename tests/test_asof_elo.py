"""As-of join vs pandas merge_asof referee; Elo vs a pure-python referee;
pairwise Elo probability sanity (FIXTURES.md F3/F4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from nfl_feature_store_spark.operators.asof import asof_join, latest_snapshot
from nfl_feature_store_spark.operators.elo import elo_pairwise, elo_per_entity
from tests.referee import referee_asof


@pytest.fixture(scope="module")
def feat_probe(transcripts_pdf):
    feats = (
        transcripts_pdf.drop_duplicates(["conv_id", "turn_idx"], keep="last")
        .groupby(["conv_id", "ts"], as_index=False)
        .agg(snap=("text", lambda s: float(len(s.iloc[0]))))
    )
    rng = np.random.default_rng(7)
    base = pd.Timestamp("2026-01-01 00:00:00")
    convs = feats["conv_id"].unique()
    probes = pd.DataFrame(
        {
            "conv_id": rng.choice(convs, 500),
            "probe_ts": base
            + pd.to_timedelta(rng.integers(-3600, 86400 * 3, 500), unit="s"),
            "probe_id": np.arange(500),
        }
    )
    # edge probes: before first turn, exactly on a turn, after last turn (F4)
    first = feats.iloc[0]
    exact = pd.DataFrame(
        {
            "conv_id": [first.conv_id, first.conv_id, first.conv_id],
            "probe_ts": [
                first.ts - pd.Timedelta(hours=2),
                first.ts,
                feats[feats.conv_id == first.conv_id].ts.max() + pd.Timedelta(days=30),
            ],
            "probe_id": [9001, 9002, 9003],
        }
    )
    return feats, pd.concat([probes, exact], ignore_index=True)


@pytest.mark.parametrize("inclusive", [True, False])
def test_asof_matches_merge_asof(spark, feat_probe, inclusive):
    feats, probes = feat_probe
    sf = spark.createDataFrame(feats)
    sp = spark.createDataFrame(probes)
    got = (
        asof_join(sf, sp, feature_cols=["snap"], inclusive=inclusive)
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    exp = (
        referee_asof(feats, probes, ["snap"], inclusive=inclusive)
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(
        got["snap"].to_numpy(dtype=float), exp["snap"].to_numpy(dtype=float), equal_nan=True
    )
    # before-first probe NULL; exact-ts probe respects the tie rule
    row_before = got[got.probe_id == 9001]
    assert row_before["snap"].isna().all()
    row_exact = got[got.probe_id == 9002]
    assert row_exact["snap"].isna().all() != inclusive


@pytest.mark.parametrize("inclusive", [True, False])
def test_salted_asof_matches_unsalted(spark, feat_probe, inclusive):
    """The salted decomposition must be invisible: same merge_asof referee,
    same tie rule, arbitrary n_salt."""
    from nfl_feature_store_spark.operators.asof import salted_asof_join

    feats, probes = feat_probe
    got = (
        salted_asof_join(
            spark.createDataFrame(feats), spark.createDataFrame(probes),
            feature_cols=["snap"], inclusive=inclusive, n_salt=16,
        )
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    exp = (
        referee_asof(feats, probes, ["snap"], inclusive=inclusive)
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(
        got["snap"].to_numpy(dtype=float), exp["snap"].to_numpy(dtype=float), equal_nan=True
    )


def test_latest_snapshot_is_last_row(spark, transcripts_sdf):
    latest = latest_snapshot(transcripts_sdf, order_cols=("ts", "turn_idx")).toPandas()
    pdf = transcripts_sdf.toPandas().sort_values(["conv_id", "ts", "turn_idx"])
    exp = pdf.groupby("conv_id").tail(1)
    assert len(latest) == latest["conv_id"].nunique() == len(exp)
    m = latest.set_index("conv_id")["turn_idx"]
    e = exp.set_index("conv_id")["turn_idx"]
    assert (m.sort_index() == e.sort_index()).all()


def _elo_referee(outcomes, k=20.0, init=1500.0, opp=1500.0):
    r, out = init, []
    for o in outcomes:
        out.append(r)
        if not np.isnan(o):
            r += k * (o - 1.0 / (1.0 + 10.0 ** (-(r - opp) / 400.0)))
    return out


def test_elo_per_entity_matches_referee(spark):
    rng = np.random.default_rng(11)
    rows = []
    base = pd.Timestamp("2026-01-01")
    for c in range(20):
        n = int(rng.integers(1, 60))
        for i in range(n):
            rows.append((f"e{c}", i, base + pd.Timedelta(seconds=i * 60), float(rng.integers(0, 2))))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts", "outcome"])
    got = (
        elo_per_entity(spark.createDataFrame(pdf), outcome_col="outcome")
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"])
    )
    for c, grp in got.groupby("conv_id"):
        exp = _elo_referee(grp["outcome"].to_numpy(dtype=float))
        np.testing.assert_allclose(grp["elo_pre"].to_numpy(), exp, rtol=1e-12)


def _pairwise_referee(matches: pd.DataFrame, k=20.0, init=1500.0) -> pd.DataFrame:
    """Bucket-synchronous pairwise Elo: pre-ratings frozen within a bucket."""
    ratings: dict = {}
    rows = []
    for b in sorted(matches["bucket"].unique()):
        grp = matches[matches["bucket"] == b]
        pre = {e: ratings.get(e, init) for e in pd.concat([grp["home"], grp["away"]])}
        for _, m in grp.iterrows():
            ph, pa = pre[m["home"]], pre[m["away"]]
            prob = 1.0 / (1.0 + 10.0 ** (-(ph - pa) / 400.0))
            rows.append((m["match_id"], ph, pa, prob))
            d = k * (m["outcome"] - prob)
            ratings[m["home"]] = ratings.get(m["home"], init) + d
            ratings[m["away"]] = ratings.get(m["away"], init) - d
    return pd.DataFrame(rows, columns=["match_id", "pre_h", "pre_a", "prob_h"])


def _league_fixture(n_buckets=20, n_pairs=6, seed=13) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    mid = 0
    for b in range(n_buckets):
        perm = rng.permutation(n_pairs * 2)
        for p in range(n_pairs):
            rows.append(
                (
                    f"t{perm[2 * p]:02d}",
                    f"t{perm[2 * p + 1]:02d}",
                    float(rng.integers(0, 2)),
                    f"b{b:03d}",
                    mid,
                )
            )
            mid += 1
    return pd.DataFrame(rows, columns=["home", "away", "outcome", "bucket", "match_id"])


def test_elo_pairwise_never_collects_match_stream(spark):
    """Round-1 VERDICT #1: driver memory must be bounded per bucket, not by
    total history. toPandas on ANY DataFrame is poisoned for the duration of
    the call — the bucket loop must go through toLocalIterator."""
    from pyspark.sql import DataFrame as SparkDataFrame

    matches = _league_fixture()
    sdf = spark.createDataFrame(matches)

    orig = SparkDataFrame.toPandas

    def boom(self):
        raise AssertionError("elo_pairwise collected a whole DataFrame via toPandas")

    SparkDataFrame.toPandas = boom
    try:
        out_df = elo_pairwise(sdf, "home", "away", "outcome", "bucket", k=20.0)
    finally:
        SparkDataFrame.toPandas = orig

    got = out_df.toPandas().sort_values("match_id").reset_index(drop=True)
    exp = _pairwise_referee(matches).sort_values("match_id").reset_index(drop=True)
    np.testing.assert_allclose(got["elo_pre_home"], exp["pre_h"], rtol=1e-12)
    np.testing.assert_allclose(got["elo_pre_away"], exp["pre_a"], rtol=1e-12)
    np.testing.assert_allclose(got["elo_prob_home"], exp["prob_h"], rtol=1e-12)


def test_elo_pairwise_resumes_from_manifest(spark, tmp_path):
    """Ratings checkpoint per bucket: a run over the first half, then a run
    over the full stream with the same manifest, must (a) skip the completed
    buckets' driver iteration (manifest gains exactly the remaining entries)
    and (b) reproduce the uninterrupted result bit-for-bit."""
    from nfl_feature_store_spark.plans.checkpoint import PartitionManifest

    matches = _league_fixture(n_buckets=10)
    sdf = spark.createDataFrame(matches)
    path = str(tmp_path / "elo_manifest.jsonl")

    fresh = (
        elo_pairwise(sdf, "home", "away", "outcome", "bucket", k=20.0)
        .toPandas()
        .sort_values("match_id")
        .reset_index(drop=True)
    )

    half = sdf.filter(F.col("bucket") < "b005")
    m1 = PartitionManifest(path)
    elo_pairwise(half, "home", "away", "outcome", "bucket", k=20.0, manifest=m1).count()
    with open(path) as f:
        assert sum(1 for _ in f) == 5  # five buckets checkpointed

    m2 = PartitionManifest(path)
    resumed = (
        elo_pairwise(sdf, "home", "away", "outcome", "bucket", k=20.0, manifest=m2)
        .toPandas()
        .sort_values("match_id")
        .reset_index(drop=True)
    )
    with open(path) as f:
        assert sum(1 for _ in f) == 10  # only the 5 remaining buckets re-ran

    for c in ("elo_pre_home", "elo_pre_away", "elo_prob_home"):
        np.testing.assert_array_equal(resumed[c].to_numpy(), fresh[c].to_numpy())


def test_elo_pairwise_spills_snapshots_bounded(spark, tmp_path):
    """Round-4 VERDICT item 4: with snapshot_spill_dir the driver's
    in-memory snapshot buffer must stay bounded by one chunk
    (spill_every_buckets x touched-entities) on a many-bucket fixture, the
    spilled chunks + remainder must union to the identical scoring result,
    and resume through a manifest must still agree bit-for-bit."""
    matches = _league_fixture(n_buckets=60, n_pairs=6, seed=17)
    sdf = spark.createDataFrame(matches)

    fresh = (
        elo_pairwise(sdf, "home", "away", "outcome", "bucket", k=20.0)
        .toPandas()
        .sort_values("match_id")
        .reset_index(drop=True)
    )

    stats: dict = {}
    spilled = (
        elo_pairwise(
            sdf,
            "home",
            "away",
            "outcome",
            "bucket",
            k=20.0,
            snapshot_spill_dir=str(tmp_path / "snapshots"),
            spill_every_buckets=8,
            spill_stats=stats,
        )
        .toPandas()
        .sort_values("match_id")
        .reset_index(drop=True)
    )
    assert stats["chunks"] == 60 // 8  # 7 full chunks, remainder in memory
    # one bucket touches <= 2 * n_pairs entities, so the buffer never holds
    # more than spill_every_buckets full buckets' snapshots
    assert stats["max_rows_in_memory"] <= 8 * 2 * 6
    for c in ("elo_pre_home", "elo_pre_away", "elo_prob_home"):
        np.testing.assert_array_equal(spilled[c].to_numpy(), fresh[c].to_numpy())

    # referee parity (the spilled union is the scoring input)
    exp = _pairwise_referee(matches).sort_values("match_id").reset_index(drop=True)
    np.testing.assert_allclose(spilled["elo_pre_home"], exp["pre_h"], rtol=1e-12)
    np.testing.assert_allclose(spilled["elo_prob_home"], exp["prob_h"], rtol=1e-12)


def test_elo_pairwise_probabilities_and_updates(spark):
    # every entity appears at most once per week — the operator's contract,
    # now enforced with a fail-fast (see test_elo_pairwise_duplicate_entity)
    matches = pd.DataFrame(
        {
            "home": ["A", "B", "A", "C", "B", "A"],
            "away": ["B", "C", "C", "A", "A", "B"],
            "outcome": [1.0, 0.0, 1.0, 0.0, 0.5, 1.0],
            "week": [1, 6, 2, 3, 4, 5],
        }
    )
    out = elo_pairwise(
        spark.createDataFrame(matches), "home", "away", "outcome", "week", k=20.0
    ).toPandas().sort_values("week").reset_index(drop=True)
    # week 1: both fresh at 1500 → prob 0.5
    assert out.loc[0, "elo_pre_home"] == 1500.0 and out.loc[0, "elo_prob_home"] == 0.5
    # A beat B in week 1 → A enters week 2 above 1500
    wk2 = out[out.week == 2].iloc[0]
    assert wk2["elo_pre_home"] == pytest.approx(1510.0)
    # zero-sum: total rating mass conserved per match
    for _, r in out.iterrows():
        assert r["elo_prob_home"] == pytest.approx(
            1.0 / (1.0 + 10 ** (-(r["elo_pre_home"] - r["elo_pre_away"]) / 400.0))
        )


def test_elo_pairwise_duplicate_entity_fails_fast(spark):
    """Round-3 advice: an entity in two played matches of one bucket would
    have its second delta silently discarded by the vectorized bucket
    update — the operator must reject the bucket instead."""
    dup = pd.DataFrame(
        {
            "home": ["A", "B"],
            "away": ["B", "C"],  # B plays twice in week 1
            "outcome": [1.0, 0.0],
            "week": [1, 1],
        }
    )
    with pytest.raises(Exception, match="more than one played match"):
        elo_pairwise(spark.createDataFrame(dup), "home", "away", "outcome", "week").count()
    # unplayed (NULL-outcome) duplicates are fine: no delta is applied
    byes = pd.DataFrame(
        {
            "home": ["A", "B"],
            "away": ["B", "A"],
            "outcome": [None, None],
            "week": [1, 1],
        }
    ).astype({"outcome": "float64"})
    out = elo_pairwise(spark.createDataFrame(byes), "home", "away", "outcome", "week").toPandas()
    assert (out["elo_pre_home"] == 1500.0).all()


def test_elo_pairwise_driver_pulls_one_row_per_bucket(spark):
    """Round-3 advice item 7: the driver phase must iterate buckets, not
    matches — toLocalIterator must yield exactly one (pre-aggregated) row
    per bucket."""
    matches = _league_fixture(n_buckets=8, n_pairs=5)
    sdf = spark.createDataFrame(matches)

    # patch the CONCRETE DataFrame class (PySpark 4's classic subclass
    # overrides toLocalIterator — patching pyspark.sql.DataFrame is a no-op)
    cls = type(sdf)
    pulled = {"rows": 0}
    orig = cls.toLocalIterator

    def counting(self, prefetchPartitions=False):
        for row in orig(self, prefetchPartitions=prefetchPartitions):
            pulled["rows"] += 1
            yield row

    cls.toLocalIterator = counting
    try:
        out = elo_pairwise(sdf, "home", "away", "outcome", "bucket", k=20.0)
        got = out.toPandas().sort_values("match_id").reset_index(drop=True)
    finally:
        cls.toLocalIterator = orig

    assert pulled["rows"] == 8, f"expected 1 row per bucket, driver pulled {pulled['rows']}"
    exp = _pairwise_referee(matches).sort_values("match_id").reset_index(drop=True)
    np.testing.assert_allclose(got["elo_pre_home"], exp["pre_h"], rtol=1e-12)
    np.testing.assert_allclose(got["elo_pre_away"], exp["pre_a"], rtol=1e-12)


def test_elo_pairwise_snapshot_joins_stay_broadcast(spark):
    """Round-6: the scoring join's snapshot side is small by construction
    (one row per (bucket, entity) rating) but its size ESTIMATE grows with
    history; the explicit broadcast hint must keep BOTH scoring joins
    BroadcastHashJoin so the match table is never shuffled on the compound
    string keys."""
    matches = _league_fixture(n_buckets=6)
    sdf = spark.createDataFrame(matches)
    out = elo_pairwise(sdf, "home", "away", "outcome", "bucket", k=20.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
