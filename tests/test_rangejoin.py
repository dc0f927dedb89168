"""Interval-overlap range join: validation guards (round-3 advice) and
hot-bin salting parity (round-3 verdict item 6).

The binned equi-join must (a) reject NULL / inverted intervals with a
dedicated error instead of silently dropping or mis-reporting them, and
(b) produce identical pairs with and without salt on a planted hot bin —
the skew pattern of one deploy window overlapped by many sessions.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nfl_feature_store_spark.operators.rangejoin import interval_overlap_join

IVL_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("iid", T.LongType()),
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("end_ts", T.TimestampType()),
    ]
)


def _ivl(spark, rows):
    pdf = pd.DataFrame(rows, columns=["entity", "iid", "start_ts", "end_ts"])
    return spark.createDataFrame(pdf, schema=IVL_SCHEMA)


@pytest.fixture(scope="module")
def base(spark):
    t0 = pd.Timestamp("2026-05-01 00:00:00")
    left = _ivl(
        spark,
        [("e1", i, t0 + pd.Timedelta(hours=i), t0 + pd.Timedelta(hours=i + 2)) for i in range(6)],
    )
    right = _ivl(spark, [("e1", 100, t0 + pd.Timedelta(hours=1), t0 + pd.Timedelta(hours=3))])
    return left, right


def _join(left, right, **kw):
    kw.setdefault("bin_width_s", 3600)
    return interval_overlap_join(
        left, right, entity_col="entity", left_keys=["iid"], right_keys=["iid"], **kw
    )


def test_null_interval_raises_dedicated_error(spark, base):
    left, right = base
    t0 = pd.Timestamp("2026-05-01 00:00:00")
    bad = _ivl(spark, [("e1", 7, None, t0 + pd.Timedelta(hours=1))])
    with pytest.raises(Exception, match="NULL start_ts/end_ts on the left"):
        _join(left.unionByName(bad), right).collect()
    with pytest.raises(Exception, match="NULL start_ts/end_ts on the right"):
        _join(left, right.unionByName(bad)).collect()


def test_inverted_interval_raises_dedicated_error(spark, base):
    left, right = base
    t0 = pd.Timestamp("2026-05-01 00:00:00")
    bad = _ivl(spark, [("e1", 8, t0 + pd.Timedelta(hours=5), t0 + pd.Timedelta(hours=1))])
    with pytest.raises(Exception, match="inverted interval"):
        _join(left.unionByName(bad), right).collect()


def test_degenerate_span_guard_still_fires(spark, base):
    """The max-bins guard keeps its own dedicated message (it must not be
    shadowed by the new validation guards)."""
    left, right = base
    t0 = pd.Timestamp("2026-05-01 00:00:00")
    wide = _ivl(spark, [("e1", 9, t0, t0 + pd.Timedelta(days=30))])
    with pytest.raises(Exception, match="spans > 5 bins"):
        _join(left.unionByName(wide), right, max_bins_per_row=5).collect()


@pytest.fixture(scope="module")
def hot_bin(spark):
    """One deploy window ('e1' day 0) overlapped by 3000 short sessions —
    every candidate lands on a handful of (entity, bin) keys."""
    t0 = pd.Timestamp("2026-06-01 00:00:00")
    sessions = [
        ("e1", i, t0 + pd.Timedelta(seconds=20 * i), t0 + pd.Timedelta(seconds=20 * i + 600))
        for i in range(3000)
    ]
    deploys = [
        ("e1", 100, t0, t0 + pd.Timedelta(hours=12)),
        ("e1", 101, t0 + pd.Timedelta(hours=10), t0 + pd.Timedelta(hours=30)),
        ("e2", 102, t0, t0 + pd.Timedelta(hours=12)),  # other entity: no pairs
    ]
    return _ivl(spark, sessions), _ivl(spark, deploys)


def test_salted_hot_bin_matches_unsalted(spark, hot_bin):
    sessions, deploys = hot_bin
    cols = ["entity", "l_iid", "r_iid", "overlap_secs"]
    plain = _join(sessions, deploys, bin_width_s=86400).select(*cols).toPandas()
    salted = _join(sessions, deploys, bin_width_s=86400, salt_buckets=8).select(*cols).toPandas()
    key = ["entity", "l_iid", "r_iid"]
    p = plain.sort_values(key).reset_index(drop=True)
    s = salted.sort_values(key).reset_index(drop=True)
    assert len(p) == len(s) and len(p) > 3000  # every session meets >=1 deploy
    pd.testing.assert_frame_equal(p, s)
    # referee: overlap counts per deploy window
    n_100 = (p["r_iid"] == 100).sum()
    exp_100 = sum(1 for i in range(3000) if 20 * i <= 12 * 3600)  # closed intervals
    assert n_100 == exp_100


def test_salted_join_keys_include_salt(spark, hot_bin):
    """The salted variant must actually join on the salt (hot key split),
    not merely compute it: the executed plan's join keys include __salt."""
    sessions, deploys = hot_bin
    out = _join(sessions, deploys, bin_width_s=86400, salt_buckets=8)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_no_dedup_shuffle(spark, hot_bin):
    """The first-shared-bin filter replaces dropDuplicates: any exchange in
    the executed plan belongs to the join itself (keys (entity, __bin));
    there is no post-join exchange on pair keys. On this fixture AQE
    broadcasts the deploy side, so the plan may legally have ZERO
    exchanges — which the old dropDuplicates version could never achieve
    (its dedup always shuffled on the pair keys)."""
    import re

    sessions, deploys = hot_bin
    out = _join(sessions, deploys, bin_width_s=86400)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    ex = [re.sub(r"#\d+L?", "", e) for e in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)]
    assert len(ex) <= 2, ex
    for e in ex:
        assert e.startswith("entity, __bin"), ex
    assert "iid" not in " ".join(ex)
