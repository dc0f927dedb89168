"""State-TTL eviction for the stateful streaming kernels (round-4 VERDICT
item 3): an idle conversation's state must be REMOVED once the watermark
passes ``last_turn_ts + state_ttl``, and a later reappearance must RESTART
the recursion (EWMA reseeds — first new row NULL; Elo re-inits) instead of
resuming from pre-eviction state. Without eviction the state store grows
with every conversation ever seen.

Staging: four files consumed one per micro-batch (maxFilesPerTrigger=1).
Conversation A is active only in file 1; B spans every batch and drags the
watermark 40 days forward (past A's 30-day TTL), so A's timeout fires in
the batch where it has no data; file 4 brings A back.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, chars double"
)


def _rows(conv, idxs, ts_list, chars):
    return pd.DataFrame(
        {
            "conv_id": conv,
            "turn_idx": pd.array(idxs, dtype="int32"),
            "role": "user",
            "text": "x",
            "tool": "",
            "ts": ts_list,
            "chars": pd.array(chars, dtype="float64"),
        }
    )


def _run(spark, tmp_path_factory, op_factory, query_name):
    t0 = pd.Timestamp("2026-01-01")
    late = t0 + pd.Timedelta(days=40)
    files = [
        # batch 1: A and B both active
        pd.concat(
            [
                _rows("A", range(4), [t0 + pd.Timedelta(seconds=60 * j) for j in range(4)], [100.0, 200.0, 300.0, 400.0]),
                _rows("B", range(4), [t0 + pd.Timedelta(seconds=7 + 60 * j) for j in range(4)], [10.0, 20.0, 30.0, 40.0]),
            ]
        ),
        # batch 2: only B, 40 days later -> watermark jumps past A's TTL
        _rows("B", [4], [late], [50.0]),
        # batch 3: only B -> A (idle, timed out) is evicted THIS batch
        _rows("B", [5], [late + pd.Timedelta(minutes=10)], [60.0]),
        # batch 4: A reappears (newer than the watermark) -> fresh recursion
        _rows("A", [4, 5], [late + pd.Timedelta(minutes=20), late + pd.Timedelta(minutes=21)], [500.0, 600.0]),
    ]
    d = str(tmp_path_factory.mktemp(f"{query_name}_src"))
    for i, pdf in enumerate(files):
        spark.createDataFrame(pdf, schema=SCHEMA).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/f{i}"
        )
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(d + "/f*")
    out = op_factory(stream)
    ckpt = str(tmp_path_factory.mktemp(f"{query_name}_ckpt"))
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    return (
        spark.sql(f"select * from {query_name}")
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"])
        .reset_index(drop=True)
    )


def test_streaming_ewma_evicts_idle_state_and_reseeds(spark, tmp_path_factory):
    from nfl_feature_store_spark.streaming.stateful import streaming_ewma

    got = _run(
        spark,
        tmp_path_factory,
        lambda s: streaming_ewma(s, metrics=("chars",), span=10, state_ttl="30 days"),
        "ewma_ttl_out",
    )
    a = got[got.conv_id == "A"].reset_index(drop=True)
    assert len(a) == 6  # nothing dropped, nothing duplicated
    # pre-gap rows: normal strictly-past recursion
    assert np.isnan(a.loc[0, "ewma_chars"]) and a.loc[1, "ewma_chars"] == 100.0
    # reappearance: state was evicted, so the recursion RESTARTS —
    # first new row NULL again, second reseeds from the first new value
    assert np.isnan(a.loc[4, "ewma_chars"]), "evicted state leaked into reappearance"
    assert a.loc[5, "ewma_chars"] == 500.0
    # B (active throughout) keeps its unbroken recursion across all batches
    b = got[got.conv_id == "B"].reset_index(drop=True)
    assert len(b) == 6
    exp = pd.Series([10.0, 20, 30, 40, 50]).ewm(span=10, adjust=False).mean()
    np.testing.assert_allclose(b["ewma_chars"].to_numpy()[1:], exp.to_numpy(), rtol=1e-12)


def test_streaming_ewma_no_ttl_keeps_state_forever(spark, tmp_path_factory):
    """state_ttl=None restores keep-forever: A's reappearance RESUMES the
    old recursion (non-NULL immediately) even after the 40-day gap."""
    from nfl_feature_store_spark.streaming.stateful import streaming_ewma

    got = _run(
        spark,
        tmp_path_factory,
        lambda s: streaming_ewma(s, metrics=("chars",), span=10, state_ttl=None),
        "ewma_nottl_out",
    )
    a = got[got.conv_id == "A"].reset_index(drop=True)
    assert len(a) == 6
    assert not np.isnan(a.loc[4, "ewma_chars"]), "state should persist without TTL"
    exp = pd.Series([100.0, 200, 300, 400, 500]).ewm(span=10, adjust=False).mean()
    np.testing.assert_allclose(a["ewma_chars"].to_numpy()[1:], exp.to_numpy(), rtol=1e-12)


def test_streaming_elo_evicts_idle_state_and_reinits(spark, tmp_path_factory):
    from nfl_feature_store_spark.streaming.stateful import streaming_elo

    got = _run(
        spark,
        tmp_path_factory,
        lambda s: streaming_elo(s, outcome_col="chars", k=20.0, state_ttl="30 days"),
        "elo_ttl_out",
    )
    a = got[got.conv_id == "A"].reset_index(drop=True)
    assert len(a) == 6
    assert a.loc[0, "elo_pre"] == 1500.0
    assert a.loc[1, "elo_pre"] != 1500.0  # updates applied pre-gap
    # reappearance after eviction: re-initialized at 1500
    assert a.loc[4, "elo_pre"] == 1500.0, "evicted Elo state leaked into reappearance"
    assert a.loc[5, "elo_pre"] != 1500.0
