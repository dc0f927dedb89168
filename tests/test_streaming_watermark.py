"""Late-data semantics for streaming sessionization (round-3 verdict item 8).

SURVEY §2.9 promises watermark handling; this pins the DROP semantics: a
turn arriving after the watermark has passed it is discarded by the state
store and never mutates an emitted session — a documented DEVIATION from
batch backfill, which would merge the late turn into its session. Turns
inside the watermark ARE incorporated. Exercised with three availableNow
runs sharing one checkpoint (the watermark persists across restarts), which
is exactly the late-batch topology of an at-least-once transport.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nfl_feature_store_spark.operators.sessionize import sessionize
from nfl_feature_store_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from nfl_feature_store_spark.streaming.sessions import streaming_session_aggregates

T0 = pd.Timestamp("2026-03-01 00:00:00")


def _rows(spec):
    return pd.DataFrame(
        [
            (conv, idx, "user", f"{conv}-{idx}", "", T0 + pd.Timedelta(minutes=m))
            for conv, idx, m in spec
        ],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )


def _run(spark, src_dir, ckpt, out_dir):
    # file sink, not memory: the memory sink refuses checkpoint RECOVERY,
    # and watermark persistence across restarts is exactly what this test
    # exercises. Append-mode parquet accumulates each emitted session once.
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src_dir)
    sess = streaming_session_aggregates(stream, gap_s=1800, watermark="2 hours")
    q = (
        sess.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    return (
        str(tmp_path_factory.mktemp("wm_src")),
        str(tmp_path_factory.mktemp("wm_ckpt")),
        str(tmp_path_factory.mktemp("wm_out")),
    )


def test_watermark_drops_late_turn_batch_would_backfill(spark, dirs):
    src, ckpt, sink = dirs

    # run 1: session A (minutes 0..5, 3 turns) + a far turn at minute 600
    # that advances the watermark to minute 480 and opens session B
    batch1 = _rows([("w1", 0, 0), ("w1", 1, 3), ("w1", 2, 5), ("w1", 10, 600)])
    spark.createDataFrame(batch1, schema=TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run(spark, src, ckpt, sink)

    # run 2: a LATE turn at minute 30 (< watermark 480 -> must be dropped;
    # gap 30min means batch would merge it into session A) and an in-time
    # turn at minute 605 that joins open session B
    batch2 = _rows([("w1", 3, 30), ("w1", 11, 605)])
    spark.createDataFrame(batch2, schema=TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run(spark, src, ckpt, sink)

    # run 3: unrelated far-future turn pushes the watermark past session B's
    # close so it flushes
    batch3 = _rows([("w9", 0, 2000)])
    spark.createDataFrame(batch3, schema=TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run(spark, src, ckpt, sink)
    out = spark.read.parquet(sink).toPandas()

    w1 = out[out.conv_id == "w1"].sort_values("session_start").reset_index(drop=True)
    assert len(w1) == 2, w1

    # session A emitted once, WITHOUT the late minute-30 turn
    a = w1.iloc[0]
    assert a["session_start"] == T0 and a["n_turns"] == 3, a

    # session B incorporated the in-time minute-605 turn
    b = w1.iloc[1]
    assert b["session_start"] == T0 + pd.Timedelta(minutes=600) and b["n_turns"] == 2, b

    # batch backfill over the SAME files WOULD merge the late turn into
    # session A — the documented deviation this test pins
    batch = sessionize(spark.read.parquet(src), gap_s=1800)
    batch_a = (
        batch.filter((F.col("conv_id") == "w1") & (F.col("session_id") == 0))
        .groupBy("conv_id", "session_id")
        .agg(F.count("*").alias("n_turns"))
        .toPandas()
    )
    assert batch_a["n_turns"].iloc[0] == 4  # 3 on-time + 1 late
