"""Structured Streaming sessionization (streaming/sessions.py): the
session_window aggregates must match the batch sessionizer's per-session
rollups on the same data (availableNow trigger over a file source)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nfl_feature_store_spark.operators.sessionize import sessionize
from nfl_feature_store_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from nfl_feature_store_spark.streaming.sessions import streaming_session_aggregates


@pytest.fixture(scope="module")
def staged_dir(spark, transcripts_pdf, tmp_path_factory):
    # dedup fixture duplicates first: streaming dedup-by-key is a separate
    # concern; this test pins the session-window semantics
    pdf = transcripts_pdf.drop_duplicates(["conv_id", "turn_idx"], keep="last")
    pdf = pdf[pdf.conv_id.isin(pdf.conv_id.unique()[:40])]
    d = str(tmp_path_factory.mktemp("stream_src"))
    spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA).coalesce(2).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_streaming_sessions_match_batch(spark, staged_dir, tmp_path_factory):
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(staged_dir)
    sess = streaming_session_aggregates(stream, gap_s=1800, watermark="10 minutes")
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sessions_out").toPandas()

    batch = sessionize(spark.read.parquet(staged_dir), gap_s=1800)
    exp = (
        batch.groupBy("conv_id", "session_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("total_chars"),
            F.min("ts").alias("session_start"),
        )
        .toPandas()
    )
    # append mode emits only watermark-closed sessions; availableNow on a
    # finite source closes all but each conv's last open session, so compare
    # on the emitted subset — every emitted session must match batch exactly
    assert len(got) > 0
    key = ["conv_id", "session_start"]
    merged = got.merge(exp, on=key, suffixes=("_s", "_b"), how="left")
    assert merged["n_turns_b"].notna().all(), "streaming emitted a session batch doesn't have"
    assert (merged["n_turns_s"] == merged["n_turns_b"]).all()
    assert (merged["total_chars_s"] == merged["total_chars_b"]).all()


def test_masked_zero_fill():
    from nfl_feature_store_spark.functions.turn_metrics import masked_zero_fill
    from nfl_feature_store_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    df = spark.createDataFrame(
        pd.DataFrame({"a": [1.0, None], "epa_like": [None, 2.0], "s": ["x", None]})
    )
    out = masked_zero_fill(df, protected=("epa_like",)).toPandas()
    assert out["a"].tolist() == [1.0, 0.0]
    assert out["epa_like"].isna().tolist() == [True, False]  # protected stays NULL
    assert out["s"].isna().tolist() == [False, True]  # strings untouched
