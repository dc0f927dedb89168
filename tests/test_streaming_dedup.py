"""Stream-static dedup (streaming/dedup.py): rows surviving the streaming
anti-join + within-watermark dedup must equal the batch equivalent — new
fingerprints only, one row per fingerprint, historical side always wins."""

from __future__ import annotations

from datetime import datetime

from nfl_feature_store_spark.functions.text import doc_fingerprint
from nfl_feature_store_spark.streaming.dedup import (
    reference_corpus_fingerprints,
    streaming_dedup_against_reference,
)

SCHEMA = "conv_id string, turn_idx int, text string, ts timestamp"


def _ts(minute: int):
    return datetime(2026, 1, 1, 9, minute)


def test_streaming_dedup_vs_reference_and_within_stream(spark, tmp_path_factory):
    # historical corpus: two known texts (one with different whitespace/case
    # to pin the normalization), streamed batch re-delivers one of them
    hist = spark.createDataFrame(
        [("h1", 0, "Hello   World", _ts(0)), ("h2", 0, "old news", _ts(1))], SCHEMA
    )
    ref = reference_corpus_fingerprints(hist, text_col="text")

    rows = [
        ("c1", 0, "hello world", _ts(10)),      # dup of h1 after normalization
        ("c1", 1, "fresh take one", _ts(11)),   # new
        ("c2", 0, "fresh take one", _ts(12)),   # in-stream dup of c1/1
        ("c2", 1, "fresh take two", _ts(13)),   # new
        ("c3", 0, "OLD NEWS  ", _ts(14)),       # dup of h2 after normalization
        ("c3", 1, None, _ts(15)),               # NULL text -> '' fingerprint, new
    ]
    src = str(tmp_path_factory.mktemp("dedup_src"))
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = streaming_dedup_against_reference(stream, ref, watermark="10 minutes")
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_out").toPandas()

    # batch equivalent: anti-join on fingerprint, then one row per fingerprint
    batch = (
        spark.read.parquet(src)
        .withColumn("fingerprint", doc_fingerprint("text"))
        .join(ref, "fingerprint", "left_anti")
    )
    exp_fps = {r["fingerprint"] for r in batch.select("fingerprint").distinct().collect()}

    assert set(got["fingerprint"]) == exp_fps
    assert len(got) == len(exp_fps), "within-stream duplicates must collapse to one row"
    # the historical replays are gone, the NULL-text row survives
    texts = set(got["text"].fillna("∅"))
    assert "hello world" not in texts and "OLD NEWS  " not in texts
    assert "∅" in texts and "fresh take two" in texts
    # schema contract: input columns + fingerprint
    assert set(got.columns) == {"conv_id", "turn_idx", "text", "ts", "fingerprint"}


def test_reference_fingerprints_require_column(spark):
    import pytest

    bad = spark.createDataFrame([("x",)], "notfp string")
    stream = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="fingerprint"):
        streaming_dedup_against_reference(stream, bad, text_col="value")
