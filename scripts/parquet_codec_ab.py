"""A/B: parquet storage codec (snappy default vs zstd) for the feature-store
sink path. Metric: bytes on disk (deterministic) + write/read-back wall
(noise-prone secondary). One JVM, alternated writes to private dirs.

Run: python scripts/parquet_codec_ab.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def du(path: str) -> int:
    total = 0
    for root, _d, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from nfl_feature_store_spark import get_spark
    from nfl_feature_store_spark.plans.pipeline import backfill_features
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = get_spark(app_name="pq-codec", master="local[8]", shuffle_partitions=8)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    transcripts = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.coalesce(F.col("props"), F.lit("")).alias("text"),
        F.lit("").alias("tool"),
        F.col("ts"),
    )
    feats = backfill_features(transcripts).cache()
    feats.count()  # materialize once so each write measures the sink only

    out = []
    base = tempfile.mkdtemp(prefix="pqcodec-")
    try:
        for codec in ("snappy", "zstd", "snappy", "zstd"):
            d = os.path.join(base, f"{codec}-{len(out)}")
            t0 = time.perf_counter()
            feats.write.option("compression", codec).mode("overwrite").parquet(d)
            wr = time.perf_counter() - t0
            t0 = time.perf_counter()
            n = spark.read.parquet(d).count()
            rd = time.perf_counter() - t0
            rec = {"codec": codec, "bytes": du(d), "write_s": round(wr, 2),
                   "read_s": round(rd, 2), "rows": n}
            out.append(rec)
            print(json.dumps(rec), flush=True)
            shutil.rmtree(d)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
