"""A/B: shuffle compression codec (lz4 default vs zstd) on the flagship
backfill. Decisive metric: SHUFFLE BYTES on disk (deterministic, host-noise
free) — the quantity that becomes network traffic on a real cluster. Wall
time is recorded as the secondary, noise-prone metric.

Run: python scripts/codec_ab.py [sf_dir] — spawns one fresh JVM per codec
with spark.local.dir pointed at a private temp dir, runs the flagship once
warm + twice measured, then sums the blockmgr shuffle files.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

CHILD = r"""
import json, os, sys, time
sf_dir, codec, local_dir = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, "/root/repo")
from nfl_feature_store_spark import get_spark
from nfl_feature_store_spark.plans.pipeline import backfill_features
from pyspark.sql import functions as F
from pyspark.sql.window import Window

spark = get_spark(
    app_name=f"codec-{codec}", master="local[8]", shuffle_partitions=8,
    extra_conf={
        "spark.io.compression.codec": codec,
        "spark.local.dir": local_dir,
        # keep shuffle files alive until we du them
        "spark.cleaner.referenceTracking.blocking": "true",
    },
)
ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
w = Window.partitionBy("user_id").orderBy("ts", "event_id")
transcripts = ev.select(
    F.col("user_id").cast("string").alias("conv_id"),
    (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
    F.col("event_type").alias("role"),
    F.coalesce(F.col("props"), F.lit("")).alias("text"),
    F.lit("").alias("tool"),
    F.col("ts"),
).cache()
transcripts.count()

def run():
    t0 = time.perf_counter()
    backfill_features(transcripts).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

warm = run()
# du immediately after ONE run, before the ContextCleaner can GC its
# shuffles — both codecs get the identical single-run treatment
total = 0
for root, _dirs, files in os.walk(local_dir):
    for f in files:
        if "shuffle" in f and f.endswith(".data"):
            total += os.path.getsize(os.path.join(root, f))
walls = [run(), run()]
print(json.dumps({"codec": codec, "warm": round(warm, 3),
                  "walls": [round(x, 3) for x in walls],
                  "shuffle_data_bytes": total}))
"""


def calibrate() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i * i
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = []
    for codec in ("lz4", "zstd", "lz4", "zstd"):  # alternated phases
        c = calibrate()
        with tempfile.TemporaryDirectory(prefix=f"codecab-{codec}-") as d:
            r = subprocess.run(
                [sys.executable, "-c", CHILD, sf_dir, codec, d],
                capture_output=True, text=True, timeout=900,
            )
            line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
            if not line:
                print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"child failed for {codec}")
            rec = json.loads(line[-1])
            rec["calib_s"] = round(c, 2)
            out.append(rec)
            print(json.dumps(rec), flush=True)
        time.sleep(60)  # cooldown between phases
    print(json.dumps({"all": out}))


if __name__ == "__main__":
    main()
