"""Single-line bench: the flagship_wide59 shape only (59 metrics x all
window families + EWMA over the sf0.1 events-derived transcript stream).
Used for same-session A/B of EWMA kernel variants (round-4 VERDICT item 6).

Usage: python scripts/bench_wide59.py [runs]
"""

import os
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nfl_feature_store_spark import get_spark  # noqa: E402
from nfl_feature_store_spark.operators.windows import FeatureSpec  # noqa: E402
from nfl_feature_store_spark.plans.pipeline import backfill_features  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(
        app_name="bench_wide59", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    transcripts = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.coalesce(F.col("props"), F.lit("")).alias("text"),
        F.when(F.col("event_type") == "error", F.lit("debugger")).otherwise(F.lit("")).alias("tool"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    extra = {
        f"m{i:02d}": (F.xxhash64("conv_id", "turn_idx", F.lit(i)) % 1000).cast("double")
        for i in range(56)
    }
    spec = FeatureSpec(metrics=("chars", "words", "is_tool") + tuple(f"m{i:02d}" for i in range(56)))
    wide_in = transcripts.withColumns(extra)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        backfill_features(wide_in, spec=spec, rank_metric=None).write.format("noop").mode(
            "overwrite"
        ).save()
        times.append(round(time.perf_counter() - t0, 3))
    print({"wide59_runs": times, "best": min(times)})


if __name__ == "__main__":
    main()
