#!/usr/bin/env python3
"""Per-query isolation bench (guide §1.4) — NOT the driver's bench.

``bench.py`` is frozen for measurement; this file exists for the
optimization loop: it times individual queries (noop sink, labelled jobs,
best-of-N) and can dump ``explain("formatted")`` plans for the
``plans/r06`` deliverables. Usage::

    python bench_extra.py q53_contamination q24_ngram_jaccard   # time queries
    python bench_extra.py --explain q53_contamination           # dump plan
    python bench_extra.py flagship wide59 wide190               # pipeline specs

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
BENCH_EXTRA_REPEATS (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("BENCH_EXTRA_REPEATS", "2"))


def _calibrate() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    return round(time.perf_counter() - t0, 2)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _flagship_input(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.coalesce(F.col("props"), F.lit("")).alias("text"),
        F.when(F.col("event_type") == "error", F.lit("debugger")).otherwise(F.lit("")).alias("tool"),
        F.col("ts").cast("timestamp").alias("ts"),
    )


def _make(spark, name):
    """Return a zero-arg builder for the named query / pipeline spec."""
    from pyspark.sql import functions as F

    from nfl_feature_store_spark.plans.pipeline import backfill_features
    from nfl_feature_store_spark.registry import QUERIES

    if name in QUERIES:
        return lambda: QUERIES[name](spark, SF_DIR)
    if name == "flagship":
        tr = _flagship_input(spark)
        return lambda: backfill_features(tr)
    if name in ("wide59", "wide190"):
        from nfl_feature_store_spark.operators.windows import FeatureSpec

        n = 56 if name == "wide59" else 187
        pref = "m" if name == "wide59" else "w"
        wid = 2 if name == "wide59" else 3
        extra = {
            f"{pref}{i:0{wid}d}": (F.xxhash64("conv_id", "turn_idx", F.lit(i)) % 1000).cast("double")
            for i in range(n)
        }
        spec = FeatureSpec(
            metrics=("chars", "words", "is_tool") + tuple(extra)
        )
        wide_in = _flagship_input(spark).withColumns(extra)
        return lambda: backfill_features(wide_in, spec=spec, rank_metric=None)
    raise SystemExit(f"unknown query {name!r}")


def main() -> None:
    from nfl_feature_store_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain = "--explain" in sys.argv
    spark = get_spark(app_name="bench_extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    # warm JVM + python workers like bench.py does
    spark.range(1000).count()

    def _identity(it):
        yield from it

    spark.range(0, CPUS * 10, 1, numPartitions=CPUS).mapInPandas(
        _identity, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    out = {}
    for name in args:
        make = _make(spark, name)
        if explain:
            print(f"==== {name} ====")
            make().explain("formatted")
            continue
        samples = []
        for i in range(REPEATS):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            _noop(make())
            samples.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(samples), "samples": samples}
    print(json.dumps({"sf_dir": SF_DIR, "cores": CPUS, "calib": _calibrate(), "queries": out}))


if __name__ == "__main__":
    main()
