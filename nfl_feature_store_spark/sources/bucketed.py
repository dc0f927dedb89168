"""Bucketed transcript storage: co-located per-entity pipelines
(SURVEY.md §4.2.2 "pre-partitioning / bucketing").

The flagship pipeline costs exactly one ``hash(conv_id)`` exchange
(plan-audited). Bucketing the table BY that key at WRITE time removes even
that: a scan of a table written with ``bucketBy(n, conv_id)`` reports
``HashPartitioning(conv_id, n)``, which satisfies every downstream window /
groupBy ClusteredDistribution, so Catalyst plans ZERO data exchanges for the
entire dedup → sessionize → windows → EWMA chain. At 10^12 turns that turns
the dominant shuffle into a one-time ingestion cost amortized over every
backfill — the parquet-table stand-in for an Iceberg table with a
``bucket(conv_id)`` partition transform.

``sortBy(conv_id, ts, turn_idx)`` additionally pre-orders rows inside each
bucket file; Spark still inserts a defensive within-partition sort when a
bucket spans multiple files, which AQE leaves cheap (files arrive
nearly-sorted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_transcripts(
    df: DataFrame,
    table: str,
    buckets: int = 64,
    entity_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
) -> None:
    """Persist transcripts as a bucketed+sorted managed table (overwrite)."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, entity_col)
        .sortBy(entity_col, *order_cols)
        .saveAsTable(table)
    )


def read_bucketed_transcripts(spark: SparkSession, table: str) -> DataFrame:
    """Read back with bucket metadata intact (plain spark.table)."""
    return spark.table(table)
